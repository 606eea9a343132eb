"""Bounded in-memory cache of decoded, resized images.

JPEG decode + antialiased resize cost ~25 ms/sample on a single-core
host and are fully deterministic per image — only the augmentation
after them is random — so epochs 2+ can skip both. Entries are the
uint8 resize output (pil_resize_u8), 1/4 the bytes of float32 and
exactly reproducing the float pipeline via /255.

The reference redecodes every epoch in its DataLoader workers
(reference: FSC_finetune_cross.py:178-210); this cache is one of the
host-side wins that keeps a TPU fed from a weak host.

FIFO-bounded (default 2 GiB, COUNTR_TPU_IMAGE_CACHE_MB overrides;
0 disables). Pickling for process-pool workers transfers the cap only,
not the contents.
"""

from __future__ import annotations

import os
import threading
from collections import OrderedDict
from typing import Optional, Tuple

DEFAULT_MB = 2048


class ImageCache:
    def __init__(self, cap_mb: Optional[float] = None):
        if cap_mb is None:
            cap_mb = float(os.environ.get("COUNTR_TPU_IMAGE_CACHE_MB", DEFAULT_MB))
        self.cap_bytes = int(cap_mb * 2**20)
        self._lock = threading.Lock()
        self._data: "OrderedDict[object, Tuple]" = OrderedDict()
        self._bytes = 0

    def get(self, key) -> Optional[Tuple]:
        with self._lock:
            return self._data.get(key)

    def put(self, key, value: Tuple) -> None:
        if self.cap_bytes <= 0:
            return
        size = sum(v.nbytes for v in value if hasattr(v, "nbytes"))
        if size > self.cap_bytes:
            return
        with self._lock:
            if key in self._data:
                return
            while self._bytes + size > self.cap_bytes and self._data:
                _, old = self._data.popitem(last=False)
                self._bytes -= sum(v.nbytes for v in old if hasattr(v, "nbytes"))
            self._data[key] = value
            self._bytes += size

    def __len__(self) -> int:
        return len(self._data)

    # process-pool workers start with an empty cache, not a 2 GiB pickle
    def __getstate__(self):
        return {"cap_bytes": self.cap_bytes}

    def __setstate__(self, state):
        self.cap_bytes = state["cap_bytes"]
        self._lock = threading.Lock()
        self._data = OrderedDict()
        self._bytes = 0
