"""Host data loading: multi-worker prefetch feeding the device.

Replaces the reference's torch DataLoader(num_workers=10) + implicit
H2D copies (reference: FSC_finetune_cross.py:178-210, :273-275) with a
thread-pool loader (PIL/cv2/scipy release the GIL for the heavy work)
plus an explicit double-buffered device-put stage so the TPU never
waits on the host: batch N+1 is decoded/augmented and transferred
while batch N computes.
"""

from __future__ import annotations

import pickle
import queue
import threading
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor
from typing import Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np

_STACK_KEYS = (
    "image", "gt_density", "boxes",
    # device-aug geometry samples (TrainDataset(device_aug=True))
    "image_u8", "dots", "n_dots", "apply_photo",
    # resident-store parameter samples (TrainDataset(store_index=...))
    "img_idx", "affine_C", "affine_d", "is_mosaic", "cell_idx",
    "cell_top", "cell_left", "cell_len", "blend_l",
    # pretrain resident-store crop parameters
    "crop_top", "crop_left", "crop_h", "crop_w", "transposed", "flip",
)

# --- process-worker plumbing (one unpickled dataset per worker) ----------
_worker_dataset = None


def _proc_init(ds_bytes: bytes) -> None:
    global _worker_dataset
    _worker_dataset = pickle.loads(ds_bytes)


def _proc_fetch(job):
    epoch, idx = job
    if hasattr(_worker_dataset, "set_epoch"):
        _worker_dataset.set_epoch(epoch)
    return _worker_dataset[idx]


def default_collate(samples: Sequence[Dict]) -> Dict:
    """Stack array fields; list-ify ragged fields (rects, names)."""
    out: Dict = {}
    for k in samples[0]:
        vals = [s[k] for s in samples]
        if k in _STACK_KEYS:
            out[k] = np.stack(vals)
        elif k == "m_flag":
            out[k] = np.asarray(vals, np.int32)
        else:
            out[k] = vals
    return out


class DataLoader:
    """Deterministic shuffling + parallel sample fetch.

    Per-epoch order is a seeded permutation; each sample's augmentation
    RNG is derived from (dataset.seed, epoch, index) inside the
    dataset, so results are reproducible for any worker count.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        *,
        shuffle: bool = False,
        num_workers: int = 8,
        drop_last: bool = False,
        seed: int = 0,
        collate: Callable = default_collate,
        prefetch_batches: int = 2,
        use_processes: bool = False,
        process_index: int = 0,
        process_count: int = 1,
    ):
        """use_processes: fetch samples in worker *processes* instead of
        threads — sidesteps the GIL for the Python parts of heavy
        augmentation on many-core training hosts (the dataset must be
        picklable; ours are plain dataclass/dict state).

        process_index/process_count: multi-host sharding. batch_size is
        the GLOBAL batch; every process computes the same seeded
        permutation and loads only its contiguous
        batch_size/process_count slice of each batch (slice p feeds the
        mesh devices process p addresses — see
        parallel.mesh.make_global_batch). Requires batch_size %
        process_count == 0; a final partial batch is dropped when it
        cannot be split evenly (train loaders use drop_last anyway)."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.seed = seed
        self.collate = collate
        self.prefetch_batches = prefetch_batches
        self.use_processes = use_processes
        if process_count > 1 and batch_size % process_count != 0:
            raise ValueError(
                f"global batch_size {batch_size} not divisible by "
                f"process_count {process_count}"
            )
        self.process_index = process_index
        self.process_count = process_count
        self._pool = None  # persists across epochs (keeps worker-side
        # state — e.g. the decoded-image cache — warm)

    def _get_pool(self):
        if self._pool is None:
            if self.use_processes:
                self._pool = ProcessPoolExecutor(
                    self.num_workers, initializer=_proc_init,
                    initargs=(pickle.dumps(self.dataset),),
                )
            else:
                self._pool = ThreadPoolExecutor(self.num_workers)
        return self._pool

    def close(self) -> None:
        if self._pool is not None:
            self._pool.shutdown(wait=False, cancel_futures=True)
            self._pool = None

    def __del__(self):  # best-effort cleanup
        try:
            self.close()
        except Exception:
            pass

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def epoch(self, epoch: int = 0) -> Iterator[Dict]:
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            order = np.random.default_rng(
                np.random.SeedSequence([self.seed, epoch])
            ).permutation(n)
        batches: List[np.ndarray] = [
            order[i : i + self.batch_size]
            for i in range(0, n, self.batch_size)
        ]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches.pop()
        if self.process_count > 1:
            # keep this process's contiguous slice of each global batch
            sliced = []
            for idxs in batches:
                if len(idxs) % self.process_count:
                    continue  # final ragged batch not splittable evenly
                k = len(idxs) // self.process_count
                sliced.append(idxs[self.process_index * k : (self.process_index + 1) * k])
            batches = sliced

        pool = self._get_pool()
        if self.use_processes:
            submit = lambda i: pool.submit(_proc_fetch, (epoch, int(i)))  # noqa: E731
        else:
            submit = lambda i: pool.submit(self.dataset.__getitem__, int(i))  # noqa: E731

        pending: "queue.Queue" = queue.Queue()
        it = iter(batches)

        def submit_next() -> bool:
            try:
                idxs = next(it)
            except StopIteration:
                return False
            pending.put([submit(i) for i in idxs])
            return True

        for _ in range(self.prefetch_batches):
            if not submit_next():
                break
        while not pending.empty():
            futs = pending.get()
            submit_next()
            yield self.collate([f.result() for f in futs])


def device_prefetch(it: Iterator[Dict], put: Optional[Callable] = None, depth: int = 2):
    """Double-buffer an iterator through a device-put stage: a
    background thread stays `depth` batches ahead so H2D transfer and
    host augmentation overlap device compute."""
    import jax

    put = put or (lambda b: jax.tree.map(
        lambda x: jax.device_put(x) if isinstance(x, np.ndarray) else x, b
    ))
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    _END = object()
    err: List[BaseException] = []

    def producer():
        try:
            for batch in it:
                q.put(put(batch))
        except BaseException as e:  # propagate to consumer
            err.append(e)
        finally:
            q.put(_END)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            if err:
                raise err[0]
            return
        yield item
