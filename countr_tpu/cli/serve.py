"""HTTP counting service.

Production-serving surface over the batched counting engine (beyond
the reference, which only ships offline scripts): POST an image, get a
count. Requests are pooled across concurrent clients into device
batches by a micro-batching loop.

  python -m countr_tpu.cli.serve --resume weights.pth --port 8700

  POST /count            body: image bytes (jpeg/png)
       ?boxes=x1,y1,x2,y2;...   optional exemplar boxes (original px)
  -> {"count": float, "grid_mode": bool, "n_windows": int, "ms": float}
  GET /healthz -> {"ok": true}
"""

from __future__ import annotations

import argparse
import io
import json
import queue
import threading
import time

from countr_tpu.cli import common


def get_args():
    p = argparse.ArgumentParser("counting service")
    common.add_model_args(p, default_model="mae_vit_base6_patch16")
    p.add_argument("--host", default="127.0.0.1", type=str)
    p.add_argument("--port", default=8700, type=int)
    p.add_argument("--batch_windows", default=16, type=int)
    p.add_argument("--max_batch_images", default=16, type=int)
    p.add_argument("--batch_wait_ms", default=5.0, type=float,
                   help="micro-batching window")
    p.add_argument("--no_normalization", action="store_true")
    p.add_argument("--warmup_sizes", default="", type=str,
                   help="comma list of WxH image sizes (original pixels) to "
                        "pre-compile before accepting traffic: for each "
                        "size, every upload-row bucket and shot count the "
                        "service can hit is run once, so no request ever "
                        "pays an XLA compile")
    p.add_argument("--warmup_grid", action="store_true",
                   help="also pre-compile the 3x3 grid-mode path (tiny "
                        "exemplars) for each warmup size, alone and mixed "
                        "with plain images")
    return p.parse_args()


class CountingService:
    """Micro-batching wrapper: concurrent requests with the same shot
    count ride one count_batch call."""

    def __init__(self, engine, max_batch: int, wait_ms: float):
        self.engine = engine
        self.max_batch = max_batch
        self.wait_s = wait_ms / 1000.0
        self.q: "queue.Queue" = queue.Queue()
        self._worker = threading.Thread(target=self._loop, daemon=True)
        self._worker.start()

    def submit(self, image, boxes, rects, shot):
        done = threading.Event()
        slot = {"done": done}
        self.q.put((image, boxes, rects, shot, slot))
        done.wait()
        if "error" in slot:
            raise RuntimeError(slot["error"])
        return slot["result"]

    def _loop(self):
        while True:
            first = self.q.get()
            batch = [first]
            deadline = time.perf_counter() + self.wait_s
            while len(batch) < self.max_batch:
                timeout = deadline - time.perf_counter()
                if timeout <= 0:
                    break
                try:
                    item = self.q.get(timeout=timeout)
                except queue.Empty:
                    break
                batch.append(item)
            by_shot: dict = {}
            for item in batch:
                by_shot.setdefault(item[3], []).append(item)
            for shot, items in by_shot.items():
                try:
                    results = self.engine.count_batch(
                        [it[0] for it in items],
                        [it[1] for it in items],
                        [it[2] for it in items],
                        shot_num=shot,
                        return_density=False,
                    )
                    for it, r in zip(items, results):
                        it[4]["result"] = r
                        it[4]["done"].set()
                except Exception as e:  # propagate per request
                    for it in items:
                        it[4]["error"] = repr(e)
                        it[4]["done"].set()


def make_handler(service):
    from http.server import BaseHTTPRequestHandler

    import numpy as np
    from PIL import Image

    from countr_tpu.data import transforms as T

    class Handler(BaseHTTPRequestHandler):
        def _json(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # quiet
            pass

        def do_GET(self):
            if self.path.startswith("/healthz"):
                self._json(200, {"ok": True})
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            if not self.path.startswith("/count"):
                self._json(404, {"error": "not found"})
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                raw = self.rfile.read(length)
                img = Image.open(io.BytesIO(raw))
                if img.mode != "RGB":
                    img = img.convert("RGB")
                w0, h0 = img.size
                nh, nw = T.test_size(h0, w0)
                sy, sx = nh / h0, nw / w0
                image = T.pil_resize_u8(img, nh, nw)

                boxes_q = ""
                if "?" in self.path:
                    from urllib.parse import parse_qs, urlparse

                    boxes_q = parse_qs(urlparse(self.path).query).get(
                        "boxes", [""]
                    )[0]
                rects = []
                boxes = None
                if boxes_q:
                    image_f = image.astype(np.float32) / 255.0
                    for part in boxes_q.split(";"):
                        x1, y1, x2, y2 = (float(v) for v in part.split(","))
                        rects.append(
                            [int(y1 * sy), int(x1 * sx), int(y2 * sy), int(x2 * sx)]
                        )
                    boxes = T.crop_exemplars(image_f, rects, max_boxes=len(rects))

                t0 = time.perf_counter()
                r = service.submit(image, boxes, rects, len(rects))
                self._json(
                    200,
                    {
                        "count": r.count,
                        "grid_mode": r.grid_mode,
                        "n_windows": r.n_windows,
                        "ms": round((time.perf_counter() - t0) * 1e3, 1),
                    },
                )
            except Exception as e:
                self._json(400, {"error": repr(e)})

    return Handler


def serve(args, engine):
    from http.server import ThreadingHTTPServer

    service = CountingService(engine, args.max_batch_images, args.batch_wait_ms)
    server = ThreadingHTTPServer((args.host, args.port), make_handler(service))
    print(f"counting service on http://{args.host}:{server.server_address[1]}",
          flush=True)
    return server


def warmup(engine, sizes: str, max_batch: int, grid: bool = False) -> None:
    """Pre-compile every (row-bucket, width-bucket, shot) combo the
    micro-batcher can produce for the given image sizes. The engine
    buckets upload rows to powers of two (CountingEngine._row_bucket)
    and pads window chunks to batch_windows, so running one batch per
    distinct row bucket covers all steady-state shapes. With ``grid``,
    one grid-mode image (9 density rows) is also run alone and mixed
    into each plain-batch bucket, covering the resampled-extraction
    compiles tiny-exemplar requests would otherwise pay."""
    import numpy as np

    from countr_tpu.data import transforms as T

    buckets = sorted({engine._row_bucket(n) for n in range(1, max_batch + 1)})
    for part in sizes.split(","):
        w0, h0 = (int(v) for v in part.lower().split("x"))
        nh, nw = T.test_size(h0, w0)
        img = np.zeros((nh, nw, 3), np.uint8)
        img_f = img.astype(np.float32) / 255.0
        rects = [[10, 10, 60, 60], [80, 80, 140, 140], [200, 200, 260, 260]]
        boxes = T.crop_exemplars(img_f, rects, max_boxes=3)
        for nb in buckets:
            for shot, bx, rc in ((3, boxes, rects), (0, None, [])):
                t0 = time.perf_counter()
                engine.count_batch(
                    [img] * nb, [bx] * nb, [rc] * nb, shot_num=shot,
                    return_density=False,
                )
                print(
                    f"warmup {w0}x{h0} batch {nb} shot {shot}: "
                    f"{time.perf_counter() - t0:.1f}s",
                    flush=True,
                )
        if grid:
            # <10x10 px exemplars trigger the 3x3 grid path
            # (reference: FSC_test_cross(few-shot).py:264-284)
            tiny = [[10, 10, 15, 15], [30, 30, 36, 36], [50, 50, 55, 55]]
            tboxes = T.crop_exemplars(img_f, tiny, max_boxes=3)
            for nb in sorted({1, *buckets}):
                t0 = time.perf_counter()
                engine.count_batch(
                    [img] * nb,
                    [tboxes] + [boxes] * (nb - 1),
                    [tiny] + [rects] * (nb - 1),
                    shot_num=3, return_density=False,
                )
                print(
                    f"warmup {w0}x{h0} grid+{nb - 1} plain: "
                    f"{time.perf_counter() - t0:.1f}s",
                    flush=True,
                )


def main(args):
    from countr_tpu.engine.inference import CountingEngine

    model, params = common.build_counting_model(args)
    engine = CountingEngine(
        model, params, batch_windows=args.batch_windows,
        normalization=not args.no_normalization,
    )
    if args.warmup_sizes:
        warmup(engine, args.warmup_sizes, args.max_batch_images,
               grid=getattr(args, "warmup_grid", False))
    serve(args, engine).serve_forever()


def _entry():
    main(get_args())


if __name__ == "__main__":
    _entry()
