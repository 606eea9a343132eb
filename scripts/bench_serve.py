"""Serving throughput/latency benchmark for the HTTP counting service.

Spawns ``python -m countr_tpu.cli.serve`` (the only TPU client), waits
for /healthz, then fires concurrent few-shot requests from a thread
pool and reports imgs/s + latency percentiles. The load generator is
pure HTTP (urllib + PIL) — it never imports jax, so the one-client
rule of this machine's tunneled chip holds.

  python scripts/bench_serve.py [--n 64] [--concurrency 8]
      [--resume ckpt.pth] [--port 8701]

The micro-batching loop (cli/serve.py CountingService) is the thing
under test: concurrent requests with the same shot count must ride one
count_batch call, so imgs/s at concurrency C should approach the
offline batched-engine rate, while latency stays ~(batch window +
device time). The reference has no serving surface to compare against
(offline scripts only); the offline bench.py number is the ceiling.
"""

import argparse
import io
import json
import os
import queue
import subprocess
import sys
import threading
import time
import urllib.error
import urllib.request

import numpy as np
from PIL import Image

_here = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(_here)


def make_jpeg(rng, h, w):
    """Synthetic blobs image -> encoded JPEG bytes + 3 exemplar boxes."""
    img = np.full((h, w, 3), 40, np.uint8)
    boxes = []
    for i in range(30):
        cy, cx = int(rng.uniform(20, h - 20)), int(rng.uniform(20, w - 20))
        r = int(rng.uniform(6, 12))
        y0, y1 = max(0, cy - r), min(h, cy + r)
        x0, x1 = max(0, cx - r), min(w, cx + r)
        img[y0:y1, x0:x1] = rng.integers(120, 255, 3, np.uint8)
        if len(boxes) < 3:
            boxes.append((x0, y0, x1, y1))
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=90)
    q = ";".join(f"{x0},{y0},{x1},{y1}" for x0, y0, x1, y1 in boxes)
    return buf.getvalue(), q


def wait_healthy(port, proc, timeout=900.0):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if proc.poll() is not None:
            raise RuntimeError(f"server exited rc={proc.returncode}")
        try:
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=2
            ) as r:
                if r.status == 200:
                    return
        except (urllib.error.URLError, OSError):
            time.sleep(1.0)
    raise TimeoutError("server never became healthy")


def post(port, payload, boxes_q, timeout=600):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/count?boxes={boxes_q}",
        data=payload, method="POST",
    )
    t0 = time.perf_counter()
    with urllib.request.urlopen(req, timeout=timeout) as r:
        body = json.loads(r.read())
    return (time.perf_counter() - t0) * 1e3, body


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", default=64, type=int, help="requests per phase")
    p.add_argument("--concurrency", default=8, type=int)
    p.add_argument("--port", default=8701, type=int)
    p.add_argument("--resume", default="", type=str)
    p.add_argument("--dtype", default="bf16", type=str)
    p.add_argument("--batch_wait_ms", default=20.0, type=float)
    p.add_argument("--size", default="384x576", type=str,
                   help="HxW of the synthetic images (one shape bucket)")
    args = p.parse_args()

    h, w = (int(v) for v in args.size.split("x"))
    rng = np.random.default_rng(0)
    reqs = [make_jpeg(rng, h, w) for _ in range(args.n)]

    cmd = [
        sys.executable, "-m", "countr_tpu.cli.serve",
        "--port", str(args.port), "--dtype", args.dtype,
        "--batch_wait_ms", str(args.batch_wait_ms),
        "--warmup_sizes", f"{w}x{h}",
    ]
    if args.resume:
        cmd += ["--resume", args.resume]
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + ":" + env.get("PYTHONPATH", "")
    proc = subprocess.Popen(cmd, env=env, stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL)
    try:
        wait_healthy(args.port, proc, timeout=2400)
        # the server pre-compiled via --warmup_sizes; one request to settle
        t0 = time.perf_counter()
        post(args.port, *reqs[0])
        print(f"first request {time.perf_counter() - t0:.1f}s",
              file=sys.stderr, flush=True)

        results = {}
        for conc in (1, args.concurrency):
            lats: "queue.Queue" = queue.Queue()
            work: "queue.Queue" = queue.Queue()
            for r in reqs:
                work.put(r)

            def client():
                while True:
                    try:
                        payload, q = work.get_nowait()
                    except queue.Empty:
                        return
                    ms, body = post(args.port, payload, q)
                    lats.put((ms, body["count"]))

            threads = [threading.Thread(target=client) for _ in range(conc)]
            t0 = time.perf_counter()
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            wall = time.perf_counter() - t0
            ls = sorted(lats.queue, key=lambda x: x[0])
            ms = [x[0] for x in ls]
            results[f"c{conc}"] = {
                "imgs_per_sec": round(args.n / wall, 2),
                "p50_ms": round(float(np.percentile(ms, 50)), 1),
                "p95_ms": round(float(np.percentile(ms, 95)), 1),
                "max_ms": round(max(ms), 1),
            }
            print(f"concurrency {conc}: {results[f'c{conc}']}",
                  file=sys.stderr, flush=True)
        print(json.dumps(results))
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()


if __name__ == "__main__":
    main()
