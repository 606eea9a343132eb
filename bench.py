"""Headline benchmark: FSC147-style few-shot sliding-window counting
throughput (images/sec/chip) on the flagship mae_vit_base6_patch16
model in bf16.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

The workload replicates the reference benchmark's geometry
(FSC_test_cross(few-shot).py): H=384, widths snapped to multiples of
16 drawn from the FSC147 aspect distribution, 3 exemplar boxes, full
sliding-window + overlap stitch + test-time normalization per image,
and ~10% of images carrying tiny (<10x10) exemplars so the 3x3
grid-mode path (9x windows/image, reference :264-284) is exercised and
priced. FSC147 images/weights are not downloadable in this
environment, so the pixel content is synthetic — throughput is
content-independent.

vs_baseline: the reference publishes no throughput number
(BASELINE.md); it runs >=ceil((w-384)/128)+1 serial fp32 torch
forwards per image on an RTX 3090. We use 2.0 images/sec as the
baseline estimate (~0.5 s/image mean infer time for the 3090 pipeline)
— the value the driver records is ours; vs_baseline is this ratio.

Two device-rate fields separate chip capability from this machine's
15-30 MB/s tunnel H2D link that bounds the end-to-end number:

- ``device_windows_per_sec``: bare forward_tokens rate (chained jitted
  calls, one terminal fetch) — the model-kernel ceiling.
- ``device_pipeline_windows_per_sec``: the FULL per-set device
  pipeline at device speed — exemplar-CNN embed + window extraction
  (plain AND grid-mode resampled) + batched forward + stitch
  accumulation + integral-image finalize + TTN — built from the SAME
  production plan (CountingEngine._plan_set) the e2e path dispatches.
  The modeled PCIe-host e2e is based on THIS rate.
"""

import json
import time

import numpy as np

BASELINE_IMAGES_PER_SEC = 2.0
N_IMAGES = 64
BATCH_WINDOWS = 16
GRID_EVERY = 10  # every 10th image gets tiny exemplars -> 3x3 grid mode

PLAIN_RECTS = [(40, 40, 110, 120), (150, 60, 230, 140), (250, 200, 330, 300)]
TINY_RECTS = [(12, 12, 17, 17), (60, 60, 65, 65), (100, 100, 105, 105)]


def main():
    import argparse
    import sys

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--mode", default="few_shot", choices=("few_shot", "zero_shot"),
        help="zero_shot prices the C12 path on-chip: shot_num=0 (learned "
             "shot token, no exemplar CNN), no exemplar rects -> no TTN "
             "and no grid mode (reference: FSC_test_cross(zero-shot).py, "
             "run_minimal.MD:92-95). The driver's recorded metric is the "
             "default few_shot.",
    )
    bench_args = ap.parse_args()
    zero_shot = bench_args.mode == "zero_shot"
    shot_num = 0 if zero_shot else 3

    import jax
    import jax.numpy as jnp

    from countr_tpu.engine.inference import CountingEngine
    from countr_tpu.models import build_countr
    from countr_tpu.parallel.mesh import get_mesh
    from countr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    def note(msg):
        print(f"[bench] {msg}", file=sys.stderr, flush=True)

    # Persistent-cache hit/miss counters: warmup on this machine is
    # dominated by the axon backend's variable first-dispatch handshake
    # (measured 6-342 s, scripts/probe_first_dispatch.py) plus ~2-8 s
    # PER cached executable to ship its binary over the 15-30 MB/s
    # tunnel (jit_fwd entries are 23 MB each) — counting hits vs misses
    # makes warmup_s self-explaining in the recorded JSON.
    import logging

    cache_events = {"hits": 0, "misses": 0}

    class _CacheCounter(logging.Handler):
        def emit(self, record):
            m = record.getMessage()
            if "cache hit for" in m:
                cache_events["hits"] += 1
            elif "CACHE MISS for" in m:
                cache_events["misses"] += 1

    _clog = logging.getLogger("jax._src.compiler")
    _clog.setLevel(logging.DEBUG)
    _clog.addHandler(_CacheCounter())
    _clog.propagate = False  # counters only; keep stderr readable

    rng = np.random.default_rng(0)
    model = build_countr(
        "mae_vit_base6_patch16", dtype=jnp.bfloat16, use_pallas_attention=True,
        approx_gelu=True, subpixel_head=True,
    )
    params = jax.jit(model.init, static_argnums=(3,))(
        jax.random.key(0),
        jnp.zeros((1, 384, 384, 3), jnp.float32),
        jnp.zeros((1, 3, 64, 64, 3), jnp.float32),
        3,
    )
    # All-device mesh: on a single chip this is the plain path; on a
    # multi-chip host window batches shard across 'data' (the reference
    # evaluates under DDP too, FSC_test_cross(few-shot).py:229-231).
    engine = CountingEngine(
        model, params, batch_windows=BATCH_WINDOWS, mesh=get_mesh()
    )

    def timed(fn):
        t0 = time.perf_counter()
        fn()
        return time.perf_counter() - t0

    def dispatch_floor(iters: int) -> float:
        """Per-call dispatch+fetch floor over the tunnel (~10-40 ms,
        session-dependent), measured with an empty chain and subtracted
        so device metrics reflect device time, not RTT."""
        from jax import lax

        def empty(x):
            def body(c, _):
                return c * jnp.float32(1.0000001), None

            return lax.scan(body, x, None, length=iters)[0]

        erun = jax.jit(empty)
        x0 = jnp.float32(1.0)
        float(erun(x0))
        return min(timed(lambda: float(erun(x0))) for _ in range(4))

    def device_windows_per_sec(iters: int = 10) -> float:
        """Bare forward rate (no host/tunnel): iters chained forwards
        in one jitted scan, one terminal scalar fetch."""
        from jax import lax

        from countr_tpu.models.countr import CounTR

        imgs = jnp.asarray(
            rng.uniform(0, 1, (BATCH_WINDOWS, 384, 384, 3)), jnp.float32
        )
        ny = 1 if zero_shot else 3  # zero-shot: one learned shot token
        y = jnp.asarray(rng.uniform(-1, 1, (BATCH_WINDOWS, ny, 512)), jnp.bfloat16)

        def looped(imgs, p, y):
            def body(c, _):
                im = imgs + (c * 1e-12).astype(imgs.dtype)
                d = model.apply(p, im, y, method=CounTR.forward_tokens)
                return jnp.float32(d.ravel()[0]) * 1e-12, None

            return lax.scan(body, jnp.float32(0.0), None, length=iters)[0]

        floor = dispatch_floor(iters)
        run = jax.jit(looped)
        _ = float(run(imgs, params, y))  # compile + warmup
        best = min(timed(lambda: float(run(imgs, params, y))) for _ in range(3))
        return BATCH_WINDOWS * iters / max(best - floor, 1e-9)

    # ------------------------------------------------------------------
    # FSC147-like geometry (H=384, W multiple of 16); uint8 pixels,
    # matching the real test pipeline's PIL output. Every GRID_EVERY-th
    # image carries tiny exemplar rects -> 3x3 grid mode (9 crops, each
    # sliding-window counted on device via resampled extraction).
    # ------------------------------------------------------------------
    widths = [384, 448, 512, 512, 576, 640, 512, 688, 512, 464, 576, 512]
    images = [
        rng.integers(0, 256, (384, widths[i % len(widths)], 3), dtype=np.uint8)
        for i in range(N_IMAGES)
    ]
    boxes = [rng.uniform(0, 1, (3, 64, 64, 3)).astype(np.float32) for _ in images]
    if zero_shot:
        # no exemplar rects: no grid mode, no TTN (the reference's
        # zero-shot route never exercises either)
        rects = [[] for _ in range(N_IMAGES)]
    else:
        rects = [
            list(TINY_RECTS) if (i % GRID_EVERY) == GRID_EVERY - 1 else list(PLAIN_RECTS)
            for i in range(N_IMAGES)
        ]
    n_grid = sum(1 for r in rects if r and r[0] == TINY_RECTS[0])

    def device_pipeline_windows_per_sec(iters: int = 8):
        """Full device pipeline at device speed: one jitted scan whose
        every iteration embeds the set's exemplars (CNN), extracts every
        window (plain slices + grid-mode 2-tap resample) from the
        resident uint8 rows, runs the batched forwards, stitch-
        accumulates with the production weight columns, finalizes
        (count + integral-image TTN statistic) and applies TTN — the
        same plan count_batch dispatches, minus the host/tunnel
        (engine.device_pipeline.fused_set_program; its counts are
        pinned equal to count_batch in tests/test_bench_pipeline.py).

        Returns (windows_per_sec, images_per_sec, n_windows, n_imgs).
        """
        from countr_tpu.engine.device_pipeline import (
            chunk_plan, fused_set_program,
        )

        # THE production set: the first set count_batch itself would
        # dispatch for this batch (same sort, same greedy row packing),
        # so the measured composition — including its grid share and
        # tail-bucket padding — is exactly what the e2e path runs.
        idxs = engine.plan_batch_sets(images, rects)[0]
        sp = engine._plan_set(idxs, images, boxes, rects, shot_num)
        n = sp["plan"]["img_owner"].shape[0]
        n_img = len(idxs)
        n_grid = sum(1 for i in idxs if rects[i] and rects[i][0] == TINY_RECTS[0])
        # unified stream: one chunk ladder over plain+resampled windows
        slots = sum(bk for _, bk in chunk_plan(n, BATCH_WINDOWS))
        args, _, make_loop = fused_set_program(model, sp, BATCH_WINDOWS, shot_num)
        run = jax.jit(make_loop(iters))
        floor = dispatch_floor(iters)
        _ = float(run(params, *args))  # compile + warmup
        best = min(timed(lambda: float(run(params, *args))) for _ in range(3))
        dt = max(best - floor, 1e-9)
        return n * iters / dt, n_img * iters / dt, n, n_img, n_grid, slots

    # Pay (and price) the backend's first-dispatch handshake before any
    # timed phase; on the shared axon worker it varies 6-342 s and is
    # independent of our programs (scripts/probe_first_dispatch.py).
    t_h = time.perf_counter()
    float(jnp.add(jnp.float32(1), jnp.float32(1)))
    handshake_s = time.perf_counter() - t_h
    note(f"backend first-dispatch handshake: {handshake_s:.1f}s")

    note("measuring device-only window throughput...")
    dev_wps = device_windows_per_sec()
    note(f"device-only forward: {dev_wps:.0f} windows/s")

    note("measuring full device-pipeline throughput (incl. grid mode)...")
    (pipe_wps, pipe_ips, pipe_nwin, pipe_nimg, pipe_ngrid,
     pipe_slots) = device_pipeline_windows_per_sec()
    note(
        f"device pipeline: {pipe_wps:.0f} windows/s, {pipe_ips:.1f} img/s "
        f"({pipe_nwin} windows / {pipe_nimg} imgs per set, "
        f"{pipe_ngrid} grid, {pipe_nwin}/{pipe_slots} forward slots = "
        f"{pipe_nwin / pipe_slots:.0%} occupancy)"
    )

    # Warmup pass compiles every shape (pooled forward + exemplar CNN).
    note("compiling + warmup...")
    t_c = time.perf_counter()
    engine.count_batch(images, boxes, rects, shot_num=shot_num, return_density=False)
    warmup_s = time.perf_counter() - t_c
    note(
        f"warmup done in {warmup_s:.1f}s "
        f"(persistent cache: {cache_events['hits']} hits, "
        f"{cache_events['misses']} misses); timing..."
    )

    # Best of N timed passes: the tunneled-TPU link bandwidth is shared
    # and noisy (session weather swings 15-40 MB/s); best-of reflects
    # the pipeline's actual capability.
    N_PASSES = 8
    engine.h2d_bytes = 0
    times = []
    for _ in range(N_PASSES):
        t0 = time.perf_counter()
        results = engine.count_batch(
            images, boxes, rects, shot_num=shot_num, return_density=False
        )
        times.append(time.perf_counter() - t0)
    dt = min(times)

    n_windows = sum(r.n_windows for r in results)
    ips = len(images) / dt
    # Pass-rate spread: the shared tunnel's session weather swings the
    # e2e number (docs/PROFILE.md documents 118 vs 64 TFLOP/s across
    # sessions); min/median/max img/s over the N passes lets a future
    # regression be separated from link weather without re-running.
    ips_all = sorted(len(images) / t for t in times)
    ips_min = ips_all[0]
    ips_med = ips_all[len(ips_all) // 2]
    # H2D accounting: the engine uploads uint8 pixels + the window plan
    # once per image per pass. On this machine the tunnel link
    # (15-30 MB/s) dominates end-to-end; model what the same pipeline
    # does behind a PCIe-class link (~10 GB/s) so the e2e number is
    # interpretable beyond the tunnel. Per image the device runs the
    # FULL pipeline (embed + extract + forward + stitch + finalize) at
    # the measured pipeline rate, plus the PCIe transfer.
    # (engine.h2d_bytes counts every per-set payload: pixel pool,
    # exemplar box stack — bf16 since round 4 — window plan, rects.)
    h2d_per_img = engine.h2d_bytes / (N_PASSES * len(images))
    # per-image device time = the e2e geometry's windows/image at the
    # measured full-pipeline window rate (grid images included in both)
    dev_s_per_img = (n_windows / len(images)) / max(pipe_wps, 1e-9)
    pcie_s_per_img = h2d_per_img / 10e9
    projected_pcie_ips = 1.0 / (dev_s_per_img + pcie_s_per_img)
    note(
        f"h2d {h2d_per_img / 1e3:.0f} KB/image; tunnel-link e2e "
        f"{ips:.1f} img/s; modeled PCIe-host e2e "
        f"{projected_pcie_ips:.0f} img/s (device-bound, pipeline rate)"
    )
    out = {
        "metric": ("FSC147-geometry zero-shot sliding-window throughput"
                   if zero_shot else
                   "FSC147-geometry few-shot sliding-window throughput"),
        "value": round(ips, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / BASELINE_IMAGES_PER_SEC, 2),
        "device_windows_per_sec": round(dev_wps, 1),
        "device_pipeline_windows_per_sec": round(pipe_wps, 1),
        "h2d_bytes_per_image": round(h2d_per_img),
        "detail": {
            "n_images": len(images),
            "n_grid_images": n_grid,
            "n_windows": n_windows,
            "windows_per_sec": round(n_windows / dt, 1),
            "batch_windows": BATCH_WINDOWS,
            "images_bucket": engine.images_bucket,
            "forward_slot_occupancy": round(pipe_nwin / pipe_slots, 3),
            "dtype": "bfloat16",
            "model": "mae_vit_base6_patch16",
            "warmup_s": round(warmup_s, 1),
            "backend_handshake_s": round(handshake_s, 1),
            "compile_cache_hits": cache_events["hits"],
            "compile_cache_misses": cache_events["misses"],
            "pass_times_s": [round(t, 3) for t in times],
            "images_per_sec_min": round(ips_min, 2),
            "images_per_sec_median": round(ips_med, 2),
            "images_per_sec_max": round(ips, 2),
            "device_pipeline_images_per_sec": round(pipe_ips, 1),
            "projected_pcie_host_images_per_sec": round(projected_pcie_ips, 1),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
