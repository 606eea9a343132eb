"""Isolate the per-program-execution overhead behind the standalone
materialize cost (round 5).

probe_2disp_parts.py: a standalone materialize program costs 112
ms/dispatch while the identical work inside a 10-iteration scan costs
36.2 ms/iter — and neither a length-1 scan wrapper nor in-program key
derivation changes it. The fixed-overhead model (per-iter ~29 ms +
~76-83 ms per program EXECUTION) fits both numbers; the earlier
40-tiny-dispatch probe (~0.09 ms/dispatch) had no large arguments, so
the overhead would have to scale with the program's operand set. This
probe times N dispatches of trivial programs with graded operands:

  empty      — scalar in, scalar out (the dispatch floor itself);
  small-arg  — sum of a device-resident 14 MB array;
  store-arg  — sum of ONE device-resident 60 MB pool array;
  store-all  — takes the FULL store pytree (every pool array bound as
               a program input), sums one element of each.

If store-arg/store-all pay ~76 ms/dispatch while empty/small-arg do
not, the two-dispatch penalty is per-execution input-binding cost for
large operands, not a gather lowering — and the design rule is
"amortize big-operand programs over many iterations with lax.scan".

  python scripts/probe_program_overhead.py [--iters 10] [--rounds 4]
"""

import argparse
import os
import sys
import time

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here))
sys.path.insert(0, _here)

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", default=10, type=int)
    p.add_argument("--rounds", default=4, type=int)
    p.add_argument("--data_dir", default="/tmp/bench_fsc_e2e", type=str)
    args = p.parse_args()
    iters = args.iters

    import jax
    import jax.numpy as jnp

    from countr_tpu.data.fsc147 import FSC147Meta
    from countr_tpu.engine.train_store import build_store
    from countr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print(f"device={jax.devices()[0]} iters={iters}", flush=True)

    if not os.path.exists(os.path.join(args.data_dir,
                                       "annotation_FSC147_384.json")):
        from bench_finetune_e2e import make_dataset

        print("generating dataset...", flush=True)
        make_dataset(args.data_dir, 64, np.random.default_rng(0))
    meta = FSC147Meta.load(args.data_dir)
    store = build_store(meta, meta.splits["train"])
    sa = store.arrays

    leaves = jax.tree.leaves(sa)
    big = max(leaves, key=lambda a: a.nbytes)
    print(f"store leaves: {len(leaves)}, biggest {big.nbytes / 1e6:.0f} MB, "
          f"total {sum(a.nbytes for a in leaves) / 1e6:.0f} MB", flush=True)
    small = jnp.zeros((14 * 1024 * 1024 // 4,), jnp.float32)  # 14 MB

    @jax.jit
    def f_empty(x, i):
        return x * 1.0000001 + i

    @jax.jit
    def f_small(a, i):
        return jnp.sum(a) * 1e-20 + jnp.float32(i)

    @jax.jit
    def f_store1(b, i):
        return jnp.sum(b.astype(jnp.float32)) * 1e-20 + jnp.float32(i)

    @jax.jit
    def f_storeall(tree, i):
        tot = sum(l.ravel()[0].astype(jnp.float32)
                  for l in jax.tree.leaves(tree))
        return tot * 1e-20 + jnp.float32(i)

    @jax.jit
    def force(xs):
        return sum(xs)

    x0 = jnp.float32(1.0)
    runs = {
        "empty": lambda: float(force(
            [f_empty(x0, jnp.float32(i)) for i in range(iters)])),
        "small-arg": lambda: float(force(
            [f_small(small, jnp.float32(i)) for i in range(iters)])),
        "store-arg": lambda: float(force(
            [f_store1(big, jnp.float32(i)) for i in range(iters)])),
        "store-all": lambda: float(force(
            [f_storeall(sa, jnp.float32(i)) for i in range(iters)])),
    }

    print("compiling...", flush=True)
    for fn in runs.values():
        fn()

    best = {k: 1e9 for k in runs}
    for r in range(args.rounds):
        for k, fn in runs.items():
            t0 = time.perf_counter()
            fn()
            best[k] = min(best[k], (time.perf_counter() - t0) / iters)
        print(f"round {r}: " + "  ".join(
            f"{k} {v * 1e3:.2f}" for k, v in best.items()), flush=True)

    print("---", flush=True)
    for k, v in best.items():
        print(f"{k:<10s} {v * 1e3:8.2f} ms/dispatch", flush=True)


if __name__ == "__main__":
    main()
