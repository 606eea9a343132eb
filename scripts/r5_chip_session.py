"""Round-5 chip session driver: run every on-chip experiment in ONE
process so the axon backend's first-dispatch handshake (measured up to
~1100 s this session) is paid once, not per script.

Order (highest value first; the crash-risky multi-element-slice gather
probe runs LAST so a worker fault cannot take the session's earlier
results with it):

  1. scripts/ab_overlap.py      — pipelined vs serial resident step
  2. scripts/eval_precision.py  — train synthetic weights + head bisect
  3. scripts/profile_train.py   — batch-26 ledger (reference default)
  4. bench.py --mode zero_shot  — C12 path priced on-chip
  5. bench.py                   — few-shot record for this session
  6. scripts/probe_gather_pair.py — 2-element slice gather probe

Each stage's argv is patched and run via runpy in-process; a stage
failure is recorded and the chain continues.

  python scripts/r5_chip_session.py [--stages 1,2,3,4,5,6]
"""

import argparse
import os
import sys
import time
import traceback

_here = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(_here)
sys.path.insert(0, REPO)
sys.path.insert(0, _here)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", default="1,2,3,4,5,6", type=str)
    args = ap.parse_args()
    stages = {int(s) for s in args.stages.split(",") if s}

    import runpy

    STAGES = {
        1: (os.path.join(_here, "ab_overlap.py"),
            ["--batch", "8", "--iters", "10", "--rounds", "4"]),
        2: (os.path.join(_here, "eval_precision.py"),
            ["--head_bisect", "--batch_windows", "16"]),
        3: (os.path.join(_here, "profile_train.py"),
            ["--batch", "26", "--iters", "10"]),
        4: (os.path.join(REPO, "bench.py"), ["--mode", "zero_shot"]),
        5: (os.path.join(REPO, "bench.py"), []),
        6: (os.path.join(_here, "probe_gather_pair.py"),
            ["--batch", "8", "--iters", "20"]),
        # composed head-precision candidates, chosen from the stage-2
        # head bisect (error concentrates in hs4 = pred+final-up, then
        # hs3): price error AND device rate per candidate
        7: (os.path.join(_here, "eval_precision.py"),
            ["--modes", "fp32,bf16,mixed_fast,mix:01,mix:012,mix:0123",
             "--batch_windows", "16"]),
        # external-exemplar smoke ON the chip (C11 --external evidence
        # beyond CPU tests; reference: FSC_test_cross(few-shot).py:91-129)
        # — dataset + trained ckpt come from earlier stages' /tmp
        # artifacts (make_synthetic_fsc + eval_precision's training)
        8: ("-m countr_tpu.cli.test",
            ["--data_path", "/tmp/synth_fsc", "--external", "--limit", "8",
             "--resume", "/tmp/countr_synth_ckpt",
             "--model", "mae_vit_base6_patch16", "--dtype", "bf16",
             "--output_dir", "/tmp/ext_smoke"]),
        # decompose the two-dispatch pipeline's cost: standalone vs
        # in-scan materialize programs + biased-vs-honest fetch delta
        9: (os.path.join(_here, "probe_2disp_parts.py"),
            ["--batch", "8", "--iters", "10", "--rounds", "4"]),
        # graded-operand trivial programs: rules out input binding as
        # the per-dispatch cost (it's output staging)
        10: (os.path.join(_here, "probe_program_overhead.py"), []),
        # the PRODUCTION per-dispatch train loop vs the chained ledger
        # (donated TrainState outputs skip the staging cost)
        11: (os.path.join(_here, "probe_prod_dispatch.py"), []),
    }

    # pay the handshake once, up front, and report it
    t0 = time.time()
    import jax
    import jax.numpy as jnp

    print(f"[session] devices: {jax.devices()}", flush=True)
    float(jnp.add(jnp.float32(1), jnp.float32(1)))
    print(f"[session] handshake: {time.time() - t0:.1f}s", flush=True)

    results = {}
    for k in sorted(stages):
        script, argv = STAGES[k]
        print(f"\n===== stage {k}: {os.path.basename(script)} "
              f"{' '.join(argv)} =====", flush=True)
        if k == 8 and not os.path.isdir("/tmp/synth_fsc"):
            sys.argv = [os.path.join(_here, "make_synthetic_fsc.py"),
                        "--out", "/tmp/synth_fsc", "--n_train", "32",
                        "--n_val", "8", "--n_test", "16"]
            runpy.run_path(sys.argv[0], run_name="__main__")
        t0 = time.time()
        try:
            if script.startswith("-m "):
                sys.argv = [script] + argv
                runpy.run_module(script[3:], run_name="__main__",
                                 alter_sys=False)
            else:
                sys.argv = [script] + argv
                runpy.run_path(script, run_name="__main__")
            results[k] = f"OK ({time.time() - t0:.0f}s)"
        except SystemExit as e:
            results[k] = (f"OK ({time.time() - t0:.0f}s)" if not e.code
                          else f"EXIT {e.code} ({time.time() - t0:.0f}s)")
        except Exception:
            traceback.print_exc()
            results[k] = f"FAILED ({time.time() - t0:.0f}s)"
        print(f"===== stage {k}: {results[k]} =====", flush=True)

    print("\n[session] summary:", flush=True)
    for k in sorted(results):
        print(f"  stage {k} ({os.path.basename(STAGES[k][0])}): {results[k]}",
              flush=True)


if __name__ == "__main__":
    main()
