"""Worker process for the true 2-process multi-host rehearsal test.

Launched by tests/test_multiprocess.py with JAX_COORDINATOR_ADDRESS /
JAX_NUM_PROCESSES / JAX_PROCESS_ID set (the env contract of
countr_tpu.parallel.dist.init_distributed). Runs the REAL finetune CLI
main over a synthetic mini-FSC147 fixture — per-process slice loading,
make_global_batch assembly, replicated-metric reads, rank-gated side
effects — then probes global_any with rank-dependent flags and writes a
per-rank JSON result for the parent to assert on.

The reference only ever exercises its distributed path by actually
launching under torchrun (reference: util/misc.py:225-257); this is the
TPU-native equivalent rehearsal, runnable on CPU without a pod.
"""

import argparse
import ctypes
import json
import os
import signal
import sys

# Die with the parent (PR_SET_PDEATHSIG): a SIGKILLed/SIGTERMed pytest
# must not leave gloo-blocked workers orphaned on this 1-core host —
# two stuck ranks at ~30% CPU each starve every later compile.
try:
    ctypes.CDLL("libc.so.6", use_errno=True).prctl(1, signal.SIGKILL)
except Exception:
    pass

import jax

# CPU platform + gloo cross-process collectives MUST be configured
# before backend init (the axon TPU plugin ignores JAX_PLATFORMS).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Persistent compile cache: these two workers dominate the suite's wall
# time (~16 of 37 cold minutes) and their compiles repeat run-to-run.
from countr_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--fsc_dir", required=True)
    p.add_argument("--outdir", required=True)
    p.add_argument("--result", required=True)
    p.add_argument("--epochs", default=2, type=int)
    p.add_argument("--batch_size", default=8, type=int)
    p.add_argument("--single", action="store_true",
                   help="single-process comparison run (8 local devices)")
    p.add_argument("--do_resume", action="store_true",
                   help="resume full training state from --outdir "
                        "(the kill-and-resume rehearsal's second phase)")
    p.add_argument("--resident", action="store_true",
                   help="run the resident-store training mode (pool "
                        "replicated over the mesh, geometry sharded)")
    args = p.parse_args()

    from countr_tpu.parallel.dist import init_distributed

    init_distributed()
    assert jax.process_count() == (1 if args.single else 2), jax.process_count()

    from countr_tpu.config import COUNTR_PRESETS, CounTRConfig

    COUNTR_PRESETS["tiny384"] = CounTRConfig(
        img_size=384, patch_size=16, embed_dim=32, depth=1, num_heads=2,
        decoder_embed_dim=32, decoder_depth=1, decoder_num_heads=2,
        head_width=32,
    )

    from countr_tpu.cli import finetune as cli_ft

    ft_args = argparse.Namespace(
        data_path=args.fsc_dir, anno_file="annotation_FSC147_384.json",
        data_split_file="Train_Test_Val_FSC_147.json",
        im_dir="images_384_VarV2", class_file="ImageClasses_FSC147.txt",
        output_dir=args.outdir, model="tiny384", resume="", dtype="fp32",
        seed=0, batch_size=args.batch_size, epochs=args.epochs,
        warmup_epochs=1, blr=2e-4, lr=None, min_lr=0.0, weight_decay=0.05,
        accum_iter=1, no_aug=False, num_workers=0, use_processes=False,
        resident_data=args.resident,
        ckpt_every=0, do_resume=args.do_resume, init_from_mae="",
        init_from_mae_model="", limit_steps=0, n_devices=0, panel_every=0,
        log_every=0, exact_gelu=False, debug_nans=False, wandb_project="",
        wandb_title="", wandb_team="", wandb_id="",
    )
    cli_ft.main(ft_args)

    if args.single:
        print("[single] done", flush=True)
        return

    # global_any must see the OTHER rank's flag (the m_flag shot rule
    # spans the global batch)
    from countr_tpu.parallel.mesh import global_any, is_main_process
    import numpy as np

    rank = jax.process_index()
    # only rank 1 raises its local flag; both must observe True
    sees_other = global_any(np.asarray([rank == 1]))
    none_set = global_any(np.asarray([False]))

    with open(args.result, "w") as f:
        json.dump(
            {
                "rank": rank,
                "process_count": jax.process_count(),
                "local_devices": jax.local_device_count(),
                "global_devices": jax.device_count(),
                "sees_other_flag": bool(sees_other),
                "none_set": bool(none_set),
                "is_main": bool(is_main_process()),
            },
            f,
        )
    print(f"[rank {rank}] done", flush=True)


if __name__ == "__main__":
    main()
