"""Checkpoint converter verification for released reference weights.

Prints the .pth file's sha256, converts it through the framework's
key-mapping (engine/checkpoint.py convert_countr_state_dict), and
prints a deterministic digest of the converted parameter tree
(key/shape/dtype structure + value hash). Run this on the released
FSC147 checkpoint before the acceptance gate
(cli.test --expect_mae 11.95 --expect_rmse 91.23) so a conversion
regression is distinguishable from a model regression.

  python scripts/verify_weights.py FSC147.pth [--model mae_vit_base6_patch16]

The released reference checkpoints (reference: README.md:117-120) are
not downloadable in this development environment (zero egress); record
the digests the first time the weights are available and pin them here.
"""

import argparse
import hashlib
import os
import sys

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here))

import numpy as np


def tree_digest(params) -> str:
    """Order-independent digest over (path, shape, dtype, value sha)."""
    import jax

    items = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = jax.tree_util.keystr(path)
        arr = np.asarray(leaf)
        h = hashlib.sha256(arr.tobytes()).hexdigest()[:16]
        items.append(f"{key}:{arr.shape}:{arr.dtype}:{h}")
    items.sort()
    return hashlib.sha256("\n".join(items).encode()).hexdigest()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("pth", type=str)
    p.add_argument("--model", default="mae_vit_base6_patch16", type=str)
    p.add_argument("--mae", action="store_true",
                   help="treat as an MAE pretrain checkpoint")
    args = p.parse_args()

    with open(args.pth, "rb") as f:
        file_sha = hashlib.sha256(f.read()).hexdigest()
    print(f"file sha256: {file_sha}")

    from countr_tpu.config import COUNTR_PRESETS, MAE_PRESETS
    from countr_tpu.engine import checkpoint as ckpt

    sd = ckpt.load_torch_checkpoint(args.pth)
    print(f"state_dict: {len(sd)} tensors")
    if args.mae:
        cfg = MAE_PRESETS[args.model]
        params = ckpt.convert_mae_state_dict(sd, depth=cfg.depth)
    else:
        cfg = COUNTR_PRESETS[args.model]
        params = ckpt.convert_countr_state_dict(
            sd, depth=cfg.depth, decoder_depth=cfg.decoder_depth
        )
    n_leaves = len(
        [1 for _ in __import__("jax").tree_util.tree_leaves(params)]
    )
    print(f"converted tree: {n_leaves} arrays")
    print(f"converted-tree digest: {tree_digest(params)}")


if __name__ == "__main__":
    main()
