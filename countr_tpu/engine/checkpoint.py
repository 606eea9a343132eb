"""Checkpointing: orbax-native save/load plus a one-way converter from
the reference's torch ``.pth`` checkpoints.

The reference saves ``{'model': state_dict, 'optimizer', 'epoch',
'scaler', 'args'}`` via torch.save (reference: util/misc.py:304-335)
and provides released FSC147 weights in that format. The converter maps
those state_dict keys onto our flax param pytree so released weights
load bit-exactly (layout changes only: torch Linear stores W^T, torch
convs are OIHW vs our HWIO, and the patch-embed conv becomes a matmul).

Fixed sin-cos position embeddings are NOT converted — they are
deterministic constants recomputed at model build
(reference: models_mae_cross.py:111-115 writes the same values).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Mapping

import jax
import numpy as np


def _t(w: np.ndarray) -> np.ndarray:
    """torch Linear weight [out, in] -> flax Dense kernel [in, out]."""
    return np.ascontiguousarray(w.T)


def _conv(w: np.ndarray) -> np.ndarray:
    """torch Conv2d weight OIHW -> flax Conv kernel HWIO."""
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def _patch_kernel(w: np.ndarray) -> np.ndarray:
    """Stride-p conv kernel [D, C, p, p] -> matmul kernel [(p,p,C), D]
    matching PatchEmbed's (ph, pw, c) patch-pixel flatten order."""
    d = w.shape[0]
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0).reshape(-1, d))


def _ln(sd: Mapping[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _dense(sd: Mapping[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    out = {"kernel": _t(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def _encoder_block(sd, i: int, prefix: str = "blocks") -> Dict[str, Any]:
    p = f"{prefix}.{i}"
    return {
        "norm1": _ln(sd, f"{p}.norm1"),
        "attn": {
            "qkv": _dense(sd, f"{p}.attn.qkv"),
            "proj": _dense(sd, f"{p}.attn.proj"),
        },
        "norm2": _ln(sd, f"{p}.norm2"),
        "mlp": {
            "fc1": _dense(sd, f"{p}.mlp.fc1"),
            "fc2": _dense(sd, f"{p}.mlp.fc2"),
        },
    }


def _to_numpy_sd(state_dict: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in state_dict.items():
        if hasattr(v, "detach"):  # torch tensor
            v = v.detach().cpu().float().numpy()
        out[k] = np.asarray(v, dtype=np.float32)
    return out


def convert_countr_state_dict(
    state_dict: Mapping[str, Any], depth: int = 12, decoder_depth: int = 6
) -> Dict[str, Any]:
    """Reference SupervisedMAE state_dict -> CounTR flax params
    (key layout per models_mae_cross.py:18-106)."""
    sd = _to_numpy_sd(state_dict)
    params: Dict[str, Any] = {
        "patch_embed": {
            "proj": {
                "kernel": _patch_kernel(sd["patch_embed.proj.weight"]),
                "bias": sd["patch_embed.proj.bias"],
            }
        },
        "norm": _ln(sd, "norm"),
        "decoder_embed": _dense(sd, "decoder_embed"),
        "shot_token": sd["shot_token"],
        "decoder_norm": _ln(sd, "decoder_norm"),
    }
    for i in range(depth):
        params[f"blocks_{i}"] = _encoder_block(sd, i)

    # Exemplar CNN: decoder_proj{k}.0 is the conv; the InstanceNorm at
    # index 1 is affine-free (no params).
    params["exemplar_encoder"] = {
        f"conv{k}": {
            "kernel": _conv(sd[f"decoder_proj{k}.0.weight"]),
            "bias": sd[f"decoder_proj{k}.0.bias"],
        }
        for k in (1, 2, 3, 4)
    }

    for i in range(decoder_depth):
        p = f"decoder_blocks.{i}"
        params[f"decoder_blocks_{i}"] = {
            "norm0": _ln(sd, f"{p}.norm0"),
            "selfattn": {
                "qkv": _dense(sd, f"{p}.selfattn.qkv"),
                "proj": _dense(sd, f"{p}.selfattn.proj"),
            },
            "norm1": _ln(sd, f"{p}.norm1"),
            "attn": {
                "wq": _dense(sd, f"{p}.attn.wq"),
                "wk": _dense(sd, f"{p}.attn.wk"),
                "wv": _dense(sd, f"{p}.attn.wv"),
                "proj": _dense(sd, f"{p}.attn.proj"),
            },
            "norm2": _ln(sd, f"{p}.norm2"),
            "mlp": {
                "fc1": _dense(sd, f"{p}.mlp.fc1"),
                "fc2": _dense(sd, f"{p}.mlp.fc2"),
            },
        }

    # Density head: decode_head{k}.0 conv, .1 GroupNorm; decode_head3.3
    # is the final 1x1 projection.
    head: Dict[str, Any] = {}
    for k in range(4):
        head[f"conv{k}"] = {
            "kernel": _conv(sd[f"decode_head{k}.0.weight"]),
            "bias": sd[f"decode_head{k}.0.bias"],
        }
        head[f"gn{k}_scale"] = sd[f"decode_head{k}.1.weight"]
        head[f"gn{k}_bias"] = sd[f"decode_head{k}.1.bias"]
    head["pred"] = {
        "kernel": _conv(sd["decode_head3.3.weight"]),
        "bias": sd["decode_head3.3.bias"],
    }
    params["density_head"] = head
    return {"params": params}


def convert_mae_state_dict(
    state_dict: Mapping[str, Any], depth: int = 12, decoder_depth: int = 8
) -> Dict[str, Any]:
    """Reference MaskedAutoencoderViTNoCT state_dict -> flax params
    (key layout per models_mae_noct.py:11-51)."""
    sd = _to_numpy_sd(state_dict)
    params: Dict[str, Any] = {
        "patch_embed": {
            "proj": {
                "kernel": _patch_kernel(sd["patch_embed.proj.weight"]),
                "bias": sd["patch_embed.proj.bias"],
            }
        },
        "norm": _ln(sd, "norm"),
        "decoder_embed": _dense(sd, "decoder_embed"),
        "mask_token": sd["mask_token"],
        "decoder_norm": _ln(sd, "decoder_norm"),
        "decoder_pred": _dense(sd, "decoder_pred"),
    }
    for i in range(depth):
        params[f"blocks_{i}"] = _encoder_block(sd, i)
    for i in range(decoder_depth):
        params[f"decoder_blocks_{i}"] = _encoder_block(sd, i, "decoder_blocks")
    return {"params": params}


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a reference .pth and return its model state_dict as numpy.

    Handles both the full training checkpoint format
    ({'model': ..., 'optimizer': ...}, reference: util/misc.py:311-318)
    and a bare state_dict. torch is imported lazily — it is only needed
    for this one-way import path.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    return _to_numpy_sd(sd)


# ---------------------------------------------------------------------------
# Orbax-native checkpointing (training state save/resume).
# Replaces the reference's torch.save/load machinery
# (reference: util/misc.py:304-421) with atomic, async-capable orbax
# checkpoints.
# ---------------------------------------------------------------------------


def save_checkpoint(directory: str, step: int, state: Any, keep: int = 3) -> None:
    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    with ocp.CheckpointManager(
        directory, options=ocp.CheckpointManagerOptions(max_to_keep=keep)
    ) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(state))
        mgr.wait_until_finished()


def restore_checkpoint(directory: str, state: Any, step: int | None = None) -> Any:
    """Restore `state`-shaped pytree; latest step if not given."""
    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    with ocp.CheckpointManager(directory) as mgr:
        if step is None:
            step = mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {directory}")
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, state)
        return mgr.restore(step, args=ocp.args.StandardRestore(abstract)), step


def latest_step(directory: str) -> int | None:
    import orbax.checkpoint as ocp

    if not os.path.isdir(directory):
        return None
    with ocp.CheckpointManager(os.path.abspath(directory)) as mgr:
        return mgr.latest_step()
