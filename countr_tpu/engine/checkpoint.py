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


# ---------------------------------------------------------------------------
# Reverse export: flax params -> reference torch state_dict
# ---------------------------------------------------------------------------


def _t_inv(k: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(k, np.float32).T)


def _conv_inv(k: np.ndarray) -> np.ndarray:
    """flax HWIO -> torch OIHW."""
    return np.ascontiguousarray(np.asarray(k, np.float32).transpose(3, 2, 0, 1))


def _patch_kernel_inv(k: np.ndarray, patch: int, in_chans: int = 3) -> np.ndarray:
    """[(p*p*c), D] matmul kernel -> torch conv [D, c, p, p]."""
    k = np.asarray(k, np.float32)
    d = k.shape[1]
    return np.ascontiguousarray(
        k.T.reshape(d, patch, patch, in_chans).transpose(0, 3, 1, 2)
    )


def _ln_inv(sd, prefix, p):
    sd[f"{prefix}.weight"] = np.asarray(p["scale"], np.float32)
    sd[f"{prefix}.bias"] = np.asarray(p["bias"], np.float32)


def _dense_inv(sd, prefix, p):
    sd[f"{prefix}.weight"] = _t_inv(p["kernel"])
    if "bias" in p:
        sd[f"{prefix}.bias"] = np.asarray(p["bias"], np.float32)


def _encoder_block_inv(sd, p, prefix):
    _ln_inv(sd, f"{prefix}.norm1", p["norm1"])
    _dense_inv(sd, f"{prefix}.attn.qkv", p["attn"]["qkv"])
    _dense_inv(sd, f"{prefix}.attn.proj", p["attn"]["proj"])
    _ln_inv(sd, f"{prefix}.norm2", p["norm2"])
    _dense_inv(sd, f"{prefix}.mlp.fc1", p["mlp"]["fc1"])
    _dense_inv(sd, f"{prefix}.mlp.fc2", p["mlp"]["fc2"])


def export_countr_state_dict(
    params: Mapping[str, Any], patch: int = 16, grid: int = 24
) -> Dict[str, np.ndarray]:
    """CounTR flax params -> reference SupervisedMAE torch state_dict
    (the inverse of convert_countr_state_dict), so models trained here
    load in the reference PyTorch ecosystem. Fixed sin-cos pos embeds
    are emitted too (the reference stores them as buffers)."""
    from countr_tpu.ops.posembed import get_2d_sincos_pos_embed

    p = params.get("params", params)
    sd: Dict[str, np.ndarray] = {}
    sd["patch_embed.proj.weight"] = _patch_kernel_inv(
        p["patch_embed"]["proj"]["kernel"], patch
    )
    sd["patch_embed.proj.bias"] = np.asarray(p["patch_embed"]["proj"]["bias"], np.float32)
    depth = len([k for k in p if k.startswith("blocks_")])
    for i in range(depth):
        _encoder_block_inv(sd, p[f"blocks_{i}"], f"blocks.{i}")
    _ln_inv(sd, "norm", p["norm"])
    _dense_inv(sd, "decoder_embed", p["decoder_embed"])
    sd["shot_token"] = np.asarray(p["shot_token"], np.float32)
    for k in (1, 2, 3, 4):
        conv = p["exemplar_encoder"][f"conv{k}"]
        sd[f"decoder_proj{k}.0.weight"] = _conv_inv(conv["kernel"])
        sd[f"decoder_proj{k}.0.bias"] = np.asarray(conv["bias"], np.float32)
    dec_depth = len([k for k in p if k.startswith("decoder_blocks_")])
    for i in range(dec_depth):
        blk = p[f"decoder_blocks_{i}"]
        pre = f"decoder_blocks.{i}"
        _ln_inv(sd, f"{pre}.norm0", blk["norm0"])
        _dense_inv(sd, f"{pre}.selfattn.qkv", blk["selfattn"]["qkv"])
        _dense_inv(sd, f"{pre}.selfattn.proj", blk["selfattn"]["proj"])
        _ln_inv(sd, f"{pre}.norm1", blk["norm1"])
        for w in ("wq", "wk", "wv", "proj"):
            _dense_inv(sd, f"{pre}.attn.{w}", blk["attn"][w])
        _ln_inv(sd, f"{pre}.norm2", blk["norm2"])
        _dense_inv(sd, f"{pre}.mlp.fc1", blk["mlp"]["fc1"])
        _dense_inv(sd, f"{pre}.mlp.fc2", blk["mlp"]["fc2"])
    _ln_inv(sd, "decoder_norm", p["decoder_norm"])
    head = p["density_head"]
    for k in range(4):
        sd[f"decode_head{k}.0.weight"] = _conv_inv(head[f"conv{k}"]["kernel"])
        sd[f"decode_head{k}.0.bias"] = np.asarray(head[f"conv{k}"]["bias"], np.float32)
        sd[f"decode_head{k}.1.weight"] = np.asarray(head[f"gn{k}_scale"], np.float32)
        sd[f"decode_head{k}.1.bias"] = np.asarray(head[f"gn{k}_bias"], np.float32)
    sd["decode_head3.3.weight"] = _conv_inv(head["pred"]["kernel"])
    sd["decode_head3.3.bias"] = np.asarray(head["pred"]["bias"], np.float32)

    embed_dim = sd["patch_embed.proj.bias"].shape[0]
    dec_dim = sd["decoder_embed.bias"].shape[0]
    sd["pos_embed"] = get_2d_sincos_pos_embed(embed_dim, grid)[None]
    sd["decoder_pos_embed"] = get_2d_sincos_pos_embed(dec_dim, grid)[None]
    return sd


def save_torch_checkpoint(path: str, state_dict: Mapping[str, np.ndarray]) -> None:
    """Write a reference-format .pth ({'model': state_dict})."""
    import torch

    torch.save(
        {"model": {k: torch.from_numpy(np.asarray(v)) for k, v in state_dict.items()}},
        path,
    )


def _fetch_if_url(path: str) -> str:
    """Download http(s):// / file:// checkpoint URLs to a local cache
    (reference: util/misc.py:340-342 loads 'https' resume paths via
    torch.hub). Local paths pass through untouched."""
    if not path.startswith(("http://", "https://", "file://")):
        return path
    import hashlib
    import os
    import urllib.request

    cache = os.path.expanduser("~/.cache/countr_tpu/ckpts")
    os.makedirs(cache, exist_ok=True)
    name = hashlib.sha1(path.encode()).hexdigest()[:16] + "_" + os.path.basename(path)
    dest = os.path.join(cache, name)
    if not os.path.exists(dest):
        import tempfile

        # unique temp per process: concurrent fetchers (multi-host
        # startup on a shared cache) each download whole, last replace
        # wins atomically
        fd, tmp = tempfile.mkstemp(dir=cache, suffix=".part")
        os.close(fd)
        try:
            urllib.request.urlretrieve(path, tmp)
            os.replace(tmp, dest)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
    return dest


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a reference .pth and return its model state_dict as numpy.

    Handles both the full training checkpoint format
    ({'model': ..., 'optimizer': ...}, reference: util/misc.py:311-318)
    and a bare state_dict; URL paths are fetched to a local cache
    first. torch is imported lazily — it is only needed for this
    one-way import path.
    """
    import torch

    ckpt = torch.load(_fetch_if_url(path), map_location="cpu", weights_only=False)
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


def restore_params(directory: str, params_template: Any, step: int | None = None) -> Any:
    """Restore ONLY the model params from any of our checkpoint
    layouts: a params-only checkpoint ({'params': ...}, written by
    pretrain's ckpt_params), a full TrainState checkpoint
    (step/params/opt_state, written by the training loops), or a raw
    params tree (save_checkpoint(dir, step, params)). Returns a
    {'params': ...} tree."""
    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    template = params_template.get("params", params_template)
    with ocp.CheckpointManager(directory) as mgr:
        if step is None:
            step = mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {directory}")
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
        try:
            restored = mgr.restore(
                step,
                args=ocp.args.PyTreeRestore(
                    item={"params": abstract}, partial_restore=True
                ),
            )["params"]
        except Exception:
            restored = abstract
        if any(
            isinstance(leaf, jax.ShapeDtypeStruct)
            for leaf in jax.tree.leaves(restored)
        ):
            # No top-level 'params' group in the checkpoint (a partial
            # restore silently hands the abstract template back): the
            # whole checkpoint IS the params tree.
            restored = mgr.restore(step, args=ocp.args.PyTreeRestore(item=abstract))
        return {"params": restored}


def latest_step(directory: str) -> int | None:
    import orbax.checkpoint as ocp

    if not os.path.isdir(directory):
        return None
    with ocp.CheckpointManager(os.path.abspath(directory)) as mgr:
        return mgr.latest_step()
