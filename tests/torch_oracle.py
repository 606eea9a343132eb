"""Functional torch oracle for whole-model parity tests.

Computes the reference models' forward semantics directly from a
torch-format state_dict using torch.nn.functional primitives only —
an independent executable spec of the architecture (shapes/keys per
the reference models_mae_cross.py / models_crossvit.py), used to
validate the .pth converter + flax models end to end on random
weights. Test-only code; the framework never imports torch.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F

from countr_tpu.ops.posembed import get_2d_sincos_pos_embed


# ---------------------------------------------------------------------------
# Random state_dict generators (reference key layout)
# ---------------------------------------------------------------------------


def _t(rng, *shape, scale=0.05):
    return torch.from_numpy(rng.standard_normal(shape).astype(np.float32) * scale)


def _add_encoder_block(sd, rng, p, dim, mlp_ratio=4.0):
    hid = int(dim * mlp_ratio)
    sd[f"{p}.norm1.weight"] = 1.0 + _t(rng, dim)
    sd[f"{p}.norm1.bias"] = _t(rng, dim)
    sd[f"{p}.attn.qkv.weight"] = _t(rng, 3 * dim, dim)
    sd[f"{p}.attn.qkv.bias"] = _t(rng, 3 * dim)
    sd[f"{p}.attn.proj.weight"] = _t(rng, dim, dim)
    sd[f"{p}.attn.proj.bias"] = _t(rng, dim)
    sd[f"{p}.norm2.weight"] = 1.0 + _t(rng, dim)
    sd[f"{p}.norm2.bias"] = _t(rng, dim)
    sd[f"{p}.mlp.fc1.weight"] = _t(rng, hid, dim)
    sd[f"{p}.mlp.fc1.bias"] = _t(rng, hid)
    sd[f"{p}.mlp.fc2.weight"] = _t(rng, dim, hid)
    sd[f"{p}.mlp.fc2.bias"] = _t(rng, dim)


def make_countr_state_dict(
    rng, embed_dim=64, depth=2, dec_dim=32, dec_depth=2, patch=16, head_width=256
):
    sd = {}
    sd["patch_embed.proj.weight"] = _t(rng, embed_dim, 3, patch, patch)
    sd["patch_embed.proj.bias"] = _t(rng, embed_dim)
    for i in range(depth):
        _add_encoder_block(sd, rng, f"blocks.{i}", embed_dim)
    sd["norm.weight"] = 1.0 + _t(rng, embed_dim)
    sd["norm.bias"] = _t(rng, embed_dim)
    sd["decoder_embed.weight"] = _t(rng, dec_dim, embed_dim)
    sd["decoder_embed.bias"] = _t(rng, dec_dim)
    sd["shot_token"] = _t(rng, dec_dim if dec_dim != 32 else 512)
    # reference hardcodes a 512-d shot token; for tiny test configs we
    # size it to dec_dim.
    sd["shot_token"] = _t(rng, dec_dim)
    chans = [3, 64, 128, 256, dec_dim]
    for k in (1, 2, 3, 4):
        sd[f"decoder_proj{k}.0.weight"] = _t(rng, chans[k], chans[k - 1], 3, 3)
        sd[f"decoder_proj{k}.0.bias"] = _t(rng, chans[k])
    for i in range(dec_depth):
        p = f"decoder_blocks.{i}"
        sd[f"{p}.norm0.weight"] = 1.0 + _t(rng, dec_dim)
        sd[f"{p}.norm0.bias"] = _t(rng, dec_dim)
        sd[f"{p}.selfattn.qkv.weight"] = _t(rng, 3 * dec_dim, dec_dim)
        sd[f"{p}.selfattn.qkv.bias"] = _t(rng, 3 * dec_dim)
        sd[f"{p}.selfattn.proj.weight"] = _t(rng, dec_dim, dec_dim)
        sd[f"{p}.selfattn.proj.bias"] = _t(rng, dec_dim)
        sd[f"{p}.norm1.weight"] = 1.0 + _t(rng, dec_dim)
        sd[f"{p}.norm1.bias"] = _t(rng, dec_dim)
        for w in ("wq", "wk", "wv", "proj"):
            sd[f"{p}.attn.{w}.weight"] = _t(rng, dec_dim, dec_dim)
            sd[f"{p}.attn.{w}.bias"] = _t(rng, dec_dim)
        sd[f"{p}.norm2.weight"] = 1.0 + _t(rng, dec_dim)
        sd[f"{p}.norm2.bias"] = _t(rng, dec_dim)
        hid = dec_dim * 4
        sd[f"{p}.mlp.fc1.weight"] = _t(rng, hid, dec_dim)
        sd[f"{p}.mlp.fc1.bias"] = _t(rng, hid)
        sd[f"{p}.mlp.fc2.weight"] = _t(rng, dec_dim, hid)
        sd[f"{p}.mlp.fc2.bias"] = _t(rng, dec_dim)
    sd["decoder_norm.weight"] = 1.0 + _t(rng, dec_dim)
    sd["decoder_norm.bias"] = _t(rng, dec_dim)
    w = head_width
    ins = [dec_dim, w, w, w]
    for k in range(4):
        sd[f"decode_head{k}.0.weight"] = _t(rng, w, ins[k], 3, 3)
        sd[f"decode_head{k}.0.bias"] = _t(rng, w)
        sd[f"decode_head{k}.1.weight"] = 1.0 + _t(rng, w)
        sd[f"decode_head{k}.1.bias"] = _t(rng, w)
    sd["decode_head3.3.weight"] = _t(rng, 1, w, 1, 1)
    sd["decode_head3.3.bias"] = _t(rng, 1)
    return sd


def make_mae_state_dict(rng, embed_dim=64, depth=2, dec_dim=32, dec_depth=2, patch=16):
    sd = {}
    sd["patch_embed.proj.weight"] = _t(rng, embed_dim, 3, patch, patch)
    sd["patch_embed.proj.bias"] = _t(rng, embed_dim)
    for i in range(depth):
        _add_encoder_block(sd, rng, f"blocks.{i}", embed_dim)
    sd["norm.weight"] = 1.0 + _t(rng, embed_dim)
    sd["norm.bias"] = _t(rng, embed_dim)
    sd["decoder_embed.weight"] = _t(rng, dec_dim, embed_dim)
    sd["decoder_embed.bias"] = _t(rng, dec_dim)
    sd["mask_token"] = _t(rng, 1, 1, dec_dim)
    for i in range(dec_depth):
        _add_encoder_block(sd, rng, f"decoder_blocks.{i}", dec_dim)
    sd["decoder_norm.weight"] = 1.0 + _t(rng, dec_dim)
    sd["decoder_norm.bias"] = _t(rng, dec_dim)
    sd["decoder_pred.weight"] = _t(rng, patch * patch * 3, dec_dim)
    sd["decoder_pred.bias"] = _t(rng, patch * patch * 3)
    return sd


# ---------------------------------------------------------------------------
# Functional forward
# ---------------------------------------------------------------------------


def _ln(x, sd, p, eps=1e-6):
    return F.layer_norm(x, (x.shape[-1],), sd[f"{p}.weight"], sd[f"{p}.bias"], eps)


def _lin(x, sd, p):
    return F.linear(x, sd[f"{p}.weight"], sd.get(f"{p}.bias"))


def _split_heads(x, heads):
    b, n, c = x.shape
    return x.reshape(b, n, heads, c // heads).permute(0, 2, 1, 3)


def _attend(q, k, v, heads):
    b, _, nq, hd = q.shape
    a = torch.softmax((q @ k.transpose(-2, -1)) * hd ** -0.5, dim=-1)
    return (a @ v).permute(0, 2, 1, 3).reshape(b, nq, heads * hd)


def _mhsa(x, sd, p, heads):
    qkv = _lin(x, sd, f"{p}.qkv")
    b, n, c3 = qkv.shape
    c = c3 // 3
    q, k, v = (
        _split_heads(qkv[..., :c], heads),
        _split_heads(qkv[..., c : 2 * c], heads),
        _split_heads(qkv[..., 2 * c :], heads),
    )
    return _lin(_attend(q, k, v, heads), sd, f"{p}.proj")


def _mlp(x, sd, p):
    return _lin(F.gelu(_lin(x, sd, f"{p}.fc1")), sd, f"{p}.fc2")


def _block(x, sd, p, heads):
    x = x + _mhsa(_ln(x, sd, f"{p}.norm1"), sd, f"{p}.attn", heads)
    x = x + _mlp(_ln(x, sd, f"{p}.norm2"), sd, f"{p}.mlp")
    return x


def _cross_attn(x, y, sd, p, heads):
    q = _split_heads(_lin(x, sd, f"{p}.wq"), heads)
    k = _split_heads(_lin(y, sd, f"{p}.wk"), heads)
    v = _split_heads(_lin(y, sd, f"{p}.wv"), heads)
    return _lin(_attend(q, k, v, heads), sd, f"{p}.proj")


def _exemplar_cnn(sd, yi):
    for k in (1, 2, 3, 4):
        yi = F.conv2d(
            yi, sd[f"decoder_proj{k}.0.weight"], sd[f"decoder_proj{k}.0.bias"],
            padding=1,
        )
        yi = F.relu(F.instance_norm(yi))
        yi = F.max_pool2d(yi, 2) if k < 4 else yi.mean(dim=(2, 3), keepdim=True)
    return yi[..., 0, 0]


def countr_forward(sd, imgs_nchw, boxes, shot_num, depth, dec_depth,
                   enc_heads=4, dec_heads=4, patch=16):
    """Oracle for the counting forward: imgs [N,3,H,W], boxes
    [N,3,3,64,64] -> density [N,H,W]."""
    imgs = torch.from_numpy(imgs_nchw)
    boxes = torch.from_numpy(boxes)
    n, _, h, w = imgs.shape
    g = h // patch
    embed_dim = sd["patch_embed.proj.bias"].shape[0]
    dec_dim = sd["decoder_embed.bias"].shape[0]

    x = F.conv2d(imgs, sd["patch_embed.proj.weight"], sd["patch_embed.proj.bias"], stride=patch)
    x = x.flatten(2).transpose(1, 2)
    x = x + torch.from_numpy(get_2d_sincos_pos_embed(embed_dim, g))
    for i in range(depth):
        x = _block(x, sd, f"blocks.{i}", enc_heads)
    x = _ln(x, sd, "norm")

    x = _lin(x, sd, "decoder_embed")
    x = x + torch.from_numpy(get_2d_sincos_pos_embed(dec_dim, g))

    if shot_num > 0:
        feats = [_exemplar_cnn(sd, boxes[:, s]) for s in range(shot_num)]
        y = torch.stack(feats, dim=1)  # [N, shot, C]
    else:
        y = sd["shot_token"].reshape(1, 1, -1).repeat(n, 1, 1)

    for i in range(dec_depth):
        p = f"decoder_blocks.{i}"
        x = x + _mhsa(_ln(x, sd, f"{p}.norm0"), sd, f"{p}.selfattn", dec_heads)
        x = x + _cross_attn(_ln(x, sd, f"{p}.norm1"), y, sd, f"{p}.attn", dec_heads)
        x = x + _mlp(_ln(x, sd, f"{p}.norm2"), sd, f"{p}.mlp")
    x = _ln(x, sd, "decoder_norm")

    x = x.transpose(1, 2).reshape(n, dec_dim, g, g)
    for k in range(4):
        x = F.relu(
            F.group_norm(
                F.conv2d(x, sd[f"decode_head{k}.0.weight"], sd[f"decode_head{k}.0.bias"], padding=1),
                8, sd[f"decode_head{k}.1.weight"], sd[f"decode_head{k}.1.bias"],
            )
        )
        if k < 3:
            x = F.interpolate(x, scale_factor=2, mode="bilinear", align_corners=False)
    x = F.conv2d(x, sd["decode_head3.3.weight"], sd["decode_head3.3.bias"])
    x = F.interpolate(x, scale_factor=2, mode="bilinear", align_corners=False)
    return x[:, 0].numpy()


def mae_decoder_forward(sd, latent, ids_restore, dec_depth, dec_heads, grid):
    """Oracle for the MAE decoder given encoder output (numpy in/out)."""
    x = _lin(torch.from_numpy(latent), sd, "decoder_embed")
    b, n_vis, c = x.shape
    ids = torch.from_numpy(ids_restore).long()
    l = ids.shape[1]
    mask_tokens = sd["mask_token"].repeat(b, l - n_vis, 1)
    x = torch.cat([x, mask_tokens], dim=1)
    x = torch.gather(x, 1, ids.unsqueeze(-1).repeat(1, 1, c))
    x = x + torch.from_numpy(get_2d_sincos_pos_embed(c, grid))
    for i in range(dec_depth):
        x = _block(x, sd, f"decoder_blocks.{i}", dec_heads)
    x = _ln(x, sd, "decoder_norm")
    return _lin(x, sd, "decoder_pred").numpy()
