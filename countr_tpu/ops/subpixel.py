"""Fused 2x-upsample + 3x3-conv as a phase-space (subpixel) conv.

The density head's last stage runs conv3x3 on the 2x-upsampled 96-grid
(reference: models_mae_cross.py:92-97, :189-196 — F.interpolate 2x then
decode_head3's Conv2d). Algebraically, conv3x3(upsample2x(x)) equals a
single 3x3 conv at the LOW resolution producing the four output phases:
each bilinear tap (0.25/0.75 half-pixel weights) composes with the conv
taps into one 3x3 composite kernel per phase,

    z[2i+p, 2j+q] = (x * K'[p, q])[i, j],   K'[p,q] = T[p] K T[q]^T,

so the 2x tensor never materializes in HBM and the MXU contracts
256 -> 1024 channels at the low resolution (measured 1.47x the
up->conv pair at the head's hot shape, scripts/probe_subpixel.py).
Downstream ops consume the PHASE LAYOUT [N, h, w, 2, 2, C] directly —
a depth-to-space interleave costs more than the fusion saves: GroupNorm
statistics are layout-invariant, ReLU and the 1x1 pred conv are
per-position, and the final 2x upsample is a band matmul whose input
axis is just reindexed (i, p) -> 2i+p.

Exactness: the phase conv zero-pads at the LOW resolution, so its
outermost two high-res output rows/cols differ from the reference
computation (which clamps the upsample taps and zero-pads the conv at
the HIGH resolution). Instead of scattering corrections into the big
phase tensor (measured: each .at[].set copies the 600 MB tensor and
erases the win), the true ring is computed from four thin strips, the
GroupNorm statistics are corrected algebraically from those strips
(sum/centered-square corrections via inclusion-exclusion over the ring,
exact in fp32), and the ring is re-applied AFTER the 1x1 pred conv on
the small [N, h, w, 2, 2] tensor. The fused head is numerically
equivalent to the reference formulation (tests/test_subpixel_head.py:
fp32 parity incl. borders and grads).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from countr_tpu.ops.upsample import _up2x_matrix


@functools.lru_cache(maxsize=None)
def _tap_tensor() -> np.ndarray:
    """T[p, t, a]: weight of low-res x[i+a-1] inside conv tap t of
    output phase p, for interior rows of up2x (out[2i] = .25x[i-1] +
    .75x[i]; out[2i+1] = .75x[i] + .25x[i+1])."""
    T = np.zeros((2, 3, 3), np.float32)
    T[0, 0] = [0.75, 0.25, 0.0]  # y[2i-1]
    T[0, 1] = [0.25, 0.75, 0.0]  # y[2i]
    T[0, 2] = [0.0, 0.75, 0.25]  # y[2i+1]
    T[1, 0] = [0.25, 0.75, 0.0]  # y[2i]
    T[1, 1] = [0.0, 0.75, 0.25]  # y[2i+1]
    T[1, 2] = [0.0, 0.25, 0.75]  # y[2i+2]
    return T


def compose_phase_kernel(kernel: jnp.ndarray) -> jnp.ndarray:
    """[3, 3, Cin, Cout] HWIO kernel -> [3, 3, Cin, 4*Cout] composite
    phase kernel, output channels ordered (p, q, cout). Built in fp32 at
    trace time (a tiny einsum over the constant tap tensor)."""
    T = jnp.asarray(_tap_tensor())
    k32 = kernel.astype(jnp.float32)
    kp = jnp.einsum("pta,qsb,tsio->abipqo", T, T, k32)
    a, b, ci, _, _, co = kp.shape
    return kp.reshape(a, b, ci, 4 * co)


def _conv(x, w, padding, precision):
    return lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision,
    )


def phase_conv2x_core(
    x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray, precision=None
) -> jnp.ndarray:
    """The hot op: conv3x3(up2x(x)) in FLAT phase layout, SAME zero
    padding at the low resolution. x [N, h, w, Cin] ->
    [N, h, w, 4*Cout], channels ordered (p, q, cout).

    Correct everywhere except the outermost TWO high-res rows/cols
    (low-res i/j in {0, h-1}); pair with ring_strips for exact edges.

    The flat layout is deliberate: the tensor is ~600 MB at the bench
    shape, and every reshape that regroups its channel (lane) dim
    forces a full retiling copy on TPU — in-model measurement showed
    those copies costing more than the fusion saves. All downstream
    consumers (gn_stats_flat / gn_apply_flat / pred_phase_flat) operate
    on the flat lane dim via one-hot matmuls and per-channel broadcast
    vectors, so the big tensor is only ever read elementwise."""
    cout = kernel.shape[-1]
    kp = compose_phase_kernel(kernel)
    ph = _conv(x, kp, "SAME", precision)
    return ph + jnp.tile(bias, 4).astype(ph.dtype)


def ring_strips(
    x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray, precision=None
):
    """The TRUE outermost two high-res rows/cols of conv3x3(up2x(x)),
    computed from thin strips of the exact upsample (clamped taps) with
    the conv's high-res zero padding.

    Returns (top, bot, left, right): top/bot [N, 2, 2w, Cout] are
    high-res rows (0, 1) / (2h-2, 2h-1); left/right [N, 2h, 2, Cout]
    are high-res cols (0, 1) / (2w-2, 2w-1) over ALL rows."""
    n, h, w, cin = x.shape
    cout = kernel.shape[-1]
    wc = jnp.asarray(_up2x_matrix(w), x.dtype)
    wr = jnp.asarray(_up2x_matrix(h), x.dtype)
    hi, lo = x.dtype.type(0.75), x.dtype.type(0.25)

    def up_cols(rows):  # [N, r, w, C] -> [N, r, 2w, C]
        return jnp.einsum("nrwc,wW->nrWc", rows, wc,
                          precision=precision).astype(x.dtype)

    def up_rows(cols):  # [N, h, r, C] -> [N, 2h, r, C]
        return jnp.einsum("nhrc,hH->nHrc", cols, wr,
                          precision=precision).astype(x.dtype)

    b_ = bias.astype(x.dtype)
    zero_row = jnp.zeros((n, 1, 2 * w, cin), x.dtype)
    # True upsampled rows: y[0] = x[0] (clamped), y[1] = .75x0+.25x1,
    # y[2] = .25x0+.75x1; mirrored at the bottom.
    ytop = up_cols(jnp.stack(
        [x[:, 0], hi * x[:, 0] + lo * x[:, 1], lo * x[:, 0] + hi * x[:, 1]], 1
    ))
    ybot = up_cols(jnp.stack(
        [hi * x[:, h - 2] + lo * x[:, h - 1],
         lo * x[:, h - 2] + hi * x[:, h - 1], x[:, h - 1]], 1
    ))
    pad_cols = ((0, 0), (1, 1))  # rows VALID (explicit zero), cols SAME
    top = _conv(jnp.concatenate([zero_row, ytop], 1), kernel,
                pad_cols, precision) + b_
    bot = _conv(jnp.concatenate([ybot, zero_row], 1), kernel,
                pad_cols, precision) + b_

    zero_col = jnp.zeros((n, 2 * h, 1, cin), x.dtype)
    yleft = up_rows(jnp.stack(
        [x[:, :, 0], hi * x[:, :, 0] + lo * x[:, :, 1],
         lo * x[:, :, 0] + hi * x[:, :, 1]], 2
    ))
    yright = up_rows(jnp.stack(
        [hi * x[:, :, w - 2] + lo * x[:, :, w - 1],
         lo * x[:, :, w - 2] + hi * x[:, :, w - 1], x[:, :, w - 1]], 2
    ))
    pad_rows = ((1, 1), (0, 0))
    left = _conv(jnp.concatenate([zero_col, yleft], 2), kernel,
                 pad_rows, precision) + b_
    right = _conv(jnp.concatenate([yright, zero_col], 2), kernel,
                  pad_rows, precision) + b_
    return top, bot, left, right


@functools.lru_cache(maxsize=None)
def _group_map(c_last: int, c_real: int, num_groups: int) -> np.ndarray:
    """Channel -> group index for a flat layout whose last dim is
    ``c_last`` = (phases *) c_real, grouped over the REAL channel
    (c % c_real) like torch GroupNorm."""
    cs = np.arange(c_last)
    return ((cs % c_real) * num_groups // c_real).astype(np.int32)


@functools.lru_cache(maxsize=None)
def _group_onehot(c_last: int, c_real: int, num_groups: int) -> np.ndarray:
    """[c_last, G] one-hot matrix: lane-dim matmul computes per-group
    sums with NO reshape (and hence no retiling) of the big tensor."""
    gm = _group_map(c_last, c_real, num_groups)
    return (gm[:, None] == np.arange(num_groups)[None, :]).astype(np.float32)


def _sums_flat(v, c_real: int, g: int, precision):
    """v [N, ..., C_last] -> (sum, sum_sq) [N, G] fp32, via one-hot
    matmuls on the lane dim (XLA fuses the square into the dot input)."""
    oh = jnp.asarray(_group_onehot(v.shape[-1], c_real, g), v.dtype)
    n = v.shape[0]
    vf = v.reshape(n, -1, v.shape[-1])
    kw = dict(precision=precision, preferred_element_type=jnp.float32)
    s1 = jnp.einsum("nkc,cg->ng", vf, oh, **kw)
    s2 = jnp.einsum("nkc,nkc,cg->ng", vf, vf, oh, **kw)
    return s1, s2


def gn_phase_stats(ph, strips, num_groups: int, c_real: int = 256,
                   eps: float = 1e-5, precision=None):
    """Corrected GroupNorm statistics for the FLAT phase tensor
    [N, h, w, 4*C]: the ring lines inside ``ph`` are wrong (zero-pad
    core); their contribution is swapped for the true strip values via
    inclusion-exclusion (the four 2x2-block corners are in both a row
    and a col strip). Returns (mean, rstd) [N, G] fp32 — exactly the
    statistics GroupNorm computes on the true high-res tensor."""
    top, bot, left, right = strips
    n, h, w, _ = ph.shape
    g = num_groups
    count = (2 * h) * (2 * w) * (c_real // g)

    def sums(v):
        return _sums_flat(v, c_real, g, precision)

    # Ring slices along h/w keep the lane dim intact (no retiling).
    ph_rows = jnp.concatenate([ph[:, :1], ph[:, h - 1:]], 1)
    ph_cols = jnp.concatenate([ph[:, :, :1], ph[:, :, w - 1:]], 2)
    ph_corn = jnp.concatenate([ph_rows[:, :, :1], ph_rows[:, :, w - 1:]], 2)
    tr_rows = jnp.concatenate([top, bot], 1)          # [N, 4, 2w, C]
    tr_cols = jnp.concatenate([left, right], 2)       # [N, 2h, 4, C]
    tr_corn = jnp.concatenate([tr_rows[:, :, :2], tr_rows[:, :, -2:]], 2)

    s1, s2 = sums(ph)
    for v, sgn in ((ph_rows, -1), (ph_cols, -1), (ph_corn, +1),
                   (tr_rows, +1), (tr_cols, +1), (tr_corn, -1)):
        d1, d2 = sums(v)
        s1 = s1 + sgn * d1
        s2 = s2 + sgn * d2

    mean = s1 / count
    var = jnp.maximum(s2 / count - mean * mean, 0.0)
    rstd = jnp.reciprocal(jnp.sqrt(var + eps))
    return mean, rstd


def gn_phase_apply(v, mean, rstd, scale, bias, c_real: int = 256):
    """Normalize + affine with precomputed per-(N, group) stats on a
    FLAT layout [N, ..., C_last] (the big phase tensor or a strip):
    the [N, G] stats expand to per-channel [N, C_last] vectors and
    broadcast along lanes — no reshape of the big operand."""
    g = mean.shape[1]
    gm = jnp.asarray(_group_map(v.shape[-1], c_real, g))
    nd = (None,) * (v.ndim - 2)
    mean_c = jnp.take(mean, gm, axis=1)[(slice(None), *nd)]
    rstd_c = jnp.take(rstd, gm, axis=1)[(slice(None), *nd)]
    reps = v.shape[-1] // c_real
    sc = jnp.tile(scale.astype(jnp.float32), reps)
    bi = jnp.tile(bias.astype(jnp.float32), reps)
    y = (v.astype(jnp.float32) - mean_c) * rstd_c * sc + bi
    return y.astype(v.dtype)


def pred_phase_flat(v, pred_kernel, pred_bias, precision=None):
    """The 1x1 pred conv on the FLAT phase tensor [N, h, w, 4*C] ->
    [N, h, w, 4] via a block-diagonal [4C, 4] matrix (zeros off-block):
    one lane-dim matmul, no retiling. pred_kernel [C, 1] (the unfused
    conv's kernel squeezed), pred_bias [1]."""
    c = pred_kernel.shape[0]
    eye = jnp.asarray(np.eye(4, dtype=np.float32))
    blk = jnp.einsum("pz,co->pcz", eye, pred_kernel.astype(jnp.float32))
    blk = blk.reshape(4 * c, 4).astype(v.dtype)
    out = jnp.einsum("nhwc,cz->nhwz", v, blk, precision=precision)
    return out + pred_bias.astype(out.dtype)


def scatter_ring(z: jnp.ndarray, zt, zb, zl, zr) -> jnp.ndarray:
    """Overwrite the ring of the SMALL post-pred phase tensor z
    [N, h, w, 2, 2] with the true strip values zt/zb [N, 2, 2w], zl/zr
    [N, 2h, 2] (cols after rows; the corner blocks agree exactly)."""
    n, h, w, _, _ = z.shape
    z = z.at[:, 0].set(zt.reshape(n, 2, w, 2).transpose(0, 2, 1, 3))
    z = z.at[:, h - 1].set(zb.reshape(n, 2, w, 2).transpose(0, 2, 1, 3))
    z = z.at[:, :, 0].set(zl.reshape(n, h, 2, 2))
    z = z.at[:, :, w - 1].set(zr.reshape(n, h, 2, 2))
    return z


def phase_conv2x(
    x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray, precision=None
) -> jnp.ndarray:
    """Reference-exact conv3x3(upsample2x(x)) in phase layout
    [N, h, w, 2, 2, Cout] — core conv + ring scatter. Used by tests and
    small callers; the head inlines the pieces so the ring correction
    rides the small post-pred tensor instead (see DensityHead)."""
    n, h, w, _ = x.shape
    cout = kernel.shape[-1]
    ph = phase_conv2x_core(x, kernel, bias, precision)
    ph = ph.reshape(n, h, w, 2, 2, cout)
    top, bot, left, right = ring_strips(x, kernel, bias, precision)
    ph = ph.at[:, 0].set(
        top.reshape(n, 2, w, 2, cout).transpose(0, 2, 1, 3, 4))
    ph = ph.at[:, h - 1].set(
        bot.reshape(n, 2, w, 2, cout).transpose(0, 2, 1, 3, 4))
    ph = ph.at[:, :, 0].set(left.reshape(n, h, 2, 2, cout))
    ph = ph.at[:, :, w - 1].set(right.reshape(n, h, 2, 2, cout))
    return ph


def group_norm_phase(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    num_groups: int,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """GroupNorm over phase layout [N, h, w, 2, 2, C]: statistics per
    (sample, channel group) over (h, w, p, q, C/G) — the same element
    set as the spatial layout, so it equals group_norm(depth_to_space)."""
    n, h, w, p, q, c = x.shape
    g = num_groups
    x32 = x.astype(jnp.float32).reshape(n, h, w, p * q, g, c // g)
    mean = jnp.mean(x32, axis=(1, 2, 3, 5), keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=(1, 2, 3, 5), keepdims=True)
    y = (x32 - mean) * jnp.reciprocal(jnp.sqrt(var + eps))
    y = y.reshape(n, h, w, p, q, c)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def upsample2x_phase(z: jnp.ndarray, precision=None) -> jnp.ndarray:
    """Final 2x bilinear upsample consuming phase layout: z
    [N, h, w, 2, 2] (single channel squeezed) -> [N, 4h, 4w]. The
    [2h, 4h] band matrix's input axis is reindexed (i, p) -> 2i+p, so
    no 2h x 2w spatial tensor is ever materialized."""
    n, h, w, _, _ = z.shape
    ur = jnp.asarray(_up2x_matrix(2 * h), z.dtype).reshape(h, 2, 4 * h)
    uc = jnp.asarray(_up2x_matrix(2 * w), z.dtype).reshape(w, 2, 4 * w)
    out = jnp.einsum("nijpq,ipH->njqH", z, ur, precision=precision)
    out = jnp.einsum("njqH,jqW->nHW", out.astype(z.dtype), uc,
                     precision=precision)
    return out.astype(z.dtype)
