"""Direct unit tests of the device-pipeline primitives against numpy
references (they are otherwise covered end-to-end via engine parity)."""

import jax.numpy as jnp
import numpy as np
import pytest

from countr_tpu.engine.device_pipeline import (
    accumulate, extract_windows, finalize, width_bucket,
)


def test_width_bucket():
    assert width_bucket(384) == 384
    assert width_bucket(385) == 448
    assert width_bucket(600) == 640
    assert width_bucket(4608) == 4608
    assert width_bucket(5000) == 5120  # beyond table: 512-multiple


def test_extract_windows_uint8(rng):
    # flat pool: two 512-wide images concatenated along the width axis
    pool = rng.integers(0, 256, (384, 1024, 3), dtype=np.uint8)
    starts = jnp.asarray([0, 512 + 128, 512 + 64], jnp.int32)
    out = np.asarray(extract_windows(jnp.asarray(pool), starts))
    assert out.dtype == np.float32
    np.testing.assert_allclose(out[0], pool[:, 0:384] / 255.0, atol=1e-7)
    np.testing.assert_allclose(out[2], pool[:, 576:960] / 255.0, atol=1e-7)


def test_accumulate_weighted_scatter(rng):
    density = jnp.zeros((2, 384, 512), jnp.float32)
    dens = jnp.asarray(rng.standard_normal((2, 384, 384)), jnp.float32)
    owners = jnp.asarray([0, 1], jnp.int32)
    starts = jnp.asarray([64, 128], jnp.int32)
    wcols = jnp.asarray(rng.uniform(0, 1, (2, 384)), jnp.float32)
    out = np.asarray(accumulate(density, dens, owners, starts, wcols))
    want = np.zeros((2, 384, 512), np.float32)
    want[0, :, 64:448] += np.asarray(dens[0]) * np.asarray(wcols[0])[None, :]
    want[1, :, 128:512] += np.asarray(dens[1]) * np.asarray(wcols[1])[None, :]
    np.testing.assert_allclose(out, want, atol=1e-6)


def test_finalize_counts_and_rect_sums(rng):
    density = rng.uniform(0, 1, (2, 384, 512)).astype(np.float32)
    rects = np.asarray(
        [[[10, 20, 50, 80], [0, 0, 383, 511]],
         [[100, 100, 150, 160], [0, 0, 0, 0]]], np.int32,
    )
    valid = np.asarray([[1.0, 1.0], [1.0, 0.0]], np.float32)
    counts, esum = finalize(jnp.asarray(density), jnp.asarray(rects), jnp.asarray(valid))
    np.testing.assert_allclose(
        np.asarray(counts), density.sum((1, 2)) / 60.0, rtol=1e-4
    )
    want0 = (
        density[0, 10:51, 20:81].sum() + density[0].sum()
    ) / 60.0
    want1 = density[1, 100:151, 100:161].sum() / 60.0
    np.testing.assert_allclose(np.asarray(esum), [want0, want1], rtol=1e-4)


def test_finalize_clamps_out_of_range_rects(rng):
    density = rng.uniform(0, 1, (1, 384, 512)).astype(np.float32)
    rects = np.asarray([[[300, 400, 999, 999]]], np.int32)  # beyond bounds
    valid = np.ones((1, 1), np.float32)
    _, esum = finalize(jnp.asarray(density), jnp.asarray(rects), jnp.asarray(valid))
    want = density[0, 300:, 400:].sum() / 60.0
    assert float(esum[0]) == pytest.approx(want, rel=1e-4)
