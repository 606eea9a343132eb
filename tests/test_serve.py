"""HTTP counting service end-to-end over a local socket."""

import argparse
import io
import json
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from countr_tpu.config import CounTRConfig
from countr_tpu.engine.inference import CountingEngine
from countr_tpu.models.countr import CounTR

CFG = CounTRConfig(
    img_size=384, patch_size=16, embed_dim=32, depth=1, num_heads=2,
    decoder_embed_dim=32, decoder_depth=1, decoder_num_heads=2,
    head_width=32,
)


@pytest.fixture(scope="module")
def server():
    from countr_tpu.cli import serve as serve_mod

    model = CounTR(CFG)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 384, 384, 3)),
        jnp.zeros((1, 3, 64, 64, 3)), 3,
    )
    engine = CountingEngine(model, params, batch_windows=4)
    args = argparse.Namespace(
        host="127.0.0.1", port=0, max_batch_images=4, batch_wait_ms=2.0
    )
    srv = serve_mod.serve(args, engine)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _jpeg_bytes(rng, h, w):
    buf = io.BytesIO()
    Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8)).save(
        buf, format="JPEG"
    )
    return buf.getvalue()


def test_healthz(server):
    with urllib.request.urlopen(f"{server}/healthz") as r:
        assert json.load(r)["ok"] is True


def test_count_zero_shot(server, rng):
    req = urllib.request.Request(
        f"{server}/count", data=_jpeg_bytes(rng, 500, 700), method="POST"
    )
    with urllib.request.urlopen(req) as r:
        out = json.load(r)
    assert "count" in out and out["n_windows"] >= 1


def test_count_few_shot_boxes(server, rng):
    req = urllib.request.Request(
        f"{server}/count?boxes=10,20,80,90;120,130,200,210",
        data=_jpeg_bytes(rng, 400, 600), method="POST",
    )
    with urllib.request.urlopen(req) as r:
        out = json.load(r)
    assert "count" in out


def test_count_bad_payload(server):
    req = urllib.request.Request(
        f"{server}/count", data=b"not an image", method="POST"
    )
    try:
        urllib.request.urlopen(req)
        assert False, "expected HTTP 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400
        assert "error" in json.load(e)


def test_warmup_covers_buckets(rng):
    """--warmup_sizes must pre-run every row bucket and shot count the
    micro-batcher can produce (so no request pays a compile later)."""
    from countr_tpu.cli import serve as serve_mod

    model = CounTR(CFG)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 384, 384, 3)),
        jnp.zeros((1, 3, 64, 64, 3)), 3,
    )
    engine = CountingEngine(model, params, batch_windows=4)
    calls = []
    orig = engine.count_batch

    def spy(images, boxes, rects, shot_num, **kw):
        calls.append((len(images), shot_num))
        return orig(images, boxes, rects, shot_num=shot_num, **kw)

    engine.count_batch = spy
    serve_mod.warmup(engine, "512x384", max_batch=8)
    buckets = sorted({engine._row_bucket(n) for n in range(1, 9)})
    want = {(nb, s) for nb in buckets for s in (3, 0)}
    assert set(calls) == want


def test_warmup_grid_covers_grid_path(rng):
    """--warmup_grid must run grid-mode batches (alone + mixed) so
    tiny-exemplar requests never pay the resampled-path compile."""
    from countr_tpu.cli import serve as serve_mod

    model = CounTR(CFG)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 384, 384, 3)),
        jnp.zeros((1, 3, 64, 64, 3)), 3,
    )
    engine = CountingEngine(model, params, batch_windows=4)
    grid_calls = []
    orig = engine.count_batch

    def spy(images, boxes, rects, shot_num, **kw):
        n_tiny = sum(
            1 for r in rects
            if r and r[0][2] - r[0][0] < 10 and r[0][3] - r[0][1] < 10
        )
        grid_calls.append((len(images), n_tiny, shot_num))
        return orig(images, boxes, rects, shot_num=shot_num, **kw)

    engine.count_batch = spy
    serve_mod.warmup(engine, "512x384", max_batch=4, grid=True)
    mixed = [c for c in grid_calls if c[1] == 1]
    assert (1, 1, 3) in mixed  # grid alone
    assert any(nb > 1 for nb, t, _ in mixed)  # grid mixed with plain
