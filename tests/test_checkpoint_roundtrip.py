"""Converter roundtrip: torch sd -> flax params -> torch sd must be the
identity (up to the recomputed pos-embed buffers)."""

import numpy as np

from countr_tpu.engine.checkpoint import (
    convert_countr_state_dict, export_countr_state_dict,
    load_torch_checkpoint, save_torch_checkpoint,
)
from tests.torch_oracle import make_countr_state_dict


def test_roundtrip_identity(rng, tmp_path):
    sd = make_countr_state_dict(rng, embed_dim=64, depth=2, dec_dim=32, dec_depth=2)
    params = convert_countr_state_dict(sd, depth=2, decoder_depth=2)
    back = export_countr_state_dict(params, patch=16, grid=4)
    for k, v in sd.items():
        np.testing.assert_array_equal(
            back[k], np.asarray(v.numpy() if hasattr(v, "numpy") else v, np.float32),
            err_msg=k,
        )
    assert back["pos_embed"].shape == (1, 16, 64)
    assert back["decoder_pos_embed"].shape == (1, 16, 32)


def test_restore_params_from_trainstate(rng, tmp_path):
    """restore_params must pull the params subtree out of a full
    TrainState checkpoint (the finetune ckpt layout)."""
    import jax
    import jax.numpy as jnp

    from countr_tpu.config import CounTRConfig, TrainConfig
    from countr_tpu.engine.checkpoint import restore_params, save_checkpoint
    from countr_tpu.engine.train import init_train_state, make_optimizer
    from countr_tpu.models.countr import CounTR

    cfg = CounTRConfig(
        img_size=64, patch_size=16, embed_dim=32, depth=1, num_heads=2,
        decoder_embed_dim=32, decoder_depth=1, decoder_num_heads=2,
    )
    model = CounTR(cfg)
    params = model.init(
        jax.random.key(3), jnp.zeros((1, 64, 64, 3)),
        jnp.zeros((1, 3, 64, 64, 3)), 1,
    )
    tx, _ = make_optimizer(TrainConfig(batch_size=2, epochs=2, warmup_epochs=1),
                           1, 2, freeze_encoder=True)
    state = init_train_state(params["params"], tx)
    d = str(tmp_path / "ts")
    save_checkpoint(d, 0, jax.device_get(state))
    restored = restore_params(d, params)
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["decoder_embed"]["kernel"]),
        np.asarray(params["params"]["decoder_embed"]["kernel"]),
    )

    # and from a params-only checkpoint (the pretrain ckpt_params layout)
    d2 = str(tmp_path / "ponly")
    save_checkpoint(d2, 0, {"params": jax.device_get(params["params"])})
    restored2 = restore_params(d2, params)
    np.testing.assert_array_equal(
        np.asarray(restored2["params"]["shot_token"]),
        np.asarray(params["params"]["shot_token"]),
    )

    # and from a RAW params tree (save_checkpoint(dir, step, params) with
    # no wrapper — scripts save this). A partial restore silently returns
    # ShapeDtypeStructs here; restore_params must detect that and fall
    # back to restoring the whole checkpoint as params.
    d3 = str(tmp_path / "raw")
    save_checkpoint(d3, 0, jax.device_get(params["params"]))
    restored3 = restore_params(d3, params)
    assert not any(
        isinstance(leaf, jax.ShapeDtypeStruct)
        for leaf in jax.tree.leaves(restored3)
    )
    np.testing.assert_array_equal(
        np.asarray(restored3["params"]["shot_token"]),
        np.asarray(params["params"]["shot_token"]),
    )


def test_pth_save_load_roundtrip(rng, tmp_path):
    sd = make_countr_state_dict(rng, embed_dim=64, depth=1, dec_dim=32, dec_depth=1)
    params = convert_countr_state_dict(sd, depth=1, decoder_depth=1)
    path = str(tmp_path / "export.pth")
    save_torch_checkpoint(path, export_countr_state_dict(params, grid=4))
    loaded = load_torch_checkpoint(path)
    params2 = convert_countr_state_dict(loaded, depth=1, decoder_depth=1)
    a = params["params"]["decoder_blocks_0"]["attn"]["wq"]["kernel"]
    b = params2["params"]["decoder_blocks_0"]["attn"]["wq"]["kernel"]
    np.testing.assert_array_equal(a, b)


def test_pth_load_from_url(rng, tmp_path):
    # file:// exercises the URL fetch-and-cache path used for the
    # reference's https checkpoint URLs (util/misc.py:340-342)
    from countr_tpu.engine.checkpoint import _fetch_if_url

    sd = make_countr_state_dict(rng, embed_dim=64, depth=1, dec_dim=32, dec_depth=1)
    params = convert_countr_state_dict(sd, depth=1, decoder_depth=1)
    path = str(tmp_path / "url_export.pth")
    save_torch_checkpoint(path, export_countr_state_dict(params, grid=4))
    url = "file://" + path
    loaded = load_torch_checkpoint(url)
    assert "shot_token" in loaded
    cached = _fetch_if_url(url)
    assert cached != path and _fetch_if_url(url) == cached  # cache hit
    assert _fetch_if_url(path) == path  # local passthrough


def test_pth_load_over_http(rng, tmp_path):
    """Fetch-and-cache over a REAL local HTTP server — the transport
    the reference uses for released weights (util/misc.py:340-342,
    torch.hub.load_state_dict_from_url)."""
    import functools
    import threading
    from http.server import SimpleHTTPRequestHandler, ThreadingHTTPServer

    from countr_tpu.engine.checkpoint import _fetch_if_url

    sd = make_countr_state_dict(rng, embed_dim=64, depth=1, dec_dim=32, dec_depth=1)
    params = convert_countr_state_dict(sd, depth=1, decoder_depth=1)
    save_torch_checkpoint(
        str(tmp_path / "http_export.pth"),
        export_countr_state_dict(params, grid=4),
    )
    handler = functools.partial(
        SimpleHTTPRequestHandler, directory=str(tmp_path)
    )
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}/http_export.pth"
        loaded = load_torch_checkpoint(url)
        assert "shot_token" in loaded
        params2 = convert_countr_state_dict(loaded, depth=1, decoder_depth=1)
        np.testing.assert_array_equal(
            params["params"]["shot_token"], params2["params"]["shot_token"]
        )
        cached = _fetch_if_url(url)
        assert _fetch_if_url(url) == cached  # second fetch is a cache hit
    finally:
        srv.shutdown()
        srv.server_close()
