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
