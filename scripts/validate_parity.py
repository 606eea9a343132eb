"""One-off full-size numerical parity validation.

Builds a random torch-format state_dict at the released-weights config
(mae_vit_base_patch16_fim6 dims), runs the functional torch oracle and
the converted flax model on the same 384x384 input, and reports
density-map and count deltas. Run on CPU for fp32 determinism:

  python scripts/validate_parity.py

Also reports the bf16 and Pallas-path deviations of the same forward —
the accuracy budget for the fast inference mode.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")

import numpy as np  # noqa: E402


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from countr_tpu.config import COUNTR_PRESETS
    from countr_tpu.engine.checkpoint import convert_countr_state_dict
    from countr_tpu.models.countr import CounTR
    from tests.torch_oracle import countr_forward, make_countr_state_dict

    rng = np.random.default_rng(0)
    print("building fim6-size state dict...", flush=True)
    sd = make_countr_state_dict(
        rng, embed_dim=768, depth=12, dec_dim=512, dec_depth=6
    )
    imgs = rng.uniform(0, 1, (1, 3, 384, 384)).astype(np.float32)
    boxes = rng.uniform(0, 1, (1, 3, 3, 64, 64)).astype(np.float32)

    t0 = time.time()
    want = countr_forward(
        sd, imgs, boxes, 3, depth=12, dec_depth=6, enc_heads=12, dec_heads=16
    )
    print(f"torch oracle forward: {time.time() - t0:.1f}s", flush=True)

    params = convert_countr_state_dict(sd, depth=12, decoder_depth=6)
    params = jax.tree.map(jnp.asarray, params)

    import dataclasses

    for tag, dtype, pallas in [("fp32", jnp.float32, False),
                               ("bf16", jnp.bfloat16, False),
                               ("bf16+pallas-interp", jnp.bfloat16, True)]:
        cfg = dataclasses.replace(
            COUNTR_PRESETS["mae_vit_base6_patch16"], dtype=dtype,
            use_pallas_attention=pallas,
        )
        model = CounTR(cfg)
        t0 = time.time()
        if pallas:
            # force kernel execution on CPU via interpret mode
            import countr_tpu.ops.pallas_attn as pa

            orig = pa.fused_attention
            pa.fused_attention = lambda q, k, v, h, interpret=None: orig(
                q, k, v, h, interpret=True
            )
            try:
                got = np.asarray(
                    model.apply(params, jnp.asarray(imgs.transpose(0, 2, 3, 1)),
                                jnp.asarray(boxes.transpose(0, 1, 3, 4, 2)), 3)
                )
            finally:
                pa.fused_attention = orig
        else:
            got = np.asarray(
                model.apply(params, jnp.asarray(imgs.transpose(0, 2, 3, 1)),
                            jnp.asarray(boxes.transpose(0, 1, 3, 4, 2)), 3)
            )
        dt = time.time() - t0
        max_abs = float(np.max(np.abs(got - want)))
        cnt_w = float(want.sum() / 60)
        cnt_g = float(got.sum() / 60)
        print(
            f"{tag:>20}: max|dens diff| {max_abs:.3e}  "
            f"count {cnt_g:+.5f} vs {cnt_w:+.5f} "
            f"(rel {abs(cnt_g - cnt_w) / max(abs(cnt_w), 1e-9):.2e})  [{dt:.1f}s]",
            flush=True,
        )


if __name__ == "__main__":
    main()
