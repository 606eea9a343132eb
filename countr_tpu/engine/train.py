"""Shared training engine (fine-tune + MAE pre-train).

One engine replaces the reference's six copy-pasted per-script training
loops (SURVEY.md §1, L4). TPU-native data parallelism: the step is
jitted over a global batch whose leading dim is sharded across the
1-D device mesh; params/optimizer state are replicated; because the
loss is a mean over the global batch, XLA emits the gradient
all-reduce on ICI — there is no DDP wrapper or NCCL equivalent
(reference machinery replaced: util/misc.py:225-257, :260-287,
FSC_finetune_cross.py:229-231).

Mixed precision: bf16 activations with fp32 params/optimizer replace
the reference's fp16 AMP + GradScaler (reference: util/misc.py:260-287)
— bf16 has fp32's exponent range, so no loss scaling is needed.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from countr_tpu.config import DENSITY_SCALE, TrainConfig
from countr_tpu.engine.schedule import warmup_cosine
from countr_tpu.models.countr import CounTR
from countr_tpu.models.mae import MaskedAutoencoderViT


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads) -> "TrainState":
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt,
        )


def decay_mask(params) -> Any:
    """Weight decay only for >=2-D params — the timm
    ``add_weight_decay`` no-decay-for-1D-and-bias grouping the
    reference applies (reference: FSC_finetune_cross.py:234,
    FSC_pretrain.py:226-227)."""
    return jax.tree.map(lambda p: p.ndim > 1, params)


# Top-level param groups that make up the frozen ViT encoder of the
# counting model (reference: torch.no_grad() encoder — those params
# never receive .grad, so torch AdamW neither steps NOR weight-decays
# them; we must exclude them from decay too, and we also skip their
# Adam moments entirely, saving 2x encoder-size optimizer memory).
FROZEN_ENCODER_PREFIXES = ("patch_embed", "blocks_", "norm")


def frozen_labels(params, prefixes=FROZEN_ENCODER_PREFIXES) -> Any:
    def top_label(key: str) -> str:
        for pre in prefixes:
            if key == pre.rstrip("_") or key.startswith(pre):
                return "frozen"
        return "train"

    return {
        k: jax.tree.map(lambda _: top_label(k), v) if isinstance(v, dict) else top_label(k)
        for k, v in params.items()
    }


def make_optimizer(
    cfg: TrainConfig,
    steps_per_epoch: int,
    world_batch: int,
    freeze_encoder: bool = False,
) -> Tuple[optax.GradientTransformation, Callable]:
    """AdamW(0.9, 0.95) + warmup-cosine, with optional gradient
    accumulation via MultiSteps (reference accum_iter:
    FSC_finetune_cross.py:312-315). With freeze_encoder, encoder
    params get zero updates and no optimizer state."""
    sched = warmup_cosine(
        cfg.resolved_lr(world_batch),
        epochs=cfg.epochs,
        warmup_epochs=cfg.warmup_epochs,
        steps_per_epoch=steps_per_epoch,
        min_lr=cfg.min_lr,
    )
    tx = optax.adamw(
        learning_rate=sched, b1=0.9, b2=0.95,
        weight_decay=cfg.weight_decay, mask=decay_mask,
    )
    if freeze_encoder:
        tx = optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()}, frozen_labels
        )
    if cfg.accum_iter > 1:
        tx = optax.MultiSteps(tx, cfg.accum_iter)
    return tx, sched


def init_train_state(params, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        opt_state=tx.init(params), tx=tx,
    )


# ---------------------------------------------------------------------------
# Fine-tuning (counting) steps
# ---------------------------------------------------------------------------


def make_finetune_step(
    model: CounTR, cfg: TrainConfig, device_aug: bool = False
) -> Callable[[TrainState, Dict, jax.Array, int], Tuple[TrainState, Dict]]:
    """Returns jitted step(state, batch, rng, shot_num) -> (state, metrics).

    batch: {'image' [B,384,384,3], 'gt_density' [B,384,384],
    'boxes' [B,3,64,64,3]}. shot_num is static (4 variants compile).

    With device_aug, batch instead carries the host-geometry sample
    {'image_u8' uint8, 'dots' [B,K,2] int16, 'n_dots', 'apply_photo',
    'boxes'} and the photometric chain + density synthesis run INSIDE
    this step on device (countr_tpu.ops.augment) — the host ships 4x
    fewer bytes and does none of the per-pixel work.

    Loss = sum((out-gt)^2 * pixel_mask / HW) / B with a Bernoulli(0.8)
    pixel mask shared across the batch — the reference's masked MSE
    (reference: FSC_finetune_cross.py:290-295, same np mask tiled over
    the batch)."""
    hw = model.cfg.img_size

    def step_fn(state: TrainState, batch, rng, shot_num: int):
        if device_aug:
            from countr_tpu.ops.augment import augment_batch

            rng, k_aug = jax.random.split(rng)
            imgs, gt = augment_batch(
                k_aug, batch["image_u8"], batch["dots"], batch["n_dots"],
                batch["apply_photo"],
            )
        else:
            imgs = batch["image"]
            gt = batch["gt_density"].astype(jnp.float32)
        return _finetune_core(model, cfg, state, imgs, gt, batch["boxes"],
                              rng, shot_num)

    return jax.jit(step_fn, static_argnums=(3,), donate_argnums=(0,))


def _finetune_core(model, cfg, state, imgs, gt, boxes, rng, shot_num: int):
    """Shared masked-MSE forward/backward/update + count metrics."""
    hw = model.cfg.img_size
    b = imgs.shape[0]

    def loss_fn(params):
        out = model.apply({"params": params}, imgs, boxes, shot_num)
        mask = jax.random.bernoulli(rng, cfg.loss_mask_p, (hw, hw))
        sq = jnp.square(out - gt) * mask.astype(jnp.float32)
        loss = jnp.sum(sq / (hw * hw)) / b
        return loss, out

    (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    new_state = state.apply_gradients(grads)

    pred_cnt = jnp.sum(out, axis=(1, 2)) / DENSITY_SCALE
    gt_cnt = jnp.sum(gt, axis=(1, 2)) / DENSITY_SCALE
    err = jnp.abs(pred_cnt - gt_cnt)
    metrics = {
        "loss": loss,
        "mae": jnp.mean(err),
        "mse": jnp.mean(jnp.square(err)),
    }
    return new_state, metrics


def _materialize_train_batch(store_arrays, batch, rng, n_mosaic=None):
    """Resident-store batch assembly + in-step augmentation: pixels
    materialized from the HBM pool (affine/mosaic), photometric chain
    on non-mosaic samples (reference: util/FSC147.py:177-255 — mosaic
    cells stay clean), density synthesis from the dot coordinates.
    Returns the dict a train phase consumes: imgs/gt/boxes plus 'rng'
    (the post-split key the loss mask of THIS batch must draw from, so
    the pipelined step reproduces the serial step's draw sequence)."""
    from countr_tpu.engine.train_store import materialize_batch
    from countr_tpu.ops.augment import density_from_dots, photometric

    imgs, boxes = materialize_batch(store_arrays, batch, n_mosaic)
    rng, k_aug = jax.random.split(rng)
    keys = jax.random.split(k_aug, imgs.shape[0])
    imgs = jax.vmap(
        lambda k, im, mos: jnp.where(mos > 0, im, photometric(k, im))
    )(keys, imgs, batch["is_mosaic"])
    gt = jax.vmap(density_from_dots)(batch["dots"], batch["n_dots"])
    return {"imgs": imgs, "gt": gt, "boxes": boxes, "rng": rng}


def make_store_finetune_step(
    model: CounTR, cfg: TrainConfig
) -> Callable:
    """Resident-store fine-tune step: step(state, store_arrays, batch,
    rng, shot_num). The batch carries only geometry PARAMETERS
    (engine.train_store); pixels are materialized on device from the
    resident pool, then photometric aug + density synthesis run in-step
    (mosaic samples skip photometric, reference: util/FSC147.py:177-255).
    store_arrays must be passed as arguments every call — closing over
    them would ship gigabytes as compile-request constants."""

    def step_fn(state: TrainState, store_arrays, batch, rng, shot_num: int,
                n_mosaic=None):
        c = _materialize_train_batch(store_arrays, batch, rng, n_mosaic)
        return _finetune_core(model, cfg, state, c["imgs"], c["gt"],
                              c["boxes"], c["rng"], shot_num)

    return jax.jit(step_fn, static_argnums=(4, 5), donate_argnums=(0,))


def make_store_materialize(n_mosaic=None) -> Callable:
    """jitted materialize(store_arrays, batch, rng) -> carry dict —
    primes the software-pipelined step below (and materializes the final
    drained batch's carry when an epoch ends)."""
    return jax.jit(
        lambda store_arrays, batch, rng: _materialize_train_batch(
            store_arrays, batch, rng, n_mosaic
        )
    )


def make_store_finetune_step_pipelined(
    model: CounTR, cfg: TrainConfig
) -> Callable:
    """Software-pipelined resident fine-tune step: trains on the
    PREVIOUSLY materialized batch (the device-resident ``carry``) while
    materializing + augmenting the NEXT batch inside the same program —
    the ~34 ms/batch-8 affine gather (52% of the serial 64.75 ms step,
    docs/PROFILE.md) is independent of the fwd/bwd it runs next to, so
    the compiler/hardware could in principle overlap gather DMA traffic
    with MXU work. MEASURED NEUTRAL on the axon v5e (64.8 vs 64.7
    ms/step — XLA schedules the subgraphs serially on the TensorCore;
    the two-dispatch split is slower still, docs/PROFILE.md round-5
    overlap section). Kept as the trajectory-exact pipelined form for
    backends that do overlap.

      step(state, store_arrays, carry, next_batch, next_rng, shot_num,
           n_mosaic) -> (state, metrics, next_carry)

    shot_num applies to the CARRIED batch (its m_flag rule draw);
    next_rng is the rng the serial step would receive for next_batch.
    The loss/metric trajectory is EXACTLY the serial step's, one batch
    behind: batch k trains with identical pixels, photometric keys and
    loss-mask key (pinned by tests/test_train_store.py). Prime the
    first carry with make_store_materialize(); on the final batch of an
    epoch, run the train phase alone via make_store_train_phase()."""

    def step_fn(state: TrainState, store_arrays, carry, next_batch,
                next_rng, shot_num: int, n_mosaic=None):
        new_state, metrics = _finetune_core(
            model, cfg, state, carry["imgs"], carry["gt"], carry["boxes"],
            carry["rng"], shot_num,
        )
        next_carry = _materialize_train_batch(
            store_arrays, next_batch, next_rng, n_mosaic
        )
        return new_state, metrics, next_carry

    return jax.jit(step_fn, static_argnums=(5, 6), donate_argnums=(0, 2))


def make_store_train_phase(model: CounTR, cfg: TrainConfig) -> Callable:
    """jitted train(state, carry, shot_num) — the pipelined step's
    train half alone, for draining the last carried batch of an epoch."""

    def train_fn(state: TrainState, carry, shot_num: int):
        return _finetune_core(
            model, cfg, state, carry["imgs"], carry["gt"], carry["boxes"],
            carry["rng"], shot_num,
        )

    return jax.jit(train_fn, static_argnums=(2,), donate_argnums=(0, 1))


def make_carpk_store_step(model: CounTR, cfg: TrainConfig) -> Callable:
    """Resident CARPK fine-tune step: step(state, store_arrays, batch,
    rng) -> (state, metrics). The batch carries only an image index and
    the random exemplar's crop maps (engine.carpk_store); the 384x384
    resize+crop, density synthesis, and exemplar resize all run in-step
    from the resident uint8 originals. shot_num is fixed at 1 and the
    loss is unmasked (cfg.loss_mask_p=1), matching the reference
    (reference: FSC_finetune_CARPK.py:242, :250-252)."""

    def step_fn(state: TrainState, store_arrays, batch, rng):
        from countr_tpu.engine.carpk_store import materialize_carpk_batch
        from countr_tpu.ops.augment import density_from_dots

        imgs, boxes = materialize_carpk_batch(store_arrays, batch)
        dots = jnp.take(store_arrays["dots"], batch["img_idx"], axis=0)
        nd = jnp.take(store_arrays["n_dots"], batch["img_idx"], axis=0)
        gt = jax.vmap(density_from_dots)(dots, nd)
        return _finetune_core(model, cfg, state, imgs, gt, boxes, rng, 1)

    return jax.jit(step_fn, donate_argnums=(0,))


def make_eval_step(model: CounTR):
    """jitted eval(params, batch, shot_num) -> masked error SUMS
    (reference val loop: FSC_finetune_cross.py:328-350).

    batch["valid"] masks padding samples. Sums over the (batch-sharded)
    per-sample errors come back replicated — reading them is the
    metric all-reduce, which also makes this correct on multi-host
    meshes where per-sample entries would not be addressable."""

    def eval_fn(params, batch, shot_num: int):
        out = model.apply({"params": params}, batch["image"], batch["boxes"], shot_num)
        pred_cnt = jnp.sum(out, axis=(1, 2)) / DENSITY_SCALE
        gt_cnt = jnp.sum(batch["gt_density"].astype(jnp.float32), axis=(1, 2)) / DENSITY_SCALE
        err = jnp.abs(pred_cnt - gt_cnt)
        nae = jnp.where(gt_cnt > 0, err / jnp.maximum(gt_cnt, 1e-9), 0.0)
        v = batch["valid"].astype(jnp.float32)
        return {
            "err_sum": jnp.sum(err * v),
            "sq_sum": jnp.sum(jnp.square(err) * v),
            "nae_sum": jnp.sum(nae * v),
            "n": jnp.sum(v),
        }

    return jax.jit(eval_fn, static_argnums=(2,))


def make_store_eval_step(model: CounTR):
    """Resident-store validation: eval(params, val_arrays, idxs, valid,
    shot_num) gathers the fixed 384^2 val samples from HBM
    (engine.train_store.ValStore) — per-epoch H2D is just the index
    vectors instead of re-uploading the whole split every epoch
    (reference val loop: FSC_finetune_cross.py:328-350)."""

    def eval_fn(params, val_arrays, idxs, valid, shot_num: int):
        imgs = jnp.take(
            val_arrays["images"], idxs, axis=0
        ).astype(jnp.float32) / 255.0
        boxes = jnp.take(val_arrays["boxes"], idxs, axis=0)
        out = model.apply({"params": params}, imgs, boxes, shot_num)
        pred_cnt = jnp.sum(out, axis=(1, 2)) / DENSITY_SCALE
        gt_cnt = jnp.take(val_arrays["gt_cnt"], idxs, axis=0)
        err = jnp.abs(pred_cnt - gt_cnt)
        nae = jnp.where(gt_cnt > 0, err / jnp.maximum(gt_cnt, 1e-9), 0.0)
        v = valid.astype(jnp.float32)
        return {
            "err_sum": jnp.sum(err * v),
            "sq_sum": jnp.sum(jnp.square(err) * v),
            "nae_sum": jnp.sum(nae * v),
            "n": jnp.sum(v),
        }

    return jax.jit(eval_fn, static_argnums=(4,))


# ---------------------------------------------------------------------------
# MAE pre-training step
# ---------------------------------------------------------------------------


def make_pretrain_step(
    model: MaskedAutoencoderViT,
) -> Callable[[TrainState, jnp.ndarray, jax.Array], Tuple[TrainState, Dict]]:
    """jitted step(state, images, rng) -> (state, metrics)
    (reference hot loop: FSC_pretrain.py:254-299)."""

    def step_fn(state: TrainState, imgs, rng):
        def loss_fn(params):
            loss, _pred, _mask = model.apply({"params": params}, imgs, rng)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        new_state = state.apply_gradients(grads)
        return new_state, {"loss": loss}

    return jax.jit(step_fn, donate_argnums=(0,))


def make_store_pretrain_step(model: MaskedAutoencoderViT, max_w: int):
    """Resident-store MAE pretrain step: step(state, store_arrays,
    batch, rng) — the RandomResizedCrop(384, bicubic) + flip happens on
    device from per-sample crop scalars (engine.train_store
    .materialize_pretrain_batch); per-step H2D is ~30 bytes/sample
    instead of a 1.8 MB float image."""

    def step_fn(state: TrainState, store_arrays, batch, rng):
        from countr_tpu.engine.train_store import materialize_pretrain_batch

        imgs = materialize_pretrain_batch(store_arrays, batch, max_w)

        def loss_fn(params):
            loss, _pred, _mask = model.apply({"params": params}, imgs, rng)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        new_state = state.apply_gradients(grads)
        return new_state, {"loss": loss}

    return jax.jit(step_fn, donate_argnums=(0,))


# ---------------------------------------------------------------------------
# Encoder transfer: MAE pretrain checkpoint -> counting model
# ---------------------------------------------------------------------------

ENCODER_KEYS = ("patch_embed", "norm")


def transfer_encoder(mae_params: Dict, countr_params: Dict, depth: int = 12) -> Dict:
    """Copy the pretrained ViT encoder (patch_embed, blocks_*, norm)
    from MAE params into a counting-model param tree — the reference's
    non-strict load of the pretrain checkpoint into SupervisedMAE
    (reference: util/misc.py:363-376 load_model_FSC with strict=False
    key overlap; only encoder keys match)."""
    src = mae_params.get("params", mae_params)
    dst_root = countr_params.get("params", countr_params)
    dst = dict(dst_root)
    for k in ENCODER_KEYS + tuple(f"blocks_{i}" for i in range(depth)):
        if k in src:
            dst[k] = src[k]
    if "params" in countr_params:
        return {**countr_params, "params": dst}
    return dst
