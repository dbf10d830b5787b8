"""Liquid-Warping-GAN trainer: jitted G+D step with data-parallel sharding.

TPU-native rebuild of `iPERCore/tools/trainers/lwg_trainer.py` (LWGTrainerABC:17,
LWGTrainer:609, LWGAugBGTrainer:367, LWGFrontTrainer:835) and
`trainers/base.py:120-300` (FlowCompositionForTrainer + kps bboxes):

  * the torch set_input/forward/optimize_G/optimize_D call chain collapses into
    ONE pure `train_step(state, batch)` that runs flow composition
    (stop-gradient), the generator update, and the discriminator update in a
    single XLA program — G grads and D grads in one backward region each;
  * DDP/NCCL (`services/train.py:44-51`) becomes `pjit` over a 1-D `data` mesh
    axis: params replicated, batch sharded, gradient mean via XLA collectives;
  * loss mix parity (`lwg_trainer.py:732-790`, `deploy.toml:85-90`):
    rec 10*L1(src+bg)/2, tsf 10*VGG, face 5, adv 1 (LSGAN real=1/fake=-1,
    G target 0), mask 5*BCE, tv 1.
"""
from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ipercore_tpu.models import flow_composition as fc
from ipercore_tpu.models.networks import criterions as C

NECK_IDS = 12  # cocoplus: joints >= 12 are neck/head (`trainers/base.py:202`)


def _norm_gen_outputs(outs):
    """Normalize generator outputs to the LWB 5-tuple. The baseline family
    (InputConcat / TextureWarping, `input_concat_resunet.py`) has no source
    reconstruction stream and returns (bg, tsf_color, tsf_mask)."""
    if len(outs) == 3:
        bg, tsf_color, tsf_mask = outs
        return bg, None, None, tsf_color, tsf_mask
    return outs


class TrainConfig(NamedTuple):
    lambda_rec: float = 10.0
    lambda_tsf: float = 10.0
    lambda_face: float = 5.0
    lambda_mask: float = 5.0
    lambda_mask_smooth: float = 1.0
    lambda_d_prob: float = 1.0
    lr_g: float = 1e-4
    lr_d: float = 1e-4
    use_face: bool = True
    # face-net crop size: (112, 96) Sphere20a, (224, 224) SENet-50
    # (`faceloss.py:291-299`)
    face_hw: tuple = (112, 96)
    use_gan: bool = True
    aug_bg: bool = False
    temporal: bool = False
    # lr schedule — reference keeps lr constant for `niters_no_decay` then
    # decays linearly to 0 over `niters_decay` (`trainers/base.py` LambdaLR).
    # niters_decay = 0 -> constant lr.
    niters_no_decay: int = 0
    niters_decay: int = 0
    # TPU perf knobs: bf16 network compute (master params/optimizer stay f32;
    # bf16 needs no loss scaling) and generator rematerialization (recompute
    # the G forward in the backward pass — trades MXU flops for HBM, the
    # standard 512^2+ memory lever).
    compute_dtype: str = "float32"
    remat: bool = False
    # GAN-robustness hygiene: global-norm gradient clipping plus
    # skip-update-on-nonfinite-grads. A long pretrain was observed blowing
    # up (mask loss 0.57 -> 18.6 in 400 steps, NaN shortly after) and every
    # step thereafter poisoned; apply_if_finite freezes through the bad
    # step instead. 0 disables clipping.
    grad_clip: float = 10.0


def _schedule(lr: float, cfg: "TrainConfig"):
    if cfg.niters_decay <= 0:
        return lr
    return optax.join_schedules(
        [optax.constant_schedule(lr),
         optax.linear_schedule(lr, 0.0, cfg.niters_decay)],
        [max(cfg.niters_no_decay, 1)])


def make_optimizers(cfg: "TrainConfig"):
    """The two Adams (b1=0.5) with the reference's constant-then-linear-decay
    lr schedule — `lwg_trainer.py:104-175` + `base.py` schedulers."""
    def guard(adam):
        if cfg.grad_clip and cfg.grad_clip > 0:
            adam = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), adam)
        # 100k tolerated consecutive nonfinite steps ~= "never halt, always
        # skip" for any practical schedule
        return optax.apply_if_finite(adam, max_consecutive_errors=100_000)

    tx_g = guard(optax.adam(_schedule(cfg.lr_g, cfg), b1=0.5, b2=0.999))
    tx_d = guard(optax.adam(_schedule(cfg.lr_d, cfg), b1=0.5, b2=0.999))
    return tx_g, tx_d


class LWGTrainState(NamedTuple):
    params_G: Any
    params_D: Any
    opt_G: Any
    opt_D: Any
    step: jnp.ndarray


def cal_head_bbox_by_kps(j2d: jnp.ndarray) -> jnp.ndarray:
    """Head bbox in NDC from cocoplus j2d — `trainers/base.py:205-246`.

    Args: j2d (N, 19, 2) in [-1, 1]. Returns (N, 4) = (x0, y0, x1, y1)."""
    head = j2d[:, NECK_IDS:, :]
    min_x = jnp.clip(jnp.min(head[:, :, 0], axis=1) - 0.1, -1.0, 1.0)
    max_x = jnp.clip(jnp.max(head[:, :, 0], axis=1) + 0.1, -1.0, 1.0)
    min_y = jnp.clip(jnp.min(head[:, :, 1], axis=1) - 0.1, -1.0, 1.0)
    max_y = jnp.clip(jnp.max(head[:, :, 1], axis=1) + 0.1, -1.0, 1.0)
    return jnp.stack([min_x, min_y, max_x, max_y], axis=1)


def cal_body_bbox_by_kps(j2d: jnp.ndarray, factor: float = 1.2) -> jnp.ndarray:
    """Body bbox in NDC — `trainers/base.py:248-285`."""
    min_x = jnp.min(j2d[:, :, 0], axis=1)
    max_x = jnp.max(j2d[:, :, 0], axis=1)
    mid_x = (min_x + max_x) / 2
    w = (max_x - min_x) * factor
    min_y = jnp.min(j2d[:, :, 1], axis=1)
    max_y = jnp.max(j2d[:, :, 1], axis=1)
    mid_y = (min_y + max_y) / 2
    h = (max_y - min_y) * factor
    return jnp.stack(
        [
            jnp.clip(mid_x - w / 2, -1.0, 1.0),
            jnp.clip(mid_y - h / 2, -1.0, 1.0),
            jnp.clip(mid_x + w / 2, -1.0, 1.0),
            jnp.clip(mid_y + h / 2, -1.0, 1.0),
        ],
        axis=1,
    )


def create_train_state(
    rng: jax.Array,
    generator,
    discriminator,
    comp: fc.FlowComposer,
    cfg: TrainConfig,
    ns: int = 2,
    nt: int = 2,
    params_G: Any = None,
) -> LWGTrainState:
    """Initialize G/D params + Adam states (reference builds two Adams with
    lr 1e-4, `lwg_trainer.py:104-175`)."""
    S = comp.image_size
    rng_g, rng_d = jax.random.split(rng)
    bg = jnp.zeros((1, 1, S, S, 4))
    src = jnp.zeros((1, ns, S, S, 6))
    tsf = jnp.zeros((1, nt, S, S, 6))
    Tst = jnp.zeros((1, nt, ns, S, S, 2))
    Ttt = jnp.zeros((1, max(nt - 1, 1), S, S, 2)) if cfg.temporal else None
    if params_G is None:
        # jit the init: eager flax init dispatches thousands of tiny ops.
        params_G = jax.jit(
            lambda r: generator.init(r, bg, src, tsf, Tst, Ttt, False))(rng_g)

    x = jnp.zeros((1, S, S, 6))
    bbox = jnp.asarray([[-0.5, -0.5, 0.5, 0.5]])
    params_D = jax.jit(lambda r: discriminator.init(r, x, None, bbox, bbox))(rng_d)

    tx_g, tx_d = make_optimizers(cfg)
    return LWGTrainState(
        params_G=params_G,
        params_D=params_D,
        opt_G=tx_g.init(params_G),
        opt_D=tx_d.init(params_D),
        step=jnp.zeros((), jnp.int32),
    )


def _composite(color, mask, bg):
    return mask * bg + (1.0 - mask) * color


def train_step(
    state: LWGTrainState,
    batch: dict,
    comp: fc.FlowComposer,
    generator,
    discriminator,
    vgg,
    vgg_params,
    face,
    face_params,
    cfg: TrainConfig,
    ns: int = 2,
    axis_name: Optional[str] = None,
) -> tuple[LWGTrainState, dict]:
    """One G+D update — `optimize_parameters` (`lwg_trainer.py:326-352`).

    Args:
        batch: dict with
            images (bs, ns+nt, S, S, 3) in [-1, 1];
            smpls (bs, ns+nt, 85);
            masks (bs, ns+nt, S, S, 1) background=1;
            bg (bs, S, S, 3) pseudo-background supervision;
            optional offsets (bs, V, 3), links_ids, aug_bg.
        ns: number of source frames at the start of the frame axis (static).
        axis_name: mesh axis for gradient pmean (None = single device / let
            pjit insert collectives automatically).

    Returns:
        (new_state, metrics dict)
    """
    images = batch["images"]
    smpls = batch["smpls"]
    masks = batch["masks"]
    bs = images.shape[0]
    nt = images.shape[1] - ns
    S = comp.image_size

    src_img, ref_img = images[:, :ns], images[:, ns:]
    src_smpl, ref_smpl = smpls[:, :ns], smpls[:, ns:]
    src_mask, ref_mask = masks[:, :ns], masks[:, ns:]
    offsets = batch.get("offsets", 0.0)
    links_ids = batch.get("links_ids")

    # ---- flow composition (frozen geometry; no grads) — `set_input:624`
    comp_out = jax.lax.stop_gradient(
        fc.forward(comp, src_img, ref_img, src_smpl, ref_smpl,
                   src_mask=src_mask, ref_mask=ref_mask,
                   links_ids=links_ids, offsets=offsets, temporal=cfg.temporal)
    )
    ref_j2d = comp_out["ref_info"]["j2d"]  # (bs*nt, 19, 2)
    head_bbox = cal_head_bbox_by_kps(ref_j2d)
    body_bbox = cal_body_bbox_by_kps(ref_j2d)

    input_G_bg = comp_out["input_G_bg"]
    input_G_src = comp_out["input_G_src"]
    input_G_tsf = comp_out["input_G_tsf"]
    Tst, Ttt = comp_out["Tst"], comp_out["Ttt"]

    # Aug-bg supervision (`LWGAugBGTrainer.set_input`, `lwg_trainer.py:457-460`):
    # paste the source human mask onto a clean background image and append it
    # as an extra BGNet sample supervised against the clean image.
    aug_bg = batch.get("aug_bg") if cfg.aug_bg else None
    if aug_bg is not None:
        src_mask0 = masks[:, 0:1]  # (bs, 1, S, S, 1) background=1
        aug_in = jnp.concatenate([aug_bg[:, None] * src_mask0, src_mask0], axis=-1)
        input_G_bg = jnp.concatenate([input_G_bg, aug_in], axis=1)

    real_bg = batch["bg"]  # (bs, S, S, 3)
    tsf_cond = input_G_tsf[..., 3:6].reshape(bs * nt, S, S, 3)
    real_tsf = ref_img.reshape(bs * nt, S, S, 3)

    tx_g, tx_d = make_optimizers(cfg)

    # bf16 compute path: cast params + activations for the network applies,
    # losses and grads stay f32 (casts are differentiable; master params and
    # both Adams remain f32 in the state)
    cdt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None

    def _cast(t):
        if cdt is None:
            return t
        return jax.tree_util.tree_map(
            lambda x: x.astype(cdt)
            if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x, t)

    def _f32(t):
        return jax.tree_util.tree_map(lambda x: x.astype(jnp.float32), t)

    apply_G = lambda p, a, b, c, d, e: generator.apply(p, a, b, c, d, e, False)
    if cfg.remat:
        apply_G = jax.checkpoint(apply_G)

    def apply_D(p, x, mask, bb, hb):
        return _f32(discriminator.apply(_cast(p), _cast(x), mask, bb, hb))

    # ------------------------------------------------------------------ G
    def g_loss_fn(params_G):
        outs = _f32(apply_G(_cast(params_G), _cast(input_G_bg),
                            _cast(input_G_src), _cast(input_G_tsf),
                            _cast(Tst), _cast(Ttt)))
        fake_bg, fake_src_color, fake_src_mask, fake_tsf_color, fake_tsf_mask = (
            _norm_gen_outputs(outs))
        fake_aug_bg = None
        if fake_bg is None:
            fake_bg_b = jnp.broadcast_to(real_bg[:, None], (bs, 1, S, S, 3))
        else:
            if aug_bg is not None:  # split off the appended aug sample
                fake_aug_bg = fake_bg[:, -1]
                fake_bg = fake_bg[:, :-1]
            fake_bg_b = fake_bg[:, 0:1]  # (bs, 1, S, S, 3) shared bg
        fake_tsf_imgs = _composite(fake_tsf_color, fake_tsf_mask, fake_bg_b)

        flat_tsf = fake_tsf_imgs.reshape(bs * nt, S, S, 3)

        # adversarial (G target 0 — `optimize_G:766`)
        if cfg.use_gan:
            d_in = jnp.concatenate([flat_tsf, tsf_cond], axis=-1)
            d_outs = apply_D(state.params_D, d_in, None, body_bbox, head_bbox)
            loss_adv = C.lsgan_loss(d_outs, 0.0) * cfg.lambda_d_prob
        else:
            loss_adv = 0.0

        bg_rec = C.l1_loss(fake_bg_b[:, 0], real_bg)
        if fake_aug_bg is not None:  # supervised inpainting on the clean aug bg
            bg_rec = (bg_rec + C.l1_loss(fake_aug_bg, aug_bg)) / 2.0
        if fake_src_color is not None:
            fake_src_imgs = _composite(fake_src_color, fake_src_mask, fake_bg_b)
            loss_rec = (C.l1_loss(fake_src_imgs, src_img) + bg_rec) / 2.0 * cfg.lambda_rec
        else:  # baseline family: no source reconstruction stream
            loss_rec = bg_rec * cfg.lambda_rec
        loss_tsf = C.perceptual_loss(vgg_params, vgg.apply, flat_tsf, real_tsf) * cfg.lambda_tsf

        if cfg.use_face:
            loss_face = C.face_loss(face_params, face.apply, flat_tsf, real_tsf,
                                    head_bbox, head_bbox,
                                    hw=cfg.face_hw) * cfg.lambda_face
        else:
            loss_face = 0.0

        if fake_src_mask is not None:
            fake_masks = jnp.concatenate([fake_src_mask, fake_tsf_mask], axis=1)
            body_masks = masks  # background=1, same convention as predicted masks
        else:
            fake_masks = fake_tsf_mask
            body_masks = masks[:, ns:]
        loss_mask = C.mask_bce_loss(
            fake_masks.reshape(-1, S, S, 1), body_masks.reshape(-1, S, S, 1)) * cfg.lambda_mask
        loss_smooth = C.tv_loss(fake_masks.reshape(-1, S, S, 1)) * cfg.lambda_mask_smooth

        total = loss_rec + loss_tsf + loss_face + loss_adv + loss_mask + loss_smooth
        aux = {
            "g_rec": loss_rec, "g_tsf": loss_tsf, "g_face": loss_face,
            "g_adv": loss_adv, "g_mask": loss_mask, "g_smooth": loss_smooth,
            "g_total": total,
        }
        return total, (aux, jax.lax.stop_gradient(flat_tsf))

    (g_total, (g_metrics, fake_tsf_detached)), g_grads = jax.value_and_grad(
        g_loss_fn, has_aux=True)(state.params_G)
    if axis_name is not None:
        g_grads = jax.lax.pmean(g_grads, axis_name)
    g_updates, new_opt_G = tx_g.update(g_grads, state.opt_G, state.params_G)
    new_params_G = optax.apply_updates(state.params_G, g_updates)

    # ------------------------------------------------------------------ D
    def d_loss_fn(params_D):
        fake_in = jnp.concatenate([fake_tsf_detached, tsf_cond], axis=-1)
        real_in = jnp.concatenate([real_tsf, tsf_cond], axis=-1)
        d_fake = apply_D(params_D, fake_in, None, body_bbox, head_bbox)
        d_real = apply_D(params_D, real_in, None, body_bbox, head_bbox)
        loss = C.lsgan_loss(d_real, 1.0) + C.lsgan_loss(d_fake, -1.0)
        return loss

    if cfg.use_gan:
        d_total, d_grads = jax.value_and_grad(d_loss_fn)(state.params_D)
        if axis_name is not None:
            d_grads = jax.lax.pmean(d_grads, axis_name)
        d_updates, new_opt_D = tx_d.update(d_grads, state.opt_D, state.params_D)
        new_params_D = optax.apply_updates(state.params_D, d_updates)
    else:
        d_total = jnp.zeros(())
        new_opt_D, new_params_D = state.opt_D, state.params_D

    metrics = dict(g_metrics)
    metrics["d_total"] = d_total

    new_state = LWGTrainState(
        params_G=new_params_G,
        params_D=new_params_D,
        opt_G=new_opt_G,
        opt_D=new_opt_D,
        step=state.step + 1,
    )
    return new_state, metrics


def eval_step(
    state: LWGTrainState,
    batch: dict,
    comp: fc.FlowComposer,
    generator,
    discriminator,
    vgg,
    vgg_params,
    face,
    face_params,
    cfg: TrainConfig,
    ns: int = 2,
    return_images: bool = False,
) -> dict:
    """Validation forward: the G losses of `train_step` with no parameter
    update — the role of `Train._display_visualizer_val` (`train.py:210-237`),
    which runs `set_input` + `forward` on held-out batches and reports the
    same loss dict. With `return_images` also returns the visual panel rows
    (src / ref / fake tsf / fake bg) that the reference's `TBVisualizer`
    publishes as image panels (`tb_visualizer.py:38-76`)."""
    images = batch["images"]
    smpls = batch["smpls"]
    masks = batch["masks"]
    bs = images.shape[0]
    nt = images.shape[1] - ns
    S = comp.image_size

    src_img, ref_img = images[:, :ns], images[:, ns:]
    src_smpl, ref_smpl = smpls[:, :ns], smpls[:, ns:]
    src_mask, ref_mask = masks[:, :ns], masks[:, ns:]

    comp_out = fc.forward(comp, src_img, ref_img, src_smpl, ref_smpl,
                          src_mask=src_mask, ref_mask=ref_mask,
                          temporal=cfg.temporal)
    ref_j2d = comp_out["ref_info"]["j2d"]
    head_bbox = cal_head_bbox_by_kps(ref_j2d)
    body_bbox = cal_body_bbox_by_kps(ref_j2d)
    real_bg = batch["bg"]
    tsf_cond = comp_out["input_G_tsf"][..., 3:6].reshape(bs * nt, S, S, 3)
    real_tsf = ref_img.reshape(bs * nt, S, S, 3)

    outs = generator.apply(state.params_G, comp_out["input_G_bg"],
                           comp_out["input_G_src"], comp_out["input_G_tsf"],
                           comp_out["Tst"], comp_out["Ttt"], False)
    fake_bg, fake_src_color, fake_src_mask, fake_tsf_color, fake_tsf_mask = (
        _norm_gen_outputs(outs))
    if fake_bg is None:
        fake_bg_b = jnp.broadcast_to(real_bg[:, None], (bs, 1, S, S, 3))
    else:
        fake_bg_b = fake_bg[:, 0:1]
    fake_tsf_imgs = _composite(fake_tsf_color, fake_tsf_mask, fake_bg_b)
    flat_tsf = fake_tsf_imgs.reshape(bs * nt, S, S, 3)

    bg_rec = C.l1_loss(fake_bg_b[:, 0], real_bg)
    if fake_src_color is not None:
        fake_src_imgs = _composite(fake_src_color, fake_src_mask, fake_bg_b)
        loss_rec = (C.l1_loss(fake_src_imgs, src_img) + bg_rec) / 2.0 * cfg.lambda_rec
    else:
        loss_rec = bg_rec * cfg.lambda_rec
    loss_tsf = C.perceptual_loss(vgg_params, vgg.apply, flat_tsf, real_tsf) * cfg.lambda_tsf
    if cfg.use_face:
        loss_face = C.face_loss(face_params, face.apply, flat_tsf, real_tsf,
                                head_bbox, head_bbox,
                                hw=cfg.face_hw) * cfg.lambda_face
    else:
        loss_face = jnp.zeros(())
    if cfg.use_gan:
        d_in = jnp.concatenate([flat_tsf, tsf_cond], axis=-1)
        d_outs = discriminator.apply(state.params_D, d_in, None, body_bbox, head_bbox)
        loss_adv = C.lsgan_loss(d_outs, 0.0) * cfg.lambda_d_prob
    else:
        loss_adv = jnp.zeros(())
    if fake_src_mask is not None:
        fake_masks = jnp.concatenate([fake_src_mask, fake_tsf_mask], axis=1)
        body_masks = masks
    else:
        fake_masks, body_masks = fake_tsf_mask, masks[:, ns:]
    loss_mask = C.mask_bce_loss(
        fake_masks.reshape(-1, S, S, 1), body_masks.reshape(-1, S, S, 1)) * cfg.lambda_mask
    total = loss_rec + loss_tsf + loss_face + loss_adv + loss_mask
    metrics = {"val_g_rec": loss_rec, "val_g_tsf": loss_tsf,
               "val_g_face": loss_face, "val_g_adv": loss_adv,
               "val_g_mask": loss_mask, "val_g_total": total}
    if return_images:
        images = {
            "src": src_img[:, 0],
            "ref": ref_img[:, 0],
            "fake_tsf": fake_tsf_imgs[:, 0],
            "fake_bg": fake_bg_b[:, 0],
        }
        return metrics, images
    return metrics


def make_sharded_train_step(
    comp, generator, discriminator, vgg, vgg_params, face, face_params, cfg,
    mesh, ns: int = 2, axis_name: str = "data",
):
    """pjit the full train step over a data mesh: params replicated, batch
    sharded on the leading axis; XLA inserts the gradient all-reduce
    (reference: NCCL DDP, `services/train.py:89-95`)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(axis_name))

    def step(state, batch):
        return train_step(state, batch, comp, generator, discriminator,
                          vgg, vgg_params, face, face_params, cfg, ns=ns)

    batch_sharding = {
        "images": shard, "smpls": shard, "masks": shard, "bg": shard,
    }
    return jax.jit(
        step,
        in_shardings=(rep, batch_sharding),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )
