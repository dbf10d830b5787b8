"""Full training service: data-parallel LWG-GAN training over a device mesh.

Rebuilds `iPERCore/services/train.py:33-252` + `scripts/train/dist_train.py`:
the reference launches one torch process per GPU with NCCL DDP; here a single
JAX controller pjit-shards the batch over all local devices (multi-host via
`jax.distributed.initialize` is transparent to this code). Wall-clock-periodic
checkpointing mirrors `save_latest_freq_s` (`train.py:181-184`); `net_iter_*`
checkpoint naming and latest-iteration auto-resume mirror
`trainers/base.py:76-94` + `options_train.py:34-53`.
"""
from __future__ import annotations

import os
import time
from typing import Optional

import numpy as np

from ipercore_tpu.services.meta_info import checkpoints_dir
from ipercore_tpu.utils.checkpoint import (
    find_latest_iter,
    load_train_ckpt,
    save_train_ckpt,
)
from ipercore_tpu.utils.logging import MetricsLogger


def train(opt, max_iters: Optional[int] = None) -> dict:
    """Run (or resume) training. Returns the last metrics dict."""
    import jax
    import jax.numpy as jnp

    from ipercore_tpu.data import build_dataset
    from ipercore_tpu.models import smpl as smpl_mod
    from ipercore_tpu.models import flow_composition as fc
    from ipercore_tpu.models.mesh import load_assets
    from ipercore_tpu.models.networks import build_generator, build_discriminator
    from ipercore_tpu.models.networks import criterions as C
    from ipercore_tpu.parallel.mesh import make_mesh
    from ipercore_tpu.trainers import lwg_trainer as T

    S = int(opt.image_size)
    ns = int(opt.num_source)
    nt = int(opt.get("time_step", 2))

    model = smpl_mod.resolve_body_model(opt)
    assets = load_assets(model)
    comp = fc.make_composer(model, assets, image_size=S,
                            out_dilate_ks=int(opt.get("out_dilate_ks", 51)))
    from ipercore_tpu.trainers import resolve_trainer

    tspec = resolve_trainer(opt.get("train_name", "LWGTrainer"))
    aug_bg = bool(opt.get("aug_bg", tspec["aug_bg"]))
    gen = build_generator(opt.get("gen_name", tspec["default_gen"]), opt.Generator,
                          temporal=bool(opt.get("temporal", False)))
    dis = build_discriminator(opt.get("dis_name", "patch_global_body_head"),
                              opt.Discriminator, use_aug_bg=aug_bg)
    tr = opt.Train
    # `--use_vgg` picks VGG19/VGG16/VGG11 (`lwg_trainer.py:153`, vggloss
    # dispatch `vggloss.py:262-270`); `--face_loss_path` picks Sphere20a vs
    # SENet-50 by name (`faceloss.py:291-299`).
    vgg = C.build_vgg(str(tr.get("use_vgg", "VGG19")))
    vgg_params = C.init_vgg_params(
        jax.random.PRNGKey(1), S, weights_path=tr.get("vgg_loss_path"), net=vgg)
    face, face_params, face_hw = C.init_face_params(
        jax.random.PRNGKey(2), str(tr.get("face_loss_path", "sphere20a")))
    cfg = T.TrainConfig(
        lambda_rec=float(tr.lambda_rec), lambda_tsf=float(tr.lambda_tsf),
        lambda_face=float(tr.lambda_face), lambda_mask=float(tr.lambda_mask),
        lambda_mask_smooth=float(tr.lambda_mask_smooth),
        lambda_d_prob=float(tr.lambda_D_prob),
        lr_g=float(tr.lr_G), lr_d=float(tr.lr_D),
        use_face=bool(tr.use_face),
        face_hw=face_hw,
        aug_bg=aug_bg,
        temporal=bool(opt.get("temporal", False)),
        niters_no_decay=int(tr.get("niters_or_epochs_no_decay", 0)),
        niters_decay=int(tr.get("niters_or_epochs_decay", 0)),
        compute_dtype=str(tr.get("compute_dtype", "float32")),
        remat=bool(tr.get("remat", False)),
    )
    state = T.create_train_state(jax.random.PRNGKey(0), gen, dis, comp, cfg, ns=ns, nt=nt)

    # resume params + BOTH Adam states — `options_train.py:34-53` +
    # `trainers/base.py:76-117`
    ckpt_dir = checkpoints_dir(opt.output_dir, opt.model_id)
    start_iter, g_path = find_latest_iter(ckpt_dir, "G")
    if g_path:
        state = load_train_ckpt(ckpt_dir, start_iter, state)

    mesh = make_mesh("data")
    n_dev = mesh.devices.size
    step_fn = T.make_sharded_train_step(
        comp, gen, dis, vgg, vgg_params, face, face_params, cfg, mesh, ns=ns)

    ds = build_dataset(
        opt.get("dataset_mode", "ProcessedVideo"),
        dataset_dirs=list(opt.get("dataset_dirs", [])),
        image_size=S, num_source=ns, time_step=nt,
    )
    # held-out validation split (`val.txt` per dataset dir) — the role of
    # `Train._display_visualizer_val` (ref `train.py:210-237`)
    try:
        val_ds = build_dataset(
            opt.get("dataset_mode", "ProcessedVideo"),
            dataset_dirs=list(opt.get("dataset_dirs", [])),
            image_size=S, num_source=ns, time_step=nt, split="val",
        )
    except TypeError:
        val_ds = None
    eval_fn = None
    panel_fn = None
    val_it = None
    if val_ds is not None and len(val_ds) > 0:
        eval_fn = jax.jit(lambda st, b: T.eval_step(
            st, b, comp, gen, dis, vgg, vgg_params, face, face_params, cfg, ns=ns))
        # image panels on display cadence — the reference's TBVisualizer
        # image rows (`train.py:190-208`, `tb_visualizer.py:38-76`)
        panel_fn = jax.jit(lambda st, b: T.eval_step(
            st, b, comp, gen, dis, vgg, vgg_params, face, face_params, cfg,
            ns=ns, return_images=True))
        val_it = val_ds.iterate(batch_size=n_dev, seed=7)
    batch_size = max(int(opt.get("batch_size", 1)) * n_dev, n_dev)
    from ipercore_tpu.data.prefetch import prefetch

    # overlap host decode with the device step (ref: DataLoader workers)
    it = prefetch(ds.iterate(batch_size), depth=int(opt.get("prefetch_depth", 2)))

    logger = MetricsLogger(os.path.join(ckpt_dir, "train_log.jsonl"))
    total = max_iters if max_iters is not None else int(tr.get("total_iters", 400_000))
    save_every_s = float(tr.get("save_latest_freq_s", 300.0))
    print_every_s = float(tr.get("print_freq_s", 30.0))
    display_every_s = float(tr.get("display_freq_s", 300.0))
    last_save = last_print = last_display = time.time()

    # live babysitting dashboard (role of TensorBoardX/visdom,
    # `tb_visualizer.py:10-76`): --live_port N serves loss curves + panels
    dash = None
    live_port = int(opt.get("live_port", 0) or 0)
    if live_port:
        from ipercore_tpu.utils.live_dashboard import LiveDashboard

        dash = LiveDashboard(os.path.join(ckpt_dir, "train_log.jsonl"),
                             os.path.join(ckpt_dir, "panels"),
                             port=live_port).start()

    metrics = {}
    for i in range(int(state.step), total):
        batch = next(it)
        state, metrics = step_fn(state, {k: jnp.asarray(v) for k, v in batch.items()
                                         if k in ("images", "smpls", "masks", "bg")})
        now = time.time()
        if now - last_print > print_every_s:
            row = {k: float(v) for k, v in metrics.items()}
            if eval_fn is not None:
                vb = next(val_it)
                vm = eval_fn(state, {k: jnp.asarray(v) for k, v in vb.items()
                                     if k in ("images", "smpls", "masks", "bg")})
                row.update({k: float(v) for k, v in vm.items()})
            logger.log(step=i, **row)
            last_print = now
        if panel_fn is not None and now - last_display > display_every_s:
            from ipercore_tpu.utils.visualizer import save_train_panel

            vb = next(val_it)
            _, imgs = panel_fn(state, {k: jnp.asarray(v) for k, v in vb.items()
                                       if k in ("images", "smpls", "masks", "bg")})
            save_train_panel(
                os.path.join(ckpt_dir, "panels", f"panel_iter_{i:08d}.png"),
                {k: np.asarray(v) for k, v in imgs.items()})
            last_display = now
        if now - last_save > save_every_s:
            save_train_ckpt(ckpt_dir, i, jax.device_get(state.params_G),
                            jax.device_get(state.params_D),
                            opt_G=jax.device_get(state.opt_G),
                            opt_D=jax.device_get(state.opt_D))
            last_save = now

    save_train_ckpt(ckpt_dir, total, jax.device_get(state.params_G),
                    jax.device_get(state.params_D),
                    opt_G=jax.device_get(state.opt_G),
                    opt_D=jax.device_get(state.opt_D))
    if dash is not None:
        dash.stop()
    return {k: float(v) for k, v in metrics.items()}


def main(argv=None):  # pragma: no cover - CLI shim
    from ipercore_tpu.services.options import parse_args

    return train(parse_args(argv))


if __name__ == "__main__":  # pragma: no cover
    main()
