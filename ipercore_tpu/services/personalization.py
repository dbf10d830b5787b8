"""Personalization: fine-tune the generator on the source person.

Rebuilds `iPERCore/services/personalization.py` (PersonalizerProcess:36,
personalize:165). The reference spawns a child process to free GPU memory;
XLA buffers are freed when arrays are deleted, so this runs in-process: build
the LWG train state from the pretrained generator, loop jitted train steps
over the personalized dataset, save `personalized.npz`. Skips when the
checkpoint already exists (`personalization.py:179`).
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ipercore_tpu.services.meta_info import MetaProcess, parse_src_input, checkpoints_dir
from ipercore_tpu.services.process_info import ProcessInfo
from ipercore_tpu.utils import video as vid
from ipercore_tpu.utils.checkpoint import load_params, save_params


def load_pretrained_generator(opt, params_like):
    """Initialize G from a published/pretrained checkpoint before fine-tuning
    — ref `lwg_trainer.py:95-102` loads the released AttLWB-SPADE weights
    (round 1 always started from random init, so personalization could never
    produce a real video).

    Priority: `opt.load_path_G` (ours .npz, or a torch .pth converted via
    `convert_generator`), then `<output_dir>/models/pretrains/AttLWB-SPADE_G.npz`.
    Returns params or None when no checkpoint is available.
    """
    candidates = [
        str(opt.get("load_path_G", "") or ""),
        os.path.join(opt.output_dir, "models", "pretrains", "AttLWB-SPADE_G.npz"),
        # repo-shipped pretrain (scripts/train_lwg_pretrain.py on procedural
        # identities) — the no-network stand-in for the published checkpoint
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), "assets", "lwg_pretrained_G.npz"),
    ]
    def shapes_match(loaded):
        import jax

        ok = [True]

        def chk(a, b):
            if getattr(a, "shape", None) != getattr(b, "shape", None):
                ok[0] = False

        try:
            jax.tree_util.tree_map(chk, loaded, params_like)
        except Exception:
            return False
        return ok[0]

    for p in candidates:
        if not p or not os.path.exists(p):
            continue
        if p.endswith(".npz"):
            try:
                out = load_params(p, like=params_like)
            except Exception as e:  # missing keys / different arch family
                print(f"[personalize] skip incompatible pretrain {p}: {e}")
                continue
            if not shapes_match(out):
                # a full-size shipped pretrain cannot seed a differently
                # configured G (e.g. the tiny test nets) — fall through
                print(f"[personalize] skip shape-mismatched pretrain {p}")
                continue
            return out
        if p.endswith((".pth", ".pt")):
            import torch

            from ipercore_tpu.utils.torch_convert import convert_generator

            sd = torch.load(p, map_location="cpu")
            if isinstance(sd, dict) and "state_dict" in sd:
                sd = sd["state_dict"]
            out, report = convert_generator(sd, params_like)
            if report:
                print(f"[personalize] {p}: {len(report)} unconverted entries")
            return out
    return None


def make_personalized_batches(opt, src_meta, rng: np.random.RandomState, n_iters: int):
    """Yield training batches from the subject's processed frames —
    `PersonalizedDataset` (`data/personalized_dataset.py:13-191`): sources are
    the fixed front/back ids, targets random frames, pseudo-bg from the
    inpainted background."""
    proc_dir = MetaProcess(src_meta.name, opt.output_dir).processed_dir
    info = ProcessInfo.deserialize(proc_dir)
    S = int(opt.image_size)
    ns = int(opt.num_source)
    nt = int(opt.get("time_step", 1))

    src = info.read_src_info(num_source=ns)
    smpls = np.asarray(info.get_array("smpls"), np.float32)
    n = len(smpls)
    img_dir = os.path.join(proc_dir, "images")
    names = info.meta["valid_img_names"]
    masks_arr = info.get_array("masks")

    def load(i):
        return vid.load_image(os.path.join(img_dir, names[i]), size=S)

    src_ids = src["src_ids"]
    src_imgs = np.stack([load(i) for i in src_ids])
    bg_path = os.path.join(proc_dir, "background.png")
    if os.path.exists(bg_path):
        bg = vid.load_image(bg_path, size=S)
    else:
        bg = np.zeros((S, S, 3), np.float32)

    for _ in range(n_iters):
        tgt_ids = rng.randint(0, n, size=nt)
        imgs = np.concatenate([src_imgs, np.stack([load(i) for i in tgt_ids])])[None]
        ids = list(src_ids) + list(tgt_ids)
        batch_smpls = smpls[ids][None]
        if masks_arr is not None:
            m = masks_arr[ids].astype(np.float32)
            if m.ndim == 3:
                m = m[..., None]
            masks = m[None]
        else:
            masks = np.ones((1, ns + nt, S, S, 1), np.float32)
        yield {
            "images": imgs.astype(np.float32),
            "smpls": batch_smpls.astype(np.float32),
            "masks": masks,
            "bg": bg[None],
        }


def personalize(opt) -> str:
    """Fine-tune G for each source subject — `personalize:165`."""
    import jax
    import jax.numpy as jnp

    ckpt_dir = checkpoints_dir(opt.output_dir, opt.model_id)
    out_path = os.path.join(ckpt_dir, "personalized.npz")
    if os.path.exists(out_path):
        return out_path  # skip — `personalization.py:179`

    from ipercore_tpu.models import smpl as smpl_mod
    from ipercore_tpu.models import flow_composition as fc
    from ipercore_tpu.models.mesh import load_assets
    from ipercore_tpu.models.networks import build_generator, build_discriminator
    from ipercore_tpu.models.networks import criterions as C
    from ipercore_tpu.trainers import lwg_trainer as T

    model = smpl_mod.resolve_body_model(opt)
    if opt.get("smoke_model", False):
        assets = load_assets(model, uv_map_path="/nonexistent", part_path="/nonexistent")
    else:
        assets = load_assets(model)
    S = int(opt.image_size)
    comp = fc.make_composer(model, assets, image_size=S,
                            out_dilate_ks=int(opt.get("out_dilate_ks", 51)))
    gen = build_generator(opt.get("gen_name", "AttLWB-SPADE"), opt.Generator)
    dis = build_discriminator(opt.get("dis_name", "patch_global"), opt.Discriminator)
    vgg = C.VGGFeatures()
    vgg_params = C.init_vgg_params(jax.random.PRNGKey(1), S)
    tr = opt.Train
    # auto-loads assets/faceloss.npz when shipped (trained identity
    # features; `faceloss.py:291-311` — the reference always runs
    # pretrained features here)
    face, face_params, _face_hw = C.init_face_params(
        jax.random.PRNGKey(2), str(tr.get("face_loss_path", "sphere20a")))
    cfg = T.TrainConfig(
        lambda_rec=float(tr.lambda_rec), lambda_tsf=float(tr.lambda_tsf),
        lambda_face=float(tr.lambda_face), lambda_mask=float(tr.lambda_mask),
        lambda_mask_smooth=float(tr.lambda_mask_smooth),
        lambda_d_prob=float(tr.lambda_D_prob),
        lr_g=float(tr.lr_G), lr_d=float(tr.lr_D), use_face=bool(tr.use_face),
    )
    ns = int(opt.num_source)
    nt = int(opt.get("time_step", 1))
    state = T.create_train_state(jax.random.PRNGKey(0), gen, dis, comp, cfg, ns=ns, nt=nt)
    pretrained = load_pretrained_generator(opt, state.params_G)
    if pretrained is not None:
        state = state._replace(params_G=pretrained)

    import functools

    step = jax.jit(functools.partial(
        T.train_step, comp=comp, generator=gen, discriminator=dis,
        vgg=vgg, vgg_params=vgg_params, face=face, face_params=face_params,
        cfg=cfg, ns=ns))

    n_iters = int(tr.get("niters_or_epochs_no_decay", 100)) + int(
        tr.get("niters_or_epochs_decay", 0))
    rng = np.random.RandomState(0)
    src_metas = parse_src_input(opt.src_path)
    for src_meta in src_metas:
        for batch in make_personalized_batches(opt, src_meta, rng, n_iters):
            state, metrics = step(state, {k: jnp.asarray(v) for k, v in batch.items()})

    save_params(out_path, jax.device_get(state.params_G))
    return out_path
