"""Pretrain the LWG generator on procedural multi-pose identities.

The reference ships a published AttLWB-SPADE checkpoint (400k iters on iPER,
`assets/download.sh`) that personalization fine-tunes from
(`lwg_trainer.py:95-102`). This environment has no network and no iPER data,
so this script produces the in-repo equivalent: the full LWGAugBG training
step (G+D, all losses, aug-bg branch) over procedural *identities* rendered
on-device — one identity = fixed SMPL shape + a pose-consistent procedural
texture (per-vertex colors + part tint, both functions of the surface, so
appearance follows the body across poses exactly like a real person's
clothing) + a fixed background plate; frames = that identity under random
poses/views. The generator must read appearance from the source frames and
warp it through Tst to the target pose — precisely the LWB task.

Weights land in `assets/lwg_pretrained_G.npz` (f16), which
`services.personalization.load_pretrained_generator` picks up as the default
pretrained G. Domain: procedural renders, not photographs — personalization
adapts it to the actual subject, exactly as the reference fine-tunes its
published checkpoint.

Usage: python scripts/train_lwg_pretrain.py [--steps 20000] [--batch 2]
       [--size 256] [--resume]
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20000)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--ns", type=int, default=2)
    ap.add_argument("--nt", type=int, default=2)
    ap.add_argument("--save_every", type=int, default=2000)
    ap.add_argument("--ckpt_dir", type=str,
                    default=os.path.join(REPO, ".cache", "lwg_pretrain"))
    ap.add_argument("--out", type=str,
                    default=os.path.join(REPO, "assets", "lwg_pretrained_G.npz"))
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--recipe", choices=("v1", "v2"), default="v2",
                    help="v2 (round 4, VERDICT r3 Missing#5): 60% of "
                         "identities wear realistic muted garments "
                         "(pose-consistent per-identity garment tables), "
                         "photo-statistics/studio background plates with "
                         "camera-pipeline augmentation applied per identity "
                         "(so the BGNet supervision target matches); v1 "
                         "reproduces the round-2 procedural recipe")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(REPO, ".cache", "jax_compilation")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ipercore_tpu.models import smpl as smpl_mod
    from ipercore_tpu.models import flow_composition as fc
    from ipercore_tpu.models.mesh import load_assets
    from ipercore_tpu.models.networks import build_generator, build_discriminator
    from ipercore_tpu.models.networks import criterions as C
    from ipercore_tpu.ops import rasterizer as rz
    from ipercore_tpu.tools import synth_data as sd
    from ipercore_tpu.trainers import lwg_trainer as T
    from ipercore_tpu.utils.checkpoint import (
        find_latest_iter, load_train_ckpt, save_params, save_train_ckpt)
    from ipercore_tpu.utils.visualizer import save_train_panel

    if args.smoke:
        args.steps, args.batch, args.save_every = 3, 1, 10
        args.size = min(args.size, 64)
        if args.out.startswith(os.path.join(REPO, "assets")):
            args.out = "/tmp/lwg_pretrained_smoke.npz"  # never clobber shipped weights

    B, S, ns, nt = args.batch, args.size, args.ns, args.nt
    F = ns + nt
    model = smpl_mod.template_model()
    assets = load_assets(model)
    V = model.v_template.shape[0]
    faces = jnp.asarray(model.faces)  # (Fc, 3)

    v2 = args.recipe == "v2"

    def make_identity_batch(key):
        """One training batch: B identities x (ns src + nt tgt) frames."""
        kth, kvc, kM, kbg, kaug, kn, kg, kgu, kst, ksu, kpa, kpb = \
            jax.random.split(key, 12)
        theta = sd.make_theta(kth, B * F).reshape(B, F, 85)
        # identity = shared shape across the sample's frames
        theta = theta.at[:, :, 75:85].set(theta[:, 0:1, 75:85])
        flat = theta.reshape(B * F, 85)
        details = smpl_mod.get_details(model, flat)
        fim = sd.render_fim(model, flat, S * 2, f2uvs=assets.f2uvs,
                            details=details)  # (B*F, 2S, 2S) face ids, -1 bg
        alpha = sd._downsample2((fim >= 0).astype(jnp.float32)[..., None])
        cond = sd._downsample2(rz.encode_fim(fim, assets.map_fn))

        # pose-consistent identity texture: smooth per-vertex random colors
        # (averaged to faces -> surface-smooth) + a per-identity part tint
        vcol = jax.random.uniform(kvc, (B, V, 3), minval=-1.0, maxval=1.0)
        fcol = jnp.mean(vcol[:, faces], axis=2)  # (B, Fc, 3)
        fcol_pf = jnp.repeat(fcol, F, axis=0)  # (B*F, Fc, 3)
        fcol_hi = jnp.where(
            (fim >= 0)[..., None],
            jax.vmap(lambda c, f: c[jnp.maximum(f, 0)])(fcol_pf, fim),
            0.0)
        fcol_ds = sd._downsample2(fcol_hi)
        M = jax.random.uniform(kM, (B, 3, 3), minval=-1, maxval=1)
        Mf = jnp.repeat(M, F, axis=0)
        tex = jnp.tanh(0.8 * jnp.einsum("bhwc,bcd->bhwd", cond, Mf)
                       + 1.2 * fcol_ds)

        if v2:
            # 60% of identities wear realistic muted garments: ONE garment
            # color table per identity (indexed by face id, so appearance
            # follows the body across that identity's frames exactly like
            # the vcol texture) — the person-seg v7 ingredient applied to
            # the generator prior (VERDICT r3 Missing#5)
            tables = sd.garment_tables(kg, B, assets.face_parts)
            tables_pf = jnp.repeat(tables, F, axis=0)  # (B*F, Fc, 3)
            garm_hi = jnp.where(
                (fim >= 0)[..., None],
                jax.vmap(lambda f, t: rz.encode_fim(f[None], t)[0])(
                    fim, tables_pf),
                0.0)
            garm = sd._downsample2(garm_hi)
            shade = 1.0 + 0.15 * sd.fractal_noise(kgu, B * F, S, 1)
            ramp = 1.0 - 0.2 * jnp.linspace(0, 1, S)[None, :, None, None]
            garm = jnp.clip(garm * shade * ramp, -1, 1)
            use_garm = jax.random.bernoulli(
                kgu, 0.6, (B, 1, 1, 1)).astype(jnp.float32)
            tex = (tex * (1 - jnp.repeat(use_garm, F, axis=0))
                   + garm * jnp.repeat(use_garm, F, axis=0))

            # photo-statistics background plates, camera-pipeline augmented
            # per IDENTITY so the BGNet supervision target stays consistent
            # with every frame's composite
            bg = sd.synth_background_mix(kbg, B, S)
            studio = sd.synth_background_studio(kst, B, S)
            use_st = jax.random.bernoulli(
                ksu, 0.35, (B, 1, 1, 1)).astype(jnp.float32)
            bg = bg * (1 - use_st) + studio * use_st
            bg = sd.photo_augment(kpa, bg, strength=0.6)
            aug_bg = sd.photo_augment(
                kpb, sd.synth_background_mix(kaug, B, S), strength=0.6)
        else:
            bg = sd.synth_background(kbg, B, S)  # one plate per identity
            aug_bg = sd.synth_background(kaug, B, S)
        bgf = jnp.repeat(bg, F, axis=0)
        img = tex * alpha + bgf * (1.0 - alpha)
        img = jnp.clip(img + 0.02 * jax.random.normal(kn, img.shape), -1, 1)

        masks = 1.0 - (alpha > 0.5).astype(jnp.float32)  # background=1
        return {
            "images": img.reshape(B, F, S, S, 3),
            "smpls": theta,
            "masks": masks.reshape(B, F, S, S, 1),
            "bg": bg,
            "aug_bg": aug_bg,
        }

    comp = fc.make_composer(model, assets, image_size=S, out_dilate_ks=51)
    gen = build_generator("AttLWB-SPADE", {
        "BGNet": {"num_filters": [64, 128, 128, 256], "n_res_block": 6},
        "SIDNet": {"num_filters": [64, 128, 256], "n_res_block": 6},
        "TSFNet": {"num_filters": [64, 128, 256], "n_res_block": 6},
    })
    dis = build_discriminator("patch_global_body_head",
                              {"ndf": 64, "n_layers": 4, "max_nf_mult": 8})
    vgg = C.VGGFeatures()
    vgg_params = C.init_vgg_params(jax.random.PRNGKey(1), S)
    face = C.SphereFaceFeatures()
    face_params = jax.jit(face.init)(jax.random.PRNGKey(2),
                                     jnp.zeros((1, 112, 96, 3)))

    cfg = T.TrainConfig(aug_bg=True, compute_dtype="bfloat16",
                        remat=(S >= 512))
    state = T.create_train_state(jax.random.PRNGKey(0), gen, dis, comp, cfg,
                                 ns=ns, nt=nt)
    start = 0
    if args.resume:
        it, path = find_latest_iter(args.ckpt_dir, "G")
        if path is not None:
            state = load_train_ckpt(args.ckpt_dir, it, state)
            start = it
            print(f"resumed from {args.ckpt_dir} iter {it}", flush=True)

    batch_fn = jax.jit(make_identity_batch)
    step_fn = jax.jit(functools.partial(
        T.train_step, comp=comp, generator=gen, discriminator=dis,
        vgg=vgg, vgg_params=vgg_params, face=face, face_params=face_params,
        cfg=cfg, ns=ns))

    def save_final(params_G):
        f16 = jax.tree_util.tree_map(
            lambda v: np.asarray(v, np.float16)
            if np.asarray(v).dtype == np.float32 else np.asarray(v), params_G)
        save_params(args.out, f16)

    key = jax.random.PRNGKey(1234 + start)
    t0 = time.perf_counter()
    for it in range(start, args.steps):
        key, sub = jax.random.split(key)
        state, metrics = step_fn(state, batch_fn(sub))
        if it % max(args.steps // 50, 1) == 0 or it == args.steps - 1:
            m = {k: round(float(v), 4) for k, v in metrics.items()}
            print(json.dumps({"step": it, **m}), flush=True)
        if (it + 1) % args.save_every == 0 or it == args.steps - 1:
            save_train_ckpt(args.ckpt_dir, it + 1, state.params_G,
                            state.params_D, state.opt_G, state.opt_D)
            save_final(state.params_G)

    # holdout: a fresh identity; SSIM/L1 of synthesized targets vs GT renders
    hb = batch_fn(jax.random.PRNGKey(9999))
    ev, imgs = jax.jit(functools.partial(
        T.eval_step, comp=comp, generator=gen, discriminator=dis,
        vgg=vgg, vgg_params=vgg_params, face=face, face_params=face_params,
        cfg=cfg, ns=ns, return_images=True))(state, hb)
    from ipercore_tpu.services.evaluate import ssim

    gt = np.asarray(hb["images"][:, ns])
    pred = np.asarray(imgs["fake_tsf"], np.float32)
    s = float(np.mean(ssim(pred, gt)))
    l1 = float(np.abs(pred - gt).mean())
    panel = os.path.join(args.ckpt_dir, "holdout_panel.png")
    save_train_panel(panel, {"src": np.asarray(imgs["src"]),
                             "ref": gt, "fake": pred,
                             "fake_bg": np.asarray(imgs["fake_bg"])})
    save_final(state.params_G)
    print(json.dumps({"metric": "lwg_pretrain_holdout", "ssim": round(s, 4),
                      "l1": round(l1, 4),
                      "val_g_total": round(float(ev["val_g_total"]), 4),
                      "steps": args.steps, "size": S,
                      "train_s": round(time.perf_counter() - t0, 1),
                      "panel": panel, "out": args.out}), flush=True)


if __name__ == "__main__":
    main()
