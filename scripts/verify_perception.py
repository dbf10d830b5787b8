"""End-to-end verification of the trained perception stack against exact GT.

Synthesizes a short video the same way `tools/synth_data.py` builds training
scenes (one person, fixed shape/texture, smoothly interpolated pose over a
fixed procedural background — all labels exact by construction) and then runs
the PRODUCTION preprocessing components over the rendered frames:

  * SPINRunner (+ optional OpenPose -> SMPLify refinement, exactly as
    preprocessing stage 1.3 wires them),
  * HumanMattor (stage 1.4, silhouette-banded),
  * SuperResolutionInpaintor (stage 1.6) on the median-visible background.

Reports recovery errors vs ground truth as one JSON line:
  j2d_px_256   — mean projected-joint error of the recovered thetas (px@256)
  j2d_px_256_spin — same before SMPLify refinement
  mask_iou     — person mask IoU
  bg_l1        — inpainted background L1 vs the true plate ([-1,1] units)

Usage: python scripts/verify_perception.py [--frames 8] [--size 256]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--no_smplify", action="store_true")
    ap.add_argument("--seed", type=int, default=9)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(REPO, ".cache", "jax_compilation")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ipercore_tpu.models import smpl as smpl_mod
    from ipercore_tpu.models.mesh import load_assets
    from ipercore_tpu.ops import rasterizer as rz
    from ipercore_tpu.tools import synth_data as sd

    model = smpl_mod.template_model()
    assets = load_assets(model)
    T, S = args.frames, args.size
    key = jax.random.PRNGKey(args.seed)
    k1, k2, k3, k4 = jax.random.split(key, 4)

    # one person: fixed shape/texture/background, pose interpolated A -> B
    thetas = sd.make_theta(k1, 2, pose_std=0.25, yaw=False)
    a, b = thetas[0], thetas[1]
    w = jnp.linspace(0.0, 1.0, T)[:, None]
    theta_gt = a[None] * (1 - w) + b[None] * w  # (T, 85)
    theta_gt = theta_gt.at[:, 75:85].set(a[75:85])  # constant shape

    details = smpl_mod.get_details(model, theta_gt)
    fim = sd.render_fim(model, theta_gt, S * 2, f2uvs=assets.f2uvs,
                        details=details)
    alpha = sd._downsample2((fim >= 0).astype(jnp.float32)[..., None])
    cond = sd._downsample2(rz.encode_fim(fim, assets.map_fn))
    bg = jnp.broadcast_to(sd.synth_background(k2, 1, S), (T, S, S, 3))
    M = jax.random.uniform(k3, (1, 3, 3), minval=-1, maxval=1)
    tex = jnp.tanh(jnp.einsum("bhwc,bcd->bhwd", cond,
                              jnp.broadcast_to(M, (T, 3, 3))))
    img = tex * alpha + bg * (1.0 - alpha)
    img = jnp.clip(img + 0.05 * jax.random.normal(k4, img.shape), -1, 1)
    frames = np.asarray(img)
    j2d_gt = details["j2d"]

    t0 = time.perf_counter()

    # --- stage 1.3: SPIN (+ SMPLify), production wiring -------------------
    from ipercore_tpu.tools.pose3d import SPINRunner, smplify_refine

    spin = SPINRunner()
    spin_in = np.asarray(jax.image.resize(img, (T, 224, 224, 3), "linear"))
    theta_spin = spin.run(spin_in)

    def j2d_err(theta):
        d = smpl_mod.get_details(model, jnp.asarray(theta))
        e = jnp.linalg.norm(d["j2d"] - j2d_gt, axis=-1)
        return float(jnp.mean(e)) * (S / 2)

    result = {"metric": "perception_stack_recovery", "frames": T, "size": S,
              "spin_trained": spin.trained,
              "j2d_px_256_spin": round(j2d_err(theta_spin), 2)}

    theta_rec = theta_spin
    if not args.no_smplify:
        from ipercore_tpu.tools.pose2d import OpenPoseRunner, body25_to_cocoplus

        op = OpenPoseRunner()
        result["openpose_trained"] = op.trained
        if op.trained:
            kps, scores, valid = op.run_tracked(spin_in)
            kps19, conf19 = body25_to_cocoplus(kps, scores * valid)
            theta_rec = np.asarray(smplify_refine(
                model, jnp.asarray(theta_spin), jnp.asarray(kps19),
                jnp.asarray(conf19)))
            result["j2d_px_256"] = round(j2d_err(theta_rec), 2)
            # openpose's own decode error vs GT (mapped joints, px@224)
            b25_gt, valid25 = sd.body25_from_cocoplus(
                smpl_mod.get_details(model, theta_gt)["j2d"])
            err = np.linalg.norm(kps - np.asarray(b25_gt), axis=-1) * (224 / 2)
            result["openpose_px_224"] = round(
                float((err * valid25[None]).sum() / (valid25.sum() * T)), 2)

    # --- stage 1.4: matting ----------------------------------------------
    from ipercore_tpu.tools.mattors import HumanMattor

    d_rec = smpl_mod.get_details(model, jnp.asarray(theta_rec))
    proj = rz.project_verts(d_rec["verts"], d_rec["cam"])
    fv = rz.verts_to_faces(proj, model.faces)
    _, fim_rec, _ = rz.render_fim_wim(d_rec["verts"], d_rec["cam"], model.faces, S)
    sil = np.asarray(fim_rec >= 0)[..., None].astype(np.float32)
    mat = HumanMattor(image_size=S)
    result["mattor_trained"] = mat.trained
    m_alpha, m_mask = mat.run(frames, fallback_mask=sil)
    gt_mask = np.asarray(alpha > 0.5).astype(np.float32)
    inter = (m_mask * gt_mask).sum()
    union = np.maximum(m_mask, gt_mask).sum()
    result["mask_iou"] = round(float(inter / union), 4)

    # --- stage 1.6: background inpaint ------------------------------------
    from ipercore_tpu.tools.inpaintors import build_background_inpaintors

    inp = build_background_inpaintors(control_size=min(S, 256))
    result["inpaintor_trained"] = inp.trained
    vis = 1.0 - m_mask
    acc = (frames * vis).sum(0) / np.maximum(vis.sum(0), 1e-5)
    hole = (vis.sum(0) < 0.5).astype(np.float32)
    bg_rec = inp.run_inpainting(acc, hole)
    result["bg_l1"] = round(float(np.abs(bg_rec - np.asarray(bg[0])).mean()), 4)

    # --- ESRGAN 4x SR (when trained): PSNR vs bilinear on the GT plate -----
    if inp.sr_trained:
        lo = jax.lax.reduce_window(
            (bg[:1] + 1) * 0.5, 0.0, jax.lax.add, (1, 4, 4, 1), (1, 4, 4, 1),
            "VALID") / 16.0
        hi = jnp.clip(inp._sr(inp.sr_params, lo), 0, 1) * 2 - 1
        bil = jax.image.resize(lo * 2 - 1, bg[:1].shape, "bilinear")

        def _psnr(x):
            return round(float(-10 * jnp.log10(jnp.mean((x - bg[:1]) ** 2 / 4)
                                               + 1e-12)), 2)

        result["sr_psnr"] = _psnr(hi)
        result["sr_psnr_bilinear"] = _psnr(bil)

    # --- SCHP parser (when trained): LIP body-mask IoU ---------------------
    from ipercore_tpu.tools.parsers import build_parser

    parser = build_parser(None)
    result["schp_trained"] = parser is not None
    if parser is not None:
        ok, body_masks = parser.run(frames[:4], "body")
        if ok and body_masks:
            bm = np.stack(body_masks)[..., None].astype(np.float32)
            gm = gt_mask[:4]
            result["schp_body_iou"] = round(
                float((bm * gm).sum() / np.maximum(np.maximum(bm, gm).sum(), 1)), 4)
        ok_sd, _ = parser.run(frames[:4], "skirt+dress")
        result["schp_false_skirt"] = bool(ok_sd)  # no skirt in these scenes

    # --- Mobilenet pose (when trained): decode error like openpose ---------
    from ipercore_tpu.tools.pose2d_mobilenet import MobilenetOpenPoseRunner

    mob = MobilenetOpenPoseRunner(input_size=224)
    result["mobilenet_trained"] = mob.trained
    if mob.trained:
        mk, ms, mv = mob.run(spin_in)
        b25_gt, valid25 = sd.body25_from_cocoplus(
            smpl_mod.get_details(model, theta_gt)["j2d"])
        v = valid25.copy()
        v[19:] = 0  # mobilenet has no toe/heel channels
        v[8] = 0    # synthesized mid-hip is derived, not decoded
        err = np.linalg.norm(mk - np.asarray(b25_gt), axis=-1) * (224 / 2)
        result["mobilenet_px_224"] = round(
            float((err * v[None]).sum() / (v.sum() * T)), 2)

    result["wall_s"] = round(time.perf_counter() - t0, 1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
