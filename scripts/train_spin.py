"""Train the SPIN pose regressor on procedural SMPL renders.

The reference downloads the pretrained SPIN checkpoint
(`spin_ckpt.pth`, `assets/download.sh`); this environment has no network, so
the BatchNorm-exact `SPINNet` ran untrained. This script trains it for real
on labeled scenes synthesized on-device (`tools/synth_data.py`): every render
carries exact theta = (cam, pose, shape) and projected joints, so the loss is
direct parameter supervision plus joint reprojection:

  L = |R_pred - R_gt|^2 (24 rotmats)  +  w_beta |beta|^2 err
      + w_cam |cam|^2 err  +  w_j2d |j2d|^2 err (through the full LBS)

BatchNorm statistics stay frozen at identity (the layout is the torch
checkpoint conversion target — `spin/network.py:30-90`); their updates are
masked out so `var` cannot go negative. Weights land in `assets/spin.npz`
(f16) and auto-load in `tools.pose3d.SPINRunner`, upgrading preprocessing
stage 1.3 from random filters to a trained regressor. Domain: rendered
humans over procedural backgrounds — not photographs; see docs/PARITY.md.

Usage: python scripts/train_spin.py [--steps 4000] [--batch 16]
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
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--scene_size", type=int, default=256)
    ap.add_argument("--out", type=str, default=os.path.join(REPO, "assets", "spin.npz"))
    ap.add_argument("--resume", action="store_true",
                    help="initialize from an existing --out checkpoint")
    ap.add_argument("--studio_frac", type=float, default=0.35,
                    help="fraction of studio/stage backgrounds (v7 sim2real)")
    ap.add_argument("--garment_frac", type=float, default=0.5,
                    help="fraction of realistic muted garment textures (v7)")
    ap.add_argument("--natural_frac", type=float, default=0.65,
                    help="fraction of natural-stance poses (arms down / "
                         "walking — synth_data.natural_pose, round-4 "
                         "sim2real fix)")
    ap.add_argument("--save_every", type=int, default=250,
                    help="real-probe checkpoint-selection cadence in steps")
    ap.add_argument("--pseudo", type=str, default="",
                    help="npz of chain-distilled (crop, theta) pairs from "
                         "scripts/pseudo_label_theta.py; mixed into every "
                         "batch (direct sim2real training stalls at chance "
                         "on real probes — r5; the chain's SMPLify output "
                         "is the only real-domain supervision available)")
    ap.add_argument("--real_frac", type=float, default=0.375,
                    help="fraction of each batch drawn from --pseudo")
    ap.add_argument("--smoke", action="store_true", help="tiny run (CI)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    cache_dir = os.path.join(REPO, ".cache", "jax_compilation")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ipercore_tpu.models import smpl as smpl_mod
    from ipercore_tpu.models.mesh import load_assets
    from ipercore_tpu.ops.rotations import rodrigues
    from ipercore_tpu.tools import synth_data as sd
    from ipercore_tpu.tools.pose3d import HMR_IMG_SIZE, SPINNet
    from ipercore_tpu.utils.checkpoint import load_params, save_params

    if args.smoke and args.out.startswith(os.path.join(REPO, "assets")):
        args.out = "/tmp/" + os.path.basename(args.out).replace(".npz", "_smoke.npz")  # never clobber shipped weights

    if args.smoke:
        args.steps, args.batch, args.scene_size = 8, 2, 64
        model = smpl_mod.synthetic_model(nu=16, nv=14)
        assets = load_assets(model, uv_map_path="/nonexistent", part_path="/nonexistent")
    else:
        model = smpl_mod.template_model()
        assets = load_assets(model)
    B, S = args.batch, args.scene_size

    mean = jnp.asarray([0.485, 0.456, 0.406])
    std = jnp.asarray([0.229, 0.224, 0.225])

    # chain-distilled real supervision (scripts/pseudo_label_theta.py)
    pseudo = None
    Bs = B
    if args.pseudo and not args.smoke:
        d = np.load(args.pseudo, allow_pickle=True)
        pc = jnp.asarray(np.asarray(d["crops"], np.float32))
        if pc.shape[1] != HMR_IMG_SIZE:
            pc = jax.image.resize(
                pc, (pc.shape[0], HMR_IMG_SIZE, HMR_IMG_SIZE, 3), "linear")
        pseudo = {"crops": pc, "theta": jnp.asarray(d["theta"])}
        Br = min(max(int(round(args.real_frac * B)), 1), B - 1)
        Bs = B - Br
        print(f"pseudo pool: {pc.shape[0]} real (crop, theta) pairs; "
              f"{Bs} synth + {Br} real per batch", flush=True)

    def synth_batch(key, batch):
        sb = sd.compose_scene(key, model, assets, batch=batch, size=S,
                              studio_frac=args.studio_frac,
                              garment_frac=args.garment_frac,
                              natural_frac=args.natural_frac)
        x = jax.image.resize(sb.img, (batch, HMR_IMG_SIZE, HMR_IMG_SIZE, 3),
                             "linear")
        x = ((x + 1.0) * 0.5 - mean) / std  # SPINRunner.run preprocessing
        return x, sb.theta, sb.j2d

    def real_batch(key):
        """Augmented real crops + chain thetas. Shift augmentation moves the
        weak-perspective camera consistently: j2d = s*(x+t), so a pixel
        shift of delta NDC is t += delta/s."""
        kk = jax.random.split(key, 4)
        idx = jax.random.randint(kk[0], (Br,), 0, pseudo["crops"].shape[0])
        x = pseudo["crops"][idx]
        th = pseudo["theta"][idx]
        shift = jax.random.randint(kk[1], (Br, 2), -HMR_IMG_SIZE // 14,
                                   HMR_IMG_SIZE // 14 + 1)
        x = jax.vmap(lambda im, s_: jnp.roll(im, s_, axis=(0, 1)))(x, shift)
        delta = 2.0 * shift[:, ::-1].astype(jnp.float32) / HMR_IMG_SIZE
        th = th.at[:, 1:3].add(delta / th[:, 0:1])
        gain = jax.random.uniform(kk[2], (Br, 1, 1, 3), minval=0.75, maxval=1.25)
        bias = jax.random.uniform(kk[3], (Br, 1, 1, 3), minval=-0.12, maxval=0.12)
        x = jnp.clip(x * gain + bias, -1, 1)
        x = ((x + 1.0) * 0.5 - mean) / std
        # labels' j2d through the same LBS the loss uses
        det = smpl_mod.get_details(model, th)
        return x, th, det["j2d"]

    if pseudo is None:
        def make_batch(key):
            return synth_batch(key, B)
    else:
        def make_batch(key):
            k0, k1 = jax.random.split(key)
            xs_, ts_, js_ = synth_batch(k0, Bs)
            xr_, tr_, jr_ = real_batch(k1)
            return (jnp.concatenate([xs_, xr_]), jnp.concatenate([ts_, tr_]),
                    jnp.concatenate([js_, jr_]))

    net = SPINNet()
    params = jax.jit(net.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, HMR_IMG_SIZE, HMR_IMG_SIZE, 3)))
    if args.resume and os.path.exists(args.out):
        params = load_params(args.out, like=params)
        print(f"resumed from {args.out}", flush=True)

    # freeze BatchNorm statistics: identity stats are the training-time norm
    # (weight-conversion layout preserved); Adam updates masked to zero so
    # `var` cannot drift negative under optimization.
    def is_stat(path):
        return path[-1].key in ("mean", "var")

    mask = jax.tree_util.tree_map_with_path(lambda p, _: not is_stat(p), params)
    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.masked(optax.adam(args.lr), mask),
    )
    opt_state = tx.init(params)

    W_BETA, W_CAM, W_J2D = 0.2, 5.0, 2.0

    def loss_fn(params, x, theta_gt, j2d_gt):
        pose6d, shape, cam = net.apply(params, x)
        from ipercore_tpu.ops.rotations import rot6d_to_rotmat

        R_pred = rot6d_to_rotmat(pose6d.reshape(B, 24, 6))
        R_gt = rodrigues(theta_gt[:, 3:75].reshape(B, 24, 3))
        l_rot = jnp.mean((R_pred - R_gt) ** 2)
        l_beta = jnp.mean((shape - theta_gt[:, 75:85]) ** 2)
        l_cam = jnp.mean((cam - theta_gt[:, 0:3]) ** 2)
        # joints through the rotmat LBS entry point: the axis-angle
        # round-trip's gradient is singular at theta -> 0 (NaNs once
        # predictions sharpen)
        verts = jax.vmap(lambda sh, R: smpl_mod.lbs_from_rot(model, sh, R)[0])(
            shape, R_pred)
        j3d = jnp.einsum("kv,nvd->nkd", model.joint_regressor, verts)
        j2d_pred = smpl_mod.batch_orth_proj_idrot(j3d, cam)
        l_j2d = jnp.mean((j2d_pred - j2d_gt) ** 2)
        loss = l_rot + W_BETA * l_beta + W_CAM * l_cam + W_J2D * l_j2d
        px = jnp.mean(jnp.linalg.norm(j2d_pred - j2d_gt, axis=-1)) * (HMR_IMG_SIZE / 2)
        return loss, {"rot": l_rot, "beta": l_beta, "cam": l_cam,
                      "j2d_px": px}

    @jax.jit
    def train_step(params, opt_state, key):
        x, theta_gt, j2d_gt = make_batch(key)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, x, theta_gt, j2d_gt)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, aux

    def save(params):
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        f16 = jax.tree_util.tree_map(
            lambda v: np.asarray(v, np.float16)
            if np.asarray(v).dtype == np.float32 else np.asarray(v), params)
        save_params(args.out, f16)

    # REAL-PROBE CHECKPOINT SELECTION: reprojection PCK@0.1 of the predicted
    # SMPL joints on the kps25-annotated SELECT real images (val held out) —
    # the person-seg v6/v7 recipe applied to the 3D regressor.
    from ipercore_tpu.ops.rotations import rot6d_to_rotmat
    from ipercore_tpu.tools.synth_data import body25_from_cocoplus

    probes = []
    if not args.smoke:
        try:
            sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
            from eval_real_photos import pose_probe_crops

            probes = pose_probe_crops(roles=("select",))
            for p in probes:
                c = jax.image.resize(jnp.asarray(p["crop"][None]),
                                     (1, HMR_IMG_SIZE, HMR_IMG_SIZE, 3),
                                     "linear")
                p["x"] = ((c + 1.0) * 0.5 - mean) / std
        except Exception as e:
            print(f"real probe unavailable: {e}", flush=True)
            probes = []

    @jax.jit
    def predict_b25(params, x):
        pose6d, shape, cam = net.apply(params, x)
        R = rot6d_to_rotmat(pose6d.reshape(-1, 24, 6))
        verts = jax.vmap(lambda sh, Ri: smpl_mod.lbs_from_rot(model, sh, Ri)[0])(
            shape, R)
        j3d = jnp.einsum("kv,nvd->nkd", model.joint_regressor, verts)
        j2d = smpl_mod.batch_orth_proj_idrot(j3d, cam)
        return body25_from_cocoplus(j2d)

    def probe_pck(params) -> float:
        if not probes:
            return -1.0
        accs = []
        for p in probes:
            b25, valid = predict_b25(params, p["x"])
            ids = p["ids"]
            vm = np.asarray(valid)[ids] > 0
            sel = np.asarray(b25)[0][ids][vm]
            err = np.linalg.norm(sel - p["gt_ndc"][vm], axis=-1)
            accs.append(float((err < p["thr_ndc"]).mean()))
        return float(np.mean(accs))

    key = jax.random.PRNGKey(123)
    t0 = time.perf_counter()
    best_q, best_step = -np.inf, -1
    for step in range(args.steps):
        key, sub = jax.random.split(key)
        params, opt_state, loss, aux = train_step(params, opt_state, sub)
        if step % max(args.steps // 20, 1) == 0 or step == args.steps - 1:
            print(json.dumps({"step": step, "loss": round(float(loss), 4),
                              **{k: round(float(v), 4) for k, v in aux.items()}}),
                  flush=True)
        if args.save_every and step and step % args.save_every == 0 and probes:
            q = probe_pck(params)
            if q >= best_q:
                best_q, best_step = q, step
                save(params)
            print(json.dumps({"step": step, "real_probe_pck": round(q, 4),
                              "best_step": best_step}), flush=True)

    x, theta_gt, j2d_gt = jax.jit(
        lambda k: synth_batch(k, B))(jax.random.PRNGKey(777))
    _, aux = loss_fn(params, x, theta_gt, j2d_gt)
    result = {"metric": "spin_synthetic_holdout",
              "j2d_px_224": round(float(aux["j2d_px"]), 2),
              "rot_mse": round(float(aux["rot"]), 4),
              "steps": args.steps,
              "train_s": round(time.perf_counter() - t0, 1)}

    # promote the final params only if they beat the best real-probe ckpt
    q_final = probe_pck(params)
    if not probes or q_final >= best_q:
        best_q, best_step = q_final, args.steps - 1
        save(params)
    result["real_probe_pck_best"] = round(float(best_q), 4)
    result["best_step"] = best_step
    result["out"] = args.out
    print(json.dumps(result))


if __name__ == "__main__":
    main()
