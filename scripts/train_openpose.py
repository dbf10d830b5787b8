"""Train the Body-25 OpenPose net on procedural SMPL renders.

The reference downloads the CMU body25 checkpoint (`assets/download.sh`);
this environment has no network, so the checkpoint-exact `OpenPoseBody25`
ran untrained. This script trains it on labeled scenes synthesized on-device
(`tools/synth_data.py`): rendered SMPL joints give exact Body-25 heatmap +
PAF targets (`make_pose2d_targets`) for the nineteen joints the production
decode consumes (the six toe/heel channels the SMPL cocoplus regressor
cannot produce carry zero loss weight). Deep supervision over all six
refinement stages — the standard CMU recipe the reference checkpoint was
trained with.

Weights land in `assets/openpose.npz` (f16) and auto-load in
`tools.pose2d.OpenPoseRunner`, making SMPLify refinement (preprocessing
stage 1.3) run against real keypoints. Domain: rendered humans over
procedural backgrounds — not photographs; see docs/PARITY.md.

Usage: python scripts/train_openpose.py [--steps 3000] [--batch 8]
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
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--scene_size", type=int, default=256)
    ap.add_argument("--input_size", type=int, default=224,
                    help="net input (preprocessing feeds 224 crops)")
    ap.add_argument("--arch", choices=("body25", "mobilenet"), default="body25",
                    help="body25 = OpenPoseBody25; mobilenet = the "
                         "lightweight COCO-18 variant")
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--studio_frac", type=float, default=0.35,
                    help="fraction of studio/stage backgrounds (v7 sim2real)")
    ap.add_argument("--natural_frac", type=float, default=0.65,
                    help="fraction of scenes with natural-stance poses "
                         "(arms down / walking — synth_data.natural_pose; "
                         "round-4 sim2real fix: the isotropic prior never "
                         "produces ordinary standing people)")
    ap.add_argument("--garment_frac", type=float, default=0.5,
                    help="fraction of realistic muted garment textures (v7)")
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--pool", type=int, default=0,
                    help="pre-render this many scenes once and augment per "
                         "step (color jitter + small shifts) instead of "
                         "rendering every step — for CPU hosts where the "
                         "per-step SMPL render dominates. 0 = render fresh "
                         "scenes each step (the TPU default).")
    ap.add_argument("--save_every", type=int, default=300,
                    help="checkpoint cadence in steps (0 = only at the end)")
    ap.add_argument("--pseudo", type=str, default="",
                    help="npz of pseudo-labeled REAL crops from "
                         "scripts/pseudo_label_pose.py; mixed into every "
                         "batch (self-training — closes the appearance "
                         "domain gap procedural renders cannot)")
    ap.add_argument("--real_frac", type=float, default=0.375,
                    help="fraction of each batch drawn from --pseudo")
    ap.add_argument("--probe_tta", action="store_true", default=True,
                    help="score real-probe checkpoints with flip-TTA "
                         "heatmaps (the production inference config)")
    ap.add_argument("--motion_blur", type=float, default=0.5,
                    help="probability of directional motion blur on each "
                         "synthetic sample (the real video's fast limbs are "
                         "blurred; renders are sharp). 0 disables.")
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
    from ipercore_tpu.tools import synth_data as sd
    from ipercore_tpu.tools.pose2d import OpenPoseBody25, decode_single_person
    from ipercore_tpu.utils.checkpoint import load_params, save_params

    if args.smoke:
        args.steps, args.batch = 4, 2
        args.scene_size, args.input_size = 64, 64
        model = smpl_mod.synthetic_model(nu=16, nv=14)
        assets = load_assets(model, uv_map_path="/nonexistent", part_path="/nonexistent")
    else:
        model = smpl_mod.template_model()
        assets = load_assets(model)
    B, S, IN = args.batch, args.scene_size, args.input_size
    HM = IN // 8
    mobile = args.arch == "mobilenet"
    if args.out is None:
        args.out = os.path.join(
            REPO, "assets",
            "mobilenet_openpose.npz" if mobile else "openpose.npz")
    if args.smoke and args.out.startswith(os.path.join(REPO, "assets")):
        args.out = "/tmp/openpose_smoke.npz"  # never clobber shipped weights

    # self-training pool: pseudo-labeled real crops replace part of each batch
    pseudo = None
    Bs = B
    if args.pseudo and not args.smoke:
        if mobile:
            raise SystemExit("--pseudo labels are Body-25; use --arch body25")
        d = np.load(args.pseudo, allow_pickle=True)
        p_crops = jnp.asarray(np.asarray(d["crops"], np.float32))
        if p_crops.shape[1] != IN:
            p_crops = jax.image.resize(
                p_crops, (p_crops.shape[0], IN, IN, 3), "linear")
        pseudo = {"crops": p_crops,
                  "kps": jnp.asarray(d["kps_ndc"]),
                  "valid": jnp.asarray(d["valid"])}
        Br = min(max(int(round(args.real_frac * B)), 1), B - 1)
        Bs = B - Br
        print(f"pseudo pool: {p_crops.shape[0]} real crops, "
              f"{Bs} synth + {Br} real per batch", flush=True)

    def render_scene(key, batch=None):
        batch = Bs if batch is None else batch
        sb = sd.compose_scene(key, model, assets, batch=batch, size=S,
                              studio_frac=args.studio_frac,
                              garment_frac=args.garment_frac,
                              natural_frac=args.natural_frac)
        x = jax.image.resize(sb.img, (batch, IN, IN, 3), "linear")
        return x, sb.j2d

    def finish_batch(key, x, j2d):
        """Targets + runner input scaling (+ pool-mode augmentation)."""
        nb = x.shape[0]
        key, kmb = jax.random.split(key)
        if args.motion_blur > 0 and not args.smoke:
            x = sd.motion_blur(kmb, x, p=args.motion_blur)
        if args.pool:
            k1, k2, k3, k4 = jax.random.split(key, 4)
            # small joint-consistent shift: roll pixels, offset normalized j2d
            shift = jax.random.randint(k1, (nb, 2), -IN // 12, IN // 12 + 1)
            x = jax.vmap(lambda im, s: jnp.roll(im, s, axis=(0, 1)))(x, shift)
            j2d = j2d + 2.0 * shift[:, None, ::-1].astype(jnp.float32) / IN
            # target-free appearance jitter
            gain = jax.random.uniform(k2, (nb, 1, 1, 3), minval=0.7, maxval=1.3)
            bias = jax.random.uniform(k3, (nb, 1, 1, 3), minval=-0.15, maxval=0.15)
            x = jnp.clip(x * gain + bias
                         + 0.02 * jax.random.normal(k4, x.shape), -1, 1)
        if mobile:  # MobilenetOpenPoseRunner scaling: BGR, (pix-128)/256
            x = x[..., ::-1] * 0.5
            hm_t, paf_t, hm_w, paf_w = sd.make_pose2d_targets_coco18(j2d, HM)
        else:  # OpenPoseRunner scaling
            x = x * 0.5
            hm_t, paf_t, hm_w, paf_w = sd.make_pose2d_targets(j2d, HM)
        return x, hm_t, paf_t, hm_w, paf_w, j2d

    if args.pool:
        render_pool = jax.jit(lambda k: render_scene(k, B))
        pool_n = max(args.pool, B)
        xs, js = [], []
        pk = jax.random.PRNGKey(808)
        for _ in range(-(-pool_n // B)):
            pk, sub = jax.random.split(pk)
            xc, jc = render_pool(sub)
            xs.append(xc), js.append(jc)
        x_pool = jnp.concatenate(xs, axis=0)[:pool_n]
        j_pool = jnp.concatenate(js, axis=0)[:pool_n]
        print(f"scene pool ready: {x_pool.shape}", flush=True)

        def make_batch_synth(key, batch=None):
            batch = Bs if batch is None else batch
            k0, k1 = jax.random.split(key)
            idx = jax.random.randint(k0, (batch,), 0, pool_n)
            return finish_batch(k1, x_pool[idx], j_pool[idx])
    else:
        def make_batch_synth(key, batch=None):
            k0, k1 = jax.random.split(key)
            x, j2d = render_scene(k0, batch)
            return finish_batch(k1, x, j2d)

    def real_batch(key):
        """Augmented pseudo-labeled real crops + per-sample-validity targets
        (self-training branch; labels from scripts/pseudo_label_pose.py)."""
        from ipercore_tpu.tools.pose2d import BODY25_FLIP_JOINTS

        kk = jax.random.split(key, 6)
        idx = jax.random.randint(kk[0], (Br,), 0, pseudo["crops"].shape[0])
        x = pseudo["crops"][idx]
        kps = pseudo["kps"][idx]
        val = pseudo["valid"][idx]
        # horizontal flip (joint slots permuted, x negated)
        do = jax.random.bernoulli(kk[1], 0.5, (Br,))
        jp = jnp.asarray(BODY25_FLIP_JOINTS[:25])
        x = jnp.where(do[:, None, None, None], x[:, :, ::-1, :], x)
        kps = jnp.where(do[:, None, None],
                        (kps * jnp.asarray([-1.0, 1.0]))[:, jp], kps)
        val = jnp.where(do[:, None], val[:, jp], val)
        # joint-consistent shift + appearance jitter (pool-mode recipe)
        shift = jax.random.randint(kk[2], (Br, 2), -IN // 12, IN // 12 + 1)
        x = jax.vmap(lambda im, s: jnp.roll(im, s, axis=(0, 1)))(x, shift)
        kps = kps + 2.0 * shift[:, None, ::-1].astype(jnp.float32) / IN
        gain = jax.random.uniform(kk[3], (Br, 1, 1, 3), minval=0.7, maxval=1.3)
        bias = jax.random.uniform(kk[4], (Br, 1, 1, 3), minval=-0.15, maxval=0.15)
        x = jnp.clip(x * gain + bias
                     + 0.02 * jax.random.normal(kk[5], x.shape), -1, 1)
        # shifted/flipped joints may leave the crop: invalidate
        val = val * jnp.all(jnp.abs(kps) < 1.0, axis=-1)
        hm_t, paf_t, hm_w, paf_w = sd.make_pose2d_targets_b25(kps, val, HM)
        return x * 0.5, hm_t, paf_t, hm_w, paf_w

    if pseudo is None:
        make_batch = make_batch_synth
    else:
        def make_batch(key):
            """Mixed batch with per-sample weight tensors (broadcast-compat
            with the synthetic global channel weights)."""
            k0, k1 = jax.random.split(key)
            xs_, hm_s, paf_s, hmw_s, pafw_s, j2d = make_batch_synth(k0, Bs)
            xr_, hm_r, paf_r, hmw_r, pafw_r = real_batch(k1)
            x = jnp.concatenate([xs_, xr_], axis=0)
            hm_t = jnp.concatenate([hm_s, hm_r], axis=0)
            paf_t = jnp.concatenate([paf_s, paf_r], axis=0)
            hm_w = jnp.concatenate(
                [jnp.broadcast_to(hmw_s, (Bs, 1, 1, hm_r.shape[-1]))
                 * jnp.ones((Bs, 1, 1, 1)), hmw_r], axis=0)
            paf_w = jnp.concatenate(
                [jnp.broadcast_to(pafw_s, (Bs, 1, 1, paf_r.shape[-1]))
                 * jnp.ones((Bs, 1, 1, 1)), pafw_r], axis=0)
            return x, hm_t, paf_t, hm_w, paf_w, j2d

    if mobile:
        from ipercore_tpu.tools.pose2d_mobilenet import MobilenetOpenPose

        net = MobilenetOpenPose()
    else:
        net = OpenPoseBody25()
    params = jax.jit(net.init)(jax.random.PRNGKey(0), jnp.zeros((1, IN, IN, 3)))
    if args.resume and os.path.exists(args.out):
        params = load_params(args.out, like=params)
        print(f"resumed from {args.out}", flush=True)

    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(args.lr))
    opt_state = tx.init(params)

    def loss_fn(params, x, hm_t, paf_t, hm_w, paf_w):
        if mobile:  # deep supervision unavailable: last stage only
            hm_o, paf_o = net.apply(params, x)
            pafs, hms = [paf_o], [hm_o]
        else:
            _, _, pafs, hms = net.apply(params, x, return_stages=True)
        l_paf = sum(jnp.mean(((p - paf_t) ** 2) * paf_w) for p in pafs) / len(pafs)
        l_hm = sum(jnp.mean(((h - hm_t) ** 2) * hm_w) for h in hms) / len(hms)
        return l_paf + l_hm, {"paf": l_paf, "hm": l_hm}

    @jax.jit
    def train_step(params, opt_state, key):
        x, hm_t, paf_t, hm_w, paf_w, _ = make_batch(key)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, x, hm_t, paf_t, hm_w, paf_w)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss, aux

    def save(params):
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        f16 = jax.tree_util.tree_map(
            lambda v: np.asarray(v, np.float16) if np.asarray(v).dtype == np.float32
            else np.asarray(v), params)
        # record the training resolution: the FCN runs at any size but is
        # scale-calibrated to this one; runners/preprocessor feed it back
        f16 = dict(f16)
        f16["__meta__"] = {"input_size": np.asarray(IN, np.int32)}
        save_params(args.out, f16)

    # REAL-PROBE CHECKPOINT SELECTION (PCK@0.1 on the kps25-annotated SELECT
    # images; the val images stay held out — same recipe that fixed the
    # person segmenter, train_person_seg.py v6/v7). Sim2real transfer is
    # non-monotone in steps, so each periodic checkpoint is scored on real
    # photographs and `args.out` keeps the best.
    probes = []
    if not args.smoke:
        try:
            sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
            from eval_real_photos import pose_probe_crops

            probes = pose_probe_crops(roles=("select",))
            for p in probes:
                c = jax.image.resize(jnp.asarray(p["crop"][None]),
                                     (1, IN, IN, 3), "linear")
                p["x"] = (c[..., ::-1] * 0.5) if mobile else (c * 0.5)
        except Exception as e:
            print(f"real probe unavailable: {e}", flush=True)
            probes = []

    if mobile:
        hm_apply = jax.jit(lambda p, x: net.apply(p, x)[0])
    elif args.probe_tta:
        # score checkpoints under the production inference config (flip-TTA)
        from ipercore_tpu.tools.pose2d import BODY25_FLIP_JOINTS

        def _tta_hm(p, x):
            hm = net.apply(p, x)[1]
            hm_f = net.apply(p, x[:, :, ::-1])[1][:, :, ::-1, :]
            return 0.5 * (hm + hm_f[..., jnp.asarray(BODY25_FLIP_JOINTS)])

        hm_apply = jax.jit(_tta_hm)
    else:
        hm_apply = jax.jit(lambda p, x: net.apply(p, x)[1])

    def probe_pck(params) -> float:
        if not probes:
            return -1.0
        accs = []
        for p in probes:
            hm = hm_apply(params, p["x"])
            kps, scores, valid = decode_single_person(
                hm, n_joints=18 if mobile else 25)
            ids = p["ids"]
            if mobile:  # COCO-18 ids differ from Body-25 for lower body
                b25_to_c18 = {0: 0, 1: 1, 2: 2, 3: 3, 4: 4, 5: 5, 6: 6, 7: 7,
                              9: 8, 10: 9, 11: 10, 12: 11, 13: 12, 14: 13}
                keep = np.asarray([i for i, j in enumerate(ids)
                                   if int(j) in b25_to_c18])
                sel = np.asarray(kps)[0][[b25_to_c18[int(j)] for j in ids
                                          if int(j) in b25_to_c18]]
                gt = p["gt_ndc"][keep]
            else:
                sel = np.asarray(kps)[0][ids]
                gt = p["gt_ndc"]
            err = np.linalg.norm(sel - gt, axis=-1)
            accs.append(float((err < p["thr_ndc"]).mean()))
        return float(np.mean(accs))

    key = jax.random.PRNGKey(321)
    t0 = time.perf_counter()
    best_q, best_step = -np.inf, -1
    for step in range(args.steps):
        key, sub = jax.random.split(key)
        params, opt_state, loss, aux = train_step(params, opt_state, sub)
        if step % max(args.steps // 20, 1) == 0 or step == args.steps - 1:
            print(json.dumps({"step": step, "loss": round(float(loss), 5),
                              **{k: round(float(v), 5) for k, v in aux.items()}}),
                  flush=True)
        if args.save_every and step and step % args.save_every == 0:
            if probes:
                q = probe_pck(params)
                if q >= best_q:
                    best_q, best_step = q, step
                    save(params)
                print(json.dumps({"step": step, "real_probe_pck": round(q, 4),
                                  "best_step": best_step}), flush=True)
            else:
                save(params)

    # holdout: decode px error over supervised joints. Out-of-frame GT joints
    # are excluded (their gaussians are clipped off the heatmap — nothing to
    # decode); the production consumer (SMPLify) weights by predicted score,
    # so the score-gated error is the operative number.
    x, hm_t, paf_t, hm_w, paf_w, j2d = jax.jit(
        lambda k: make_batch_synth(k, B))(jax.random.PRNGKey(777))
    if mobile:
        hm, _ = jax.jit(lambda p, x: net.apply(p, x))(params, x)
        kps, scores, valid = decode_single_person(hm, n_joints=18)
        b25_gt = j2d[:, sd.COCO18_FROM_COCOPLUS]
        valid25 = np.ones((18,), np.float32)
    else:
        _, hm = jax.jit(lambda p, x: net.apply(p, x))(params, x)
        kps, scores, valid = decode_single_person(hm)
        b25_gt, valid25 = sd.body25_from_cocoplus(j2d)
    in_frame = np.asarray(jnp.all(jnp.abs(b25_gt) < 1.0, axis=-1), np.float32)
    err = np.asarray(jnp.linalg.norm(jnp.asarray(kps) - b25_gt, axis=-1)) * (IN / 2)
    m = np.asarray(valid25)[None, :] * in_frame
    px = float((err * m).sum() / max(m.sum(), 1))
    conf = m * np.asarray(scores > 0.3)
    px_conf = float((err * conf).sum() / max(conf.sum(), 1))
    result = {"metric": "openpose_synthetic_holdout", "arch": args.arch,
              "decode_px_err": round(px, 2),
              "decode_px_err_conf": round(px_conf, 2),
              "conf_frac": round(float(conf.sum() / max(m.sum(), 1)), 3),
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
