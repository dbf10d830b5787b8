"""Train the person segmenter + matting refiner on procedural SMPL renders.

The reference ships downloaded PointRend/GCA checkpoints for its matting
stage (`point_render+gca.toml`); this environment has no network, so the
stand-in nets ran untrained behind geometry fallbacks. This script makes them
REAL: it synthesizes labeled scenes entirely on-device — random SMPL
pose/shape/camera rendered through the production rasterizer gives an exact
silhouette (supersampled 2x for a soft alpha), textured with a random color
transform of the SMPL part-condition map, composited over procedural
backgrounds (gradients / checkers / blobs / noise) — and trains:

  * `PersonSegUNet`  — BCE + soft-dice on the binary mask;
  * `MattingRefiner` — L1 to the soft alpha given RGB + trimap (the trimap is
    derived from the binary mask by the production `generate_trimap`).

Weights land in `assets/person_seg.npz` (f16) and are auto-loaded by
`tools.mattors.build_mattor` / `HumanMattor`, upgrading preprocessing stages
1.1-1.2 from geometry fallbacks to a trained segmenter. Domain: rendered
humans over synthetic backgrounds — not photographs; see docs/PARITY.md.

Usage: python scripts/train_person_seg.py [--size 256] [--steps 1500]
                                          [--batch 8] [--out assets/person_seg.npz]
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
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--out", type=str, default=os.path.join(REPO, "assets", "person_seg.npz"))
    ap.add_argument("--smoke", action="store_true", help="tiny run (CI)")
    ap.add_argument("--matting", choices=("plain", "gca"), default="plain",
                    help="alpha refiner: plain UNet or guided-contextual-"
                         "attention (`GCAMattingRefiner`); gca saves to "
                         "assets/matting_gca.npz by default")
    ap.add_argument("--save_every", type=int, default=200,
                    help="checkpoint cadence in steps (0 = only at the end)")
    ap.add_argument("--real_tex", type=float, default=0.0,
                    help="fraction of real-photo texture crops in bg/person "
                         "textures (see synth_background_mix: the 2-image "
                         "bank memorizes above ~0.2)")
    ap.add_argument("--recipe", choices=("v6", "v7"), default="v7",
                    help="v7 (round 4): studio backgrounds + realistic "
                         "garment textures + boundary/FP-weighted loss + "
                         "box-IoU probe; v6 reproduces the round-3 recipe")
    ap.add_argument("--pseudo", type=str, default="",
                    help="npz of background-subtraction pseudo-masks from "
                         "scripts/pseudo_label_seg.py (the r5 'v8' rung: "
                         "real full-frame (img, mask) pairs fix the "
                         "thin-mask failure procedural renders can't)")
    ap.add_argument("--real_frac", type=float, default=0.375,
                    help="real rows appended per batch = real_frac * batch")
    ap.add_argument("--resume", action="store_true",
                    help="initialize from an existing --out checkpoint")
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
    from ipercore_tpu.ops import rasterizer as rz
    from ipercore_tpu.tools.mattors import (MattingRefiner, PersonSegUNet,
                                            generate_trimap)
    from ipercore_tpu.utils.checkpoint import save_params

    if args.smoke:
        args.size, args.steps, args.batch = 64, 8, 2
        if args.out.startswith(os.path.join(REPO, "assets")):
            args.out = "/tmp/person_seg_smoke.npz"  # never clobber shipped weights
        model = smpl_mod.synthetic_model(nu=16, nv=14)
        assets = load_assets(model, uv_map_path="/nonexistent", part_path="/nonexistent")
    else:
        model = smpl_mod.template_model()
        assets = load_assets(model)
    S, B = args.size, args.batch
    R = S * 2  # supersampled render size -> soft alpha after 2x average pool

    faces = model.faces
    map_fn = assets.map_fn

    def render_alpha(key):
        """(B,) random SMPL scenes -> soft alpha (B, S, S, 1), cond (B, S, S, 3),
        plus the supersampled face-index map (B, R, R) for garment texturing."""
        k1, k2, k3, k4 = jax.random.split(key, 4)
        theta = jnp.zeros((B, 85))
        # low end 0.35: far-shot people (a 1080p dance video at detection
        # work-res) are smaller than the personalization-crop distribution
        scale = jax.random.uniform(k1, (B, 1), minval=0.35, maxval=1.6)
        txy = jax.random.uniform(k2, (B, 2), minval=-0.5, maxval=0.5)
        pose = jax.random.normal(k3, (B, 72)) * 0.25
        beta = jax.random.normal(k4, (B, 10)) * 1.0
        theta = theta.at[:, 0:1].set(scale).at[:, 1:3].set(txy)
        theta = theta.at[:, 3:75].set(pose).at[:, 75:85].set(beta)
        details = smpl_mod.get_details(model, theta)
        proj = rz.project_verts(details["verts"], details["cam"])
        fv = rz.verts_to_faces(proj, faces)
        if rz._use_pallas(R):
            from ipercore_tpu.ops.rasterizer_pallas import rasterize_flows_pallas_csr
            fim, _ = rasterize_flows_pallas_csr(
                fv, assets.f2uvs[None], R)
        else:
            fim = jax.vmap(lambda f: rz.rasterize(f, R).fim)(fv)
        hard = (fim >= 0).astype(jnp.float32)[..., None]  # (B, R, R, 1)
        alpha = jax.lax.reduce_window(
            hard, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID") / 4.0
        cond_hi = rz.encode_fim(fim, map_fn)  # (B, R, R, 3)
        cond = jax.lax.reduce_window(
            cond_hi, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID") / 4.0
        return alpha, cond, fim

    from ipercore_tpu.tools.synth_data import (
        _downsample2, fractal_noise, garment_texture, person_texture_mix,
        photo_augment, synth_background_mix, synth_background_studio)

    v7 = args.recipe == "v7"

    def make_batch(key):
        """Sim2real scene generator. v6 (round 3, VERDICT r2 Weak#2):
        real-photo texture crops + photo-statistics backgrounds
        (`synth_background_mix`), person clothed half the time in REAL
        texture crops (`person_texture_mix` — otherwise 'looks photographic'
        separates fg from bg and the net rejects real people), contact
        shadow, camera-pipeline augmentation of the COMPOSITE, person-free
        hard negatives, and person-shaped distractor blobs labeled
        background. v7 (round 4, VERDICT r3 Missing#1) additionally mixes
        40% studio/stage backgrounds (`synth_background_studio` — the akun
        deployment scene class) and clothes the person half the time in
        realistic muted garments (`garment_texture`)."""
        ks = jax.random.split(key, 16)
        alpha, cond, fim = render_alpha(ks[0])
        bg = synth_background_mix(ks[1], B, S, real_frac=args.real_tex)
        tex = person_texture_mix(ks[4], cond, B, S, real_frac=args.real_tex)
        if v7:
            studio = synth_background_studio(ks[12], B, S)
            use_studio = jax.random.bernoulli(
                ks[14], 0.4, (B, 1, 1, 1)).astype(jnp.float32)
            bg = bg * (1 - use_studio) + studio * use_studio
            garm = _downsample2(garment_texture(ks[13], fim, assets.face_parts))
            use_garm = jax.random.bernoulli(
                ks[15], 0.5, (B, 1, 1, 1)).astype(jnp.float32)
            tex = tex * (1 - use_garm) + garm * use_garm

        # person-free hard negatives (12%): everything is background
        drop = jax.random.bernoulli(ks[7], 0.12, (B, 1, 1, 1)).astype(jnp.float32)
        alpha = alpha * (1.0 - drop)

        # contact shadow: shifted+blurred silhouette darkens the background
        sh = jnp.roll(alpha, (S // 32, S // 24), axis=(1, 2))
        sh = jax.lax.reduce_window(sh, 0.0, jax.lax.add,
                                   (1, 5, 5, 1), (1, 1, 1, 1), "SAME") / 25.0
        sh_amp = jax.random.uniform(ks[8], (B, 1, 1, 1), minval=0.0, maxval=0.5)
        bg = bg - sh_amp * sh * (bg + 1.0) * 0.5

        # distractor blob labeled BACKGROUND: forces person-shape specificity
        blob = fractal_noise(ks[9], B, S, 1)
        blob = (blob > 0.55).astype(jnp.float32)
        use_blob = jax.random.bernoulli(ks[10], 0.3, (B, 1, 1, 1)).astype(jnp.float32)
        blob = blob * use_blob * (1.0 - alpha)
        blob_col = jax.random.uniform(ks[9], (B, 1, 1, 3), minval=-1, maxval=1)
        bg = bg * (1 - blob) + blob_col * blob

        img = tex * alpha + bg * (1.0 - alpha)
        img = photo_augment(ks[11], img)
        hard = (alpha > 0.5).astype(jnp.float32)
        return img, alpha, hard

    # v8 rung: real full-frame (img, mask) rows appended to every batch
    # (scripts/pseudo_label_seg.py — static-camera background subtraction,
    # pose-consistency gated). Matting L1 is masked off on real rows: the
    # binary pseudo-mask is not a soft alpha.
    pseudo = None
    Br = 0
    if args.pseudo and not args.smoke:
        d = np.load(args.pseudo, allow_pickle=True)
        p_imgs = jnp.asarray(np.asarray(d["imgs"], np.float32))
        p_masks = jnp.asarray(np.asarray(d["masks"], np.float32))[..., None]
        if p_imgs.shape[1] != S:
            p_imgs = jax.image.resize(
                p_imgs, (p_imgs.shape[0], S, S, 3), "linear")
            p_masks = (jax.image.resize(
                p_masks, (p_masks.shape[0], S, S, 1), "linear") > 0.5
            ).astype(jnp.float32)
        pseudo = (p_imgs, p_masks)
        Br = max(int(round(args.real_frac * B)), 1)
        print(f"pseudo pool: {p_imgs.shape[0]} real frames; "
              f"{B} synth + {Br} real per batch", flush=True)

        def real_rows(key):
            kk = jax.random.split(key, 5)
            idx = jax.random.randint(kk[0], (Br,), 0, pseudo[0].shape[0])
            x, m = pseudo[0][idx], pseudo[1][idx]
            do = jax.random.bernoulli(kk[1], 0.5, (Br,))
            x = jnp.where(do[:, None, None, None], x[:, :, ::-1, :], x)
            m = jnp.where(do[:, None, None, None], m[:, :, ::-1, :], m)
            shift = jax.random.randint(kk[2], (Br, 2), -S // 10, S // 10 + 1)
            x = jax.vmap(lambda im, s_: jnp.roll(im, s_, axis=(0, 1)))(x, shift)
            m = jax.vmap(lambda im, s_: jnp.roll(im, s_, axis=(0, 1)))(m, shift)
            gain = jax.random.uniform(kk[3], (Br, 1, 1, 3), minval=0.75, maxval=1.25)
            bias = jax.random.uniform(kk[4], (Br, 1, 1, 3), minval=-0.12, maxval=0.12)
            x = jnp.clip(x * gain + bias, -1, 1)
            return x, m

        make_batch_synth = make_batch

        def make_batch(key):
            k0, k1 = jax.random.split(key)
            img, alpha, hard = make_batch_synth(k0)
            xr, mr = real_rows(k1)
            return (jnp.concatenate([img, xr]),
                    jnp.concatenate([alpha, mr]),
                    jnp.concatenate([hard, mr]))

    # per-row matting-loss weight: 1 on synthetic rows, 0 on real rows
    W_MAT = jnp.concatenate([jnp.ones((B,)), jnp.zeros((Br,))]) \
        if pseudo is not None else None

    seg = PersonSegUNet()
    if args.matting == "gca":
        from ipercore_tpu.tools.mattors import GCAMattingRefiner

        mat = GCAMattingRefiner()
        if args.out.endswith("person_seg.npz"):
            args.out = os.path.join(REPO, "assets", "matting_gca.npz")
    else:
        mat = MattingRefiner()
    k0 = jax.random.PRNGKey(0)
    params = {
        "seg": jax.jit(seg.init)(k0, jnp.zeros((1, S, S, 3))),
        "mat": jax.jit(mat.init)(jax.random.PRNGKey(1), jnp.zeros((1, S, S, 4))),
    }
    if args.resume and os.path.exists(args.out):
        from ipercore_tpu.utils.checkpoint import load_params

        params = load_params(args.out, like=params)
        print(f"resumed from {args.out}", flush=True)
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)

    def loss_fn(params, img, alpha, hard):
        logits = seg.apply(params["seg"], img)
        if v7:
            # boundary-weighted, FP-weighted BCE: background pixels cost
            # 2x (the round-3 failure was halo/texture false positives) and
            # silhouette-boundary pixels 3x (sharper edges -> tighter boxes)
            from ipercore_tpu.ops.morphology import dilate, erode

            band = dilate(hard, 5) - erode(hard, 5)
            w = 1.0 + 1.0 * (1.0 - hard) + 2.0 * band
            bce = jnp.mean(w * optax.sigmoid_binary_cross_entropy(logits, hard)
                           ) / jnp.mean(w)
        else:
            bce = jnp.mean(optax.sigmoid_binary_cross_entropy(logits, hard))
        p = jax.nn.sigmoid(logits)
        inter = jnp.sum(p * hard, axis=(1, 2, 3))
        dice = 1.0 - jnp.mean((2 * inter + 1.0) /
                              (jnp.sum(p, (1, 2, 3)) + jnp.sum(hard, (1, 2, 3)) + 1.0))
        trimap = generate_trimap(hard)
        a_pred = mat.apply(params["mat"], jnp.concatenate([img, trimap], axis=-1))
        wm = (jnp.ones((img.shape[0],))
              if W_MAT is None or W_MAT.shape[0] != img.shape[0] else W_MAT)
        wm4 = wm[:, None, None, None]
        if args.matting == "gca":
            # the GCA refiner only predicts inside the unknown band (certain
            # trimap pixels pass through); average the error over the band so
            # the signal isn't diluted 10x by zero-error certain pixels
            band = ((trimap > 0.25) & (trimap < 0.75)).astype(a_pred.dtype)
            l1 = (jnp.sum(jnp.abs(a_pred - alpha) * band * wm4)
                  / jnp.maximum(jnp.sum(band * wm4), 1.0))
        else:
            l1 = (jnp.sum(jnp.abs(a_pred - alpha) * wm4)
                  / jnp.maximum(jnp.sum(wm4) * alpha.shape[1] * alpha.shape[2], 1.0))
        iou = jnp.mean(inter / (jnp.sum(jnp.maximum(p > 0.5, hard > 0.5), (1, 2, 3)) + 1.0))
        return bce + dice + 2.0 * l1, {"bce": bce, "dice": dice,
                                       "alpha_l1": l1, "iou": iou}

    @jax.jit
    def train_step(params, opt_state, key):
        img, alpha, hard = make_batch(key)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, img, alpha, hard)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss, aux

    def save(params, path=None):
        path = path or args.out
        os.makedirs(os.path.dirname(path), exist_ok=True)
        f16 = jax.tree_util.tree_map(
            lambda x: np.asarray(x, np.float16) if np.asarray(x).dtype == np.float32
            else np.asarray(x), params)
        save_params(path, f16)

    # REAL-PROBE CHECKPOINT SELECTION on the bundled real sample media.
    # Sim2real transfer is non-monotone in training steps — the net
    # over-sharpens onto the procedural domain (a 4000-step run hit 0.21
    # person-mask coverage on the real still; the same recipe at 6000 steps
    # fell to 0.08) — so each periodic checkpoint is scored on the real
    # SELECT-subset images (in-GT-box coverage minus 2x out-of-box
    # false-positive rate) and `args.out` keeps the BEST one. The held-out
    # val subset (incl. the trump still) is NEVER seen here; its numbers are
    # reported by scripts/eval_real_photos.py (see assets/real_gt.json).
    probe_imgs = []
    if not args.smoke:
        try:
            sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
            from eval_real_photos import select_gt
            from PIL import Image

            for _name, (path, frac) in select_gt().items():
                if os.path.exists(path):
                    im = Image.open(path).convert("RGB")
                    arr = np.asarray(im).astype(np.float32) / 127.5 - 1.0
                    small = np.asarray(jax.image.resize(
                        jnp.asarray(arr[None]), (1, S, S, 3), "linear"))[0]
                    gx = (np.asarray(frac) * S).astype(int)
                    probe_imgs.append((small, gx))
        except Exception:
            probe_imgs = []

    seg_apply = jax.jit(seg.apply)

    # v8: the probe also scores MASK IoU against the select-side hand-traced
    # silhouette (akun_0060) — boxes alone let thin masks win (r4 Weak#3)
    probe_mask = None
    if not args.smoke and pseudo is not None:
        try:
            from PIL import Image

            from eval_real_photos import GT_PATH, load_gt, rasterize_poly

            reg = json.load(open(GT_PATH))["images"]
            e = reg.get("akun_0060", {})
            gt_sel = load_gt(roles=("select",))
            if "mask_poly" in e and "akun_0060" in gt_sel:
                im = Image.open(gt_sel["akun_0060"][0]).convert("RGB")
                arr = np.asarray(im, np.float32) / 127.5 - 1.0
                small = np.asarray(jax.image.resize(
                    jnp.asarray(arr[None]), (1, S, S, 3), "linear"))[0]
                probe_mask = (small, rasterize_poly(e["mask_poly"], S) > 0.5)
        except Exception as exc:  # pragma: no cover
            print(f"mask probe unavailable: {exc}", flush=True)

    # For --matting gca the shipped artifact is the MAT refiner, so
    # checkpoint selection scores held-out alpha L1 (fixed synthetic batch),
    # not the segmenter's real-probe box IoU — an early seg-probe peak would
    # otherwise freeze an undertrained refiner.
    if args.matting == "gca":
        ev_img, ev_alpha, ev_hard = jax.jit(make_batch)(jax.random.PRNGKey(777))
        ev_tri = generate_trimap(ev_hard)

        @jax.jit
        def _ev_alpha_l1(mat_params):
            a = mat.apply(mat_params, jnp.concatenate([ev_img, ev_tri], -1))
            return jnp.mean(jnp.abs(a - ev_alpha))

        gca_probe = lambda params: -float(_ev_alpha_l1(params["mat"]))  # noqa: E731
    else:
        gca_probe = None

    def probe(params) -> float:
        """Checkpoint-selection score. gca: -held-out alpha L1 (above).
        Otherwise, on the SELECT real images — v7: mean of the stage-1.1
        component-path box IoU (the actual product metric) and
        (coverage - 2*fp); v6: coverage - 2*fp only."""
        if gca_probe is not None:
            return gca_probe(params)
        if not probe_imgs:
            return 0.0
        qs = []
        for small, g in probe_imgs:
            prob = np.asarray(jax.nn.sigmoid(
                seg_apply(params["seg"], small[None])))[0, ..., 0]
            m = prob > 0.5
            inside = m[g[1]:g[3], g[0]:g[2]]
            fp = (m.sum() - inside.sum()) / max(m.size - inside.size, 1)
            q = float(inside.mean()) - 2.0 * float(fp)
            if v7:
                from ipercore_tpu.tools.detection import (
                    _iou, _merge_aligned_components, person_components)

                cb, cs = person_components(prob, min_area=32)
                iou = (_iou(_merge_aligned_components(cb, cs),
                            np.asarray(g, np.float32)) if len(cb) else 0.0)
                q = iou + 0.25 * q
            qs.append(q)
        score = float(np.mean(qs))
        if probe_mask is not None:
            small, gtm = probe_mask
            prob = np.asarray(jax.nn.sigmoid(
                seg_apply(params["seg"], small[None])))[0, ..., 0]
            m = prob > 0.5
            miou = float((m & gtm).sum() / max((m | gtm).sum(), 1))
            score = score + miou
        return score

    key = jax.random.PRNGKey(42)
    t0 = time.perf_counter()
    best_q, best_step = -np.inf, -1
    for step in range(args.steps):
        key, sub = jax.random.split(key)
        params, opt_state, loss, aux = train_step(params, opt_state, sub)
        if step % max(args.steps // 10, 1) == 0 or step == args.steps - 1:
            print(json.dumps({"step": step, "loss": round(float(loss), 4),
                              **{k: round(float(v), 4) for k, v in aux.items()}}),
                  flush=True)
        if args.save_every and step and step % args.save_every == 0:
            q = probe(params)
            if q >= best_q:
                best_q, best_step = q, step
                save(params)
            print(json.dumps({"step": step, "real_probe": round(q, 4),
                              "best_step": best_step}), flush=True)

    # held-out eval (synthetic-only rows for cross-run comparability)
    _mb_holdout = make_batch_synth if pseudo is not None else make_batch
    img, alpha, hard = jax.jit(_mb_holdout)(jax.random.PRNGKey(777))
    _, aux = loss_fn(params, img, alpha, hard)
    result = {"metric": "person_seg_synthetic_holdout",
              "matting": args.matting,
              "iou": round(float(aux["iou"]), 4),
              "alpha_l1": round(float(aux["alpha_l1"]), 4),
              # SAD/1e3 (matting-standard sum of absolute differences over
              # the holdout batch) — the published alpha-quality number
              # VERDICT r2 item 4 asks for
              "alpha_sad_k": round(float(jnp.abs(
                  mat.apply(params["mat"], jnp.concatenate(
                      [img, generate_trimap(hard)], axis=-1)) - alpha).sum()) / 1e3, 2),
              "steps": args.steps, "size": S,
              "train_s": round(time.perf_counter() - t0, 1)}

    # promote the final params only if they beat the best real-probe
    # checkpoint (or when no probe images exist)
    q_final = probe(params)
    if not probe_imgs or q_final >= best_q:
        best_q, best_step = q_final, args.steps - 1
        save(params)
    result["real_probe_best"] = round(float(best_q), 4)
    result["best_step"] = best_step

    # real-photo sanity on the PROMOTED weights: a compact mask on the
    # bundled real still (out-of-domain transfer check, VERDICT r2 #2/#3)
    real = "/root/reference/assets/samples/sources/donald_trump_2/00000.PNG"
    if os.path.exists(real) and not args.smoke:
        from PIL import Image

        from ipercore_tpu.tools.detection import _clean, mask_is_compact
        from ipercore_tpu.utils.checkpoint import load_params

        promoted = load_params(args.out, like=params)
        im = Image.open(real).convert("RGB")
        arr = np.asarray(im).astype(np.float32) / 127.5 - 1.0
        small = np.asarray(jax.image.resize(
            jnp.asarray(arr[None]), (1, S, S, 3), "linear"))
        prob = np.asarray(jax.nn.sigmoid(
            seg_apply(promoted["seg"], small)))[0, ..., 0]
        m = _clean(prob > 0.5)
        result["real_photo_mask_frac"] = round(float(m.mean()), 4)
        result["real_photo_compact"] = bool(mask_is_compact(m))

    result["out"] = args.out
    print(json.dumps(result))


if __name__ == "__main__":
    main()
