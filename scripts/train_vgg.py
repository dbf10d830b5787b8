"""Train the VGG19-topology perceptual net on procedural SMPL renders.

The reference's perceptual loss uses ImageNet-pretrained torchvision VGG19
(`criterions/vggloss.py:59`); this environment has no network, so
`VGGFeatures` ran on random filters. This script gives the feature pyramid
real structure by supervising a part-segmentation task on labeled scenes
synthesized on-device (`tools/synth_data.py`): every pixel's ground-truth
body-part label (11 SMPL parts + background) comes from the rendered
face-index map and `assets.face_parts`. Features that segment body parts
under random textures/backgrounds carry the person-centric semantics the
perceptual loss and LPIPS-style evaluation need.

Weights land in `assets/vgg_perceptual.npz` (f16) and auto-load wherever
`criterions.init_vgg_params` is used (personalization, training, the
evaluator's LPIPS-style metric). Domain: rendered humans over procedural
backgrounds — not photographs; see docs/PARITY.md.

Usage: python scripts/train_vgg.py [--steps 2000] [--batch 8]
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

N_CLASSES = 12  # 11 parts + background


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--out", type=str,
                    default=os.path.join(REPO, "assets", "vgg_perceptual.npz"))
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import flax.linen as nn
    import optax

    cache_dir = os.path.join(REPO, ".cache", "jax_compilation")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ipercore_tpu.models import smpl as smpl_mod
    from ipercore_tpu.models.mesh import load_assets
    from ipercore_tpu.models.networks.criterions import VGGFeatures
    from ipercore_tpu.tools import synth_data as sd
    from ipercore_tpu.utils.checkpoint import load_params, save_params

    if args.smoke and args.out.startswith(os.path.join(REPO, "assets")):
        args.out = "/tmp/" + os.path.basename(args.out).replace(".npz", "_smoke.npz")  # never clobber shipped weights

    if args.smoke:
        args.steps, args.batch = 4, 2

    model = smpl_mod.template_model()
    assets = load_assets(model)
    B, S = args.batch, args.size
    face_parts = jnp.asarray(assets.face_parts)  # (F,) int32 in [0, 11)

    def make_batch(key):
        """Labeled scene: image (B,S,S,3) + per-pixel part labels (B,S,S)."""
        ka, kb, kc, kd, ke = jax.random.split(key, 5)
        theta = sd.make_theta(ka, B)
        details = smpl_mod.get_details(model, theta)
        fim = sd.render_fim(model, theta, S * 2, f2uvs=assets.f2uvs,
                            details=details)
        labels = jnp.where(fim >= 0, face_parts[jnp.maximum(fim, 0)],
                           N_CLASSES - 1)[:, ::2, ::2]  # (B, S, S)
        alpha = sd._downsample2((fim >= 0).astype(jnp.float32)[..., None])
        from ipercore_tpu.ops import rasterizer as rz
        cond = sd._downsample2(rz.encode_fim(fim, assets.map_fn))
        bg = sd.synth_background(kb, B, S)
        M = jax.random.uniform(kc, (B, 3, 3), minval=-1, maxval=1)
        tex = jnp.tanh(jnp.einsum("bhwc,bcd->bhwd", cond, M)
                       + 0.15 * jax.random.normal(kd, (B, S, S, 3)))
        img = tex * alpha + bg * (1.0 - alpha)
        img = jnp.clip(img + 0.05 * jax.random.normal(ke, img.shape), -1, 1)
        return img, labels

    class SegVGG(nn.Module):
        """VGGFeatures + a light multi-scale decode head (head is discarded
        after training; only the pyramid's conv weights ship)."""

        @nn.compact
        def __call__(self, x):
            feats = VGGFeatures()(x)  # 5 scales: S, S/2, S/4, S/8, S/16
            h = S // 4
            ups = []
            for f in feats:
                f = nn.Conv(32, (1, 1), name=f"head_lat{len(ups)}")(f)
                f = jax.image.resize(f, (f.shape[0], h, h, 32), "linear")
                ups.append(f)
            y = nn.relu(sum(ups))
            return nn.Conv(N_CLASSES, (1, 1), name="head_out")(y)

    net = SegVGG()
    params = jax.jit(net.init)(jax.random.PRNGKey(0), jnp.zeros((1, S, S, 3)))
    if args.resume and os.path.exists(args.out):
        vgg_only = load_params(
            args.out, like={"params": params["params"]["VGGFeatures_0"]})
        params = jax.tree_util.tree_map(lambda x: x, params)  # copy
        params["params"]["VGGFeatures_0"] = vgg_only["params"]
        print(f"resumed pyramid from {args.out}")

    tx = optax.adam(args.lr)
    opt = tx.init(params)

    def loss_fn(p, img, labels):
        logits = net.apply(p, img)  # (B, S/4, S/4, C)
        lab4 = labels[:, ::4, ::4]
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, lab4)
        # person pixels are ~1/4 of the frame: upweight them so background
        # doesn't dominate the objective
        w = jnp.where(lab4 == N_CLASSES - 1, 0.3, 1.0)
        acc = jnp.mean((jnp.argmax(logits, -1) == lab4).astype(jnp.float32))
        return jnp.mean(ce * w), acc

    @jax.jit
    def step(p, o, key):
        img, labels = make_batch(key)
        (loss, acc), g = jax.value_and_grad(loss_fn, has_aux=True)(p, img, labels)
        up, o = tx.update(g, o, p)
        return optax.apply_updates(p, up), o, loss, acc

    t0 = time.time()
    key = jax.random.PRNGKey(42)
    for i in range(args.steps):
        key, sub = jax.random.split(key)
        params, opt, loss, acc = step(params, opt, sub)
        if i % max(args.steps // 20, 1) == 0 or i == args.steps - 1:
            print(json.dumps({"step": i, "loss": round(float(loss), 4),
                              "pix_acc": round(float(acc), 4)}), flush=True)

    # holdout: fresh scenes, report person-pixel accuracy and mIoU
    img, labels = jax.jit(make_batch)(jax.random.PRNGKey(777))
    logits = jax.jit(net.apply)(params, img)
    pred = np.asarray(jnp.argmax(logits, -1))
    lab = np.asarray(labels[:, ::4, ::4])
    ious = []
    for c in range(N_CLASSES):
        inter = ((pred == c) & (lab == c)).sum()
        union = ((pred == c) | (lab == c)).sum()
        if union > 0:
            ious.append(inter / union)
    person = lab != (N_CLASSES - 1)
    pacc = float((pred[person] == lab[person]).mean()) if person.any() else 0.0

    vgg_tree = {"params": params["params"]["VGGFeatures_0"]}
    f16 = jax.tree_util.tree_map(
        lambda x: np.asarray(x, np.float16), vgg_tree)
    save_params(args.out, f16)
    print(json.dumps({"metric": "vgg_part_seg_holdout",
                      "miou": round(float(np.mean(ious)), 4),
                      "person_pix_acc": round(pacc, 4),
                      "steps": args.steps,
                      "train_s": round(time.time() - t0, 1),
                      "out": args.out}), flush=True)


if __name__ == "__main__":
    main()
