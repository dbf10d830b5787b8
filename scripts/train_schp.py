"""Train the SCHP human/cloth parser on procedural clothed-SMPL renders.

The reference downloads the published `exp-schp-lip.pth` checkpoint
(`assets/download.sh`) whose job in the pipeline is cloth detection: the
`skirt+dress` class mask drives `ClothSmplLinkDeformer`
(`clothlinks_deformer.py:164-176`), and the LIP `body` mask is an alternate
person-mask source (`schp_parser.py:624-700`). No network here, so this
trains the exact SchpNet architecture on procedural scenes with exact labels:

  * the production rasterizer gives per-pixel SMPL body-part ids, mapped to
    LIP classes (hair/face/arms/legs/shoes/upper-clothes), with per-identity
    clothing coin-flips (pants vs bare legs, coat sleeves vs bare arms);
  * half the identities wear a procedural *skirt or dress*: a painted panel
    spanning the legs from the hip line to a random hem, labeled class 12/6 —
    exactly the signal `find_cloth_links_schp` consumes (lowest hem row).

Weights land in `assets/schp.npz` (f16) and auto-load via
`tools.parsers.build_parser`, activating the cloth-link deform path in
`services/preprocess.digital_deform`. Domain: procedural renders; the
converted real checkpoint drops into the same layout (`convert_schp`).

Usage: python scripts/train_schp.py [--steps 2000] [--batch 4] [--size 256]
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

# 11-part scheme (mesh.PART_IDS order: head, torso, L-leg, R-leg, L-arm,
# R-arm, L-foot, R-foot, L-hand, R-hand, facial) -> LIP class (parsers.LIP_LABELS)
PART_TO_LIP = np.array([
    2,   # head -> Hair
    5,   # torso -> Upper-clothes
    16,  # left leg -> Left-leg (bare; pants override below)
    17,  # right leg -> Right-leg
    14,  # left arm -> Left-arm (bare; coat override below)
    15,  # right arm -> Right-arm
    18,  # left foot -> Left-shoe
    19,  # right foot -> Right-shoe
    14,  # left hand -> Left-arm (LIP has no hand class; arms are skin)
    15,  # right hand -> Right-arm
    13,  # facial -> Face
    0,   # background sentinel
], np.int32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--out", type=str, default=os.path.join(REPO, "assets", "schp.npz"))
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--pool", type=int, default=48,
                    help="pre-rendered part-map pool size (the per-step SMPL "
                         "render dominates step cost on CPU; clothing flips, "
                         "palette, background and shading stay fresh per step)")
    ap.add_argument("--save_every", type=int, default=200,
                    help="checkpoint cadence in steps (0 = only at the end)")
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
    from ipercore_tpu.tools.parsers import (
        LIP_NUM_CLASSES, SchpNet, SchpParser, resize_bilinear_ac)
    from ipercore_tpu.utils.checkpoint import load_params, save_params

    if args.smoke and args.out.startswith(os.path.join(REPO, "assets")):
        args.out = "/tmp/" + os.path.basename(args.out).replace(".npz", "_smoke.npz")  # never clobber shipped weights

    if args.smoke:
        args.steps, args.batch, args.size = 4, 1, 64
        model = smpl_mod.synthetic_model(nu=16, nv=14)
        assets = load_assets(model, uv_map_path="/nonexistent", part_path="/nonexistent")
    else:
        model = smpl_mod.template_model()
        assets = load_assets(model)
    B, S = args.batch, args.size
    part_lut = jnp.asarray(PART_TO_LIP)
    face_parts = jnp.asarray(assets.face_parts)

    # Pre-render a pool of part maps once; per-step cost drops to the net
    # fwd/bwd. Horizontal flips swap the left/right part ids so the LIP
    # left/right classes stay correct.
    def render_pmap_chunk(key):
        theta = sd.make_theta(key, B)
        fim = sd.render_fim(model, theta, S, f2uvs=assets.f2uvs)
        return jnp.where(fim >= 0, face_parts[jnp.maximum(fim, 0)], 11)

    render_pmap_chunk = jax.jit(render_pmap_chunk)
    pool_n = max(args.pool, B)
    chunks = []
    pk = jax.random.PRNGKey(606)
    for _ in range(-(-pool_n // B)):
        pk, sub = jax.random.split(pk)
        chunks.append(render_pmap_chunk(sub))
    pmap_pool = jnp.concatenate(chunks, axis=0)[:pool_n]  # (P, S, S) int
    print(f"part-map pool ready: {pmap_pool.shape}", flush=True)
    # 11-part scheme L/R pairs: legs (2,3), arms (4,5), feet (6,7), hands (8,9)
    flip_lut = jnp.asarray([0, 1, 3, 2, 5, 4, 7, 6, 9, 8, 10, 11], jnp.int32)

    def make_batch(key):
        """Procedural clothed scenes + exact LIP label maps."""
        keys = jax.random.split(key, 14)
        idx = jax.random.randint(keys[11], (B,), 0, pool_n)
        pmap = pmap_pool[idx]
        flip = jax.random.bernoulli(keys[12], 0.5, (B, 1, 1))
        pmap = jnp.where(flip, flip_lut[pmap[:, :, ::-1]], pmap)
        shift = jax.random.randint(keys[13], (B, 2), -S // 8, S // 8 + 1)
        pmap = jax.vmap(lambda im, s: jnp.roll(im, s, axis=(0, 1)))(pmap, shift)
        label = part_lut[pmap]
        fg = pmap < 11

        legs = (pmap == 2) | (pmap == 3)
        arms = (pmap == 4) | (pmap == 5) | (pmap == 8) | (pmap == 9)
        torso = pmap == 1

        # per-identity clothing coin flips
        pants = jax.random.bernoulli(keys[1], 0.5, (B, 1, 1))
        coat = jax.random.bernoulli(keys[2], 0.4, (B, 1, 1))
        skirted = jax.random.bernoulli(keys[3], 0.5, (B, 1, 1))
        is_dress = jax.random.bernoulli(keys[4], 0.4, (B, 1, 1))
        label = jnp.where(pants & legs, 9, label)   # Pants
        label = jnp.where(coat & arms, 7, label)    # Coat sleeves

        # skirt/dress panel: rows from the hip line to a random hem, spanning
        # the per-row column extent of legs+torso (covers the between-leg gap)
        rows = jnp.arange(S)[None, :, None]
        cols = jnp.arange(S)[None, None, :]
        body = legs | torso
        hip_y = jnp.min(jnp.where(legs, rows, S), axis=(1, 2), keepdims=True)
        ank_y = jnp.max(jnp.where(legs, rows, -1), axis=(1, 2), keepdims=True)
        u = jax.random.uniform(keys[5], (B, 1, 1), minval=0.3, maxval=0.75)
        hem_y = hip_y + u * jnp.maximum(ank_y - hip_y, 0)
        band = (rows >= hip_y) & (rows <= hem_y)
        rminc = jnp.min(jnp.where(body, cols, S), axis=2, keepdims=True)  # (B,S,1)
        rmaxc = jnp.max(jnp.where(body, cols, -1), axis=2, keepdims=True)
        has_row = rmaxc >= 0
        panel = (band & has_row & (cols >= rminc - 2) & (cols <= rmaxc + 2)
                 & skirted & (ank_y > hip_y))
        cloth_cls = jnp.where(is_dress, 6, 12)  # Dress vs Skirt
        label = jnp.where(panel, cloth_cls, label)
        label = jnp.where(is_dress & skirted & torso, 6, label)  # dress bodice
        fg = fg | panel

        # image: one random color per (identity, LIP class), shaded + noised;
        # background pixels come from a procedural plate
        palette = jax.random.uniform(keys[6], (B, LIP_NUM_CLASSES, 3),
                                     minval=-1.0, maxval=1.0)
        img = palette[jnp.arange(B)[:, None, None], label]  # (B,S,S,3)
        bg = sd.synth_background(keys[7], B, S)
        img = jnp.where(fg[..., None], img, bg)
        gx = jax.random.uniform(keys[8], (B, 1, 1, 1), minval=-0.3, maxval=0.3)
        gy = jax.random.uniform(keys[9], (B, 1, 1, 1), minval=-0.3, maxval=0.3)
        shade = 1.0 + gx * (cols[..., None] / S - 0.5) + gy * (rows[..., None] / S - 0.5)
        img = jnp.clip(img * shade + 0.03 * jax.random.normal(keys[10], img.shape),
                       -1, 1)
        return img, label, jnp.squeeze(skirted, (1, 2))

    net = SchpNet()
    params = jax.jit(net.init)(jax.random.PRNGKey(0), jnp.zeros((1, S, S, 3)))
    if args.resume and os.path.exists(args.out):
        params = load_params(args.out, like=params)
        print(f"resumed from {args.out}", flush=True)

    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(args.lr))
    opt_state = tx.init(params)
    mean = jnp.asarray(SchpParser.MEAN)
    std = jnp.asarray(SchpParser.STD)

    def forward(params, img):
        # same normalization as SchpParser._forward; input already at S
        x = ((img + 1.0) * 0.5 - mean) / std
        logits = net.apply(params, x)
        return resize_bilinear_ac(logits, S, S)

    def loss_fn(params, img, label):
        logits = forward(params, img)
        onehot = jax.nn.one_hot(label, LIP_NUM_CLASSES)
        ce = optax.softmax_cross_entropy(logits, onehot).mean()
        acc = jnp.mean(jnp.argmax(logits, -1) == label)
        return ce, acc

    @jax.jit
    def train_step(params, opt_state, key):
        img, label, _ = make_batch(key)
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, img, label)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss, acc

    def save(params):
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        f16 = jax.tree_util.tree_map(
            lambda v: np.asarray(v, np.float16) if np.asarray(v).dtype == np.float32
            else np.asarray(v), params)
        save_params(args.out, f16)

    key = jax.random.PRNGKey(404)
    t0 = time.perf_counter()
    for step in range(args.steps):
        key, sub = jax.random.split(key)
        params, opt_state, loss, acc = train_step(params, opt_state, sub)
        if step % max(args.steps // 20, 1) == 0 or step == args.steps - 1:
            print(json.dumps({"step": step, "ce": round(float(loss), 4),
                              "pix_acc": round(float(acc), 4)}), flush=True)
        if args.save_every and step and step % args.save_every == 0:
            save(params)

    # holdout: mIoU + skirt-detection rate through the production runner path
    img, label, skirted = jax.jit(make_batch)(jax.random.PRNGKey(5150))
    pred = jnp.argmax(forward(params, img), -1)
    ious = []
    for c in range(LIP_NUM_CLASSES):
        inter = float(jnp.sum((pred == c) & (label == c)))
        union = float(jnp.sum((pred == c) | (label == c)))
        if union > 0:
            ious.append(inter / union)
    skirt_px_pred = np.asarray(jnp.sum((pred == 12) | (pred == 6), axis=(1, 2)))
    skirt_hit = (skirt_px_pred >= 100) == np.asarray(skirted)
    result = {"metric": "schp_synthetic_holdout",
              "miou": round(float(np.mean(ious)), 4),
              "skirt_detect_acc": round(float(skirt_hit.mean()), 4),
              "steps": args.steps,
              "train_s": round(time.perf_counter() - t0, 1)}

    save(params)
    result["out"] = args.out
    print(json.dumps(result))


if __name__ == "__main__":
    main()
