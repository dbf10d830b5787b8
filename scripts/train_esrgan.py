"""Train the RRDBNet 4x super-resolution net on procedural scenes.

The reference downloads the mmedit `esrgan_psnr_x4c64b23g32` DIV2K checkpoint
(`assets/download.sh`) and runs it after background inpainting when the
original frame is larger than the control size (`mmedit_inpaintors.py:57-59`,
`run_inpainting:69`). No network here, so this trains the exact same
architecture (`tools.inpaintors.RRDBNet`) on procedural data: HR = composited
SMPL scenes + background plates (sharp silhouette edges + checker/gradient
texture), LR = 4x box-downsample, L1 loss — the same PSNR-oriented objective
as the `_psnr_` checkpoint the reference wires in.

Weights land in `assets/esrgan.npz` (f16) and auto-load in
`tools.inpaintors.SuperResolutionInpaintor`. Domain: procedural renders, not
photographs; converted torch weights drop into the same layout via
`utils.torch_convert.convert_esrgan`.

Usage: python scripts/train_esrgan.py [--steps 1500] [--batch 4]
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
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--size", type=int, default=192, help="HR patch size")
    ap.add_argument("--out", type=str, default=os.path.join(REPO, "assets", "esrgan.npz"))
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--pool", type=int, default=0,
                    help="pre-render this many HR scenes once and augment per "
                         "step (flip/shift/color) instead of rendering every "
                         "step — for CPU hosts. 0 = fresh scenes (TPU default)")
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
    from ipercore_tpu.tools.inpaintors import RRDBNet
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

    def render_scenes(key):
        return sd.compose_scene(key, model, assets, B, S).img

    if args.pool:
        # Pre-render the person scenes once (the per-step cost bottleneck on
        # CPU); plates stay fresh, and SR is flip/shift/color invariant so
        # pooled scenes augment freely.
        render_scenes = jax.jit(render_scenes)
        pool_n = max(args.pool, B)
        chunks = []
        pk = jax.random.PRNGKey(909)
        for _ in range(-(-pool_n // B)):
            pk, sub = jax.random.split(pk)
            chunks.append(render_scenes(sub))
        scene_pool = jnp.concatenate(chunks, axis=0)[:pool_n]
        print(f"scene pool ready: {scene_pool.shape}", flush=True)

        def get_scenes(key):
            k0, k1, k2, k3, k4 = jax.random.split(key, 5)
            img = scene_pool[jax.random.randint(k0, (B,), 0, pool_n)]
            flip = jax.random.bernoulli(k1, 0.5, (B, 1, 1, 1))
            img = jnp.where(flip, img[:, :, ::-1], img)
            shift = jax.random.randint(k2, (B, 2), -S // 6, S // 6 + 1)
            img = jax.vmap(lambda im, s: jnp.roll(im, s, axis=(0, 1)))(img, shift)
            gain = jax.random.uniform(k3, (B, 1, 1, 3), minval=0.7, maxval=1.3)
            bias = jax.random.uniform(k4, (B, 1, 1, 3), minval=-0.15, maxval=0.15)
            return jnp.clip(img * gain + bias, -1, 1)
    else:
        get_scenes = render_scenes

    def make_batch(key):
        """HR in [0, 1] (the checkpoint's native domain) + LR 4x box-down."""
        k1, k2, k3 = jax.random.split(key, 3)
        scenes = get_scenes(k1)
        plates = sd.synth_background(k2, B, S)
        use_scene = jax.random.bernoulli(k3, 0.7, (B, 1, 1, 1))
        hr = jnp.where(use_scene, scenes, plates) * 0.5 + 0.5
        lr = jax.lax.reduce_window(
            hr, 0.0, jax.lax.add, (1, 4, 4, 1), (1, 4, 4, 1), "VALID") / 16.0
        return hr, lr

    net = RRDBNet()
    params = jax.jit(net.init)(jax.random.PRNGKey(0),
                               jnp.zeros((1, S // 4, S // 4, 3)))
    if args.resume and os.path.exists(args.out):
        params = load_params(args.out, like=params)
        print(f"resumed from {args.out}", flush=True)

    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(args.lr))
    opt_state = tx.init(params)

    def loss_fn(params, hr, lr):
        out = net.apply(params, lr)
        return jnp.mean(jnp.abs(out - hr))

    @jax.jit
    def train_step(params, opt_state, key):
        hr, lr = make_batch(key)
        loss, grads = jax.value_and_grad(loss_fn)(params, hr, lr)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    def save(params):
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        f16 = jax.tree_util.tree_map(
            lambda v: np.asarray(v, np.float16) if np.asarray(v).dtype == np.float32
            else np.asarray(v), params)
        save_params(args.out, f16)

    key = jax.random.PRNGKey(77)
    t0 = time.perf_counter()
    for step in range(args.steps):
        key, sub = jax.random.split(key)
        params, opt_state, loss = train_step(params, opt_state, sub)
        if step % max(args.steps // 10, 1) == 0 or step == args.steps - 1:
            print(json.dumps({"step": step, "l1": round(float(loss), 5)}),
                  flush=True)
        if args.save_every and step and step % args.save_every == 0:
            save(params)

    # holdout: PSNR of the net vs bilinear upsample on fresh scenes
    hr, lr = jax.jit(make_batch)(jax.random.PRNGKey(31337))
    out = jnp.clip(net.apply(params, lr), 0, 1)
    bil = jax.image.resize(lr, hr.shape, "bilinear")

    def psnr(a, b):
        return float(-10 * jnp.log10(jnp.mean((a - b) ** 2) + 1e-12))

    result = {"metric": "esrgan_synthetic_holdout",
              "psnr": round(psnr(out, hr), 2),
              "psnr_bilinear": round(psnr(bil, hr), 2),
              "steps": args.steps,
              "train_s": round(time.perf_counter() - t0, 1)}

    save(params)
    result["out"] = args.out
    print(json.dumps(result))


if __name__ == "__main__":
    main()
