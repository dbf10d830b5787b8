"""Train the gated-conv background inpaintor on procedural scenes.

The reference downloads the mmedit deepfillv2 Places2 checkpoint
(`assets/download.sh`); this environment has no network, so the gated-conv
net ran untrained behind a diffusion fallback. This script trains it on
procedural background plates (`tools/synth_data.synth_background`) with
random person-shaped holes (`random_holes` + rendered SMPL silhouettes —
the production hole IS a dilated person mask): L1 reconstruction inside the
hole plus a small total-variation smoothness term.

Weights land in `assets/inpaintor.npz` (f16) and auto-load in
`tools.inpaintors.SuperResolutionInpaintor`, upgrading preprocessing stage
1.6 from diffusion fill to a trained inpaintor. Domain: procedural plates —
not photographs; see docs/PARITY.md.

Usage: python scripts/train_inpaintor.py [--steps 2000] [--batch 8]
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
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--size", type=int, default=256, help="control size")
    ap.add_argument("--out", type=str, default=os.path.join(REPO, "assets", "inpaintor.npz"))
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--pool", type=int, default=64,
                    help="pre-rendered SMPL silhouette pool size (renders are "
                         "the per-step cost bottleneck on CPU; the pool is "
                         "rendered once and augmented per step)")
    ap.add_argument("--save_every", type=int, default=200,
                    help="checkpoint cadence in steps (0 = only at the end)")
    ap.add_argument("--stage", type=int, default=1, choices=(1, 2),
                    help="1 = coarse gated net; 2 = contextual-attention "
                         "refinement (`RefineInpaintor`) on top of the frozen "
                         "stage-1 output (deepfillv2 two-stage parity, "
                         "`mmedit_inpaintors.py:22-59`)")
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
    from ipercore_tpu.ops.morphology import dilate
    from ipercore_tpu.tools import synth_data as sd
    from ipercore_tpu.tools.inpaintors import GatedInpaintor
    from ipercore_tpu.utils.checkpoint import load_params, save_params

    if args.smoke:
        args.steps, args.batch, args.size = 4, 2, 64
        if args.out.startswith(os.path.join(REPO, "assets")):
            args.out = "/tmp/inpaintor_smoke.npz"  # never clobber shipped weights
        model = smpl_mod.synthetic_model(nu=16, nv=14)
        assets = load_assets(model, uv_map_path="/nonexistent", part_path="/nonexistent")
    else:
        model = smpl_mod.template_model()
        assets = load_assets(model)
    B, S = args.batch, args.size

    # Pre-render a pool of dilated SMPL silhouettes once: the per-step SMPL
    # render dominated step cost (~6s/step on the 1-core CPU host); sampling
    # a pre-rendered pool with flip/shift augmentation keeps the production
    # hole shapes while cutting a step to the inpaintor fwd/bwd.
    def render_sil_chunk(key):
        theta = sd.make_theta(key, B)
        fim = sd.render_fim(model, theta, S, f2uvs=assets.f2uvs)
        return dilate((fim >= 0).astype(jnp.float32)[..., None], 15)

    pool_n = max(args.pool, B)
    render_sil_chunk = jax.jit(render_sil_chunk)
    chunks = []
    pk = jax.random.PRNGKey(101)
    for _ in range(-(-pool_n // B)):
        pk, sub = jax.random.split(pk)
        chunks.append(render_sil_chunk(sub))
    sil_pool = jnp.concatenate(chunks, axis=0)[:pool_n]  # (P, S, S, 1)
    print(f"silhouette pool ready: {sil_pool.shape}", flush=True)

    def make_batch(key):
        k1, k3, k4, k5, k6, k7 = jax.random.split(key, 6)
        bg = sd.synth_background(k1, B, S)
        # half the holes are dilated SMPL silhouettes (the production hole),
        # half random rectangles/ellipses (generalization)
        idx = jax.random.randint(k5, (B,), 0, pool_n)
        sil = sil_pool[idx]
        flip = jax.random.bernoulli(k6, 0.5, (B, 1, 1, 1))
        sil = jnp.where(flip, sil[:, :, ::-1], sil)
        shift = jax.random.randint(k7, (B, 2), -S // 8, S // 8 + 1)
        sil = jax.vmap(lambda im, s: jnp.roll(im, s, axis=(0, 1)))(sil, shift)
        rand = sd.random_holes(k3, B, S)
        use_sil = jax.random.bernoulli(k4, 0.5, (B, 1, 1, 1))
        hole = jnp.where(use_sil, sil, rand)
        return bg, hole

    net = GatedInpaintor()
    coarse_params = jax.jit(net.init)(jax.random.PRNGKey(0), jnp.zeros((1, S, S, 4)))
    stage1_path = os.path.join(REPO, "assets", "inpaintor.npz")
    if args.stage == 2:
        from ipercore_tpu.tools.inpaintors import RefineInpaintor

        # frozen stage-1 (must be trained first)
        assert os.path.exists(stage1_path), \
            "train stage 1 first (assets/inpaintor.npz missing)"
        coarse_params = load_params(stage1_path, like=coarse_params)
        coarse_params = jax.tree_util.tree_map(
            lambda v: jnp.asarray(np.asarray(v), jnp.float32), coarse_params)
        refine = RefineInpaintor()
        params = jax.jit(refine.init)(
            jax.random.PRNGKey(3), jnp.zeros((1, S, S, 4)), jnp.zeros((1, S, S, 1)))
        if args.out.endswith("inpaintor.npz"):  # default redirect for stage 2
            args.out = os.path.join(REPO, "assets", "inpaintor_refine.npz")
    else:
        params = coarse_params
    if args.resume and os.path.exists(args.out):
        params = load_params(args.out, like=params)
        print(f"resumed from {args.out}", flush=True)

    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(args.lr))
    opt_state = tx.init(params)

    def coarse_out(bg, hole):
        x = jnp.concatenate([bg * (1 - hole), hole], axis=-1)
        out = net.apply(coarse_params, x)
        return bg * (1 - hole) + out * hole

    def loss_fn(params, bg, hole):
        if args.stage == 2:
            c = jax.lax.stop_gradient(coarse_out(bg, hole))
            out = refine.apply(params, jnp.concatenate([c, hole], axis=-1), hole)
        else:
            x = jnp.concatenate([bg * (1 - hole), hole], axis=-1)
            out = net.apply(params, x)
        l1_hole = jnp.sum(jnp.abs(out - bg) * hole) / jnp.maximum(hole.sum() * 3, 1.0)
        l1_keep = jnp.mean(jnp.abs(out - bg) * (1 - hole))
        tv = (jnp.mean(jnp.abs(out[:, 1:] - out[:, :-1]))
              + jnp.mean(jnp.abs(out[:, :, 1:] - out[:, :, :-1])))
        return l1_hole + 0.5 * l1_keep + 0.1 * tv, {
            "l1_hole": l1_hole, "l1_keep": l1_keep}

    @jax.jit
    def train_step(params, opt_state, key):
        bg, hole = make_batch(key)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, bg, hole)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss, aux

    def save(params):
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        f16 = jax.tree_util.tree_map(
            lambda v: np.asarray(v, np.float16) if np.asarray(v).dtype == np.float32
            else np.asarray(v), params)
        save_params(args.out, f16)

    key = jax.random.PRNGKey(55)
    t0 = time.perf_counter()
    for step in range(args.steps):
        key, sub = jax.random.split(key)
        params, opt_state, loss, aux = train_step(params, opt_state, sub)
        if step % max(args.steps // 10, 1) == 0 or step == args.steps - 1:
            print(json.dumps({"step": step, "loss": round(float(loss), 4),
                              **{k: round(float(v), 4) for k, v in aux.items()}}),
                  flush=True)
        if args.save_every and step and step % args.save_every == 0:
            save(params)

    bg, hole = jax.jit(make_batch)(jax.random.PRNGKey(777))
    _, aux = loss_fn(params, bg, hole)
    result = {"metric": "inpaintor_synthetic_holdout",
              "stage": args.stage,
              "hole_l1": round(float(aux["l1_hole"]), 4),
              "steps": args.steps,
              "train_s": round(time.perf_counter() - t0, 1)}

    if args.stage == 2:
        # masked-region PSNR: diffusion fallback vs stage-1 vs stage-2
        # (VERDICT r2 item 5's comparison)
        from ipercore_tpu.tools.inpaintors import diffusion_fill

        def masked_psnr(out):
            mse = jnp.sum(((out - bg) * hole) ** 2) / jnp.maximum(hole.sum() * 3, 1.0)
            return float(10 * jnp.log10(4.0 / jnp.maximum(mse, 1e-10)))  # range [-1,1]

        c = coarse_out(bg, hole)
        r = refine.apply(params, jnp.concatenate([c, hole], axis=-1), hole)
        r = bg * (1 - hole) + r * hole
        d = diffusion_fill(bg * (1 - hole), hole)
        result["psnr_diffusion"] = round(masked_psnr(d), 2)
        result["psnr_stage1"] = round(masked_psnr(c), 2)
        result["psnr_stage2"] = round(masked_psnr(r), 2)

    save(params)
    result["out"] = args.out
    print(json.dumps(result))


if __name__ == "__main__":
    main()
