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
        """(B,) random SMPL scenes -> soft alpha (B, S, S, 1), cond (B, S, S, 3)."""
        k1, k2, k3, k4 = jax.random.split(key, 4)
        theta = jnp.zeros((B, 85))
        scale = jax.random.uniform(k1, (B, 1), minval=0.55, maxval=1.6)
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
        return alpha, cond

    def synth_background(key):
        k = jax.random.split(key, 7)
        yy, xx = jnp.meshgrid(jnp.linspace(-1, 1, S), jnp.linspace(-1, 1, S),
                              indexing="ij")
        ang = jax.random.uniform(k[0], (B, 1, 1), minval=0, maxval=np.pi)
        g = (jnp.cos(ang) * xx[None] + jnp.sin(ang) * yy[None])[..., None]
        ca = jax.random.uniform(k[1], (B, 1, 1, 3), minval=-1, maxval=1)
        cb = jax.random.uniform(k[2], (B, 1, 1, 3), minval=-1, maxval=1)
        grad = ca + (cb - ca) * (g * 0.5 + 0.5)
        fx = jax.random.uniform(k[3], (B, 1, 1), minval=2, maxval=14)
        fy = jax.random.uniform(k[4], (B, 1, 1), minval=2, maxval=14)
        check = jnp.sign(jnp.sin(xx[None] * fx * np.pi)
                         * jnp.sin(yy[None] * fy * np.pi))[..., None]
        check = check * jax.random.uniform(k[5], (B, 1, 1, 3),
                                           minval=-0.8, maxval=0.8)
        noise = jax.random.uniform(k[6], (B, S, S, 3), minval=-1, maxval=1)
        w = jax.random.dirichlet(k[0], jnp.ones(3), (B,))  # (B, 3)
        w = w[:, None, None, :]
        bg = w[..., 0:1] * grad + w[..., 1:2] * check + w[..., 2:3] * noise
        return jnp.clip(bg, -1, 1)

    def make_batch(key):
        ka, kb, kc, kd, ke = jax.random.split(key, 5)
        alpha, cond = render_alpha(ka)
        bg = synth_background(kb)
        M = jax.random.uniform(kc, (B, 3, 3), minval=-1, maxval=1)
        tex = jnp.einsum("bhwc,bcd->bhwd", cond, M)
        tex = jnp.tanh(tex + 0.15 * jax.random.normal(kd, (B, S, S, 3)))
        img = tex * alpha + bg * (1.0 - alpha)
        img = jnp.clip(img + 0.05 * jax.random.normal(ke, (B, S, S, 3)), -1, 1)
        hard = (alpha > 0.5).astype(jnp.float32)
        return img, alpha, hard

    seg = PersonSegUNet()
    mat = MattingRefiner()
    k0 = jax.random.PRNGKey(0)
    params = {
        "seg": jax.jit(seg.init)(k0, jnp.zeros((1, S, S, 3))),
        "mat": jax.jit(mat.init)(jax.random.PRNGKey(1), jnp.zeros((1, S, S, 4))),
    }
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)

    def loss_fn(params, img, alpha, hard):
        logits = seg.apply(params["seg"], img)
        bce = jnp.mean(optax.sigmoid_binary_cross_entropy(logits, hard))
        p = jax.nn.sigmoid(logits)
        inter = jnp.sum(p * hard, axis=(1, 2, 3))
        dice = 1.0 - jnp.mean((2 * inter + 1.0) /
                              (jnp.sum(p, (1, 2, 3)) + jnp.sum(hard, (1, 2, 3)) + 1.0))
        trimap = generate_trimap(hard)
        a_pred = mat.apply(params["mat"], jnp.concatenate([img, trimap], axis=-1))
        l1 = jnp.mean(jnp.abs(a_pred - alpha))
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

    key = jax.random.PRNGKey(42)
    t0 = time.perf_counter()
    for step in range(args.steps):
        key, sub = jax.random.split(key)
        params, opt_state, loss, aux = train_step(params, opt_state, sub)
        if step % max(args.steps // 10, 1) == 0 or step == args.steps - 1:
            print(json.dumps({"step": step, "loss": round(float(loss), 4),
                              **{k: round(float(v), 4) for k, v in aux.items()}}),
                  flush=True)

    # held-out eval
    img, alpha, hard = jax.jit(make_batch)(jax.random.PRNGKey(777))
    _, aux = loss_fn(params, img, alpha, hard)
    result = {"metric": "person_seg_synthetic_holdout",
              "iou": round(float(aux["iou"]), 4),
              "alpha_l1": round(float(aux["alpha_l1"]), 4),
              "steps": args.steps, "size": S,
              "train_s": round(time.perf_counter() - t0, 1)}

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    f16 = jax.tree_util.tree_map(
        lambda x: np.asarray(x, np.float16) if np.asarray(x).dtype == np.float32
        else np.asarray(x), params)
    save_params(args.out, f16)
    result["out"] = args.out
    print(json.dumps(result))


if __name__ == "__main__":
    main()
