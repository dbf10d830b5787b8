"""Identity-contrastive training for the Sphere20a face-loss features.

The reference's FaceLoss always runs DOWNLOADED pretrained identity features
(SphereFace / SENet-50, `faceloss.py:291-320`); with no network in this
environment, production personalization applied lambda_face=5 to random
projections through r4 (VERDICT r4 missing#2). This script trains the exact
`SphereFaceFeatures` trunk so its feature distance means facial-appearance
similarity:

  * identities = procedural person texture/shape draws (the synth engine
    varies skin tone + texture statistics per sample);
  * two views per identity: SAME texture keys, different pose / camera /
    photo augmentation — `person_texture_mix(key, cond)` is deterministic in
    `key` per batch slot, so re-calling it with each view's condition map
    yields the same "clothing/skin" on a different pose;
  * head crops via the projected cocoplus face joints (nose/eyes/ears),
    resampled to the net's 112x96 input;
  * NT-Xent contrastive loss on the l2-normalized fc5 embedding.

Ships `assets/faceloss.npz` (auto-loaded by `criterions.init_face_params`
in the train/personalization services). Holdout metric: 2-view retrieval
accuracy on fresh identities (chance = 1/batch).

Usage: python scripts/train_faceloss.py [--steps 1500] [--ids 12]
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
    ap.add_argument("--ids", type=int, default=12, help="identities per batch")
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--scene_size", type=int, default=192)
    ap.add_argument("--temp", type=float, default=0.2)
    ap.add_argument("--out", type=str,
                    default=os.path.join(REPO, "assets", "faceloss.npz"))
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".cache", "jax_compilation"))

    from ipercore_tpu.models import smpl as smpl_mod
    from ipercore_tpu.models.mesh import load_assets
    from ipercore_tpu.models.networks.criterions import SphereFaceFeatures
    from ipercore_tpu.ops import rasterizer as rz
    from ipercore_tpu.tools import synth_data as sd
    from ipercore_tpu.utils.checkpoint import save_params

    if args.smoke:
        args.steps, args.ids, args.scene_size = 3, 3, 96
        if args.out.startswith(os.path.join(REPO, "assets")):
            args.out = "/tmp/faceloss_smoke.npz"
        model = smpl_mod.synthetic_model(nu=16, nv=14)
        assets = load_assets(model, uv_map_path="/nonexistent",
                             part_path="/nonexistent")
    else:
        model = smpl_mod.template_model()
        assets = load_assets(model)
    K, S = args.ids, args.scene_size
    HW = (112, 96)

    # cocoplus face joints: nose 13, ears 14/16, eyes 15/17, neck 12
    FACE_J = jnp.asarray([13, 14, 15, 16, 17])

    def render_view(key_tex, key_view):
        """One view of K identities: shared texture key, per-view pose/aug."""
        kp, kc, ka, kb = jax.random.split(key_view, 4)
        # frontal-ish: natural stance + small yaw so the face stays visible
        theta = sd.make_theta(kp, K, pose_std=0.15, yaw=False, natural_frac=1.0)
        yaw = jax.random.uniform(kc, (K,), minval=-0.5, maxval=0.5)
        theta = theta.at[:, 4].add(yaw)
        details = smpl_mod.get_details(model, theta)
        fim = sd.render_fim(model, theta, S * 2, f2uvs=assets.f2uvs,
                            details=details)
        alpha = sd._downsample2((fim >= 0).astype(jnp.float32)[..., None])
        cond = sd._downsample2(rz.encode_fim(fim, assets.map_fn))
        tex = sd.person_texture_mix(key_tex, cond, K, S)
        garm = sd._downsample2(sd.garment_texture(
            jax.random.fold_in(key_tex, 7), fim, assets.face_parts))
        use_g = jax.random.bernoulli(
            jax.random.fold_in(key_tex, 8), 0.5, (K, 1, 1, 1)).astype(tex.dtype)
        tex = tex * (1 - use_g) + garm * use_g
        bg = sd.synth_background_mix(ka, K, S)
        img = tex * alpha + bg * (1 - alpha)
        img = sd.photo_augment(kb, img)
        return img, details["j2d"]

    def head_crops(img, j2d):
        """(K, S, S, 3) + cocoplus j2d -> (K, 112, 96, 3) face crops."""
        pxy = (j2d + 1.0) * 0.5 * S - 0.5  # (K, 19, 2) pixel coords
        center = pxy[:, FACE_J].mean(axis=1)  # (K, 2)
        head = jnp.linalg.norm(pxy[:, 13] - pxy[:, 12], axis=-1)  # nose-neck
        side = jnp.clip(head * 2.4, 8.0, S * 0.9)
        ys = (jnp.arange(HW[0]) / HW[0] - 0.5)
        xs = (jnp.arange(HW[1]) / HW[1] - 0.5) * (HW[1] / HW[0])
        def one(im, c, sd_):
            yy = c[1] + ys * sd_
            xx = c[0] + xs * sd_
            gy, gx = jnp.meshgrid(yy, xx, indexing="ij")
            import jax.scipy.ndimage as ndi

            return jnp.stack([
                ndi.map_coordinates(im[..., ch], [gy, gx], order=1,
                                    mode="nearest")
                for ch in range(3)], axis=-1)
        return jax.vmap(one)(img, center, side)

    net = SphereFaceFeatures()
    params = jax.jit(net.init)(jax.random.PRNGKey(0),
                               jnp.zeros((1, HW[0], HW[1], 3)))
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(args.lr))
    opt_state = tx.init(params)

    def embed(params, crops):
        z = net.apply(params, crops)[-1]  # fc5 (N, 512)
        return z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-6)

    def make_batch(key):
        kt, k1, k2 = jax.random.split(key, 3)
        a_img, a_j = render_view(kt, k1)
        b_img, b_j = render_view(kt, k2)
        return head_crops(a_img, a_j), head_crops(b_img, b_j)

    def loss_fn(params, a, b):
        za, zb = embed(params, a), embed(params, b)
        logits = za @ zb.T / args.temp  # (K, K)
        labels = jnp.arange(K)
        l1 = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
        l2 = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels)
        acc = jnp.mean((jnp.argmax(logits, axis=1) == labels).astype(jnp.float32))
        return (l1.mean() + l2.mean()) * 0.5, acc

    @jax.jit
    def train_step(params, opt_state, key):
        a, b = make_batch(key)
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, a, b)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss, acc

    key = jax.random.PRNGKey(555)
    t0 = time.perf_counter()
    for step in range(args.steps):
        key, sub = jax.random.split(key)
        params, opt_state, loss, acc = train_step(params, opt_state, sub)
        if step % max(args.steps // 20, 1) == 0 or step == args.steps - 1:
            print(json.dumps({"step": step, "loss": round(float(loss), 4),
                              "retrieval_acc": round(float(acc), 3)}),
                  flush=True)

    # holdout retrieval on fresh identities
    @jax.jit
    def holdout(params, key):
        a, b = make_batch(key)
        _, acc = loss_fn(params, a, b)
        return acc
    accs = [float(holdout(params, jax.random.PRNGKey(9000 + i)))
            for i in range(4)]
    f16 = jax.tree_util.tree_map(
        lambda v: np.asarray(v, np.float16)
        if np.asarray(v).dtype == np.float32 else np.asarray(v), params)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    save_params(args.out, f16)
    print(json.dumps({
        "metric": "faceloss_holdout_retrieval",
        "acc": round(float(np.mean(accs)), 3), "chance": round(1.0 / K, 3),
        "steps": args.steps, "train_s": round(time.perf_counter() - t0, 1),
        "out": args.out}))


if __name__ == "__main__":
    main()
