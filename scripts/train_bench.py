"""Training-step throughput on the current backend (one chip by default).

Times the fused G+D `train_step` (AttLWB-SPADE full config + real VGG19 /
Sphere20a criterion topologies, batch 1, ns=2 nt=2 — the reference's
per-GPU training shape, `docs/train_details.md:155-175`) and prints one JSON
line: {"metric": "train_step_ms_<S>", "value": N, ...}.

Usage: python scripts/train_bench.py [--size 256] [--reps 5] [--bf16] [--remat]
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
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--remat", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(REPO, ".cache", "jax_compilation")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ipercore_tpu.models import smpl as smpl_mod
    from ipercore_tpu.models import flow_composition as fc
    from ipercore_tpu.models.mesh import load_assets
    from ipercore_tpu.models.networks import build_generator, build_discriminator
    from ipercore_tpu.models.networks import criterions as C
    from ipercore_tpu.trainers import lwg_trainer as T

    S, ns, nt, bs = args.size, 2, 2, 1
    model = smpl_mod.template_model()
    assets = load_assets(model)
    comp = fc.make_composer(model, assets, image_size=S, out_dilate_ks=51)
    gen = build_generator("AttLWB-SPADE", {
        "BGNet": {"num_filters": [64, 128, 128, 256], "n_res_block": 6},
        "SIDNet": {"num_filters": [64, 128, 256], "n_res_block": 6},
        "TSFNet": {"num_filters": [64, 128, 256], "n_res_block": 6},
    })
    dis = build_discriminator("patch_global_body_head",
                              {"ndf": 64, "n_layers": 4, "max_nf_mult": 8})
    vgg = C.VGGFeatures()
    vgg_params = jax.jit(vgg.init)(jax.random.PRNGKey(1), jnp.zeros((1, S, S, 3)))
    face = C.SphereFaceFeatures()
    face_params = jax.jit(face.init)(jax.random.PRNGKey(2),
                                     jnp.zeros((1, 112, 96, 3)))

    cfg = T.TrainConfig(
        compute_dtype="bfloat16" if args.bf16 else "float32", remat=args.remat)
    state = T.create_train_state(jax.random.PRNGKey(0), gen, dis, comp, cfg,
                                 ns=ns, nt=nt)

    rng = np.random.RandomState(0)
    smpls = np.zeros((bs, ns + nt, 85), np.float32)
    smpls[:, :, 0] = 1.2
    smpls[:, :, 3:75] = rng.randn(bs, ns + nt, 72).astype(np.float32) * 0.05
    batch = {
        "images": jnp.asarray(
            rng.uniform(-1, 1, (bs, ns + nt, S, S, 3)), jnp.float32),
        "smpls": jnp.asarray(smpls),
        "masks": jnp.asarray(
            (rng.rand(bs, ns + nt, S, S, 1) > 0.5).astype(np.float32)),
        "bg": jnp.asarray(rng.uniform(-1, 1, (bs, S, S, 3)), jnp.float32),
    }

    @jax.jit
    def step(st, b):
        return T.train_step(st, b, comp, gen, dis, vgg, vgg_params,
                            face, face_params, cfg, ns=ns)

    # two warmup steps: the first changes weak types on the state (step
    # counter, schedules) and triggers one retrace — keep it out of the timing
    for _ in range(2):
        state, metrics = step(state, batch)
        _ = float(jax.tree_util.tree_leaves(metrics)[0])  # force on axon

    t0 = time.perf_counter()
    for _ in range(args.reps):
        state, metrics = step(state, batch)
    # axon gotcha: block_until_ready may not block — fetch a scalar
    _ = float(jax.tree_util.tree_leaves(metrics)[0])
    jax.block_until_ready(state.params_G)
    ms = (time.perf_counter() - t0) / args.reps * 1e3

    print(json.dumps({
        "metric": f"train_step_ms_{S}x{S}_bs{bs}_1chip",
        "value": round(ms, 2),
        "unit": "ms/step",
        "config": {"bf16": args.bf16, "remat": args.remat,
                   "ns": ns, "nt": nt},
    }))


if __name__ == "__main__":
    main()
