"""Qualify personalization/training memory at a given resolution on one chip.

The reference quotes 20 GB on a V100-32G for 1024^2 personalization
(`/root/reference/README.md:50-55`); this box has a 16 GB chip, and round 3's
two OOM incidents showed memory margins are found by crashing. This script
makes the margin a MEASURED number (VERDICT r3 item 7): it builds the exact
production personalization train step (full-width AttLWB-SPADE G + patch
/global D + VGG + face criterions, `services/personalization.py:157-190`),
compiles it at --size, prints XLA's memory analysis, and optionally executes
real steps.

Knobs measured: --remat (recompute G forward in backward — the standard
512^2+ HBM lever, `trainers/lwg_trainer.py` TrainConfig.remat) and
--dtype bfloat16 (network compute in bf16, master params f32).

Usage:
  python scripts/qualify_train_memory.py --size 1024 --remat --dtype bfloat16 --run 2
Prints one JSON line with compiled temp/argument bytes and step wall time.
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--ns", type=int, default=2)
    ap.add_argument("--nt", type=int, default=1)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--dtype", choices=("float32", "bfloat16"),
                    default="bfloat16")
    ap.add_argument("--run", type=int, default=0,
                    help="execute N real steps after compiling (0 = compile "
                         "+ memory analysis only)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(REPO, ".cache", "jax_compilation")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ipercore_tpu.models import flow_composition as fc
    from ipercore_tpu.models import smpl as smpl_mod
    from ipercore_tpu.models.mesh import load_assets
    from ipercore_tpu.models.networks import (build_discriminator,
                                              build_generator)
    from ipercore_tpu.models.networks import criterions as C
    from ipercore_tpu.trainers import lwg_trainer as T

    S, bs, ns, nt = args.size, args.batch, args.ns, args.nt
    model = smpl_mod.template_model()
    assets = load_assets(model)
    comp = fc.make_composer(model, assets, image_size=S, out_dilate_ks=51)
    gen_cfg = {
        "BGNet": {"num_filters": [64, 128, 128, 256], "n_res_block": 6},
        "SIDNet": {"num_filters": [64, 128, 256], "n_res_block": 6},
        "TSFNet": {"num_filters": [64, 128, 256], "n_res_block": 6},
    }
    gen = build_generator("AttLWB-SPADE", gen_cfg)
    dis = build_discriminator("patch_global", {})
    vgg = C.VGGFeatures()
    vgg_params = C.init_vgg_params(jax.random.PRNGKey(1), S)
    face = C.SphereFaceFeatures()
    face_params = jax.jit(face.init)(
        jax.random.PRNGKey(2), jnp.zeros((1, 112, 96, 3)))

    cfg = T.TrainConfig(remat=args.remat, compute_dtype=args.dtype)
    state = T.create_train_state(
        jax.random.PRNGKey(0), gen, dis, comp, cfg, ns=ns, nt=nt)

    step = jax.jit(functools.partial(
        T.train_step, comp=comp, generator=gen, discriminator=dis,
        vgg=vgg, vgg_params=vgg_params, face=face, face_params=face_params,
        cfg=cfg, ns=ns))

    rng = np.random.RandomState(0)
    theta = np.zeros((bs, ns + nt, 85), np.float32)
    theta[..., 0] = 1.2
    theta[..., 3:75] = rng.randn(bs, ns + nt, 72).astype(np.float32) * 0.1
    batch = {
        "images": jnp.asarray(
            rng.uniform(-1, 1, (bs, ns + nt, S, S, 3)), jnp.float32),
        "smpls": jnp.asarray(theta),
        "masks": jnp.ones((bs, ns + nt, S, S, 1), jnp.float32),
        "bg": jnp.zeros((bs, S, S, 3), jnp.float32),
    }

    t0 = time.perf_counter()
    compiled = step.lower(state, batch).compile()
    compile_s = time.perf_counter() - t0
    out = {
        "metric": "train_step_memory", "size": S, "batch": bs,
        "ns": ns, "nt": nt, "remat": args.remat, "dtype": args.dtype,
        "compile_s": round(compile_s, 1),
        "device": getattr(jax.devices()[0], "device_kind", "unknown"),
    }
    try:
        ma = compiled.memory_analysis()
        out["temp_gib"] = round(ma.temp_size_in_bytes / 2 ** 30, 3)
        out["args_gib"] = round(ma.argument_size_in_bytes / 2 ** 30, 3)
        out["output_gib"] = round(ma.output_size_in_bytes / 2 ** 30, 3)
        out["total_gib"] = round(
            (ma.temp_size_in_bytes + ma.argument_size_in_bytes) / 2 ** 30, 3)
    except Exception as e:  # axon may not expose memory analysis
        out["memory_analysis_error"] = str(e)[:120]

    if args.run:
        st = state
        # first call may re-trace through jit; reuse the jitted step
        st, m = step(st, batch)
        float(m["g_total"])  # force execution (axon: block_until_ready no-op)
        t0 = time.perf_counter()
        for _ in range(args.run):
            st, m = step(st, batch)
            float(m["g_total"])
        out["step_s"] = round((time.perf_counter() - t0) / args.run, 3)
        out["g_total"] = round(float(m["g_total"]), 4)
        out["ran_ok"] = bool(np.isfinite(float(m["g_total"])))

    print(json.dumps(out))


if __name__ == "__main__":
    main()
