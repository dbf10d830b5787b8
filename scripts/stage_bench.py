"""Per-stage timing of the 512^2 imitation hot path on the current backend.

Splits a frame's cost into geometry (SMPL -> raster -> flows -> UV sample,
`imitator.make_frame_inputs`) vs network (`LWBGenerator.forward_tsf`) vs the
fused whole (`imitator.synthesize_frames`), so perf work targets the real top
cost. Prints one JSON line per stage: {"stage": ..., "ms_per_frame": N}.

Usage: python scripts/stage_bench.py [--size 512] [--frames 16] [--reps 3]
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
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(REPO, ".cache", "jax_compilation")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ipercore_tpu.models import smpl as smpl_mod
    from ipercore_tpu.models import flow_composition as fc
    from ipercore_tpu.models import imitator as imit
    from ipercore_tpu.models.mesh import load_assets
    from ipercore_tpu.models.networks import build_generator

    S, T, NS = args.size, args.frames, 2
    model = smpl_mod.template_model()
    assets = load_assets(model)
    comp = fc.make_composer(model, assets, image_size=S, out_dilate_ks=51)
    cfg = {
        "BGNet": {"num_filters": [64, 128, 128, 256], "n_res_block": 6},
        "SIDNet": {"num_filters": [64, 128, 256], "n_res_block": 6},
        "TSFNet": {"num_filters": [64, 128, 256], "n_res_block": 6},
    }
    gen = build_generator("AttLWB-SPADE", cfg)

    rng = np.random.RandomState(0)
    bg = jnp.zeros((1, 1, S, S, 4))
    src_in = jnp.zeros((1, NS, S, S, 6))
    tsf0 = jnp.zeros((1, 1, S, S, 6))
    Tst0 = jnp.zeros((1, 1, NS, S, S, 2))
    params = jax.jit(
        lambda r: gen.init(r, bg, src_in, tsf0, Tst0, None, False))(jax.random.PRNGKey(0))

    src_img = jnp.asarray(rng.uniform(-1, 1, (1, NS, S, S, 3)), jnp.float32)
    theta = np.zeros((NS, 85), np.float32)
    theta[:, 0] = 1.2
    theta[:, 3:75] = rng.randn(NS, 72).astype(np.float32) * 0.05
    cache = jax.jit(lambda p, si, ss: imit.setup_source(comp, gen, p, si, ss))(
        params, src_img, jnp.asarray(theta).reshape(1, NS, 85))
    cache = jax.block_until_ready(cache)

    t = np.zeros((T, 85), np.float32)
    t[:, 0] = 1.2
    t[:, 3:75] = rng.randn(T, 72).astype(np.float32) * 0.1
    tgt = jnp.asarray(t)

    def timed(name, fn, *xs):
        out = jax.block_until_ready(fn(*xs))  # compile + warm
        jax.block_until_ready(fn(*xs))
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = jax.block_until_ready(fn(*xs))
        ms = (time.perf_counter() - t0) / (args.reps * T) * 1e3
        print(json.dumps({"stage": name, "ms_per_frame": round(ms, 3)}))
        return out

    bf16 = jnp.bfloat16

    geom = jax.jit(lambda c, g: imit.make_frame_inputs(
        comp, c, g, sample_dtype=bf16))
    tsf_inputs, Tst, _ = timed("geometry:make_frame_inputs", geom, cache, tgt)

    def rep(x):
        return jnp.broadcast_to(x, (T,) + x.shape[1:])

    cast = lambda tree: jax.tree_util.tree_map(
        lambda x: x.astype(bf16)
        if hasattr(x, "astype") and jnp.issubdtype(x.dtype, jnp.floating) else x,
        tree)
    net_params = cast(params)
    enc = [rep(e).astype(bf16) for e in cache.src_enc_outs]
    res = [rep(r).astype(bf16) for r in cache.src_res_outs]

    net = jax.jit(lambda p, ti, e, r, Ts: gen.apply(
        p, ti.astype(bf16), e, r, Ts, method=gen.forward_tsf))
    timed("network:forward_tsf", net, net_params, tsf_inputs, enc, res, Tst)

    full = jax.jit(lambda p, c, g: imit.synthesize_frames(
        comp, gen, p, c, g, compute_dtype=bf16))
    timed("full:synthesize_frames", full, params, cache, tgt)


if __name__ == "__main__":
    main()
