"""Temporal-mode synthesis throughput (frames scanned serially with the
previous prediction fed back — the reference's TemporalFIFO mode,
`iPERCore/models/imitator.py:18-127,397`).

Frames in temporal mode are sequentially dependent (lax.scan), so throughput
is inherently lower than the frame-batched mode; this measures the cost of
that fidelity knob. Prints one JSON line.

Usage: python scripts/temporal_bench.py [--size 512] [--frames 16]
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
    gen = build_generator("AttLWB-SPADE", {
        "BGNet": {"num_filters": [64, 128, 128, 256], "n_res_block": 6},
        "SIDNet": {"num_filters": [64, 128, 256], "n_res_block": 6},
        "TSFNet": {"num_filters": [64, 128, 256], "n_res_block": 6},
    }, temporal=True, feat_warp_stride=2)

    rng = np.random.RandomState(0)
    bg = jnp.zeros((1, 1, S, S, 4))
    src_in = jnp.zeros((1, NS, S, S, 6))
    tsf = jnp.zeros((1, 2, S, S, 6))
    Tst0 = jnp.zeros((1, 2, NS, S, S, 2))
    Ttt0 = jnp.zeros((1, 1, S, S, 2))
    params = jax.jit(lambda r: gen.init(r, bg, src_in, tsf, Tst0, Ttt0, False))(
        jax.random.PRNGKey(0))

    src_img = jnp.asarray(rng.uniform(-1, 1, (1, NS, S, S, 3)), jnp.float32)
    theta = np.zeros((NS, 85), np.float32)
    theta[:, 0] = 1.2
    theta[:, 3:75] = rng.randn(NS, 72).astype(np.float32) * 0.05
    cache = jax.jit(lambda p, si, ss: imit.setup_source(comp, gen, p, si, ss))(
        params, src_img, jnp.asarray(theta).reshape(1, NS, 85))

    t = np.zeros((T, 85), np.float32)
    t[:, 0] = 1.2
    t[:, 3:75] = rng.randn(T, 72).astype(np.float32) * 0.1
    tgt = jnp.asarray(t)

    fn = jax.jit(lambda p, c, g: imit.synthesize_frames_temporal(comp, gen, p, c, g))

    def sync(out):
        return float(jnp.sum(out[0].astype(jnp.float32)))

    sync(fn(params, cache, tgt))
    sync(fn(params, cache, tgt))
    t0 = time.perf_counter()
    out = None
    for _ in range(args.reps):
        out = fn(params, cache, tgt)
    sync(out)
    dt = time.perf_counter() - t0
    fps = args.reps * T / dt
    print(json.dumps({
        "metric": f"temporal_imitation_fps_{S}x{S}_1chip",
        "value": round(fps, 3), "unit": "frames/sec",
    }))


if __name__ == "__main__":
    main()
