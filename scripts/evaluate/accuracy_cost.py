"""Measure the quality cost of each throughput optimization.

VERDICT r1 item 10: the bench's bf16 generator compute, bf16 UV sampling and
half-resolution Tst flows are quality-affecting shortcuts that were never
quantified. This script synthesizes a fixed golden sequence twice — once in
the reference-quality configuration (f32, tst_stride=1) and once per
optimization — and reports SSIM / PSNR / mean-|Δ| of each optimized output
against the golden output. Generator weights are deterministic random
(converted checkpoints are not distributable in this environment), so the
numbers measure the numeric drift each optimization introduces through the
real compute graph, not absolute visual quality.

Usage:  python scripts/evaluate/accuracy_cost.py [--size 512] [--frames 8]
Prints one JSON line per configuration and a markdown table.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import numpy as np


def golden_sequence(S: int, ns: int, T: int):
    """Deterministic, structured inputs (gradients + checker + blobs) so SSIM
    is meaningful, with a smooth synthetic pose track."""
    rng = np.random.RandomState(0)
    yy, xx = np.meshgrid(np.linspace(-1, 1, S), np.linspace(-1, 1, S), indexing="ij")
    imgs = []
    for i in range(ns):
        checker = np.sign(np.sin(xx * (8 + 4 * i) * np.pi) * np.sin(yy * 8 * np.pi))
        blob = np.exp(-((xx - 0.2 * i) ** 2 + yy ** 2) / 0.08)
        img = np.stack([xx, checker * 0.5, blob * 2 - 1], axis=-1)
        imgs.append(np.clip(img + rng.uniform(-0.05, 0.05, (S, S, 3)), -1, 1))
    src_img = np.stack(imgs)[None].astype(np.float32)

    src_smpl = np.zeros((1, ns, 85), np.float32)
    src_smpl[..., 0] = 1.1
    t = np.linspace(0, 2 * np.pi, T, endpoint=False)
    tgt = np.zeros((T, 85), np.float32)
    tgt[:, 0] = 1.1
    tgt[:, 3 + 3] = 0.3 * np.sin(t)          # hip sway
    tgt[:, 3 + 48] = 0.4 * np.sin(t * 2)     # arm swing
    tgt[:, 1] = 0.05 * np.cos(t)             # cam tx drift
    return src_img, src_smpl, tgt


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--smoke", action="store_true", help="tiny nets/mesh (CI)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.dirname(os.path.abspath(__file__)))),
                          ".cache", "jax_compilation"))

    from ipercore_tpu.models import flow_composition as fc
    from ipercore_tpu.models import imitator as imit
    from ipercore_tpu.models import smpl as smpl_mod
    from ipercore_tpu.models.mesh import load_assets
    from ipercore_tpu.models.networks import build_generator
    from ipercore_tpu.services.evaluate import psnr, ssim

    S = 64 if args.smoke else args.size
    ns, T = 2, args.frames
    if args.smoke:
        model = smpl_mod.synthetic_model(nu=20, nv=18)
        assets = load_assets(model, uv_map_path="/nonexistent", part_path="/nonexistent")
        cfg = {"BGNet": {"num_filters": [8, 16, 16, 32], "n_res_block": 1},
               "SIDNet": {"num_filters": [8, 16, 32], "n_res_block": 1},
               "TSFNet": {"num_filters": [8, 16, 32], "n_res_block": 1}}
    else:
        model = smpl_mod.template_model()
        assets = load_assets(model)
        cfg = {"BGNet": {"num_filters": [64, 128, 128, 256], "n_res_block": 6},
               "SIDNet": {"num_filters": [64, 128, 256], "n_res_block": 6},
               "TSFNet": {"num_filters": [64, 128, 256], "n_res_block": 6}}
    comp = fc.make_composer(model, assets, image_size=S,
                            out_dilate_ks=11 if args.smoke else 51)
    gen = build_generator("AttLWB-SPADE", cfg)

    src_img, src_smpl, tgt = golden_sequence(S, ns, T)
    bg0 = jnp.zeros((1, 1, S, S, 4))
    src_in0 = jnp.zeros((1, ns, S, S, 6))
    tsf0 = jnp.zeros((1, 1, S, S, 6))
    Tst0 = jnp.zeros((1, 1, ns, S, S, 2))
    params = jax.jit(lambda r: gen.init(r, bg0, src_in0, tsf0, Tst0, None, False))(
        jax.random.PRNGKey(0))

    cache = imit.setup_source(comp, gen, params, jnp.asarray(src_img),
                              jnp.asarray(src_smpl))

    # feat_warp_stride is a generator attribute (no new params: the stride-2
    # module shares the stride-1 parameter tree)
    gen_fw2 = build_generator("AttLWB-SPADE", cfg, feat_warp_stride=2)

    def run(compute_dtype, tst_stride, g=None):
        g = g or gen
        fn = jax.jit(lambda smpl: imit.synthesize_frames(
            comp, g, params, cache, smpl,
            compute_dtype=compute_dtype, tst_stride=tst_stride)[0])
        out = np.asarray(fn(jnp.asarray(tgt)), np.float32)
        return out

    configs = [
        ("golden_f32_stride1", None, 1, None),
        ("bf16_generator", jnp.bfloat16, 1, None),
        ("tst_stride2", None, 2, None),
        ("feat_warp_stride2", None, 1, gen_fw2),
        ("bench_bf16_stride2", jnp.bfloat16, 2, None),
        ("bench_bf16_stride2_fw2", jnp.bfloat16, 2, gen_fw2),
    ]
    golden = None
    rows = []
    for name, dtype, stride, g in configs:
        out = run(dtype, stride, g)
        if golden is None:
            golden = out
            continue
        a = jnp.asarray((out + 1.0) * 0.5)
        b = jnp.asarray((golden + 1.0) * 0.5)
        row = {
            "config": name,
            "ssim_vs_golden": round(float(jnp.mean(ssim(a, b))), 5),
            "psnr_vs_golden": round(float(jnp.mean(psnr(a, b))), 2),
            "mean_abs_delta": round(float(np.mean(np.abs(out - golden))), 6),
            "size": S, "frames": T,
        }
        rows.append(row)
        print(json.dumps(row))

    print("\n| config | SSIM vs f32/stride1 | PSNR (dB) | mean |Δ| |")
    print("|---|---|---|---|")
    for r in rows:
        print(f"| {r['config']} | {r['ssim_vs_golden']} | "
              f"{r['psnr_vs_golden']} | {r['mean_abs_delta']} |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
