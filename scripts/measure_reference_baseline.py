"""Measure the PyTorch reference's generator throughput on THIS host's CPU,
side by side with the ipercore_tpu generator on the same CPU.

BASELINE.md: the reference publishes no frames/sec, so the baseline "must be
measured locally by running the PyTorch reference". No CUDA exists here, so
the measurable common denominator is the per-frame generator stage — the
reference's `AttentionLWBGenerator.forward_tsf` with cached source encodings
(exactly what its imitation loop runs per frame, `iPERCore/models/imitator.py:388`)
vs our `LWBGenerator.forward_tsf` (what `imitator.synthesize_frames` runs per
frame). The reference additionally pays a CUDA rasterizer + flow composition
per frame that cannot run on CPU, so the reference number here is an UPPER
bound on its per-frame speed — any derived speedup claim is conservative.

Writes BASELINE_MEASURED.json at the repo root and prints one JSON line.

Usage: python scripts/measure_reference_baseline.py [--size 256] [--frames 6]
"""
from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys
import time
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
GEN_DIR = os.path.join(REF, "iPERCore/models/networks/generators")
sys.path.insert(0, REPO)

FULL_CFG = {
    "BGNet": {"num_filters": [64, 128, 128, 256], "n_res_block": 6, "cond_nc": 4},
    "SIDNet": {"num_filters": [64, 128, 256], "n_res_block": 6, "cond_nc": 6},
    "TSFNet": {"num_filters": [64, 128, 256], "n_res_block": 6, "cond_nc": 6},
}


class _NS:
    def __init__(self, **kw):
        self.__dict__.update(kw)


def _load_ref_generator_module():
    """Import the reference attlwb_spade_resunet as a standalone package
    (same loader as tests/test_utils/test_torch_convert_generator.py)."""
    if "ref_genpkg.attlwb_spade_resunet" in sys.modules:
        return sys.modules["ref_genpkg.attlwb_spade_resunet"]
    pkg = types.ModuleType("ref_genpkg")
    pkg.__path__ = [GEN_DIR]
    sys.modules["ref_genpkg"] = pkg
    spec = importlib.util.spec_from_file_location(
        "ref_genpkg.attlwb_spade_resunet",
        os.path.join(GEN_DIR, "attlwb_spade_resunet.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_genpkg.attlwb_spade_resunet"] = mod
    spec.loader.exec_module(mod)
    return mod


def _ref_cfg():
    mk = lambda key, norm: _NS(norm_type=norm, **FULL_CFG[key])
    return _NS(name="AttLWB-SPADE",
               BGNet=mk("BGNet", "instance"),
               SIDNet=mk("SIDNet", "None"),
               TSFNet=mk("TSFNet", "instance"))


def measure_torch(size: int, frames: int, ns: int) -> dict:
    import numpy as np
    import torch

    ref = _load_ref_generator_module()
    torch.manual_seed(0)
    gen = ref.AttentionLWBGenerator(_ref_cfg()).eval()

    rng = np.random.RandomState(0)
    S = size
    src_t = torch.from_numpy(
        rng.uniform(-1, 1, (1, ns, 6, S, S)).astype(np.float32))
    tsf_t = torch.from_numpy(
        rng.uniform(-1, 1, (1, 6, S, S)).astype(np.float32))
    Tst_t = torch.from_numpy(
        rng.uniform(-0.5, 0.5, (1, ns, S, S, 2)).astype(np.float32))

    with torch.no_grad():
        t0 = time.perf_counter()
        enc_outs, res_outs = gen.forward_src(src_t, only_enc=True)
        setup_s = time.perf_counter() - t0

        # warmup (allocator, thread-pool spin-up)
        gen.forward_tsf(tsf_t, enc_outs, res_outs, Tst_t)

        t0 = time.perf_counter()
        for _ in range(frames):
            gen.forward_tsf(tsf_t, enc_outs, res_outs, Tst_t)
        dt = time.perf_counter() - t0

    return {"fps": frames / dt, "setup_s": setup_s,
            "threads": torch.get_num_threads()}


def measure_jax(size: int, frames: int, ns: int) -> dict:
    # force the CPU platform for an apples-to-apples same-host comparison:
    # the shell presets JAX_PLATFORMS=axon (remote TPU), and on that platform
    # block_until_ready does not block — both the env var (before import) and
    # the config update (after) are required on this box
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from ipercore_tpu.models.networks import build_generator

    gen = build_generator("AttLWB-SPADE", FULL_CFG)
    rng = np.random.RandomState(0)
    S = size
    bg_j = jnp.zeros((1, 1, S, S, 4))
    src_j = jnp.asarray(rng.uniform(-1, 1, (1, ns, S, S, 6)), jnp.float32)
    tsf_j = jnp.asarray(rng.uniform(-1, 1, (frames, 1, S, S, 6)), jnp.float32)
    Tst_j = jnp.asarray(rng.uniform(-0.5, 0.5, (frames, 1, ns, S, S, 2)),
                        jnp.float32)
    params = jax.jit(lambda r: gen.init(
        r, bg_j, src_j, tsf_j[:1], Tst_j[:1], None, False))(jax.random.PRNGKey(0))

    enc, res = jax.jit(
        lambda p, s: gen.apply(p, s, True, method=gen.forward_src)
    )(params, src_j)
    rep = lambda x: jnp.broadcast_to(x, (frames,) + x.shape[1:])
    enc = [rep(e) for e in enc]
    res = [rep(r) for r in res]
    tsf_in = tsf_j[:, 0]
    Tst = Tst_j[:, 0]

    @jax.jit
    def run(p, t, e, r, T):
        return gen.apply(p, t, e, r, T, method=gen.forward_tsf)

    out = run(params, tsf_in, enc, res, Tst)
    jax.block_until_ready(out)  # compile + warmup
    t0 = time.perf_counter()
    out = run(params, tsf_in, enc, res, Tst)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return {"fps": frames / dt}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--ns", type=int, default=2)
    args = ap.parse_args()

    result = {
        "metric": f"generator_forward_tsf_fps_{args.size}x{args.size}_cpu",
        "host_cpus": os.cpu_count(),
        "size": args.size,
        "frames": args.frames,
        "num_source": args.ns,
        "note": ("per-frame generator stage only; the reference additionally "
                 "pays a CUDA raster + flow composition per frame (not "
                 "runnable on CPU), so torch_ref_fps is an upper bound"),
    }
    t = measure_torch(args.size, args.frames, args.ns)
    result["torch_ref_fps"] = round(t["fps"], 4)
    result["torch_ref_src_setup_s"] = round(t["setup_s"], 3)
    result["torch_threads"] = t["threads"]
    j = measure_jax(args.size, args.frames, args.ns)
    result["jax_tpu_framework_cpu_fps"] = round(j["fps"], 4)
    result["speedup_same_cpu"] = round(j["fps"] / t["fps"], 3)

    out_path = os.path.join(REPO, "BASELINE_MEASURED.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
