"""Torch checkpoint -> flax params converters for the reference's networks.

Maps the reference's `AttLWB-SPADE_id_G_*.pth` state-dict layout
(`iPERCore/models/networks/generators/attlwb_spade_resunet.py` module tree)
onto our `LWBGenerator` parameter tree, so pretrained reference weights can be
loaded for output-parity evaluation. All conv kernels are relaid out
NCHW->HWIO (transposed convs flipped), per
`ipercore_tpu.utils.checkpoint.torch_conv_to_flax`.

Name map (torch -> flax):
  bg_net.main.{i}           -> bg_net/* (sequential order; see _BG_LAYOUT)
  src_net.encoders.layers.{i}.0 -> src_net/encoders/Conv_{i}
  src_net.res_blocks.{i}.main.{0|2} -> src_net/res_blocks_{i}/Conv_{0|1}
  src_net.decoders.layers.{i}.0 -> src_net/decoders/ConvTranspose_{i}
  src_net.img_reg.0 / att_reg.0 -> src_net/heads/Conv_{0|1}
  tsf_net_enc.layers.{i}.0   -> tsf_enc_{i}
  enc_attlwbs.{i}.{fq|fk|fv} -> enc_fusion_{i}/{fq|fk|fv}
  enc_attlwbs.{i}.spade.mlp_{shared.0|gamma|beta} -> enc_fusion_{i}/SPADE_0/Conv_{0|1|2}
  res_blocks.{i}.main.{0|2}  -> tsf_res_blocks_{i}... (see code)
  tsf_net_dec.upconvs.{i}.0 / skippers.{i}.0 -> tsf_net_dec/*
  tsf_img_reg.0 / tsf_att_reg.0 -> tsf_heads/Conv_{0|1}

Use `convert_generator(torch_state_dict, like_params)` — unmatched targets stay
at their initialized values and are reported.
"""
from __future__ import annotations

from typing import Any

import numpy as np

from ipercore_tpu.utils.checkpoint import torch_conv_to_flax


def _assign(tree: dict, path: list[str], value: np.ndarray, report: list[str]):
    node = tree
    for p in path[:-1]:
        if p not in node:
            report.append("MISSING " + "/".join(path))
            return
        node = node[p]
    leaf = path[-1]
    if leaf not in node:
        report.append("MISSING " + "/".join(path))
        return
    if tuple(node[leaf].shape) != tuple(value.shape):
        report.append(
            f"SHAPE {'/'.join(path)}: have {node[leaf].shape}, got {value.shape}")
        return
    node[leaf] = value


def _conv(sd, key, transpose=False):
    w = np.asarray(sd[key + ".weight"])
    out = {"kernel": torch_conv_to_flax(w, transpose=transpose)}
    if key + ".bias" in sd:
        out["bias"] = np.asarray(sd[key + ".bias"])
    return out


def convert_generator(sd: dict, like: Any) -> tuple[dict, list[str]]:
    """Convert an AttLWB-SPADE torch state dict into our LWBGenerator params.

    Args:
        sd: torch state dict (tensors or numpy; `module.` prefixes allowed).
        like: an initialized flax params tree (from `generator.init`).

    Returns:
        (params, report): converted params + list of mismatches (empty = full
        coverage).
    """
    import jax

    sd = {k[7:] if k.startswith("module.") else k: v for k, v in sd.items()}
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
          for k, v in sd.items()}

    # deep-copy `like` into mutable dicts
    def to_mut(x):
        if hasattr(x, "keys"):
            return {k: to_mut(x[k]) for k in x.keys()}
        return np.asarray(x)

    tree = to_mut(like)
    params = tree["params"] if "params" in tree else tree
    report: list[str] = []

    def put(path, key, transpose=False):
        if key + ".weight" not in sd:
            report.append("ABSENT " + key)
            return
        conv = _conv(sd, key, transpose)
        for leaf, val in conv.items():
            _assign(params, path + [leaf], val, report)

    # --- BGNet torch Sequential layout (`bg_inpaintor.py:24-60`, n_down=3,
    # n_res=6): conv7(0) [conv3 IN relu] at 3,6,9; ResidualBlock modules at
    # 12..17 (each .main.{0,3}); deconvs at 18,21,24; final conv7 at 27.
    if "bg_net.main.0.weight" in sd:
        n_down = 3
        n_res = sum(1 for k in sd if k.startswith("bg_net.main.")
                    and k.endswith(".main.0.weight"))
        put(["bg_net", "Conv_0"], "bg_net.main.0")
        for i in range(n_down):
            put(["bg_net", f"Conv_{i + 1}"], f"bg_net.main.{3 * (i + 1)}")
        res_base = 3 * n_down + 3
        for i in range(n_res):
            put(["bg_net", f"ResidualBlockIN_{i}", "Conv_0"],
                f"bg_net.main.{res_base + i}.main.0")
            put(["bg_net", f"ResidualBlockIN_{i}", "Conv_1"],
                f"bg_net.main.{res_base + i}.main.3")
        dec_base = res_base + n_res
        for i in range(n_down):
            put(["bg_net", f"ConvTranspose_{i}"], f"bg_net.main.{dec_base + 3 * i}",
                transpose=True)
        put(["bg_net", f"Conv_{n_down + 1}"], f"bg_net.main.{dec_base + 3 * n_down}")

    # --- SIDNet
    for i in range(8):
        key = f"src_net.encoders.layers.{i}.0"
        if key + ".weight" in sd:
            put(["src_net", "encoders", f"Conv_{i}"], key)
    for i in range(16):
        a = f"src_net.res_blocks.{i}.main.0"
        b = f"src_net.res_blocks.{i}.main.2"
        if a + ".weight" in sd:
            put(["src_net", f"res_blocks_{i}", "Conv_0"], a)
            put(["src_net", f"res_blocks_{i}", "Conv_1"], b)
    for i in range(8):
        key = f"src_net.decoders.layers.{i}.0"
        if key + ".weight" in sd:
            put(["src_net", "decoders", f"ConvTranspose_{i}"], key, transpose=True)
    if "src_net.img_reg.0.weight" in sd:
        put(["src_net", "heads", "Conv_0"], "src_net.img_reg.0")
        put(["src_net", "heads", "Conv_1"], "src_net.att_reg.0")

    # --- TSF encoder convs
    for i in range(8):
        key = f"tsf_net_enc.layers.{i}.0"
        if key + ".weight" in sd:
            put([f"tsf_enc_{i}"], key)

    # --- attention fusions
    for group, prefix in (("enc_fusion", "enc_attlwbs"), ("res_fusion", "res_attlwbs")):
        for i in range(16):
            base = f"{prefix}.{i}"
            if f"{base}.fq.weight" not in sd:
                continue
            for head in ("fq", "fk", "fv"):
                put([f"{group}_{i}", head], f"{base}.{head}")
            put([f"{group}_{i}", "SPADE_0", "Conv_0"], f"{base}.spade.mlp_shared.0")
            put([f"{group}_{i}", "SPADE_0", "Conv_1"], f"{base}.spade.mlp_gamma")
            put([f"{group}_{i}", "SPADE_0", "Conv_2"], f"{base}.spade.mlp_beta")

    # --- TSF res blocks
    for i in range(16):
        a = f"res_blocks.{i}.main.0"
        if a + ".weight" in sd:
            put([f"tsf_res_blocks_{i}", "Conv_0"], a)
            put([f"tsf_res_blocks_{i}", "Conv_1"], f"res_blocks.{i}.main.2")

    # --- skip decoder + heads
    for i in range(8):
        up = f"tsf_net_dec.upconvs.{i}.0"
        if up + ".weight" in sd:
            put(["tsf_net_dec", f"ConvTranspose_{i}"], up, transpose=True)
        sk = f"tsf_net_dec.skippers.{i}.0"
        if sk + ".weight" in sd:
            put(["tsf_net_dec", f"Conv_{i}"], sk)
    if "tsf_img_reg.0.weight" in sd:
        put(["tsf_heads", "Conv_0"], "tsf_img_reg.0")
        put(["tsf_heads", "Conv_1"], "tsf_att_reg.0")

    out = {"params": params} if "params" in tree else params
    return out, report
