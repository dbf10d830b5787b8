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
        # nested pattern "bg_net.main.<i>.main.0.weight" identifies residual
        # blocks; a bare endswith(".main.0.weight") also matched the OUTER
        # first conv "bg_net.main.0.weight" and off-by-one'd every deconv
        import re as _re

        n_res = sum(1 for k in sd
                    if _re.fullmatch(r"bg_net\.main\.\d+\.main\.0\.weight", k))
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


# ---------------------------------------------------------------------------
# Perception-net converters (SPIN / Sphere20a / VGG19 / OpenPose Body-25)
# ---------------------------------------------------------------------------


def _normalize_sd(sd: dict) -> dict:
    sd = {k[7:] if k.startswith("module.") else k: v for k, v in sd.items()}
    return {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
            for k, v in sd.items()}


def _mutable_like(like):
    def to_mut(x):
        if hasattr(x, "keys"):
            return {k: to_mut(x[k]) for k in x.keys()}
        return np.asarray(x)

    tree = to_mut(like)
    params = tree["params"] if "params" in tree else tree
    return tree, params


def _finish(tree, params):
    return {"params": params} if "params" in tree else params


def _put_conv(sd, params, torch_key, flax_path, report, transpose=False):
    if torch_key + ".weight" not in sd:
        report.append("ABSENT " + torch_key)
        return
    _assign(params, flax_path + ["kernel"],
            torch_conv_to_flax(sd[torch_key + ".weight"], transpose=transpose), report)
    if torch_key + ".bias" in sd:
        _assign(params, flax_path + ["bias"], sd[torch_key + ".bias"], report)


def _put_dense(sd, params, torch_key, flax_path, report):
    if torch_key + ".weight" not in sd:
        report.append("ABSENT " + torch_key)
        return
    _assign(params, flax_path + ["kernel"], sd[torch_key + ".weight"].T.copy(), report)
    if torch_key + ".bias" in sd:
        _assign(params, flax_path + ["bias"], sd[torch_key + ".bias"], report)


def _put_bn(sd, params, torch_key, flax_path, report):
    """BatchNorm2d -> FrozenBatchNorm {scale, bias, mean, var}."""
    pairs = [("weight", "scale"), ("bias", "bias"),
             ("running_mean", "mean"), ("running_var", "var")]
    if torch_key + ".weight" not in sd:
        report.append("ABSENT " + torch_key)
        return
    for tk, fk in pairs:
        if torch_key + "." + tk in sd:
            _assign(params, flax_path + [fk], sd[torch_key + "." + tk], report)


def convert_spin(sd: dict, like) -> tuple[dict, list[str]]:
    """SPIN `model_checkpoint.pt` state dict -> `tools.pose3d.SPINNet` params.

    Torch layout (`spin/network.py:52-120`): conv1/bn1, layer{1-4}.{b}.
    {conv,bn}{1-3} + downsample.{0,1}, fc1/fc2/decpose/decshape/deccam,
    init_{pose,shape,cam} buffers.
    """
    sd = _normalize_sd(sd)
    tree, params = _mutable_like(like)
    report: list[str] = []
    bk = ["backbone"]

    _put_conv(sd, params, "conv1", bk + ["conv1"], report)
    _put_bn(sd, params, "bn1", bk + ["bn1"], report)
    for l, blocks in enumerate((3, 4, 6, 3), start=1):
        for b in range(blocks):
            t = f"layer{l}.{b}"
            f = bk + [f"layer{l}_{b}"]
            for j in (1, 2, 3):
                _put_conv(sd, params, f"{t}.conv{j}", f + [f"conv{j}"], report)
                _put_bn(sd, params, f"{t}.bn{j}", f + [f"bn{j}"], report)
            if f"{t}.downsample.0.weight" in sd:
                _put_conv(sd, params, f"{t}.downsample.0", f + ["downsample_conv"], report)
                _put_bn(sd, params, f"{t}.downsample.1", f + ["downsample_bn"], report)
    for name in ("fc1", "fc2", "decpose", "decshape", "deccam"):
        _put_dense(sd, params, name, ["regressor", name], report)
    for name in ("init_pose", "init_shape", "init_cam"):
        if name in sd:
            _assign(params, [name], sd[name], report)
        else:
            report.append("ABSENT " + name)
    return _finish(tree, params), report


def convert_sphereface(sd: dict, like) -> tuple[dict, list[str]]:
    """sphere20a checkpoint -> `criterions.SphereFaceFeatures` params.

    Torch layout (`faceloss.py:203-260`): conv{s}_{i} / relu{s}_{i} (PReLU,
    param 'weight') / fc5. The classification head (fc6/angle) is ignored.
    fc5's input is the NCHW-flattened stage-4 map; the flax module flattens
    the same order, so the weight is a plain transpose.
    """
    sd = _normalize_sd(sd)
    tree, params = _mutable_like(like)
    report: list[str] = []
    stages = {1: (1, 2, 3), 2: (1, 2, 3, 4, 5), 3: tuple(range(1, 10)), 4: (1, 2, 3)}
    for s, ids in stages.items():
        for i in ids:
            _put_conv(sd, params, f"conv{s}_{i}", [f"conv{s}_{i}"], report)
            key = f"relu{s}_{i}.weight"
            if key in sd:
                _assign(params, [f"relu{s}_{i}", "weight"], sd[key], report)
            else:
                report.append("ABSENT " + key)
    _put_dense(sd, params, "fc5", ["fc5"], report)
    return _finish(tree, params), report


# torchvision vgg19.features conv layer indices, in order (relu/pool layers
# carry no params): conv{si}_{wi} of `criterions.VGGFeatures`.
_VGG19_CONV_IDS = (0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28, 30, 32, 34)


def convert_vgg19(sd: dict, like) -> tuple[dict, list[str]]:
    """torchvision `vgg19` state dict -> `criterions.VGGFeatures` params.

    Accepts either bare indices ('features.0.weight') or a wrapped prefix.
    """
    sd = _normalize_sd(sd)
    sd = {k[len("vgg."):] if k.startswith("vgg.") else k: v for k, v in sd.items()}
    tree, params = _mutable_like(like)
    report: list[str] = []
    slices = ((64, 64), (128, 128), (256, 256, 256, 256),
              (512, 512, 512, 512), (512, 512, 512, 512))
    flat = 0
    for si, widths in enumerate(slices):
        for wi, _ in enumerate(widths):
            idx = _VGG19_CONV_IDS[flat]
            _put_conv(sd, params, f"features.{idx}", [f"conv{si}_{wi}"], report)
            flat += 1
    return _finish(tree, params), report


# torchvision vgg16 / vgg11 .features conv indices (relu/pool carry no params)
_VGG16_CONV_IDS = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)
_VGG11_CONV_IDS = (0, 3, 6, 8, 11, 13, 16, 18)


def _convert_vgg_generic(sd: dict, like, conv_ids, slices) -> tuple[dict, list[str]]:
    sd = _normalize_sd(sd)
    sd = {k[len("vgg."):] if k.startswith("vgg.") else k: v for k, v in sd.items()}
    tree, params = _mutable_like(like)
    report: list[str] = []
    flat = 0
    for si, widths in enumerate(slices):
        for wi, _ in enumerate(widths):
            _put_conv(sd, params, f"features.{conv_ids[flat]}",
                      [f"conv{si}_{wi}"], report)
            flat += 1
    return _finish(tree, params), report


def convert_vgg16(sd: dict, like) -> tuple[dict, list[str]]:
    """torchvision `vgg16` state dict -> `criterions.build_vgg('VGG16')`
    params (`vggloss.py:120-186`)."""
    from ipercore_tpu.models.networks.criterions import _VGG16_SLICES

    return _convert_vgg_generic(sd, like, _VGG16_CONV_IDS, _VGG16_SLICES)


def convert_vgg11(sd: dict, like) -> tuple[dict, list[str]]:
    """torchvision `vgg11` state dict -> `criterions.build_vgg('VGG11')`
    params (`vggloss.py:190-258`)."""
    from ipercore_tpu.models.networks.criterions import _VGG11_SLICES

    return _convert_vgg_generic(sd, like, _VGG11_CONV_IDS, _VGG11_SLICES)


def convert_senet50(sd: dict, like) -> tuple[dict, list[str]]:
    """VGGFace2 SENet-50 state dict (`faceloss.py:125-206`, senet50) ->
    `criterions.SENetFaceFeatures` params.

    Torch layout: conv1/bn1 stem; layer{L}.{i}.conv{1..5} + bn{1..3} +
    optional downsample.{0,1}. SE gates are conv4/conv5 (1x1, biased)."""
    sd = _normalize_sd(sd)
    sd = {k[len("net."):] if k.startswith("net.") else k: v for k, v in sd.items()}
    tree, params = _mutable_like(like)
    report: list[str] = []
    _put_conv(sd, params, "conv1", ["conv1"], report)
    _put_bn(sd, params, "bn1", ["bn1"], report)
    for li, blocks in enumerate((3, 4, 6, 3), start=1):
        for bi in range(blocks):
            t = f"layer{li}.{bi}"
            f = [f"layer{li}_{bi}"]
            for j in (1, 2, 3, 4, 5):
                _put_conv(sd, params, f"{t}.conv{j}", f + [f"conv{j}"], report)
            for j in (1, 2, 3):
                _put_bn(sd, params, f"{t}.bn{j}", f + [f"bn{j}"], report)
            if f"{t}.downsample.0.weight" in sd:
                _put_conv(sd, params, f"{t}.downsample.0",
                          f + ["downsample_conv"], report)
                _put_bn(sd, params, f"{t}.downsample.1",
                        f + ["downsample_bn"], report)
    return _finish(tree, params), report


def convert_openpose(sd: dict, like) -> tuple[dict, list[str]]:
    """OpenPose Body-25 torch checkpoint -> `tools.pose2d.OpenPoseBody25`.

    Torch layout (`openposenet.py:60-330`): 'model0.conv1_1.weight', and
    'block{s}{l}.main.{i}.split{col}.Mconv{i+1}_stage{s}_L{l}[_{col}].weight'
    (+ matching Mprelu PReLU weights). The flax tree flattens each block's
    MConv layers under the block name; the M-names are globally unique within
    a block, so mapping is by (first component, last-two components).
    """
    sd = _normalize_sd(sd)
    tree, params = _mutable_like(like)
    report: list[str] = []
    for key, val in sd.items():
        parts = key.split(".")
        block, mname, param = parts[0], parts[-2], parts[-1]
        if block == "model0":
            path = ["model0", mname]
        elif block.startswith("block"):
            path = [block, mname]
        else:
            report.append("UNMAPPED " + key)
            continue
        if param == "weight" and val.ndim == 4:  # conv kernel
            _assign(params, path + ["kernel"], torch_conv_to_flax(val), report)
        elif param == "weight" and val.ndim == 1 and mname.startswith(("prelu", "Mprelu")):
            _assign(params, path + ["weight"], val, report)
        elif param == "bias":
            _assign(params, path + ["bias"], val, report)
        else:
            report.append("UNMAPPED " + key)
    return _finish(tree, params), report


def _put_abn(sd, params, torch_key, flax_path, report):
    """InPlaceABNSync -> `parsers.ABN` {bn: {scale, bias, mean, var}}.

    Checkpoints saved from the reference wrapper nest the stats under
    `<key>.bn.*` (`schp_parser.py:215-229`); checkpoints saved from the real
    mapillary inplace_abn keep them directly on `<key>.*` — both accepted.
    """
    key = torch_key + ".bn" if torch_key + ".bn.weight" in sd else torch_key
    _put_bn(sd, params, key, flax_path + ["bn"], report)


def convert_schp(sd: dict, like) -> tuple[dict, list[str]]:
    """SCHP `exp-schp-lip.pth` state dict -> `tools.parsers.SchpNet` params.

    Torch layout (`schp_parser.py:384-455`): 3-conv stem conv{1-3}/bn{1-3},
    layer{1-4}.{b}.{conv,bn}{1-3} + downsample.{0,1} (ResNet-101: 3/4/23/3),
    context_encoding.stages.{0-3}.{1,2} + bottleneck.{0,1}, edge.conv{1-3}.
    {0,1} + conv4/conv5, decoder.conv{1,2}.{0,1} + conv3.{0-3} + conv4,
    fushion.{0,1,3}.
    """
    sd = _normalize_sd(sd)
    tree, params = _mutable_like(like)
    report: list[str] = []

    for i in (1, 2, 3):
        _put_conv(sd, params, f"conv{i}", [f"conv{i}"], report)
        _put_bn(sd, params, f"bn{i}", [f"bn{i}"], report)
    for l, blocks in enumerate((3, 4, 23, 3), start=1):
        for b in range(blocks):
            t = f"layer{l}.{b}"
            f = [f"layer{l}_{b}"]
            for j in (1, 2, 3):
                _put_conv(sd, params, f"{t}.conv{j}", f + [f"conv{j}"], report)
                _put_bn(sd, params, f"{t}.bn{j}", f + [f"bn{j}"], report)
            if f"{t}.downsample.0.weight" in sd:
                _put_conv(sd, params, f"{t}.downsample.0", f + ["downsample_conv"], report)
                _put_bn(sd, params, f"{t}.downsample.1", f + ["downsample_bn"], report)

    ce = ["context_encoding"]
    for i in range(4):
        _put_conv(sd, params, f"context_encoding.stages.{i}.1",
                  ce + [f"stage{i}_conv"], report)
        _put_abn(sd, params, f"context_encoding.stages.{i}.2",
                 ce + [f"stage{i}_abn"], report)
    _put_conv(sd, params, "context_encoding.bottleneck.0",
              ce + ["bottleneck_conv"], report)
    _put_abn(sd, params, "context_encoding.bottleneck.1",
             ce + ["bottleneck_abn"], report)

    for i in (1, 2, 3):
        _put_conv(sd, params, f"edge.conv{i}.0", ["edge", f"conv{i}_conv"], report)
        _put_abn(sd, params, f"edge.conv{i}.1", ["edge", f"conv{i}_abn"], report)
    _put_conv(sd, params, "edge.conv4", ["edge", "conv4"], report)
    _put_conv(sd, params, "edge.conv5", ["edge", "conv5"], report)

    dec = ["decoder"]
    _put_conv(sd, params, "decoder.conv1.0", dec + ["conv1_conv"], report)
    _put_abn(sd, params, "decoder.conv1.1", dec + ["conv1_abn"], report)
    _put_conv(sd, params, "decoder.conv2.0", dec + ["conv2_conv"], report)
    _put_abn(sd, params, "decoder.conv2.1", dec + ["conv2_abn"], report)
    _put_conv(sd, params, "decoder.conv3.0", dec + ["conv3a_conv"], report)
    _put_abn(sd, params, "decoder.conv3.1", dec + ["conv3a_abn"], report)
    _put_conv(sd, params, "decoder.conv3.2", dec + ["conv3b_conv"], report)
    _put_abn(sd, params, "decoder.conv3.3", dec + ["conv3b_abn"], report)
    _put_conv(sd, params, "decoder.conv4", dec + ["conv4"], report)

    _put_conv(sd, params, "fushion.0", ["fushion_conv"], report)
    _put_abn(sd, params, "fushion.1", ["fushion_abn"], report)
    _put_conv(sd, params, "fushion.3", ["fushion_head"], report)
    return _finish(tree, params), report


def convert_mobilenet_openpose(sd: dict, like) -> tuple[dict, list[str]]:
    """Lightweight Mobilenet OpenPose checkpoint -> `tools.pose2d_mobilenet.
    MobilenetOpenPose` params.

    Torch layout (`mobilenet.py:122-158`, Osokin's checkpoint): sequential
    `model.{i}.{j}` trunk (conv/bn indices inside each block), `cpm.align.0`,
    `cpm.trunk.{i}.{0,2}`, `cpm.conv.0`, `initial_stage.{trunk.{i}.0,
    heatmaps.{0,1}.0, pafs.{0,1}.0}`, `refinement_stages.{r}.trunk.{b}.
    {initial.0, trunk.{0,1}.0}` + heads.
    """
    sd = _normalize_sd(sd)
    tree, params = _mutable_like(like)
    report: list[str] = []

    # stem: model.0.{0 conv, 1 bn}
    _put_conv(sd, params, "model.0.0", ["model0_conv"], report)
    _put_bn(sd, params, "model.0.1", ["model0_bn"], report)
    # depthwise blocks: model.{i}.{0 dw, 1 bn, 3 pw, 4 bn}
    for i in range(1, 12):
        f = [f"model{i}"]
        _put_conv(sd, params, f"model.{i}.0", f + ["dw"], report)
        _put_bn(sd, params, f"model.{i}.1", f + ["dwbn"], report)
        _put_conv(sd, params, f"model.{i}.3", f + ["pw"], report)
        _put_bn(sd, params, f"model.{i}.4", f + ["pwbn"], report)

    _put_conv(sd, params, "cpm.align.0", ["cpm", "align"], report)
    for i in range(3):
        _put_conv(sd, params, f"cpm.trunk.{i}.0", ["cpm", f"trunk{i}", "dw"], report)
        _put_conv(sd, params, f"cpm.trunk.{i}.2", ["cpm", f"trunk{i}", "pw"], report)
    _put_conv(sd, params, "cpm.conv.0", ["cpm", "conv"], report)

    ini = ["initial_stage"]
    for i in range(3):
        _put_conv(sd, params, f"initial_stage.trunk.{i}.0", ini + [f"trunk{i}"], report)
    _put_conv(sd, params, "initial_stage.heatmaps.0.0", ini + ["hm0"], report)
    _put_conv(sd, params, "initial_stage.heatmaps.1.0", ini + ["hm1"], report)
    _put_conv(sd, params, "initial_stage.pafs.0.0", ini + ["paf0"], report)
    _put_conv(sd, params, "initial_stage.pafs.1.0", ini + ["paf1"], report)

    r = 0
    while f"refinement_stages.{r}.trunk.0.initial.0.weight" in sd:
        ref = [f"refine{r}"]
        for b in range(5):
            t = f"refinement_stages.{r}.trunk.{b}"
            f = ref + [f"block{b}"]
            _put_conv(sd, params, f"{t}.initial.0", f + ["initial"], report)
            _put_conv(sd, params, f"{t}.trunk.0.0", f + ["trunk0"], report)
            _put_bn(sd, params, f"{t}.trunk.0.1", f + ["trunk0_bn"], report)
            _put_conv(sd, params, f"{t}.trunk.1.0", f + ["trunk1"], report)
            _put_bn(sd, params, f"{t}.trunk.1.1", f + ["trunk1_bn"], report)
        _put_conv(sd, params, f"refinement_stages.{r}.heatmaps.0.0", ref + ["hm0"], report)
        _put_conv(sd, params, f"refinement_stages.{r}.heatmaps.1.0", ref + ["hm1"], report)
        _put_conv(sd, params, f"refinement_stages.{r}.pafs.0.0", ref + ["paf0"], report)
        _put_conv(sd, params, f"refinement_stages.{r}.pafs.1.0", ref + ["paf1"], report)
        r += 1
    return _finish(tree, params), report


_ESRGAN_RENAMES = {
    # original-ESRGAN-repo layer names -> BasicSR/mmedit names
    "RRDB_trunk": "body", "trunk_conv": "conv_body",
    "upconv1": "conv_up1", "upconv2": "conv_up2", "HRconv": "conv_hr",
}


def convert_esrgan(sd: dict, like) -> tuple[dict, list[str]]:
    """ESRGAN `esrgan_psnr_x4c64b23g32_*` checkpoint -> `tools.inpaintors.
    RRDBNet` params (the reference's SR net, `mmedit_inpaintors.py:57-59`).

    Accepts both published key families — BasicSR/mmedit
    (`conv_first / body.{i}.rdb{j}.conv{k} / conv_body / conv_up1 / conv_up2 /
    conv_hr / conv_last`, optionally under a `generator.` restorer-wrapper
    prefix) and the original ESRGAN repo
    (`RRDB_trunk.{i}.RDB{j}.conv{k}.0 / trunk_conv / upconv1 / ...`).
    """
    sd = _normalize_sd(sd)
    renamed: dict = {}
    for k, v in sd.items():
        if k.startswith("generator."):
            k = k[len("generator."):]
        elif k.startswith("generator_ema."):
            continue  # EMA copy: the plain generator weights are canonical
        parts: list[str] = []
        for p in k.split("."):
            if p == "0" and parts and parts[-1].startswith("conv"):
                continue  # original repo wraps each RDB conv in a Sequential
            p = _ESRGAN_RENAMES.get(p, p)
            if p.startswith("RDB"):
                p = p.lower()
            parts.append(p)
        renamed[".".join(parts)] = v
    sd = renamed

    tree, params = _mutable_like(like)
    report: list[str] = []
    for nm in ("conv_first", "conv_body", "conv_up1", "conv_up2",
               "conv_hr", "conv_last"):
        _put_conv(sd, params, nm, [nm], report)
    i = 0
    while f"body.{i}.rdb1.conv1.weight" in sd:
        for j in (1, 2, 3):
            for c in range(1, 6):
                _put_conv(sd, params, f"body.{i}.rdb{j}.conv{c}",
                          [f"body_{i}", f"rdb{j}", f"conv{c}"], report)
        i += 1
    have = len([k for k in params if k.startswith("body_")])
    if i != have:
        report.append(f"BLOCKS: params have {have}, checkpoint has {i}")
    return _finish(tree, params), report


def convert_discriminator(sd: dict, like) -> tuple[dict, list[str]]:
    """Reference discriminator checkpoint -> our discriminator params.

    Handles every variant built from `PatchDiscriminator` sequential stacks
    (`patch_dis.py:8-72`, `multi_scale_dis.py:47-332`): a bare patch D
    (`model.{i}`), the global/body/head(/bg) family
    (`{global,body,head,bg}_model.model.{i}`) and the multi-scale pyramid
    (`scale_models.{s}.model.{i}`). Instance norm carries no parameters, so
    only the conv kernels/biases map; torch conv indices are matched to our
    `Conv_{j}` call order.
    """
    sd = _normalize_sd(sd)
    tree, params = _mutable_like(like)
    report: list[str] = []

    # group conv keys by their submodule prefix (everything before ".model.")
    groups: dict[str, list[int]] = {}
    for k in sd:
        if ".weight" not in k or ".model." not in k and not k.startswith("model."):
            continue
        if k.startswith("model."):
            prefix, idx = "", k.split(".")[1]
        else:
            prefix = k.split(".model.")[0]
            idx = k.split(".model.")[1].split(".")[0]
        if not idx.isdigit():
            continue
        groups.setdefault(prefix, []).append(int(idx))

    for prefix, idxs in sorted(groups.items()):
        # flax destination submodule
        if prefix == "":
            dest = params
        elif prefix.startswith("scale_models."):
            name = "scale_models_" + prefix.split(".")[1]
            dest = params.get(name)
        else:
            dest = params.get(prefix)
        if dest is None:
            report.append("NO DEST " + (prefix or "<root>"))
            continue
        for j, idx in enumerate(sorted(set(idxs))):
            key = (f"{prefix}.model.{idx}" if prefix else f"model.{idx}")
            for leaf, val in _conv(sd, key).items():
                _assign(dest, [f"Conv_{j}", leaf], val, report)
    return _finish(tree, params), report


def _put_basicconv(sd, params, torch_prefix, flax_path, report):
    """torchvision `BasicConv2d` (conv no-bias + BatchNorm2d) -> our
    `inception.BasicConv2d` {conv/kernel, bn_scale, bn_bias, bn_mean, bn_var}."""
    if torch_prefix + ".conv.weight" not in sd:
        report.append("ABSENT " + torch_prefix)
        return
    _assign(params, flax_path + ["conv", "kernel"],
            torch_conv_to_flax(sd[torch_prefix + ".conv.weight"]), report)
    for tk, fk in (("bn.weight", "bn_scale"), ("bn.bias", "bn_bias"),
                   ("bn.running_mean", "bn_mean"), ("bn.running_var", "bn_var")):
        key = torch_prefix + "." + tk
        if key in sd:
            _assign(params, flax_path + [fk], sd[key], report)
        else:
            report.append("ABSENT " + key)


def convert_inception(sd: dict, like) -> tuple[dict, list[str]]:
    """torchvision `inception_v3` state dict -> `InceptionV3Features` params.

    The FID feature net (reference protocol `docs/evaluate.md:4-11`). The
    aux-classifier (`AuxLogits.*`) and `fc.*` entries are ignored — FID reads
    the 2048-d pool3 features only. Every BasicConv2d maps by its torchvision
    name; branch names inside Mixed_* blocks match one-to-one.
    """
    sd = _normalize_sd(sd)
    tree, params = _mutable_like(like)
    report: list[str] = []
    prefixes = set()
    for k in sd:
        if k.startswith(("AuxLogits.", "fc.")):
            continue
        if k.endswith(".conv.weight"):
            prefixes.add(k[: -len(".conv.weight")])
    for p in sorted(prefixes):
        _put_basicconv(sd, params, p, p.split("."), report)
    # targets the checkpoint never named
    named = {tuple(p.split(".")) for p in prefixes}
    def walk(node, path):
        if "conv" in node and "bn_scale" in node:
            if path not in named:
                report.append("UNFILLED " + "/".join(path))
            return
        for k, v in node.items():
            if isinstance(v, dict):
                walk(v, path + (k,))
    walk(params, ())
    return _finish(tree, params), report


def convert_lpips(sd: dict, like) -> tuple[dict, list[str]]:
    """Official `lpips.LPIPS(net='vgg')` state dict -> `criterions.LPIPSLin`.

    Keys: `net.slice{1..5}.{i}.weight` (VGG16 convs, torchvision indices) and
    `lin{k}.model.1.weight` (the learned 1x1 no-bias metric convs). The
    scaling-layer buffers (`scaling_layer.shift/scale`) are the ImageNet
    normalization `VGGFeatures` already applies and are checked, not copied.
    """
    sd = _normalize_sd(sd)
    # full-model exports prefix the backbone with `net.`; lin layers keep
    # their name. Strip a leading `net.` only for slice keys.
    tree, params = _mutable_like(like)
    report: list[str] = []
    vgg = params.get("vgg")
    if vgg is None:
        report.append("NO DEST vgg")
        return _finish(tree, params), report
    # VGG16 conv indices within torch Sequential(features): per-slice local
    # indices as lpips stores them (slice1 holds features[0..3], etc.)
    slice_convs = {1: (0, 2), 2: (5, 7), 3: (10, 12, 14),
                   4: (17, 19, 21), 5: (24, 26, 28)}
    starts = {1: 0, 2: 4, 3: 9, 4: 16, 5: 23}
    for si in range(1, 6):
        for wi, idx in enumerate(slice_convs[si]):
            local = idx - starts[si]
            key = f"net.slice{si}.{local}"
            if key + ".weight" not in sd:
                key = f"slice{si}.{local}"
            _put_conv(sd, vgg, key, [f"conv{si - 1}_{wi}"], report)
    for k in range(5):
        key = f"lin{k}.model.1"
        if key + ".weight" not in sd:
            key = f"lins.{k}.model.1"
        _put_conv(sd, params, key, [f"lin{k}"], report)
    # The docstring's "checked, not copied" claim: the export's scaling layer
    # must be the standard ImageNet normalization re-expressed for [-1, 1]
    # inputs (shift = 2*mean - 1, scale = 2*std) that VGGFeatures applies; a
    # nonstandard export would otherwise convert silently and produce wrong
    # distances.
    _want = {"scaling_layer.shift": np.array([-0.030, -0.088, -0.188]),
             "scaling_layer.scale": np.array([0.458, 0.448, 0.450])}
    for name, want in _want.items():
        got = sd.get(name)
        if got is not None:
            got = np.asarray(got).reshape(-1)
            if got.shape != (3,) or not np.allclose(got, want, atol=1e-3):
                report.append(f"SCALING MISMATCH {name}: {got.tolist()}")
    return _finish(tree, params), report
