"""Generator zoo: BGNet inpaintor + the Liquid-Warping generator family.

Rebuilds the reference's seven generator variants (ablation ladder, §2.3 of
SURVEY.md) as flax modules over NHWC tensors:

  * AttLWB-SPADE   (`attlwb_spade_resunet.py:538`) — default
  * AttLWB-Front   (`attlwb_spade_resunet.py:702`) — no BGNet
  * AttLWB-AdaIN   (`attlwb_adain_resunet.py:404`)
  * AddLWB / AvgLWB (`lwb_resunet.py:516,525`)
  * SoftGateAddLWB / SoftGateAvgLWB (`lwb_softgate_resunet.py:513+`)
  * InputConcat    (`input_concat_resunet.py`)
  * TextureWarping (`texture_warping_resunet.py:68`)

TSF time steps run as a bounded python loop over nt inside one jitted call when
temporal feedback is on, exactly like the reference's
`AttentionLWBGenerator.forward:633`; non-temporal callers fold nt into batch.

Config mirrors `assets/configs/neural_renders/*.toml`:
{"BGNet": {...}, "SIDNet": {...}, "TSFNet": {...}} with num_filters/n_res_block.
"""
from __future__ import annotations

from typing import Any, Mapping

import jax.numpy as jnp
import flax.linen as nn

from ipercore_tpu.models.networks.blocks import (
    PAD3,
    PAD7,
    FusedLWB,
    RegressHeads,
    ResAutoEncoder,
    ResidualBlock,
    ResidualBlockIN,
    SelfAttentionLWB,
    SkipDecoder,
    instance_norm,
    warp,
)
from ipercore_tpu.ops.sampling import grid_sample, resize_flow, resize_image


def _cfg_get(cfg, key: str, sub: str, default):
    block = cfg.get(key, {}) if isinstance(cfg, Mapping) else getattr(cfg, key, {})
    if isinstance(block, Mapping):
        return block.get(sub, default)
    return getattr(block, sub, default)


class ResNetInpaintor(nn.Module):
    """BGNet: masked-background inpainting — `bg_inpaintor.py:24-60`.

    Input (N, H, W, 4) = masked RGB + mask; output (N, H, W, 3) in [-1, 1].
    """

    num_filters: tuple = (64, 128, 128, 256)
    n_res_block: int = 6

    @nn.compact
    def __call__(self, x):
        nf = self.num_filters
        x = nn.Conv(nf[0], (7, 7), padding=PAD7)(x)
        x = nn.relu(instance_norm(x))
        for i in range(1, len(nf)):
            x = nn.Conv(nf[i], (3, 3), strides=(2, 2), padding=PAD3)(x)
            x = nn.relu(instance_norm(x))
        for _ in range(self.n_res_block):
            x = ResidualBlockIN(nf[-1])(x)
        for i in range(len(nf) - 1, 0, -1):
            x = nn.ConvTranspose(nf[i - 1], (4, 4), strides=(2, 2), padding="SAME", use_bias=False)(x)
            x = nn.relu(instance_norm(x))
        x = nn.Conv(3, (7, 7), padding=PAD7, use_bias=False)(x)
        return jnp.tanh(x)


class LWBGenerator(nn.Module):
    """The unified Liquid-Warping generator.

    `fusion_mode` selects the per-stage source->transfer fusion:
      "spade" | "adain"  -> attention LWB with SPADE/AdaIN modulation
      "add" | "avg"      -> plain warp-sum / warp-mean LWB
      "softgate_add" | "softgate_avg" -> sigmoid-gated fusion
      "none"             -> no feature warping (InputConcat / TextureWarping)
    """

    cfg: Any
    fusion_mode: str = "spade"
    temporal: bool = False
    use_bg_net: bool = True
    # TPU perf knob: warp LWB features on a stride-s grid and bilinearly
    # upsample back (the per-index overhead of the warp gathers is the
    # generator's largest cost at 512^2 — ~6.5 of 13.7 ms/frame measured).
    # 1 = exact reference semantics; 2 halves each warp's gather count 4x.
    # `scripts/evaluate/accuracy_cost.py` measures the quality cost.
    feat_warp_stride: int = 1

    def setup(self):
        cfg = self.cfg
        if self.use_bg_net:
            self.bg_net = ResNetInpaintor(
                num_filters=tuple(_cfg_get(cfg, "BGNet", "num_filters", (64, 128, 128, 256))),
                n_res_block=int(_cfg_get(cfg, "BGNet", "n_res_block", 6)),
            )
        sid_filters = tuple(_cfg_get(cfg, "SIDNet", "num_filters", (64, 128, 256)))
        sid_res = int(_cfg_get(cfg, "SIDNet", "n_res_block", 6))
        self.src_net = ResAutoEncoder(num_filters=sid_filters, n_res_block=sid_res)

        tsf_filters = tuple(_cfg_get(cfg, "TSFNet", "num_filters", (64, 128, 256)))
        tsf_res = int(_cfg_get(cfg, "TSFNet", "n_res_block", 6))
        self.tsf_filters = tsf_filters
        # TSF encoder stages (bias-free convs, `attlwb_spade_resunet.py:588-592`).
        self.tsf_enc_convs = [
            nn.Conv(nf, (3, 3), strides=(2, 2), padding=PAD3, use_bias=False,
                    name=f"tsf_enc_{i}")
            for i, nf in enumerate(tsf_filters)
        ]
        self.tsf_net_dec = SkipDecoder(tsf_filters, tuple(reversed(tsf_filters)))
        self.tsf_heads = RegressHeads()
        self.tsf_res_blocks = [ResidualBlock(tsf_filters[-1]) for _ in range(tsf_res)]

        def make_fusion(channel, name):
            if self.fusion_mode in ("spade", "adain"):
                return SelfAttentionLWB(channel=channel, mode=self.fusion_mode,
                                        temporal=self.temporal, name=name)
            if self.fusion_mode in ("add", "avg"):
                return FusedLWB(fuse=self.fusion_mode, soft_gate=False, name=name)
            if self.fusion_mode in ("softgate_add", "softgate_avg"):
                return FusedLWB(fuse=self.fusion_mode.split("_")[1], soft_gate=True, name=name)
            return None

        if self.fusion_mode != "none":
            self.enc_fusions = [
                make_fusion(c, f"enc_fusion_{i}") for i, c in enumerate(tsf_filters)
            ]
            self.res_fusions = [
                make_fusion(tsf_filters[-1], f"res_fusion_{i}") for i in range(tsf_res)
            ]

    # --- SIDNet -----------------------------------------------------------
    def forward_src(self, src_inputs, only_enc: bool = True):
        """Encode source identity features — `attlwb_spade_resunet.py:450-478`.

        Args:
            src_inputs: (bs, ns, h, w, 6) = morphed RGB + part condition map.

        Returns:
            src_enc_outs: list of (bs, ns, h_i, w_i, c_i);
            src_res_outs: list of (bs, ns, h_k, w_k, c_k);
            (+ img (bs, ns, h, w, 3), mask (bs, ns, h, w, 1) if only_enc=False)
        """
        bs, ns = src_inputs.shape[0], src_inputs.shape[1]
        flat = src_inputs.reshape((bs * ns,) + src_inputs.shape[2:])
        enc_outs = self.src_net.encode(flat)
        res_outs = self.src_net.res_out(enc_outs[-1])
        unflat = lambda x: x.reshape((bs, ns) + x.shape[1:])
        enc_u = [unflat(x) for x in enc_outs]
        res_u = [unflat(x) for x in res_outs]
        if only_enc:
            return enc_u, res_u
        bottleneck = res_outs[-1] if res_outs else enc_outs[-1]
        img, mask = self.src_net.regress(self.src_net.decode(bottleneck))
        return enc_u, res_u, unflat(img), unflat(mask)

    # --- BGNet --------------------------------------------------------------
    def forward_bg(self, bg_inputs):
        """Inpaint background(s) — `attlwb_spade_resunet.py:615-631`.

        Args: bg_inputs (bs, ns, h, w, 4). Returns (bs, ns, h, w, 3)."""
        bs, ns = bg_inputs.shape[0], bg_inputs.shape[1]
        flat = bg_inputs.reshape((bs * ns,) + bg_inputs.shape[2:])
        out = self.bg_net(flat)
        return out.reshape((bs, ns) + out.shape[1:])

    # --- TSFNet (one time step) ----------------------------------------------
    def forward_tsf(self, tsf_inputs, src_enc_outs, src_res_outs, Tst,
                    temp_enc_outs=None, temp_res_outs=None, Ttt=None):
        """One TSF step — `attlwb_spade_resunet.py:480-535`.

        Args:
            tsf_inputs: (bs, h, w, 6) warped-UV image + target condition map.
            Tst: (bs, ns, h, w, 2) source->target flows.

        Returns:
            tsf_img (bs, h, w, 3), tsf_mask (bs, h, w, 1).
        """
        use_temp = temp_enc_outs is not None and Ttt is not None

        # Pre-warp all same-scale source features in ONE gather per scale: all
        # fusion stages share the same (resized) flow, and wide rows make the
        # HBM gather far more efficient than per-stage warps.
        def prewarp(feats, flows):
            # feats: (bs, n, h, w, c); flows: (bs, n, H, W, 2)
            bs, n = feats.shape[0], feats.shape[1]
            flat = feats.reshape((bs * n,) + feats.shape[2:])
            fl = flows.reshape((bs * n,) + flows.shape[2:])
            h, w = flat.shape[1], flat.shape[2]
            s = self.feat_warp_stride
            if s > 1 and h % s == 0 and w % s == 0 and h // s >= 32:
                # strided warp: sample on an (h/s, w/s) grid, upsample back —
                # gather cost drops s^2-fold; exactness knob documented above
                small = grid_sample(flat, resize_flow(fl, h // s, w // s))
                out = resize_image(small, h, w).astype(flat.dtype)
            else:
                out = warp(flat, fl)
            return out.reshape((bs, n) + out.shape[1:])

        if self.fusion_mode != "none":
            warped_enc = [prewarp(f, Tst) for f in src_enc_outs]
            if src_res_outs:  # n_res_block can be 0 (no residual stage)
                res_cat = jnp.concatenate(src_res_outs, axis=-1)  # (bs, ns, h, w, c*k)
                warped_res = jnp.split(prewarp(res_cat, Tst), len(src_res_outs), axis=-1)
            if use_temp:
                warped_temp_enc = [prewarp(f, Ttt) for f in temp_enc_outs]
                if temp_res_outs:
                    tres_cat = jnp.concatenate(temp_res_outs, axis=-1)
                    warped_temp_res = jnp.split(prewarp(tres_cat, Ttt), len(temp_res_outs), axis=-1)

        x = tsf_inputs
        enc_outs = []
        for i, conv in enumerate(self.tsf_enc_convs):
            x = nn.relu(conv(x))
            if self.fusion_mode != "none":
                temp_x = warped_temp_enc[i] if use_temp else None
                x = self.enc_fusions[i](x, warped_enc[i], Tst, temp_x=temp_x,
                                        Ttt=Ttt, pre_warped=True)
            enc_outs.append(x)
        for i, blk in enumerate(self.tsf_res_blocks):
            x = blk(x)
            if self.fusion_mode != "none":
                temp_x = warped_temp_res[i] if use_temp else None
                x = self.res_fusions[i](x, warped_res[i], Tst, temp_x=temp_x,
                                        Ttt=Ttt, pre_warped=True)
        x = self.tsf_net_dec(x, enc_outs)
        return self.tsf_heads(x)

    # --- full training-style forward --------------------------------------
    def __call__(self, bg_inputs, src_inputs, tsf_inputs, Tst, Ttt=None, only_tsf=True):
        """Full forward over nt time steps — `attlwb_spade_resunet.py:633-699`.

        Args:
            bg_inputs: (bs, nbg, h, w, 4) or None (Front variant).
            src_inputs: (bs, ns, h, w, 6).
            tsf_inputs: (bs, nt, h, w, 6).
            Tst: (bs, nt, ns, h, w, 2); Ttt: (bs, nt-1, h, w, 2) or None.

        Returns:
            (bg_img, tsf_imgs (bs, nt, h, w, 3), tsf_masks (bs, nt, h, w, 1))
            [+ src_imgs, src_masks when only_tsf=False]
        """
        nt = tsf_inputs.shape[1]

        bg_img = self.forward_bg(bg_inputs) if (self.use_bg_net and bg_inputs is not None) else None

        if only_tsf:
            src_enc_outs, src_res_outs = self.forward_src(src_inputs, only_enc=True)
            src_imgs = src_masks = None
        else:
            src_enc_outs, src_res_outs, src_imgs, src_masks = self.forward_src(
                src_inputs, only_enc=False)

        tsf_imgs, tsf_masks = [], []
        for t in range(nt):
            if t != 0 and self.temporal and Ttt is not None:
                prev_cond = tsf_inputs[:, t - 1, ..., 0:3]
                prev_img = tsf_imgs[-1] * (1.0 - tsf_masks[-1])
                prev_in = jnp.concatenate([prev_img, prev_cond], axis=-1)[:, None]
                temp_enc_outs, temp_res_outs = self.forward_src(prev_in, only_enc=True)
                t_Ttt = Ttt[:, t - 1:t]
            else:
                temp_enc_outs = temp_res_outs = t_Ttt = None
            img, mask = self.forward_tsf(
                tsf_inputs[:, t], src_enc_outs, src_res_outs, Tst[:, t],
                temp_enc_outs, temp_res_outs, t_Ttt,
            )
            tsf_imgs.append(img)
            tsf_masks.append(mask)

        tsf_imgs = jnp.stack(tsf_imgs, axis=1)
        tsf_masks = jnp.stack(tsf_masks, axis=1)

        if only_tsf:
            return bg_img, tsf_imgs, tsf_masks
        return bg_img, src_imgs, src_masks, tsf_imgs, tsf_masks


class InputConcatGenerator(nn.Module):
    """Ablation: no warping; concat source and target inputs into one
    ResAutoEncoder — `input_concat_resunet.py` (~:200)."""

    cfg: Any

    def setup(self):
        tsf_filters = tuple(_cfg_get(self.cfg, "TSFNet", "num_filters", (64, 128, 256)))
        tsf_res = int(_cfg_get(self.cfg, "TSFNet", "n_res_block", 6))
        self.net = ResAutoEncoder(num_filters=tsf_filters, n_res_block=tsf_res)
        self.bg_net = ResNetInpaintor(
            num_filters=tuple(_cfg_get(self.cfg, "BGNet", "num_filters", (64, 128, 128, 256))),
            n_res_block=int(_cfg_get(self.cfg, "BGNet", "n_res_block", 6)),
        )

    def forward_bg(self, bg_inputs):
        bs, ns = bg_inputs.shape[0], bg_inputs.shape[1]
        flat = bg_inputs.reshape((bs * ns,) + bg_inputs.shape[2:])
        out = self.bg_net(flat)
        return out.reshape((bs, ns) + out.shape[1:])

    def __call__(self, bg_inputs, src_inputs, tsf_inputs, Tst=None, Ttt=None, only_tsf=True):
        bs, ns = src_inputs.shape[0], src_inputs.shape[1]
        nt = tsf_inputs.shape[1]
        bg_img = self.forward_bg(bg_inputs) if bg_inputs is not None else None
        src_cat = jnp.transpose(src_inputs, (0, 2, 3, 1, 4)).reshape(
            bs, src_inputs.shape[2], src_inputs.shape[3], -1)  # fold ns into channels
        imgs, masks = [], []
        for t in range(nt):
            x = jnp.concatenate([src_cat, tsf_inputs[:, t]], axis=-1)
            img, mask = self.net(x)
            imgs.append(img)
            masks.append(mask)
        return bg_img, jnp.stack(imgs, 1), jnp.stack(masks, 1)


class TextureWarpingGenerator(nn.Module):
    """Ablation: UV-texture warping only (tsf_inputs already carry the
    Tuv2t-warped image); no feature warping — `texture_warping_resunet.py:68`."""

    cfg: Any

    def setup(self):
        tsf_filters = tuple(_cfg_get(self.cfg, "TSFNet", "num_filters", (64, 128, 256)))
        tsf_res = int(_cfg_get(self.cfg, "TSFNet", "n_res_block", 6))
        self.net = ResAutoEncoder(num_filters=tsf_filters, n_res_block=tsf_res)
        self.bg_net = ResNetInpaintor(
            num_filters=tuple(_cfg_get(self.cfg, "BGNet", "num_filters", (64, 128, 128, 256))),
            n_res_block=int(_cfg_get(self.cfg, "BGNet", "n_res_block", 6)),
        )

    def forward_bg(self, bg_inputs):
        bs, ns = bg_inputs.shape[0], bg_inputs.shape[1]
        flat = bg_inputs.reshape((bs * ns,) + bg_inputs.shape[2:])
        out = self.bg_net(flat)
        return out.reshape((bs, ns) + out.shape[1:])

    def __call__(self, bg_inputs, src_inputs, tsf_inputs, Tst=None, Ttt=None, only_tsf=True):
        nt = tsf_inputs.shape[1]
        bg_img = self.forward_bg(bg_inputs) if bg_inputs is not None else None
        imgs, masks = [], []
        for t in range(nt):
            img, mask = self.net(tsf_inputs[:, t])
            imgs.append(img)
            masks.append(mask)
        return bg_img, jnp.stack(imgs, 1), jnp.stack(masks, 1)


GENERATOR_REGISTRY = {
    "AttLWB-SPADE": dict(cls=LWBGenerator, fusion_mode="spade", use_bg_net=True),
    "AttLWB-Front": dict(cls=LWBGenerator, fusion_mode="spade", use_bg_net=False),
    "AttLWB-AdaIN": dict(cls=LWBGenerator, fusion_mode="adain", use_bg_net=True),
    "AddLWB": dict(cls=LWBGenerator, fusion_mode="add", use_bg_net=True),
    "AvgLWB": dict(cls=LWBGenerator, fusion_mode="avg", use_bg_net=True),
    "SoftGateAddLWB": dict(cls=LWBGenerator, fusion_mode="softgate_add", use_bg_net=True),
    "SoftGateAvgLWB": dict(cls=LWBGenerator, fusion_mode="softgate_avg", use_bg_net=True),
    "InputConcat": dict(cls=InputConcatGenerator),
    "TextureWarping": dict(cls=TextureWarpingGenerator),
}


def build_generator(name: str, cfg, temporal: bool = False,
                    feat_warp_stride: int = 1) -> nn.Module:
    """NetworksFactory parity (`networks/__init__.py:3-67`)."""
    if name not in GENERATOR_REGISTRY:
        raise KeyError(f"unknown generator {name!r}; have {sorted(GENERATOR_REGISTRY)}")
    spec = dict(GENERATOR_REGISTRY[name])
    cls = spec.pop("cls")
    if cls is LWBGenerator:
        return cls(cfg=cfg, temporal=temporal,
                   feat_warp_stride=feat_warp_stride, **spec)
    return cls(cfg=cfg)
