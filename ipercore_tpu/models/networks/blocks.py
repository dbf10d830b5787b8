"""Shared network building blocks (flax.linen, NHWC).

Rebuilds the block vocabulary of the reference generators
(`iPERCore/models/networks/generators/attlwb_spade_resunet.py:14-445`,
`attlwb_adain_resunet.py:25-220`, `lwb_resunet.py:77-160`,
`lwb_softgate_resunet.py:77-125`) with TPU-idiomatic choices: NHWC layout,
explicit torch-compatible paddings (so torch checkpoints convert 1:1),
functional instance norm, and warping through `ipercore_tpu.ops.sampling`.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ipercore_tpu.ops.sampling import grid_sample, resize_flow

# torch Conv2d(k=3, s=2, p=1) == lax conv pad (1, 1); keeps H/2 exactly.
PAD3 = ((1, 1), (1, 1))
PAD5 = ((2, 2), (2, 2))
PAD7 = ((3, 3), (3, 3))


class FrozenBatchNorm(nn.Module):
    """Inference-mode BatchNorm holding torch's parameter set (scale/bias +
    running mean/var) as plain params — the conversion target for every
    BatchNorm-bearing perception net (SPIN `spin/network.py:30-90`, SCHP
    `schp_parser.py:215-229`, Mobilenet OpenPose `mobilenet.py:9-14`). On TPU
    the four constants fold into a single fused multiply-add by XLA."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        return (x - mean) * (scale * jax.lax.rsqrt(var + self.eps)) + bias


def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Parameter-free instance norm over spatial dims of NHWC (torch
    InstanceNorm2d(affine=False) semantics)."""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


class ConvIN(nn.Module):
    """Conv + optional instance norm + ReLU."""

    features: int
    kernel: int = 3
    stride: int = 1
    use_bias: bool = True
    norm: bool = True
    act: bool = True

    @nn.compact
    def __call__(self, x):
        pad = ((self.kernel // 2, self.kernel // 2),) * 2
        x = nn.Conv(self.features, (self.kernel, self.kernel), strides=(self.stride,) * 2,
                    padding=pad, use_bias=self.use_bias)(x)
        if self.norm:
            x = instance_norm(x)
        if self.act:
            x = nn.relu(x)
        return x


class ResidualBlock(nn.Module):
    """conv3-relu-conv3 residual (no norm) — `attlwb_spade_resunet.py:14-25`."""

    features: int

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.features, (3, 3), padding=PAD3)(x)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding=PAD3)(h)
        return x + h


class ResidualBlockIN(nn.Module):
    """conv3-IN-relu-conv3-IN residual — BGNet variant (`bg_inpaintor.py:7-21`)."""

    features: int

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.features, (3, 3), padding=PAD3)(x)
        h = instance_norm(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding=PAD3)(h)
        h = instance_norm(h)
        return x + h


class Encoder(nn.Module):
    """Stride-2 conv stack; returns per-stage features — `attlwb_spade_resunet.py:255-288`."""

    num_filters: Sequence[int]
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, get_details: bool = True):
        outs = []
        for nf in self.num_filters:
            x = nn.Conv(nf, (3, 3), strides=(2, 2), padding=PAD3, use_bias=self.use_bias)(x)
            x = nn.relu(x)
            outs.append(x)
        return outs if get_details else x


class Decoder(nn.Module):
    """ConvTranspose-up stack — `attlwb_spade_resunet.py:291-313`."""

    num_filters: Sequence[int]

    @nn.compact
    def __call__(self, x):
        for nf in self.num_filters:
            x = nn.ConvTranspose(nf, (4, 4), strides=(2, 2), padding="SAME")(x)
            x = nn.relu(x)
        return x


class SkipDecoder(nn.Module):
    """Up-convs with encoder skip concat+conv — `attlwb_spade_resunet.py:316-357`."""

    enc_num_filters: Sequence[int]
    dec_num_filters: Sequence[int]

    @nn.compact
    def __call__(self, x, enc_outs):
        n = len(self.dec_num_filters)
        for i, nf in enumerate(self.dec_num_filters):
            x = nn.ConvTranspose(nf, (4, 4), strides=(2, 2), padding="SAME")(x)
            x = nn.relu(x)
            if i != n - 1:
                skip = jnp.concatenate([enc_outs[n - 2 - i], x], axis=-1)
                x = nn.Conv(nf, (3, 3), padding=PAD3)(skip)
                x = nn.relu(x)
        return x


class RegressHeads(nn.Module):
    """img (tanh) + attention mask (sigmoid) heads — `attlwb_spade_resunet.py:376-384`."""

    @nn.compact
    def __call__(self, x):
        img = nn.Conv(3, (5, 5), padding=PAD5, use_bias=False)(x)
        img = jnp.tanh(img)
        mask = nn.Conv(1, (5, 5), padding=PAD5, use_bias=False)(x)
        mask = nn.sigmoid(mask)
        return img, mask


class ResAutoEncoder(nn.Module):
    """SIDNet body: encoder + res blocks + decoder + heads — `attlwb_spade_resunet.py:360-412`."""

    num_filters: Sequence[int]
    n_res_block: int

    def setup(self):
        self.encoders = Encoder(self.num_filters, use_bias=True)
        self.res_blocks = [ResidualBlock(self.num_filters[-1]) for _ in range(self.n_res_block)]
        self.decoders = Decoder(tuple(reversed(self.num_filters)))
        self.heads = RegressHeads()

    def encode(self, x):
        return self.encoders(x, get_details=True)

    def res_out(self, x):
        outs = []
        for blk in self.res_blocks:
            x = blk(x)
            outs.append(x)
        return outs

    def decode(self, x):
        return self.decoders(x)

    def regress(self, x):
        return self.heads(x)

    def __call__(self, x):
        enc = self.encoders(x, get_details=False)
        for blk in self.res_blocks:
            enc = blk(enc)
        dec = self.decoders(enc)
        return self.heads(dec)


class SPADE(nn.Module):
    """Spatially-adaptive denorm conditioned on the attention-fused feature —
    `attlwb_spade_resunet.py:52-99` (config spadeinstance3x3, nhidden=128)."""

    norm_nc: int
    nhidden: int = 128

    @nn.compact
    def __call__(self, x, condmap):
        normalized = instance_norm(x)
        actv = nn.relu(nn.Conv(self.nhidden, (3, 3), padding=PAD3)(condmap))
        gamma = nn.Conv(self.norm_nc, (3, 3), padding=PAD3)(actv)
        beta = nn.Conv(self.norm_nc, (3, 3), padding=PAD3)(actv)
        return normalized * (1.0 + gamma) + beta


def adain(content: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """AdaIN with per-pixel channel statistics — `attlwb_adain_resunet.py:25-52`:
    content is normalized by its channel-wise std/mean and re-styled by
    (gamma, beta) = channel std/mean of the attention output.

    std is unbiased (ddof=1) to match `torch.std_mean`'s default."""
    mean = jnp.mean(content, axis=-1, keepdims=True)
    std = jnp.std(content, axis=-1, keepdims=True, ddof=1)
    return (content - mean) / (std + eps) * gamma + beta


def warp(x: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """LWB warp: bilinear-sample features through a flow grid, auto-resizing the
    flow to the feature resolution — `attlwb_spade_resunet.py:142-191`.

    Args:
        x: (N, H, W, C) features; flow: (N, Hf, Wf, 2).

    Returns:
        (N, H, W, C)
    """
    flow = resize_flow(flow, x.shape[1], x.shape[2])
    return grid_sample(x, flow)


def attention_fuse(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Pixel-wise softmax attention over the source axis —
    `attlwb_spade_resunet.py:102-139`.

    Args:
        q: (N, H, W, C); k, v: (N, S, H, W, C).

    Returns:
        (N, H, W, C)
    """
    dk = k.shape[-1]
    logits = jnp.einsum("nshwc,nhwc->nshw", k, q) / jnp.sqrt(jnp.asarray(dk, q.dtype))
    alpha = jax.nn.softmax(logits, axis=1)
    return jnp.einsum("nshw,nshwc->nhwc", alpha, v)


class SelfAttentionLWB(nn.Module):
    """Attention-fuse (pre-)warped source features, modulate the tsf stream.

    mode="spade": SPADE denorm conditioned on the fused feature
        (`attlwb_spade_resunet.py:194-252`).
    mode="adain": channel-stat AdaIN re-styling (`attlwb_adain_resunet.py:152-220`).

    Warping lives in the caller when `pre_warped=True` (the generator warps all
    same-scale features in one wide gather — fewer/larger HBM gathers); passing
    raw features + flows still works for standalone use.
    """

    channel: int
    mode: str = "spade"
    temporal: bool = False

    @nn.compact
    def __call__(self, tsf_x, src_x, Tst=None, temp_x=None, Ttt=None,
                 pre_warped: bool = False):
        """
        Args:
            tsf_x: (bs, h, w, c1) transfer-stream feature.
            src_x: (bs, ns, H', W', c2) per-source features — already warped to
                the target pose when pre_warped=True.
            Tst: (bs, ns, H, W, 2) flows (ignored when pre_warped).
            temp_x: optional (bs, nt, H', W', c2) temporal features.
            Ttt: optional (bs, nt, H, W, 2).

        Returns:
            (bs, h, w, c1) modulated tsf feature.
        """
        bs, ns = src_x.shape[0], src_x.shape[1]
        h, w = tsf_x.shape[1], tsf_x.shape[2]

        fk = nn.Conv(self.channel, (1, 1), name="fk")
        fv = nn.Conv(self.channel, (1, 1), name="fv")

        if pre_warped:
            src_warp = src_x.reshape((bs * ns, h, w) + src_x.shape[4:])
        else:
            src_flat = src_x.reshape((bs * ns,) + src_x.shape[2:])
            flow_flat = Tst.reshape((bs * ns,) + Tst.shape[2:])
            src_warp = warp(src_flat, flow_flat)  # (bs*ns, h, w, c2)
        K = [fk(src_warp).reshape(bs, ns, h, w, self.channel)]
        V = [fv(src_warp).reshape(bs, ns, h, w, self.channel)]

        if self.temporal and temp_x is not None and Ttt is not None:
            nt = temp_x.shape[1]
            if pre_warped:
                temp_warp = temp_x.reshape((bs * nt, h, w) + temp_x.shape[4:])
            else:
                temp_flat = temp_x.reshape((bs * nt,) + temp_x.shape[2:])
                tflow = Ttt.reshape((bs * nt,) + Ttt.shape[2:])
                temp_warp = warp(temp_flat, tflow)
            K.append(fk(temp_warp).reshape(bs, nt, h, w, self.channel))
            V.append(fv(temp_warp).reshape(bs, nt, h, w, self.channel))

        Kc = jnp.concatenate(K, axis=1)
        Vc = jnp.concatenate(V, axis=1)
        q = nn.Conv(self.channel, (1, 1), name="fq")(tsf_x)
        x = attention_fuse(q, Kc, Vc)  # (bs, h, w, channel)

        if self.mode == "spade":
            return SPADE(norm_nc=tsf_x.shape[-1])(tsf_x, x)
        if self.mode == "adain":
            gamma = jnp.std(x, axis=-1, keepdims=True, ddof=1)
            beta = jnp.mean(x, axis=-1, keepdims=True)
            return adain(tsf_x, gamma, beta)
        raise ValueError(f"unknown SelfAttentionLWB mode {self.mode}")


class FusedLWB(nn.Module):
    """Non-attention LWB fusion ablations.

    fuse in {"add", "avg"}: plain sum/mean of warped sources (+ tsf stream)
        (`lwb_resunet.py:77-160`).
    soft_gate=True: sigmoid-gated residual add of the fused warp
        (`lwb_softgate_resunet.py:77-125`).
    """

    fuse: str = "add"
    soft_gate: bool = False

    @nn.compact
    def __call__(self, tsf_x, src_x, Tst=None, temp_x=None, Ttt=None,
                 pre_warped: bool = False):
        bs, ns = src_x.shape[0], src_x.shape[1]
        h, w = tsf_x.shape[1], tsf_x.shape[2]
        if pre_warped:
            src_warp = src_x
        else:
            src_flat = src_x.reshape((bs * ns,) + src_x.shape[2:])
            flow_flat = Tst.reshape((bs * ns,) + Tst.shape[2:])
            src_warp = warp(src_flat, flow_flat).reshape(bs, ns, h, w, -1)

        if self.soft_gate:
            if self.fuse == "add":
                fused = jnp.sum(src_warp, axis=1)
            else:
                fused = jnp.mean(src_warp, axis=1)
            c = tsf_x.shape[-1]
            g = nn.Conv(c, (3, 3), padding=PAD3)(tsf_x)
            g = nn.relu(g)
            g = nn.Conv(c, (3, 3), padding=PAD3)(g)
            gate = nn.sigmoid(g)
            return tsf_x + gate * fused

        stacked = jnp.concatenate([tsf_x[:, None], src_warp], axis=1)
        if self.fuse == "add":
            return jnp.sum(stacked, axis=1)
        return jnp.mean(stacked, axis=1)
