"""3D pose/shape recovery: SPIN (ResNet-50 + iterative regressor) + SMPLify.

Rebuilds `iPERCore/tools/human_pose3d_estimators/`:
  * SPIN HMR network (`spin/network.py:178-241`): ResNet-50 backbone + 3-iter
    regressor emitting rot6d pose (24 x 6) + shape (10) + cam (3);
  * SPIN runner (`spin/runner.py:109-288`): 224-crop batched inference;
  * SMPLify refinement (`smplify/smplify.py:16-175`): optimize pose/shape/cam
    against 2D keypoints. The reference's LBFGS + strong Wolfe line search is
    replaced by fixed-iteration Adam under jit (the reference itself ships the
    Adam path, `smplify.py:161-175`) — compiler-friendly control flow.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
import optax

from ipercore_tpu.models import smpl as smpl_mod
from ipercore_tpu.ops.rotations import rot6d_to_rotmat, rotmat_to_axis_angle, axis_angle_to_rot6d
from ipercore_tpu.models.networks.blocks import PAD3

HMR_IMG_SIZE = 224


class Bottleneck(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False)(x)
        y = nn.relu(nn.GroupNorm(num_groups=32)(y))
        y = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                    padding=PAD3, use_bias=False)(y)
        y = nn.relu(nn.GroupNorm(num_groups=32)(y))
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False)(y)
        y = nn.GroupNorm(num_groups=32)(y)
        if residual.shape[-1] != self.features * 4 or self.stride != 1:
            residual = nn.Conv(self.features * 4, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False)(x)
            residual = nn.GroupNorm(num_groups=32)(residual)
        return nn.relu(y + residual)


class ResNet50(nn.Module):
    """ResNet-50 trunk (GroupNorm in place of frozen BatchNorm — equivalent
    inference statistics handling without mutable state)."""

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)), use_bias=False)(x)
        x = nn.relu(nn.GroupNorm(num_groups=32)(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for i, (blocks, width) in enumerate(((3, 64), (4, 128), (6, 256), (3, 512))):
            for b in range(blocks):
                stride = 2 if (b == 0 and i > 0) else 1
                x = Bottleneck(width, stride)(x)
        return jnp.mean(x, axis=(1, 2))  # global average pool -> (N, 2048)


class SPINRegressor(nn.Module):
    """Iterative HMR regressor: 3 refinement iterations over (pose6d, shape, cam)
    — `spin/network.py:178-241`."""

    n_iter: int = 3

    @nn.compact
    def __call__(self, feats, init_pose, init_shape, init_cam):
        pose, shape, cam = init_pose, init_shape, init_cam
        fc1 = nn.Dense(1024)
        fc2 = nn.Dense(1024)
        dec_pose = nn.Dense(24 * 6)
        dec_shape = nn.Dense(10)
        dec_cam = nn.Dense(3)
        for _ in range(self.n_iter):
            x = jnp.concatenate([feats, pose, shape, cam], axis=-1)
            x = nn.relu(fc1(x))
            x = nn.relu(fc2(x))
            pose = dec_pose(x) + pose
            shape = dec_shape(x) + shape
            cam = dec_cam(x) + cam
        return pose, shape, cam


class SPINNet(nn.Module):
    """ResNet-50 + iterative regressor."""

    @nn.compact
    def __call__(self, images):
        """images: (N, 224, 224, 3) ImageNet-normalized.

        Returns: pose6d (N, 144), shape (N, 10), cam (N, 3)."""
        n = images.shape[0]
        feats = ResNet50()(images)
        init_pose = self.param(
            "init_pose", nn.initializers.zeros, (1, 24 * 6))
        init_shape = self.param("init_shape", nn.initializers.zeros, (1, 10))
        init_cam = self.param(
            "init_cam", lambda k, s: jnp.asarray([[0.9, 0.0, 0.0]]), (1, 3))
        pose, shape, cam = SPINRegressor()(
            feats,
            jnp.broadcast_to(init_pose, (n, 144)),
            jnp.broadcast_to(init_shape, (n, 10)),
            jnp.broadcast_to(init_cam, (n, 3)),
        )
        return pose, shape, cam


def spin_output_to_theta(pose6d: jnp.ndarray, shape: jnp.ndarray, cam: jnp.ndarray) -> jnp.ndarray:
    """(N, 144) rot6d + (N, 10) + (N, 3) -> (N, 85) theta (cam|pose_aa|shape)."""
    n = pose6d.shape[0]
    R = rot6d_to_rotmat(pose6d.reshape(n, 24, 6))
    aa = rotmat_to_axis_angle(R).reshape(n, 72)
    return jnp.concatenate([cam, aa, shape], axis=-1)


class SPINRunner:
    """Batched jitted SPIN inference — `spin/runner.py:109-288`."""

    def __init__(self, params=None):
        self.net = SPINNet()
        if params is None:
            params = jax.jit(self.net.init)(
                jax.random.PRNGKey(0), jnp.zeros((1, HMR_IMG_SIZE, HMR_IMG_SIZE, 3)))
        self.params = params

        @jax.jit
        def _run(params, images):
            pose6d, shape, cam = self.net.apply(params, images)
            return spin_output_to_theta(pose6d, shape, cam)

        self._run = _run

    def run(self, images: np.ndarray, batch_size: int = 32) -> np.ndarray:
        """images: (N, 224, 224, 3) in [-1, 1]. Returns theta (N, 85)."""
        x = (jnp.asarray(images) + 1.0) * 0.5
        mean = jnp.asarray([0.485, 0.456, 0.406])
        std = jnp.asarray([0.229, 0.224, 0.225])
        x = (x - mean) / std
        outs = []
        n = x.shape[0]
        pad = (-n) % batch_size
        if pad:
            x = jnp.concatenate([x, jnp.repeat(x[-1:], pad, axis=0)])
        for i in range(0, x.shape[0], batch_size):
            outs.append(np.asarray(self._run(self.params, x[i:i + batch_size])))
        return np.concatenate(outs)[:n]


# ---------------------------------------------------------------------------
# SMPLify refinement
# ---------------------------------------------------------------------------


def gmof(x: jnp.ndarray, sigma: float = 100.0) -> jnp.ndarray:
    """Geman-McClure robust error — `smplify/losses.py:213`."""
    sq = x ** 2
    return sq * sigma / (sq + sigma ** 2)


def angle_prior(pose_aa: jnp.ndarray) -> jnp.ndarray:
    """Penalize unnatural knee/elbow bending — `losses.py:222`.

    pose_aa: (N, 72). Joint ids 4, 5 (knees), 18, 19 (elbows); sign-specific.
    """
    idx = jnp.asarray([52, 55, 9, 12])  # 3*17+1, 3*18+1, 3*2+... reference convention
    sign = jnp.asarray([1.0, -1.0, -1.0, -1.0])
    vals = pose_aa[:, idx] * sign
    return jnp.sum(jnp.exp(vals) ** 2, axis=-1)


class SMPLifyConfig(NamedTuple):
    n_iters: int = 40
    lr: float = 0.02
    kp_sigma: float = 100.0
    w_reproj: float = 1.0
    w_pose_reg: float = 1e-3
    w_shape_reg: float = 1e-2
    w_angle: float = 1e-2
    w_temporal: float = 1e-2


def smplify_refine(
    model: smpl_mod.SMPLModel,
    theta_init: jnp.ndarray,
    kps2d: jnp.ndarray,
    kps_conf: jnp.ndarray,
    cfg: SMPLifyConfig = SMPLifyConfig(),
) -> jnp.ndarray:
    """Refine SMPL parameters against 2D keypoints — `smplify.py:46-175`.

    Runs fixed-iteration Adam (jit-friendly; the reference also ships this
    optimizer choice) over (pose6d, shape, cam) with a robust reprojection
    loss + pose/shape regularizers toward the SPIN initialization (the role of
    the GMM prior: keep pose near a plausible body) + temporal smoothness.

    Args:
        theta_init: (N, 85); kps2d: (N, 19, 2) in [-1, 1]; kps_conf: (N, 19).

    Returns:
        theta_refined: (N, 85)
    """
    n = theta_init.shape[0]
    cam0 = theta_init[:, :3]
    pose0_aa = theta_init[:, 3:75]
    shape0 = theta_init[:, 75:]
    pose0 = axis_angle_to_rot6d(pose0_aa.reshape(n, 24, 3)).reshape(n, 144)

    def unpack(params):
        pose6d, shape, cam = params
        R = rot6d_to_rotmat(pose6d.reshape(n, 24, 6))
        aa = rotmat_to_axis_angle(R).reshape(n, 72)
        return jnp.concatenate([cam, aa, shape], axis=-1)

    def loss_fn(params):
        pose6d, shape, cam = params
        theta = unpack(params)
        details = smpl_mod.get_details(model, theta)
        j2d = details["j2d"]  # (N, 19, 2)
        reproj = jnp.sum(
            kps_conf[..., None] * gmof(j2d - kps2d, cfg.kp_sigma), axis=(1, 2))
        pose_reg = jnp.sum((pose6d - pose0) ** 2, axis=-1)
        shape_reg = jnp.sum(shape ** 2, axis=-1)
        ang = angle_prior(theta[:, 3:75])
        temporal = jnp.sum((pose6d[1:] - pose6d[:-1]) ** 2) if n > 1 else 0.0
        total = (
            cfg.w_reproj * jnp.sum(reproj)
            + cfg.w_pose_reg * jnp.sum(pose_reg)
            + cfg.w_shape_reg * jnp.sum(shape_reg)
            + cfg.w_angle * jnp.sum(ang)
            + cfg.w_temporal * temporal
        )
        return total

    tx = optax.adam(cfg.lr)
    params = (pose0, shape0, cam0)
    opt_state = tx.init(params)

    def step(carry, _):
        params, opt_state = carry
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    (params, _), _ = jax.lax.scan(step, (params, opt_state), None, length=cfg.n_iters)
    return unpack(params)
