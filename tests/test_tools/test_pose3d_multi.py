"""Multi-hypothesis SMPLify (VERDICT r4 item 1c) — CPU-hermetic.

The product blocker at r4 HEAD was a SPIN init so wrong on photographs
(PCK 0.08) that single-basin refinement anchored to its mistakes. These tests
prove the rescue path: a keypoint-fit camera init and per-frame hypothesis
selection recover a pose the bad-init basin cannot.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ipercore_tpu.models import smpl as smpl_mod
from ipercore_tpu.tools.pose3d import (SMPLifyConfig, keypoint_cam_init,
                                       natural_stance_aa, reprojection_error,
                                       smplify_refine, smplify_refine_multi)


@pytest.fixture(scope="module")
def model():
    return smpl_mod.synthetic_model(nu=16, nv=14)


def _gt_scene(model, n=2, seed=0):
    """Ground-truth thetas near natural stance + their projected keypoints.

    Frames are TEMPORALLY COHERENT (shared base pose + per-frame drift):
    `smplify_refine`'s temporal smoothness terms model video, and frames with
    independent random poses would make those terms fight the data term."""
    rng = np.random.RandomState(seed)
    base = natural_stance_aa() + 0.08 * rng.randn(72).astype(np.float32)
    pose = np.tile(base[None], (n, 1)) + 0.01 * rng.randn(n, 72).astype(np.float32)
    cam = np.stack([np.full(n, 1.4 + 0.2 * rng.rand()),
                    np.full(n, 0.1 * rng.randn()),
                    np.full(n, 0.1 * rng.randn())], axis=1)
    shape = np.tile(0.3 * rng.randn(10)[None], (n, 1))
    theta = np.concatenate([cam, pose, shape], axis=1).astype(np.float32)
    j2d = np.asarray(smpl_mod.get_details(model, jnp.asarray(theta))["j2d"])
    return theta, j2d


def test_keypoint_cam_init_recovers_camera(model):
    theta_gt, j2d = _gt_scene(model)
    conf = np.ones(j2d.shape[:2], np.float32)
    init = np.asarray(keypoint_cam_init(
        model, jnp.asarray(j2d), jnp.asarray(conf)))
    # the pose differs from GT (canonical stance), so the fitted camera only
    # needs to land in the right ballpark: reprojection with the canonical
    # pose must beat a default camera by a wide margin
    e_fit = np.asarray(reprojection_error(
        model, jnp.asarray(init), jnp.asarray(j2d), jnp.asarray(conf)))
    default = init.copy()
    default[:, :3] = (1.0, 0.0, 0.0)
    e_def = np.asarray(reprojection_error(
        model, jnp.asarray(default), jnp.asarray(j2d), jnp.asarray(conf)))
    assert (e_fit <= e_def + 1e-6).all()
    # scale within 30% of GT (pose mismatch bounds how exact it can be)
    assert np.allclose(init[:, 0], theta_gt[:, 0], rtol=0.3)


def test_multi_init_rescues_bad_spin_init(model):
    theta_gt, j2d = _gt_scene(model)
    n = len(theta_gt)
    conf = np.ones(j2d.shape[:2], np.float32)
    # a catastrophically wrong init: arms-up T-pose, wrong scale, shifted —
    # the r4 failure mode in miniature
    bad = theta_gt.copy()
    bad[:, 3:75] = 0.0
    bad[:, 0] = 0.5
    bad[:, 1:3] += 0.8
    cfg = SMPLifyConfig()._replace(n_iters=60)
    single = smplify_refine(model, jnp.asarray(bad), jnp.asarray(j2d),
                            jnp.asarray(conf), cfg)
    multi = smplify_refine_multi(model, jnp.asarray(bad), jnp.asarray(j2d),
                                 jnp.asarray(conf), cfg)
    e_single = np.asarray(reprojection_error(
        model, single, jnp.asarray(j2d), jnp.asarray(conf)))
    e_multi = np.asarray(reprojection_error(
        model, multi, jnp.asarray(j2d), jnp.asarray(conf)))
    # multi never loses to the bad-init basin, and wins overall
    assert (e_multi <= e_single + 1e-4).all()
    assert e_multi.mean() < 0.75 * e_single.mean()


def test_multi_init_keeps_good_init(model):
    """When the init is already right, multi must not regress it."""
    theta_gt, j2d = _gt_scene(model)
    conf = np.ones(j2d.shape[:2], np.float32)
    near = theta_gt.copy()
    near[:, 3:75] += 0.03
    cfg = SMPLifyConfig()._replace(n_iters=40)
    out = smplify_refine_multi(model, jnp.asarray(near), jnp.asarray(j2d),
                               jnp.asarray(conf), cfg)
    e = np.asarray(reprojection_error(
        model, out, jnp.asarray(j2d), jnp.asarray(conf)))
    e_init = np.asarray(reprojection_error(
        model, jnp.asarray(near), jnp.asarray(j2d), jnp.asarray(conf)))
    # the regularized objective may trade a sliver of reprojection for the
    # shape/angle priors; what must not happen is a hypothesis switch away
    # from a good basin (which would cost ~0.1+ NDC)
    assert (e <= e_init + 0.02).all()
