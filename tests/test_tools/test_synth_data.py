"""Procedural supervision scenes (tools/synth_data.py) — CPU-hermetic."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ipercore_tpu.models import smpl as smpl_mod
from ipercore_tpu.models.mesh import load_assets
from ipercore_tpu.tools import synth_data as sd


@pytest.fixture(scope="module")
def scene_model():
    model = smpl_mod.synthetic_model(nu=16, nv=14)
    assets = load_assets(model, uv_map_path="/nonexistent", part_path="/nonexistent")
    return model, assets


def test_compose_scene_labels_consistent(scene_model):
    model, assets = scene_model
    # photo=False: the strict compositing invariant (img == bg outside the
    # person up to noise) holds only without the camera-pipeline augmentation
    sb = sd.compose_scene(jax.random.PRNGKey(0), model, assets, batch=2,
                          size=64, photo=False)
    assert sb.img.shape == (2, 64, 64, 3)
    assert sb.alpha.shape == (2, 64, 64, 1)
    assert sb.theta.shape == (2, 85)
    assert sb.j2d.shape == (2, 19, 2)
    # scene == background outside the person (up to noise)
    out_region = np.asarray(jnp.abs(sb.img - sb.bg) * (1 - sb.alpha))
    assert out_region.mean() < 0.1
    # the person occupies a plausible fraction of the frame
    frac = float(sb.mask.mean())
    assert 0.02 < frac < 0.6
    # labels are finite
    for f in sb._fields:
        assert np.isfinite(np.asarray(getattr(sb, f))).all(), f


def test_compose_scene_photo_domain(scene_model):
    """photo=True (default): augmented composite stays in range with the same
    geometric labels; the person still dominates its alpha region."""
    model, assets = scene_model
    sb = sd.compose_scene(jax.random.PRNGKey(0), model, assets, batch=2, size=64)
    assert np.abs(np.asarray(sb.img)).max() <= 1.0 + 1e-5
    assert 0.02 < float(sb.mask.mean()) < 0.6
    for f in sb._fields:
        assert np.isfinite(np.asarray(getattr(sb, f))).all(), f


def test_make_theta_yaw_distribution(scene_model):
    model, _ = scene_model
    theta = sd.make_theta(jax.random.PRNGKey(1), 64)
    orient = np.asarray(theta[:, 3:6])
    # full yaw ring: orientation magnitudes spread beyond the tilt scale
    mags = np.linalg.norm(orient, axis=1)
    assert mags.max() > 2.0 and mags.std() > 0.5
    # jit-compatible (constants stay host-side)
    jax.jit(lambda k: sd.make_theta(k, 4))(jax.random.PRNGKey(2))


def test_pose2d_targets_under_jit(scene_model):
    """Heatmap peaks land on the joints; PAF channel weights match validity;
    the whole target construction works inside jit (host-side masks)."""
    j2d = jnp.zeros((1, 19, 2))  # all joints at image center
    hm, paf, hm_w, paf_w = jax.jit(
        lambda j: sd.make_pose2d_targets(j, 16))(j2d)
    assert hm.shape == (1, 16, 16, 26) and paf.shape == (1, 16, 16, 52)
    # valid joint channels peak at the center
    c = 16 // 2
    peak = np.asarray(hm[0, :, :, 0])
    iy, ix = np.unravel_index(peak.argmax(), peak.shape)
    assert abs(iy - c) <= 1 and abs(ix - c) <= 1
    # toe/heel Body-25 channels (19-24) carry zero weight
    assert float(np.asarray(hm_w)[19:25].sum()) == 0.0
    assert float(np.asarray(hm_w)[:19].sum()) == 19.0


def test_random_holes_coverage():
    holes = sd.random_holes(jax.random.PRNGKey(3), 4, 64)
    assert holes.shape == (4, 64, 64, 1)
    m = np.asarray(holes).mean(axis=(1, 2, 3))
    assert (m > 0.0).all() and (m < 0.9).all()
