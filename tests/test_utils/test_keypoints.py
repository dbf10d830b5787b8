"""Keypoint formatters: golden parity against the reference implementation
(`iPERCore/tools/utils/geometry/keypoints.py`, imported as an oracle)."""
import os
import sys

import numpy as np
import pytest

from ipercore_tpu.utils.keypoints import (
    FORMATTERS, build_formatter, temporal_smooth_keypoints,
)

REF = "/root/reference"


def _ref_keypoints():
    pytest.importorskip("torch")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from iPERCore.tools.utils.geometry import keypoints as rk
    return rk


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference absent")
@pytest.mark.parametrize("family,nj", [
    ("OpenPose-Body-25", 25), ("CocoWhole-Body-23", 23),
])
def test_formatters_match_reference(family, nj):
    # (the reference's HalpeBody26KeypointFormater cannot even be
    # instantiated — it leaves `mapper_to_smpl` abstract — so Halpe parity is
    # asserted against the documented layout in test_halpe_layout instead)
    rk = _ref_keypoints()
    rng = np.random.RandomState(0)
    kps = rng.uniform(0, 300, (nj, 3)).astype(np.float32)
    kps[:, 2] = rng.uniform(0, 1, nj)
    frame = {"pose_keypoints_2d": kps.reshape(-1)}

    ours = build_formatter(family)
    theirs = rk.KEYPOINTS_FORMATER[family]()

    for im_shape in ((480, 320), None):
        inp = frame
        if im_shape is None:
            inp = {"pose_keypoints_2d": np.clip(kps / 160.0 - 1.0, -1, 1).reshape(-1)}
        np.testing.assert_allclose(
            ours.format_keypoints(inp, im_shape),
            theirs.format_keypoints(inp, im_shape), atol=1e-5)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference absent")
def test_stacked_formatting_matches_reference():
    rk = _ref_keypoints()
    rng = np.random.RandomState(1)
    stack = {"pose_keypoints_2d": rng.uniform(0, 200, (4, 25 * 3)).astype(np.float32)}
    ours = build_formatter("OpenPose-Body-25")
    theirs = rk.KEYPOINTS_FORMATER["OpenPose-Body-25"]()
    for i in range(4):
        np.testing.assert_allclose(
            ours.format_stacked_keypoints(i, stack, (256, 256)),
            theirs.format_stacked_keypoints(i, stack, (256, 256)), atol=1e-5)


def test_stack_and_smooth_roundtrip():
    rng = np.random.RandomState(2)
    frames = [{"pose_keypoints_2d": rng.uniform(0, 100, (25 * 3,)).astype(np.float32)}
              for _ in range(16)]
    fmt = build_formatter("OpenPose-Body-25")
    stack = fmt.stack_keypoints(frames)
    assert stack["pose_keypoints_2d"].shape == (16, 75)
    sm = temporal_smooth_keypoints(stack)
    assert sm["pose_keypoints_2d"].shape == (16, 75)
    # scores untouched by smoothing
    np.testing.assert_allclose(
        sm["pose_keypoints_2d"].reshape(16, 25, 3)[..., 2],
        stack["pose_keypoints_2d"].reshape(16, 25, 3)[..., 2], atol=1e-6)


def test_halpe_layout():
    """Halpe-26 joints land after 25 OpenPose + 24 extra slots -> (75, 3),
    renormalized to the 224 frame (`keypoints.py:412-443`)."""
    rng = np.random.RandomState(3)
    kps = rng.uniform(0, 448, (26, 3)).astype(np.float32)
    fmt = build_formatter("Halpe-Body-26")
    out = fmt.format_keypoints({"pose_keypoints_2d": kps.reshape(-1)}, (448, 448))
    assert out.shape == (75, 3)
    np.testing.assert_array_equal(out[:49], 0)
    np.testing.assert_allclose(out[49:, :2], kps[:, :2] / 448 * 224, atol=1e-5)
    np.testing.assert_allclose(out[49:, 2], kps[:, 2], atol=1e-6)


def test_ignored_joints_zeroed():
    fmt = build_formatter("OpenPose-Body-25")
    kps = np.ones((25, 3), np.float32) * 50
    out = fmt.format_keypoints({"pose_keypoints_2d": kps.reshape(-1)}, (224, 224))
    # Neck(12), RHip(2), LHip(1) slots zeroed
    for slot in (12, 2, 1):
        np.testing.assert_array_equal(out[slot], 0)
    assert set(FORMATTERS) == {"OpenPose-Body-25", "CocoWhole-Body-23", "Halpe-Body-26"}
