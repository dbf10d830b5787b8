"""Mobilenet OpenPose: golden numeric parity against the reference torch
implementation (`.../openpose/models/mobilenet.py`, random-weight oracle)."""
import importlib.util
import os
import sys

import numpy as np
import pytest

from ipercore_tpu.tools.pose2d_mobilenet import MobilenetOpenPose

REF = "/root/reference"


def _load_ref():
    pytest.importorskip("torch")
    path = os.path.join(
        REF, "iPERCore/tools/human_pose2d_estimators/openpose/models/mobilenet.py")
    if "ref_mobilenet" in sys.modules:
        return sys.modules["ref_mobilenet"]
    spec = importlib.util.spec_from_file_location("ref_mobilenet", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_mobilenet"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_mobilenet_shapes():
    import jax
    import jax.numpy as jnp

    net = MobilenetOpenPose()
    params = jax.eval_shape(net.init, jax.random.PRNGKey(0),
                            jnp.zeros((1, 128, 128, 3)))
    hm_s, paf_s = jax.eval_shape(
        lambda p, x: net.apply(p, x), params, jnp.zeros((2, 128, 128, 3)))
    assert hm_s.shape == (2, 16, 16, 19)
    assert paf_s.shape == (2, 16, 16, 38)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference absent")
def test_mobilenet_matches_reference_torch():
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp

    from ipercore_tpu.utils.torch_convert import convert_mobilenet_openpose

    ref = _load_ref()
    torch.manual_seed(0)
    oracle = ref.PoseEstimationWithMobileNet(num_refinement_stages=1).eval()
    with torch.no_grad():
        for m in oracle.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 1.5)

    x_t = torch.randn(1, 3, 96, 96)
    with torch.no_grad():
        stages = oracle(x_t)
    hm_t, paf_t = stages[-2].numpy(), stages[-1].numpy()

    net = MobilenetOpenPose(num_refinement_stages=1)
    params = jax.eval_shape(net.init, jax.random.PRNGKey(0),
                            jnp.zeros((1, 96, 96, 3)))
    params = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), params)
    conv, report = convert_mobilenet_openpose(oracle.state_dict(), params)
    assert report == [], report[:10]

    x_j = jnp.asarray(np.transpose(x_t.numpy(), (0, 2, 3, 1)))
    hm_j, paf_j = net.apply(conv, x_j)
    np.testing.assert_allclose(
        hm_t, np.transpose(np.asarray(hm_j), (0, 3, 1, 2)), atol=5e-4)
    np.testing.assert_allclose(
        paf_t, np.transpose(np.asarray(paf_j), (0, 3, 1, 2)), atol=5e-4)


def test_coco18_targets_decode_back():
    """A target heatmap decoded with n_joints=18 recovers the GT joints."""
    import jax
    import jax.numpy as jnp

    from ipercore_tpu.tools import synth_data as sd
    from ipercore_tpu.tools.pose2d import decode_single_person

    j2d = jnp.asarray(
        np.random.RandomState(0).uniform(-0.8, 0.8, (2, 19, 2)), jnp.float32)
    hm, paf, hm_w, paf_w = sd.make_pose2d_targets_coco18(j2d, 64)
    assert hm.shape == (2, 64, 64, 19) and paf.shape == (2, 64, 64, 38)
    assert hm_w.shape == (19,) and paf_w.shape == (38,)
    kps, scores, valid = decode_single_person(hm, n_joints=18)
    gt = np.asarray(j2d)[:, np.asarray(sd.COCO18_FROM_COCOPLUS)]
    err = np.linalg.norm(np.asarray(kps) - gt, axis=-1)
    assert float(err.max()) < 0.08  # within ~2.5 heatmap px
    assert bool(np.all(np.asarray(scores) > 0.5))


def test_mobilenet_runner_body25_contract(tmp_path):
    """Runner returns Body-25 slots with a synthesized mid-hip."""
    runner_mod = pytest.importorskip("ipercore_tpu.tools.pose2d_mobilenet")
    runner = runner_mod.MobilenetOpenPoseRunner(
        input_size=64, weights_path=str(tmp_path / "absent.npz"))
    assert not runner.trained  # isolated from shipped assets

    kps18 = np.random.RandomState(1).uniform(-0.5, 0.5, (3, 18, 2)).astype(np.float32)
    scores18 = np.full((3, 18), 0.9, np.float32)
    kps, scores = runner._to_body25(kps18, scores18)
    assert kps.shape == (3, 25, 2) and scores.shape == (3, 25)
    np.testing.assert_allclose(kps[:, 8], 0.5 * (kps[:, 9] + kps[:, 12]))
    # toe/heel slots (19-24) stay empty
    assert float(scores[:, 19:].max()) == 0.0

    imgs = np.random.RandomState(2).uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32)
    kps, scores, valid = runner.run(imgs)
    assert kps.shape == (1, 25, 2) and scores.shape == (1, 25)
    assert valid.dtype == bool


def test_build_pose2d_estimator_mobilenet():
    from ipercore_tpu.tools.pose2d import build_pose2d_estimator
    from ipercore_tpu.tools.pose2d_mobilenet import MobilenetOpenPoseRunner

    r = build_pose2d_estimator("mobilenet", input_size=64)
    assert isinstance(r, MobilenetOpenPoseRunner)
