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
