"""InceptionV3 (FID feature net) + LPIPS(lin) architecture & converter tests.

The reference's evaluation protocol (`/root/reference/docs/evaluate.md:4-11`)
quotes FID (InceptionV3 pool3) and LPIPS; no network access exists here, so
these tests validate the architectures and the torch-name converters with
synthetic state dicts shaped exactly like the published checkpoints — a real
checkpoint then drops in with a zero-entry report.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ipercore_tpu.models.networks.inception import InceptionV3Features
from ipercore_tpu.models.networks.criterions import LPIPSLin
from ipercore_tpu.utils.torch_convert import convert_inception, convert_lpips


@pytest.fixture(scope="module")
def inc_params():
    net = InceptionV3Features()
    # 96 px keeps the CPU cost test-friendly; the stride chain stays valid
    return net, jax.jit(net.init)(jax.random.PRNGKey(0),
                                  jnp.zeros((1, 96, 96, 3)))


def test_inception_feature_shape_and_size(inc_params):
    net, params = inc_params
    out = jax.jit(net.apply)(params, jnp.zeros((2, 96, 96, 3)))
    assert out.shape == (2, 2048)
    n = sum(int(np.prod(np.shape(p))) for p in jax.tree_util.tree_leaves(params))
    # torchvision inception_v3 minus fc/aux heads is ~21.8M params
    assert 20e6 < n < 24e6, n


def _fake_torch_sd_from(params):
    """Walk our param tree and emit a torchvision-layout state dict."""
    sd = {}

    def walk(node, path):
        if "conv" in node and "bn_scale" in node:
            pre = ".".join(path)
            k = np.asarray(node["conv"]["kernel"])  # (kh, kw, i, o)
            sd[pre + ".conv.weight"] = np.full_like(
                k.transpose(3, 2, 0, 1), 0.01)
            for tk, fk in (("bn.weight", "bn_scale"), ("bn.bias", "bn_bias"),
                           ("bn.running_mean", "bn_mean"),
                           ("bn.running_var", "bn_var")):
                sd[pre + "." + tk] = np.full_like(np.asarray(node[fk]), 0.5)
            return
        for k, v in node.items():
            if isinstance(v, dict) or hasattr(v, "keys"):
                walk(v, path + (k,))

    tree = params["params"] if "params" in params else params
    walk(tree, ())
    return sd


def test_convert_inception_full_coverage(inc_params):
    net, params = inc_params
    sd = _fake_torch_sd_from(params)
    # the real checkpoint also carries fc/aux entries — must be ignored
    sd["fc.weight"] = np.zeros((1000, 2048), np.float32)
    sd["AuxLogits.conv0.conv.weight"] = np.zeros((128, 768, 1, 1), np.float32)
    out, report = convert_inception(sd, params)
    assert report == [], report[:5]
    tree = out["params"] if "params" in out else out
    np.testing.assert_allclose(
        np.asarray(tree["Mixed_5b"]["branch1x1"]["conv"]["kernel"]), 0.01)
    np.testing.assert_allclose(
        np.asarray(tree["Conv2d_1a_3x3"]["bn_mean"]), 0.5)


def test_convert_inception_reports_missing(inc_params):
    net, params = inc_params
    sd = _fake_torch_sd_from(params)
    for k in list(sd):
        if k.startswith("Mixed_7c.branch_pool"):
            del sd[k]
    _out, report = convert_inception(sd, params)
    assert any("Mixed_7c" in r for r in report), report[:5]


@pytest.fixture(scope="module")
def lpips_params():
    net = LPIPSLin()
    return net, jax.jit(net.init)(jax.random.PRNGKey(0),
                                  jnp.zeros((1, 64, 64, 3)),
                                  jnp.zeros((1, 64, 64, 3)))


def test_lpips_zero_on_identical_and_positive_on_noise(lpips_params):
    net, params = lpips_params
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32))
    d0 = jax.jit(net.apply)(params, a, a)
    assert np.allclose(np.asarray(d0), 0.0, atol=1e-6)
    b = jnp.clip(a + 0.3 * rng.randn(2, 64, 64, 3).astype(np.float32), -1, 1)
    # random-init lin weights can be negative; magnitude must be nonzero
    assert np.abs(np.asarray(net.apply(params, a, b))).min() > 0


def test_convert_lpips_places_weights(lpips_params):
    net, params = lpips_params
    tree = params["params"] if "params" in params else params
    sd = {}
    # official lpips keys: net.slice{k}.{idx}.weight/bias + lin{k}.model.1.weight
    slice_convs = {1: (0, 2), 2: (5, 7), 3: (10, 12, 14),
                   4: (17, 19, 21), 5: (24, 26, 28)}
    starts = {1: 0, 2: 4, 3: 9, 4: 16, 5: 23}
    for si, idxs in slice_convs.items():
        for wi, idx in enumerate(idxs):
            k = np.asarray(tree["vgg"][f"conv{si - 1}_{wi}"]["kernel"])
            sd[f"net.slice{si}.{idx - starts[si]}.weight"] = np.full_like(
                k.transpose(3, 2, 0, 1), 0.02)
            sd[f"net.slice{si}.{idx - starts[si]}.bias"] = np.zeros(
                k.shape[-1], np.float32)
    for j in range(5):
        k = np.asarray(tree[f"lin{j}"]["kernel"])
        sd[f"lin{j}.model.1.weight"] = np.full_like(
            k.transpose(3, 2, 0, 1), 3.0)
    out, report = convert_lpips(sd, params)
    assert report == [], report[:5]
    otree = out["params"] if "params" in out else out
    np.testing.assert_allclose(np.asarray(otree["vgg"]["conv0_0"]["kernel"]), 0.02)
    np.testing.assert_allclose(np.asarray(otree["lin3"]["kernel"]), 3.0)


def test_evaluate_frames_metric_keys(tmp_path):
    """`evaluate_frames` reports honest keys: proxies without converted
    official weights, exact names with them (here: a synthetic LPIPS ckpt)."""
    from ipercore_tpu.services import evaluate as ev
    from ipercore_tpu.utils.checkpoint import save_params

    rng = np.random.RandomState(0)
    a = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    m = ev.evaluate_frames(a, a, metric=ev.PerceptualMetric(image_size=32),
                           fid_net=ev.InceptionFID(str(tmp_path / "no.npz")),
                           lpips_net=ev.LPIPSMetric(str(tmp_path / "no2.npz")))
    assert "lpips_proxy" in m and "fid_proxy" in m
    assert "lpips" not in m and "fid" not in m
    # with weights present the exact key appears
    net = LPIPSLin()
    params = jax.jit(net.init)(jax.random.PRNGKey(0),
                               jnp.zeros((1, 32, 32, 3)),
                               jnp.zeros((1, 32, 32, 3)))
    p = str(tmp_path / "lpips_vgg.npz")
    save_params(p, params)
    m2 = ev.evaluate_frames(a, a, metric=ev.PerceptualMetric(image_size=32),
                            fid_net=ev.InceptionFID(str(tmp_path / "no.npz")),
                            lpips_net=ev.LPIPSMetric(p))
    assert "lpips" in m2 and m2["lpips"] < 1e-5
