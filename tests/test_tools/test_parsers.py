"""SCHP parser: unit tests + golden numeric parity against the reference
torch implementation (`/root/reference/.../schp_parser.py`, used as an oracle
with random weights — never copied)."""
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

from ipercore_tpu.tools.parsers import (
    LIP_TARGETS, SchpNet, SchpParser, adaptive_avg_pool,
    find_largest_connected_mask, resize_bilinear_ac,
)

REF = "/root/reference"


def _load_ref_schp():
    torch = pytest.importorskip("torch")
    if "torchvision" not in sys.modules:
        try:
            import torchvision  # noqa: F401
        except ImportError:
            tv = types.ModuleType("torchvision")
            tvt = types.ModuleType("torchvision.transforms")
            tvt.Compose = lambda fns: fns
            tvt.ToTensor = lambda: None
            tvt.Normalize = lambda **kw: None
            tv.transforms = tvt
            sys.modules.update({"torchvision": tv, "torchvision.transforms": tvt})
    path = os.path.join(REF, "iPERCore/tools/human_mattors/schp_parser.py")
    if "ref_schp" in sys.modules:
        return sys.modules["ref_schp"]
    spec = importlib.util.spec_from_file_location("ref_schp", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_schp"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_adaptive_avg_pool_matches_torch():
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    # 7x7 input with pool sizes that do NOT divide it — exercises the exact
    # floor/ceil region logic of AdaptiveAvgPool2d.
    x = rng.randn(2, 7, 7, 5).astype(np.float32)
    for k in (1, 2, 3, 6):
        ours = np.asarray(adaptive_avg_pool(jnp.asarray(x), k))
        theirs = torch.nn.AdaptiveAvgPool2d((k, k))(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
        np.testing.assert_allclose(
            ours, np.transpose(theirs.numpy(), (0, 2, 3, 1)), atol=1e-6)


def test_resize_bilinear_ac_matches_torch():
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp
    import torch.nn.functional as F

    rng = np.random.RandomState(1)
    x = rng.randn(1, 5, 9, 3).astype(np.float32)
    for (h, w) in ((11, 4), (5, 9), (1, 7), (16, 16)):
        ours = np.asarray(resize_bilinear_ac(jnp.asarray(x), h, w))
        theirs = F.interpolate(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2))), size=(h, w),
            mode="bilinear", align_corners=True)
        np.testing.assert_allclose(
            ours, np.transpose(theirs.numpy(), (0, 2, 3, 1)), atol=1e-5)


def test_largest_connected_mask():
    m = np.zeros((20, 20), np.uint8)
    m[2:10, 2:10] = 1          # big blob (64 px)
    m[15:17, 15:17] = 1        # small noise blob
    out = find_largest_connected_mask(m)
    assert out[5, 5] == 1 and out[16, 16] == 0


def test_schp_net_shapes():
    import jax
    import jax.numpy as jnp

    net = SchpNet(layers=(1, 1, 1, 1))  # thin trunk: shape contract only
    params = jax.jit(net.init)(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    out = jax.jit(net.apply)(params, jnp.zeros((2, 64, 64, 3)))
    assert out.shape == (2, 16, 16, 20)  # stride-4 fusion logits


def test_parser_targets_and_run():
    parser = SchpParser(input_size=64, num_classes=20)
    # random filters: just the data-path contract (shapes, no NaN, bail-out)
    imgs = np.zeros((1, 64, 64, 3), np.float32)
    parse = parser.parse(imgs)
    assert parse.shape == (1, 64, 64)
    assert set(LIP_TARGETS) == {"body", "skirt+dress", "background"}


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference absent")
def test_schp_matches_reference_torch():
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp

    from ipercore_tpu.utils.torch_convert import convert_schp

    ref = _load_ref_schp()
    torch.manual_seed(0)
    oracle = ref.build_schp(num_classes=20, pretrained=None).eval()
    with torch.no_grad():
        for m in oracle.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 1.5)

    # 97x97 -> stride-16 feature 7x7: PSP pools (1,2,3,6) don't divide it,
    # so this also validates the adaptive-pool + align-corners resizes inside.
    x_t = torch.randn(1, 3, 97, 97)
    with torch.no_grad():
        out_t = oracle(x_t).numpy()

    net = SchpNet()
    params = jax.eval_shape(net.init, jax.random.PRNGKey(0),
                            jnp.zeros((1, 97, 97, 3)))
    params = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), params)
    conv, report = convert_schp(oracle.state_dict(), params)
    assert report == [], report[:10]

    x_j = jnp.asarray(np.transpose(x_t.numpy(), (0, 2, 3, 1)))
    out_j = np.transpose(np.asarray(net.apply(conv, x_j)), (0, 3, 1, 2))
    assert out_t.shape == out_j.shape
    np.testing.assert_allclose(out_t, out_j, atol=5e-4)
