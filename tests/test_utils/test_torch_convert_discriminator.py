"""Golden parity: flax discriminators vs the REFERENCE torch discriminators
(`multi_scale_dis.py`, `patch_dis.py`) through `convert_discriminator` —
the `net_iter_*_id_D.pth` resume path."""
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
DIS_DIR = os.path.join(REF, "iPERCore/models/networks/discriminators")
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference absent")


class _NS:
    def __init__(self, **kw):
        self.__dict__.update(kw)


def _load_ref():
    if "ref_dispkg.multi_scale_dis" in sys.modules:
        return sys.modules["ref_dispkg.multi_scale_dis"]
    pkg = types.ModuleType("ref_dispkg")
    pkg.__path__ = [DIS_DIR]
    sys.modules["ref_dispkg"] = pkg
    spec = importlib.util.spec_from_file_location(
        "ref_dispkg.multi_scale_dis", os.path.join(DIS_DIR, "multi_scale_dis.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_dispkg.multi_scale_dis"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_bodyhead_discriminator_matches_reference_torch():
    import jax
    import jax.numpy as jnp

    from ipercore_tpu.models.networks import build_discriminator
    from ipercore_tpu.utils.torch_convert import convert_discriminator

    ref = _load_ref()
    torch.manual_seed(5)
    cfg = _NS(cond_nc=6, bg_cond_nc=4, ndf=8, n_layers=3, max_nf_mult=8,
              norm_type="instance", use_sigmoid=False)
    oracle = ref.GlobalBodyHeadDiscriminator(cfg).eval()

    S = 64
    rng = np.random.RandomState(0)
    x_t = torch.from_numpy(rng.uniform(-1, 1, (2, 6, S, S)).astype(np.float32))
    with torch.no_grad():
        # drive just the global patch stack: the crop geometry differs by
        # design (we grid-sample normalized bboxes; the reference slices
        # pixel rects in python), so the comparable quantity is each patch
        # D's response to the same tensor
        g_t = oracle.global_model(x_t)
        b_t = oracle.body_model(x_t)
        h_t = oracle.head_model(x_t)

    dis = build_discriminator(
        "patch_global_body_head",
        {"ndf": 8, "n_layers": 3, "max_nf_mult": 8, "use_sigmoid": False})
    x_j = jnp.asarray(np.moveaxis(x_t.numpy(), 1, -1))
    bbox = jnp.asarray([[-0.5, -0.5, 0.5, 0.5]] * 2)
    params = jax.jit(lambda r: dis.init(r, x_j, None, bbox, bbox))(
        jax.random.PRNGKey(0))
    conv, report = convert_discriminator(oracle.state_dict(), params)
    assert report == [], report[:10]

    bound = dis.bind(conv)
    for name, t_out in (("global_model", g_t), ("body_model", b_t),
                        ("head_model", h_t)):
        j_out = getattr(bound, name)(x_j)
        np.testing.assert_allclose(
            t_out.numpy(), np.moveaxis(np.asarray(j_out), -1, 1),
            atol=3e-4, err_msg=name)


def test_multiscale_discriminator_converts_and_matches():
    import jax
    import jax.numpy as jnp

    from ipercore_tpu.models.networks import build_discriminator
    from ipercore_tpu.utils.torch_convert import convert_discriminator

    ref = _load_ref()
    torch.manual_seed(6)
    oracle = ref.MultiScaleDiscriminator(
        global_nc=None, input_nc=6, ndf=8, n_layers=2, max_nf_mult=8,
        norm_type="instance", use_sigmoid=False).eval()

    S = 64
    rng = np.random.RandomState(1)
    x_t = torch.from_numpy(rng.uniform(-1, 1, (1, 6, S, S)).astype(np.float32))
    with torch.no_grad():
        s0_t = oracle.scale_models[0](x_t)

    dis = build_discriminator(
        "multi_scale", {"ndf": 8, "n_layers": 2, "max_nf_mult": 8,
                        "use_sigmoid": False})
    x_j = jnp.asarray(np.moveaxis(x_t.numpy(), 1, -1))
    params = jax.jit(lambda r: dis.init(r, x_j))(jax.random.PRNGKey(0))
    conv, report = convert_discriminator(oracle.state_dict(), params)
    assert report == [], report[:10]
    s0_j = dis.bind(conv).scale_models[0](x_j)
    np.testing.assert_allclose(
        s0_t.numpy(), np.moveaxis(np.asarray(s0_j), -1, 1), atol=3e-4)
