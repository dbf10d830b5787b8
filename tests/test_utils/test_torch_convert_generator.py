"""Golden numeric parity: flax LWBGenerator vs the REFERENCE torch
AttLWB-SPADE generator (`attlwb_spade_resunet.py:404-700`), with weights
converted by `utils.torch_convert.convert_generator`.

This is the end-to-end drop-in-checkpoint guarantee for the flagship model:
a randomly initialized reference generator's state dict converts with zero
report entries and produces (near-)identical bg/src/tsf outputs.
"""
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
GEN_DIR = os.path.join(REF, "iPERCore/models/networks/generators")
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference absent")


class _NS:
    def __init__(self, **kw):
        self.__dict__.update(kw)


def _load_ref_generator_module():
    if "ref_genpkg.attlwb_spade_resunet" in sys.modules:
        return sys.modules["ref_genpkg.attlwb_spade_resunet"]
    pkg = types.ModuleType("ref_genpkg")
    pkg.__path__ = [GEN_DIR]
    sys.modules["ref_genpkg"] = pkg
    spec = importlib.util.spec_from_file_location(
        "ref_genpkg.attlwb_spade_resunet",
        os.path.join(GEN_DIR, "attlwb_spade_resunet.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_genpkg.attlwb_spade_resunet"] = mod
    spec.loader.exec_module(mod)
    return mod


S, NS_SRC, NT = 64, 2, 2

CFG = {
    "BGNet": {"num_filters": [8, 16, 16, 32], "n_res_block": 2, "cond_nc": 4},
    "SIDNet": {"num_filters": [8, 16, 32], "n_res_block": 2, "cond_nc": 6},
    "TSFNet": {"num_filters": [8, 16, 32], "n_res_block": 2, "cond_nc": 6},
}


def _ref_cfg():
    return _NS(
        name="AttLWB-SPADE",
        BGNet=_NS(norm_type="instance", cond_nc=4, n_res_block=2,
                  num_filters=[8, 16, 16, 32]),
        SIDNet=_NS(norm_type="None", cond_nc=6, n_res_block=2,
                   num_filters=[8, 16, 32]),
        TSFNet=_NS(norm_type="instance", cond_nc=6, n_res_block=2,
                   num_filters=[8, 16, 32]),
    )


def test_generator_matches_reference_torch():
    import jax
    import jax.numpy as jnp

    from ipercore_tpu.models.networks import build_generator
    from ipercore_tpu.utils.torch_convert import convert_generator

    ref = _load_ref_generator_module()
    torch.manual_seed(3)
    oracle = ref.AttentionLWBGenerator(_ref_cfg()).eval()

    rng = np.random.RandomState(0)
    bg_t = torch.from_numpy(rng.uniform(-1, 1, (1, NS_SRC, 4, S, S)).astype(np.float32))
    src_t = torch.from_numpy(rng.uniform(-1, 1, (1, NS_SRC, 6, S, S)).astype(np.float32))
    tsf_t = torch.from_numpy(rng.uniform(-1, 1, (1, NT, 6, S, S)).astype(np.float32))
    # smooth small flows keep all samples in-bounds (parity of border handling
    # is covered by the sampling op tests)
    Tst_np = rng.uniform(-0.3, 0.3, (1, NT, NS_SRC, S, S, 2)).astype(np.float32)
    base = np.stack(np.meshgrid(np.linspace(-0.6, 0.6, S),
                                np.linspace(-0.6, 0.6, S), indexing="xy"), -1)
    Tst_np = 0.2 * Tst_np + base[None, None, None].astype(np.float32)
    Tst_t = torch.from_numpy(Tst_np)

    with torch.no_grad():
        bg_o, src_o, srcm_o, tsf_o, tsfm_o = oracle(
            bg_t, src_t, tsf_t, Tst_t, None, only_tsf=False)

    gen = build_generator("AttLWB-SPADE", CFG)
    nhwc = lambda t, extra: jnp.asarray(
        np.moveaxis(t.numpy(), 2, -1) if extra else t.numpy())
    bg_j, src_j, tsf_j = nhwc(bg_t, True), nhwc(src_t, True), nhwc(tsf_t, True)
    Tst_j = jnp.asarray(Tst_np)
    params = jax.jit(lambda r: gen.init(r, bg_j, src_j, tsf_j, Tst_j, None, False))(
        jax.random.PRNGKey(0))
    conv, report = convert_generator(oracle.state_dict(), params)
    assert report == [], report[:10]

    outs = gen.apply(conv, bg_j, src_j, tsf_j, Tst_j, None, False)
    fake_bg, fake_src, fake_srcm, fake_tsf, fake_tsfm = outs

    def cmp(t, j, name, atol=3e-4):
        tn = t.numpy()
        jn = np.moveaxis(np.asarray(j), -1, 2)
        np.testing.assert_allclose(tn, jn, atol=atol, err_msg=name)

    cmp(bg_o, fake_bg, "bg")
    cmp(src_o, fake_src, "src_color")
    cmp(srcm_o, fake_srcm, "src_mask")
    # the tsf stream stacks bilinear warps + attention + SPADE on top of the
    # encoders; f32 accumulation-order drift reaches a few 1e-4 there
    cmp(tsf_o, fake_tsf, "tsf_color", atol=2e-3)
    cmp(tsfm_o, fake_tsfm, "tsf_mask", atol=2e-3)
