"""Golden numeric parity: `tools.inpaintors.RRDBNet` vs an independent eager
torch RRDBNet with the published ESRGAN layer names, weights dropped in by
`utils.torch_convert.convert_esrgan`.

The reference's SR stage loads `esrgan_psnr_x4c64b23g32_1x16_1000k_div2k`
(`mmedit_inpaintors.py:57-59`); the torch net here reproduces that exact
architecture and state-dict layout so the converter is validated against the
real checkpoints' key names and tensor layouts.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as tF

W, G, NB = 8, 4, 2


class _RDB(tnn.Module):
    def __init__(self):
        super().__init__()
        for i in range(4):
            self.add_module(f"conv{i + 1}", tnn.Conv2d(W + i * G, G, 3, 1, 1))
        self.conv5 = tnn.Conv2d(W + 4 * G, W, 3, 1, 1)

    def forward(self, x):
        feats = [x]
        for i in range(4):
            y = getattr(self, f"conv{i + 1}")(torch.cat(feats, dim=1))
            feats.append(tF.leaky_relu(y, 0.2))
        return x + 0.2 * self.conv5(torch.cat(feats, dim=1))


class _RRDB(tnn.Module):
    def __init__(self):
        super().__init__()
        self.rdb1, self.rdb2, self.rdb3 = _RDB(), _RDB(), _RDB()

    def forward(self, x):
        return x + 0.2 * self.rdb3(self.rdb2(self.rdb1(x)))


class _RRDBNet(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv_first = tnn.Conv2d(3, W, 3, 1, 1)
        self.body = tnn.Sequential(*[_RRDB() for _ in range(NB)])
        self.conv_body = tnn.Conv2d(W, W, 3, 1, 1)
        self.conv_up1 = tnn.Conv2d(W, W, 3, 1, 1)
        self.conv_up2 = tnn.Conv2d(W, W, 3, 1, 1)
        self.conv_hr = tnn.Conv2d(W, W, 3, 1, 1)
        self.conv_last = tnn.Conv2d(W, 3, 3, 1, 1)

    def forward(self, x):
        feat = self.conv_first(x)
        y = feat + self.conv_body(self.body(feat))
        for conv in (self.conv_up1, self.conv_up2):
            y = tF.leaky_relu(
                conv(tF.interpolate(y, scale_factor=2, mode="nearest")), 0.2)
        y = tF.leaky_relu(self.conv_hr(y), 0.2)
        return self.conv_last(y)


def _jax_net_and_params(oracle_sd):
    import jax
    import jax.numpy as jnp

    from ipercore_tpu.tools.inpaintors import RRDBNet
    from ipercore_tpu.utils.torch_convert import convert_esrgan

    net = RRDBNet(width=W, growth=G, n_blocks=NB)
    params = jax.jit(net.init)(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    conv, report = convert_esrgan(oracle_sd, params)
    return net, conv, report


def test_esrgan_converter_golden_parity():
    import numpy as np

    torch.manual_seed(0)
    oracle = _RRDBNet().eval()
    net, conv, report = _jax_net_and_params(oracle.state_dict())
    assert report == [], report[:10]

    rng = np.random.RandomState(1)
    x = rng.uniform(0, 1, (1, 3, 8, 8)).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(x)).numpy()
    got = np.asarray(net.apply(conv, np.moveaxis(x, 1, -1)))
    np.testing.assert_allclose(ref, np.moveaxis(got, -1, 1), atol=2e-5)


def test_esrgan_converter_accepts_original_repo_names():
    torch.manual_seed(0)
    oracle = _RRDBNet().eval()
    sd = {}
    for k, v in oracle.state_dict().items():
        k = (k.replace("conv_body", "trunk_conv")
             .replace("body.", "RRDB_trunk.")
             .replace("conv_up1", "upconv1").replace("conv_up2", "upconv2")
             .replace("conv_hr", "HRconv"))
        # original repo: RDB{j} capitalized, each conv wrapped in a Sequential
        k = k.replace(".rdb", ".RDB")
        for c in range(1, 6):
            k = k.replace(f".conv{c}.weight", f".conv{c}.0.weight")
            k = k.replace(f".conv{c}.bias", f".conv{c}.0.bias")
        # mmedit restorer checkpoints wrap the net under `generator.`
        sd["generator." + k] = v
    sd["generator_ema.conv_first.weight"] = next(iter(oracle.state_dict().values()))
    _, _, report = _jax_net_and_params(sd)
    assert report == [], report[:10]
