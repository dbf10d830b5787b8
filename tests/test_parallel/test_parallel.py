"""Multi-device frame sharding + streaming pipeline (virtual 8-device mesh)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ipercore_tpu.models import smpl as smpl_mod
from ipercore_tpu.models import flow_composition as fc
from ipercore_tpu.models import imitator as imit
from ipercore_tpu.models.mesh import load_assets
from ipercore_tpu.models.networks import build_generator
from ipercore_tpu.parallel.mesh import make_mesh, pad_to_multiple
from ipercore_tpu.parallel.inference import sharded_synthesize

S, NS = 64, 2
CFG = {
    "BGNet": {"num_filters": [8, 16, 16, 32], "n_res_block": 1},
    "SIDNet": {"num_filters": [8, 16, 32], "n_res_block": 1},
    "TSFNet": {"num_filters": [8, 16, 32], "n_res_block": 1},
}


@pytest.fixture(scope="module")
def rig():
    model = smpl_mod.synthetic_model(nu=20, nv=18)
    assets = load_assets(model, uv_map_path="/nonexistent", part_path="/nonexistent")
    comp = fc.make_composer(model, assets, image_size=S, out_dilate_ks=5)
    gen = build_generator("AttLWB-SPADE", CFG)
    bg = jnp.zeros((1, 1, S, S, 4))
    src = jnp.zeros((1, NS, S, S, 6))
    tsf = jnp.zeros((1, 1, S, S, 6))
    Tst = jnp.zeros((1, 1, NS, S, S, 2))
    params = jax.jit(lambda r: gen.init(r, bg, src, tsf, Tst))(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    src_img = jnp.asarray(rng.uniform(-1, 1, (1, NS, S, S, 3)), jnp.float32)
    theta = np.zeros((NS, 85), np.float32)
    theta[:, 0] = 1.2
    cache = jax.jit(lambda p, si, ss: imit.setup_source(comp, gen, p, si, ss))(
        params, src_img, jnp.asarray(theta)[None])
    return comp, gen, params, cache


def _theta(n, seed=0):
    rng = np.random.RandomState(seed)
    t = np.zeros((n, 85), np.float32)
    t[:, 0] = 1.2
    t[:, 3:75] = rng.randn(n, 72) * 0.05
    return jnp.asarray(t)


def test_pad_to_multiple():
    x = jnp.ones((5, 3))
    p, n = pad_to_multiple(x, 8)
    assert p.shape == (8, 3) and n == 5


def test_sharded_synthesize_matches_single_device(rig):
    comp, gen, params, cache = rig
    mesh = make_mesh("frames", min(8, jax.device_count()))
    tgt = _theta(5, seed=1)  # deliberately not a device multiple
    preds_sharded, masks_sharded = sharded_synthesize(
        comp, gen, params, cache, tgt, mesh)
    preds_single, masks_single = imit.synthesize_frames(comp, gen, params, cache, tgt)
    assert preds_sharded.shape == (5, S, S, 3)
    np.testing.assert_allclose(
        np.asarray(preds_sharded), np.asarray(preds_single), atol=2e-2)


def test_streaming_synthesizer(rig, tmp_path):
    from ipercore_tpu.parallel.streaming import StreamingSynthesizer

    comp, gen, params, cache = rig
    synth = StreamingSynthesizer(comp, gen, params, cache, chunk=4)
    tgt = np.asarray(_theta(6, seed=2))
    paths = synth.run(tgt, str(tmp_path))
    assert len(paths) == 6
    import os

    assert all(os.path.exists(p) for p in paths)
    # in-memory mode
    frames = synth.run(tgt, None)
    assert frames[0].shape == (S, S, 3)
