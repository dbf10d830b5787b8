"""Shape/dtype contract tests for the network zoo — the JAX translation of the
reference's inline-config random-tensor tests
(`tests/test_models/test_networks/test_generators.py:52-104`)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ipercore_tpu.models.networks import build_generator, build_discriminator
from ipercore_tpu.models.networks.generators import ResNetInpaintor

CFG = {
    "BGNet": {"num_filters": [8, 16, 16, 32], "n_res_block": 1},
    "SIDNet": {"num_filters": [8, 16, 32], "n_res_block": 1},
    "TSFNet": {"num_filters": [8, 16, 32], "n_res_block": 1},
}
DIS_CFG = {"ndf": 8, "n_layers": 3, "max_nf_mult": 8, "use_sigmoid": False,
           "cond_nc": 6, "bg_cond_nc": 4}

BS, NS, NT, S = 1, 2, 2, 32


def _gen_inputs(rng):
    bg = jnp.asarray(rng.randn(BS, 1, S, S, 4), jnp.float32)
    src = jnp.asarray(rng.randn(BS, NS, S, S, 6), jnp.float32)
    tsf = jnp.asarray(rng.randn(BS, NT, S, S, 6), jnp.float32)
    Tst = jnp.asarray(rng.uniform(-1, 1, (BS, NT, NS, S, S, 2)), jnp.float32)
    Ttt = jnp.asarray(rng.uniform(-1, 1, (BS, NT - 1, S, S, 2)), jnp.float32)
    return bg, src, tsf, Tst, Ttt


@pytest.mark.parametrize("name", [
    "AttLWB-SPADE", "AttLWB-AdaIN", "AddLWB", "AvgLWB",
    "SoftGateAddLWB", "SoftGateAvgLWB", "InputConcat", "TextureWarping",
])
def test_generator_forward_shapes(name):
    rng = np.random.RandomState(0)
    bg, src, tsf, Tst, Ttt = _gen_inputs(rng)
    gen = build_generator(name, CFG)
    params = jax.jit(lambda r: gen.init(r, bg, src, tsf, Tst))(jax.random.PRNGKey(0))
    out = jax.jit(gen.apply)(params, bg, src, tsf, Tst)
    bg_img, tsf_imgs, tsf_masks = out
    assert bg_img.shape == (BS, 1, S, S, 3)
    assert tsf_imgs.shape == (BS, NT, S, S, 3)
    assert tsf_masks.shape == (BS, NT, S, S, 1)
    assert np.abs(np.asarray(tsf_imgs)).max() <= 1.0
    assert np.asarray(tsf_masks).min() >= 0.0 and np.asarray(tsf_masks).max() <= 1.0


def test_front_generator_no_bg():
    rng = np.random.RandomState(1)
    _, src, tsf, Tst, _ = _gen_inputs(rng)
    gen = build_generator("AttLWB-Front", CFG)
    params = jax.jit(lambda r: gen.init(r, None, src, tsf, Tst))(jax.random.PRNGKey(0))
    bg_img, tsf_imgs, tsf_masks = gen.apply(params, None, src, tsf, Tst)
    assert bg_img is None
    assert tsf_imgs.shape == (BS, NT, S, S, 3)


def test_temporal_generator_uses_ttt():
    rng = np.random.RandomState(2)
    bg, src, tsf, Tst, Ttt = _gen_inputs(rng)
    gen = build_generator("AttLWB-SPADE", CFG, temporal=True)
    params = jax.jit(lambda r: gen.init(r, bg, src, tsf, Tst, Ttt))(jax.random.PRNGKey(0))
    _, tsf_imgs, _ = gen.apply(params, bg, src, tsf, Tst, Ttt)
    assert tsf_imgs.shape == (BS, NT, S, S, 3)


def test_generator_full_outputs():
    rng = np.random.RandomState(3)
    bg, src, tsf, Tst, _ = _gen_inputs(rng)
    gen = build_generator("AttLWB-SPADE", CFG)
    # init must trace the full path so SIDNet decoder params exist (trainers
    # always init with only_tsf=False for this reason)
    params = jax.jit(lambda r: gen.init(r, bg, src, tsf, Tst, None, False))(jax.random.PRNGKey(0))
    out = gen.apply(params, bg, src, tsf, Tst, None, False)
    bg_img, src_imgs, src_masks, tsf_imgs, tsf_masks = out
    assert src_imgs.shape == (BS, NS, S, S, 3)
    assert src_masks.shape == (BS, NS, S, S, 1)


def test_bgnet_standalone():
    net = ResNetInpaintor(num_filters=(16, 32, 32, 64), n_res_block=2)
    x = jnp.zeros((2, S, S, 4))
    params = jax.jit(net.init)(jax.random.PRNGKey(0), x)
    out = net.apply(params, x)
    assert out.shape == (2, S, S, 3)


@pytest.mark.parametrize("name,n_heads", [
    ("patch_global", 1),
    ("patch_global_local", 2),
    ("patch_global_body_head", 3),
    ("multi_scale", 2),
])
def test_discriminator_heads(name, n_heads):
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(BS, S, S, 6), jnp.float32)
    body = jnp.asarray([[-0.5, -0.5, 0.5, 0.5]] * BS, jnp.float32)
    head = jnp.asarray([[-0.2, -0.8, 0.2, -0.4]] * BS, jnp.float32)
    dis = build_discriminator(name, DIS_CFG)
    params = jax.jit(lambda r: dis.init(r, x, None, body, head))(jax.random.PRNGKey(0))
    outs = dis.apply(params, x, None, body, head)
    assert len(outs) == n_heads
    for o in outs:
        assert o.shape[0] == BS and o.shape[-1] == 1


def test_discriminator_aug_bg_head():
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(BS, S, S, 6), jnp.float32)
    bg = jnp.asarray(rng.randn(BS, S, S, 6), jnp.float32)
    dis = build_discriminator("patch_global", DIS_CFG, use_aug_bg=True)
    params = jax.jit(lambda r: dis.init(r, x, bg))(jax.random.PRNGKey(0))
    outs = dis.apply(params, x, bg)
    assert len(outs) == 2


def test_criterions():
    from ipercore_tpu.models.networks import criterions as C

    rng = np.random.RandomState(6)
    a = jnp.asarray(rng.randn(2, 32, 32, 3), jnp.float32)
    b = jnp.asarray(rng.randn(2, 32, 32, 3), jnp.float32)

    vgg = C.VGGFeatures(slices=((8, 8), (16,), (16,), (32,), (32,)))
    vp = jax.jit(vgg.init)(jax.random.PRNGKey(0), a)
    loss = C.perceptual_loss(vp, vgg.apply, a, b)
    assert np.isfinite(float(loss)) and float(loss) > 0
    assert float(C.perceptual_loss(vp, vgg.apply, a, a)) < 1e-6

    face = C.SphereFaceFeatures()
    fp = jax.jit(face.init)(jax.random.PRNGKey(0), jnp.zeros((2, 112, 96, 3)))
    fl = C.face_loss(fp, face.apply, a, b)
    assert np.isfinite(float(fl))

    outs = [jnp.zeros((2, 4, 4, 1))]
    assert float(C.lsgan_loss(outs, 1.0)) == 1.0
    assert float(C.tv_loss(jnp.ones((1, 8, 8, 1)))) == 0.0
    m = jnp.full((1, 4, 4, 1), 0.5)
    assert float(C.mask_bce_loss(m, jnp.ones_like(m))) > 0


def test_feat_warp_stride_generator():
    """`feat_warp_stride=2` shares the stride-1 parameter tree, keeps output
    shapes, and actually takes the strided path at levels with h/2 >= 32."""
    S2 = 128  # level-1 features are 64x64 -> strided floor (32) is reached
    rng = np.random.RandomState(3)
    bg = jnp.asarray(rng.randn(BS, 1, S2, S2, 4), jnp.float32)
    src = jnp.asarray(rng.randn(BS, NS, S2, S2, 6), jnp.float32)
    tsf = jnp.asarray(rng.randn(BS, 1, S2, S2, 6), jnp.float32)
    base = np.stack(np.meshgrid(np.linspace(-0.9, 0.9, S2),
                                np.linspace(-0.9, 0.9, S2), indexing="xy"), -1)
    Tst = jnp.asarray(np.broadcast_to(
        base[None, None, None], (BS, 1, NS, S2, S2, 2)).astype(np.float32))

    gen1 = build_generator("AttLWB-SPADE", CFG)
    gen2 = build_generator("AttLWB-SPADE", CFG, feat_warp_stride=2)
    params = jax.jit(lambda r: gen1.init(r, bg, src, tsf, Tst))(jax.random.PRNGKey(0))

    out1 = jax.jit(gen1.apply)(params, bg, src, tsf, Tst)
    out2 = jax.jit(gen2.apply)(params, bg, src, tsf, Tst)  # same params drop in
    for a, b in zip(out1, out2):
        assert a.shape == b.shape
        assert np.isfinite(np.asarray(b)).all()
    # the knob must change the compute (strided path taken)...
    assert not np.allclose(np.asarray(out1[1]), np.asarray(out2[1]))
    # ...but stay close on smooth flows (feature-level approximation only)
    assert float(jnp.mean(jnp.abs(out1[1] - out2[1]))) < 0.25


def test_strided_warp_exact_on_linear_features():
    """Half-res warp + bilinear upsample reproduces an affine feature map
    exactly in the interior under an identity grid (bilinear reproduces
    affine functions) — the core soundness property of feat_warp_stride."""
    from ipercore_tpu.ops.sampling import grid_sample, resize_flow, resize_image

    H = W = 64
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    img = jnp.asarray((0.03 * xx + 0.01 * yy)[None, ..., None], jnp.float32)
    ys = (2 * np.arange(H) + 1 - H) / H
    gx, gy = np.meshgrid(ys, ys, indexing="xy")
    grid = jnp.asarray(np.stack([gx, gy], -1)[None], jnp.float32)

    small = grid_sample(img, resize_flow(grid, H // 2, W // 2))
    up = np.asarray(resize_image(small, H, W))[0, 8:-8, 8:-8, 0]
    ref = np.asarray(img)[0, 8:-8, 8:-8, 0]
    np.testing.assert_allclose(up, ref, atol=1e-4)
