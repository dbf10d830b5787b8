import numpy as np
import jax.numpy as jnp

from ipercore_tpu.ops.sampling import grid_sample, resize_flow


def _identity_grid(h, w):
    ys = (2 * np.arange(h) + 1 - h) / h
    xs = (2 * np.arange(w) + 1 - w) / w
    gy, gx = np.meshgrid(ys, xs, indexing="ij")
    return np.stack([gx, gy], axis=-1).astype(np.float32)


def test_identity_grid_reproduces_image():
    rng = np.random.RandomState(0)
    img = rng.rand(2, 16, 16, 3).astype(np.float32)
    grid = np.broadcast_to(_identity_grid(16, 16), (2, 16, 16, 2))
    out = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid)))
    np.testing.assert_allclose(out, img, atol=1e-5)


def test_out_of_range_samples_zero():
    img = np.ones((1, 8, 8, 1), np.float32)
    grid = np.full((1, 4, 4, 2), -2.0, np.float32)  # the flow sentinel
    out = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid)))
    np.testing.assert_allclose(out, 0.0, atol=1e-6)


def test_halfpixel_shift_interpolates():
    # ramp image: value = column index; shifting grid by one pixel shifts values
    img = np.tile(np.arange(8, dtype=np.float32)[None, None, :, None], (1, 8, 1, 1))
    grid = _identity_grid(8, 8)[None].copy()
    grid[..., 0] += 2.0 / 8  # one pixel to the right
    out = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid)))
    np.testing.assert_allclose(out[0, :, :-1, 0], img[0, :, 1:, 0], atol=1e-5)


def test_resize_flow_shape_and_values():
    flow = np.zeros((2, 16, 16, 2), np.float32) + 0.25
    out = np.asarray(resize_flow(jnp.asarray(flow), 8, 8))
    assert out.shape == (2, 8, 8, 2)
    np.testing.assert_allclose(out, 0.25, atol=1e-5)


def test_wide_and_narrow_channel_paths_agree():
    """grid_sample has two formulations (C<=64 single stacked gather vs 4-tap
    gathers); both must produce identical values, including at the borders
    and out of range."""
    import numpy as np

    rng = np.random.RandomState(0)
    H = W = 9
    grid = jnp.asarray(rng.uniform(-1.4, 1.4, (1, 12, 13, 2)).astype(np.float32))
    img96 = jnp.asarray(rng.rand(1, H, W, 96).astype(np.float32))
    out_wide = grid_sample(img96, grid)  # 4-tap path
    # same content through the stacked path, 32 channels at a time
    parts = [grid_sample(img96[..., i:i + 32], grid) for i in (0, 32, 64)]
    out_stacked = jnp.concatenate(parts, axis=-1)
    np.testing.assert_allclose(np.asarray(out_wide), np.asarray(out_stacked),
                               atol=1e-6)
