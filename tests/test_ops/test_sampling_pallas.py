"""Pallas bilinear sampler: parity vs the XLA grid_sample (interpret mode on
CPU; the real kernel runs the same program on TPU)."""
import numpy as np
import jax
import jax.numpy as jnp

from ipercore_tpu.ops.sampling import grid_sample
from ipercore_tpu.ops.sampling_pallas import grid_sample_pallas


def test_matches_grid_sample_interpret():
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)), jnp.float32)
    # include out-of-range coords and the -2 "no source" sentinel
    grids = jnp.asarray(rng.uniform(-1.2, 1.2, (2, 32, 48, 2)), jnp.float32)
    grids = grids.at[0, 0, :4].set(-2.0)

    ref = grid_sample(imgs, grids)
    out = grid_sample_pallas(imgs, grids, interpret=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=5e-3)
    # sentinel coords sample to exactly zero (zero-padding semantics)
    np.testing.assert_array_equal(np.asarray(out[0, 0, :4]), 0.0)


def test_non_tile_multiple_output():
    rng = np.random.RandomState(1)
    imgs = jnp.asarray(rng.uniform(-1, 1, (1, 40, 56, 3)), jnp.float32)
    grids = jnp.asarray(rng.uniform(-1, 1, (1, 17, 23, 2)), jnp.float32)
    ref = grid_sample(imgs, grids)
    out = grid_sample_pallas(imgs, grids, interpret=True)
    assert out.shape == ref.shape == (1, 17, 23, 3)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=5e-3)
