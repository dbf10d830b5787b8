"""Compiled-memory regression guards for the round-3 OOM incidents.

Two real-media runs OOMed a 16 GB chip before the frame-chunking fixes:

  * preprocessing's full-clip silhouette raster (438 frames @512² -> 58 GB
    of (N*S*S, aux) buffers) — fixed by 16-frame chunks rastered at <=256²
    (`tools/preprocessor.py::Preprocessor._smpl_silhouette`);
  * the deform stage's grad-of-scan (covered by
    `test_deformer_fit.py::test_deformer_memory_bound`).

This test compiles the EXACT per-chunk program _smpl_silhouette now issues
(16 frames, 256² raster, SMPL's 13776 faces) and bounds its compiled temp
allocation, so a future shape/chunking regression fails in CI instead of
crashing on a real clip. (CPU-backend XLA: buffer sizes are dominated by the
logical (N, S, S, …) tensors that caused the TPU OOM.)
"""
import jax
import jax.numpy as jnp

from ipercore_tpu.models import smpl as smpl_mod
from ipercore_tpu.ops import rasterizer as rz


def test_silhouette_chunk_memory_bound():
    import pytest

    model = smpl_mod.synthetic_model()  # SMPL cardinalities: 13776 faces
    chunk, rS = 16, 256  # _smpl_silhouette's production chunking

    def sil_chunk(theta):
        d = smpl_mod.get_details(model, theta)
        _, fim, _ = rz.render_fim_wim(d["verts"], d["cam"], model.faces, rS)
        return (fim >= 0).astype(jnp.float32)[..., None]

    theta = jnp.zeros((chunk, 85), jnp.float32).at[:, 0].set(1.2)
    compiled = jax.jit(sil_chunk).lower(theta).compile()
    try:
        temp = compiled.memory_analysis().temp_size_in_bytes
    except Exception:
        pytest.skip("backend exposes no memory analysis")
    # the unchunked clip was a 58 GB allocation; one chunk must stay far
    # under HBM (16 GB) with generous headroom for other live buffers
    assert temp < 4 * 1024 ** 3, f"temp allocation {temp / 2**30:.2f} GiB"


def test_gca_refiner_chunk_memory_bound():
    """Round-5 OOM incident: the first production run with trained GCA
    matting weights (`assets/matting_gca.npz` -> `GCAMattingRefiner`
    preferred) compiled the refiner for the mattor's full 16-frame chunk at
    512² and needed 17.56G of a 15.75G chip — the contextual-attention
    affinity is quadratic in patch count. `HumanMattor.run` now bounds
    frames×area per refiner apply (mat_bs = 16·(256/s)²); this compiles the
    production 512² sub-batch (mat_bs = 8·(256/s)² = 2) and bounds its
    temp allocation."""
    import pytest

    from ipercore_tpu.tools.mattors import GCAMattingRefiner

    net = GCAMattingRefiner()
    s, mat_bs = 512, 2  # run()'s sub-batch at image_size=512
    x = jnp.zeros((mat_bs, s, s, 4), jnp.float32)
    params = jax.jit(net.init)(jax.random.PRNGKey(0), x[:1])
    compiled = jax.jit(net.apply).lower(params, x).compile()
    try:
        temp = compiled.memory_analysis().temp_size_in_bytes
    except Exception:
        pytest.skip("backend exposes no memory analysis")
    # 16 frames needed 17.56G; 4 must stay well under HBM with headroom
    # for params + the seg UNet's buffers living alongside
    assert temp < 6 * 1024 ** 3, f"temp allocation {temp / 2**30:.2f} GiB"
