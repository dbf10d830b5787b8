"""Trained-weights auto-load paths for the optional perception stages.

The production preference order mirrors the reference's download-and-load
behaviour (`point_render_parser.py:150-204` runs GCA as the default mattor;
`mmedit_inpaintors.py:35-69` runs two-stage deepfillv2): when
`assets/matting_gca.npz` / `assets/inpaintor_refine.npz` exist they are
preferred over the plain refiner / stage-1-only path. These tests exercise
exactly that dispatch with fabricated tiny checkpoints in tmp — hermetic
from whatever is shipped in `assets/` (the round-3 mobilenet lesson).
"""
import numpy as np
import jax
import jax.numpy as jnp


def _save_f16(path, tree):
    from ipercore_tpu.utils.checkpoint import save_params

    f16 = jax.tree_util.tree_map(
        lambda x: np.asarray(x, np.float16)
        if np.asarray(x).dtype == np.float32 else np.asarray(x), tree)
    save_params(str(path), f16)


def test_gca_mattor_autoload(tmp_path):
    from ipercore_tpu.tools.mattors import (GCAMattingRefiner, HumanMattor,
                                            MattingRefiner, PersonSegUNet)

    s = 64
    seg = PersonSegUNet()
    mat = GCAMattingRefiner()
    tree = {
        "seg": jax.jit(seg.init)(jax.random.PRNGKey(0), jnp.zeros((1, s, s, 3))),
        "mat": jax.jit(mat.init)(jax.random.PRNGKey(1), jnp.zeros((1, s, s, 4))),
    }
    gca_npz = tmp_path / "matting_gca.npz"
    _save_f16(gca_npz, tree)

    # without the GCA file: plain refiner, untrained (both paths pointed at
    # tmp so the shipped assets never leak in)
    plain = HumanMattor(image_size=s,
                        weights_path=str(tmp_path / "absent.npz"),
                        gca_weights_path=str(tmp_path / "absent_gca.npz"))
    assert isinstance(plain.mat, MattingRefiner)
    assert not plain.trained

    # with it: GCA refiner selected, params loaded (seg comes along too)
    m = HumanMattor(image_size=s,
                    weights_path=str(tmp_path / "absent.npz"),
                    gca_weights_path=str(gca_npz))
    assert isinstance(m.mat, GCAMattingRefiner)
    assert m.trained
    img = np.zeros((1, s, s, 3), np.float32)
    alpha, mask = m.run(img)
    assert alpha.shape == (1, s, s, 1) and mask.shape == (1, s, s, 1)
    assert np.isfinite(np.asarray(alpha)).all()


def test_refine_inpaintor_autoload(tmp_path):
    from ipercore_tpu.tools.inpaintors import (GatedInpaintor, RefineInpaintor,
                                               RRDBNet,
                                               SuperResolutionInpaintor)

    s = 64
    refine = RefineInpaintor()
    tree = jax.jit(refine.init)(jax.random.PRNGKey(2),
                                jnp.zeros((1, s, s, 4)), jnp.zeros((1, s, s, 1)))
    ref_npz = tmp_path / "inpaintor_refine.npz"
    _save_f16(ref_npz, tree)
    sr_params = jax.jit(RRDBNet(n_blocks=2).init)(
        jax.random.PRNGKey(1), jnp.zeros((1, s, s, 3)))
    inpaint_params = jax.jit(GatedInpaintor().init)(
        jax.random.PRNGKey(0), jnp.zeros((1, s, s, 4)))

    # stage-1 params given explicitly (trained=True) so the gated path —
    # the only one that can chain into stage 2 — runs in both variants
    base = dict(control_size=s, sr_blocks=2, sr_params=sr_params,
                inpaint_params=inpaint_params,
                weights_path=str(tmp_path / "absent.npz"))
    off = SuperResolutionInpaintor(
        refine_weights_path=str(tmp_path / "absent_refine.npz"), **base)
    assert not off.refine_trained

    on = SuperResolutionInpaintor(refine_weights_path=str(ref_npz), **base)
    assert on.refine_trained
    img = np.zeros((s, s, 3), np.float32)
    mask = np.zeros((s, s, 1), np.float32)
    mask[16:48, 16:48] = 1.0
    out_on = on.run_inpainting(img, mask)
    out_off = off.run_inpainting(img, mask)
    assert out_on.shape == (s, s, 3)
    assert np.isfinite(out_on).all()
    # stage 2 actually runs: the refined hole differs from stage-1-only
    assert not np.allclose(out_on, out_off)
