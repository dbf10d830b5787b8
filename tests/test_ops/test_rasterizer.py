import numpy as np
import jax.numpy as jnp

from ipercore_tpu.ops import rasterizer as rz


def _tri(v0, v1, v2, z=1.0):
    """One face at constant depth, given 2D NDC vertices."""
    f = np.array([[list(v0) + [z], list(v1) + [z], list(v2) + [z]]], np.float32)
    return jnp.asarray(f)


def test_fullscreen_triangle_covers_expected_half():
    # Triangle covering the lower-left half of NDC space.
    fv = _tri((-1, -1), (-1, 3), (3, -1))
    out = rz.rasterize(fv, size=16)
    fim = np.asarray(out.fim)
    assert (fim == 0).all(), "one huge triangle should cover every pixel"
    wim = np.asarray(out.wim)
    np.testing.assert_allclose(wim.sum(-1), 1.0, atol=1e-4)


def test_background_is_minus_one():
    fv = _tri((-0.2, -0.2), (0.2, -0.2), (0.0, 0.2))
    out = rz.rasterize(fv, size=32)
    fim = np.asarray(out.fim)
    assert fim[0, 0] == -1 and fim[-1, -1] == -1
    assert (fim == 0).sum() > 0


def test_zbuffer_prefers_near_face():
    near = _tri((-1, -1), (-1, 3), (3, -1), z=1.0)
    far = _tri((-1, -1), (-1, 3), (3, -1), z=2.0)
    fv = jnp.concatenate([far, near], axis=0)  # far face is id 0, near is id 1
    out = rz.rasterize(fv, size=8)
    assert (np.asarray(out.fim) == 1).all()


def test_barycentric_weights_interpolate_position():
    fv = _tri((-1, -1), (1, -1), (0, 1))
    out = rz.rasterize(fv, size=64)
    fim, wim = np.asarray(out.fim), np.asarray(out.wim)
    verts = np.asarray(fv)[0, :, 0:2]  # (3, 2)
    coords = (2 * np.arange(64) + 1 - 64) / 64
    ys, xs = np.meshgrid(coords, coords, indexing="ij")
    inside = fim == 0
    recon = wim @ verts  # (S, S, 2)
    np.testing.assert_allclose(recon[inside, 0], xs[inside], atol=1e-4)
    np.testing.assert_allclose(recon[inside, 1], ys[inside], atol=1e-4)


def test_project_verts_convention():
    # A vertex at world (0, 1, 0) with cam scale 1: +y is up => top of image (y_ndc < 0)
    verts = jnp.asarray([[[0.0, 1.0, 0.0], [0.0, -1.0, 0.0]]])
    cam = jnp.asarray([[1.0, 0.0, 0.0]])
    proj = np.asarray(rz.project_verts(verts, cam))
    assert proj[0, 0, 1] == -1.0  # up -> y_ndc = -1 (top)
    assert proj[0, 1, 1] == 1.0
    np.testing.assert_allclose(proj[0, 0, 2], rz.EYE_DISTANCE, atol=1e-5)


def test_cal_bc_transform_identity_flow():
    """If source and destination poses are the same, the flow is (approx) the
    identity map on covered pixels."""
    fv = _tri((-0.8, -0.8), (0.8, -0.8), (0.0, 0.8))
    out = rz.rasterize(fv, size=32)
    f2pts = fv[None, 0:1, :, 0:2].reshape(1, 1, 3, 2)
    T = np.asarray(rz.cal_bc_transform(f2pts, out.fim[None], out.wim[None]))[0]
    fim = np.asarray(out.fim)
    coords = (2 * np.arange(32) + 1 - 32) / 32
    ys, xs = np.meshgrid(coords, coords, indexing="ij")
    inside = fim == 0
    np.testing.assert_allclose(T[inside, 0], xs[inside], atol=1e-4)
    np.testing.assert_allclose(T[inside, 1], ys[inside], atol=1e-4)
    assert (T[~inside] == rz.FLOW_SENTINEL).all()


def test_visible_face_mask_and_knn_expansion():
    fv = jnp.concatenate(
        [
            _tri((-0.5, -0.5), (0.5, -0.5), (0.0, 0.5)),  # visible
            _tri((-0.5, -0.5), (0.5, -0.5), (0.0, 0.5), z=5.0),  # occluded
            _tri((-5.0, -5.0), (-4.0, -5.0), (-4.5, -4.0)),  # off-screen
        ],
        axis=0,
    )
    out = rz.rasterize(fv, size=32)
    mask = np.asarray(rz.visible_face_mask(out.fim[None], 3))[0]
    assert mask.tolist() == [True, False, False]

    fkn = jnp.asarray([[0, 1], [1, 0], [2, 2]], jnp.int32)
    grown = np.asarray(rz.expand_mask_by_knn(jnp.asarray(mask)[None], fkn))[0]
    assert grown.tolist() == [True, True, False]


def test_select_f2pts_sentinel():
    f2pts = jnp.ones((1, 3, 3, 2))
    mask = jnp.asarray([[True, False, True]])
    out = np.asarray(rz.select_f2pts(f2pts, mask))
    assert (out[0, 0] == 1).all() and (out[0, 2] == 1).all()
    assert (out[0, 1] == rz.FLOW_SENTINEL).all()


def test_encode_fim_colors():
    map_fn = jnp.asarray([[1.0, 0, 0], [0, 1, 0], [0, 0, 0]])  # 2 faces + bg
    fim = jnp.asarray([[[0, 1], [-1, 1]]])
    enc = np.asarray(rz.encode_fim(fim, map_fn))
    np.testing.assert_array_equal(enc[0, 0, 0], [1, 0, 0])
    np.testing.assert_array_equal(enc[0, 0, 1], [0, 1, 0])
    np.testing.assert_array_equal(enc[0, 1, 0], [0, 0, 0])


def test_render_fim_wim_on_synthetic_body():
    from ipercore_tpu.models import smpl

    m = smpl.synthetic_model()
    theta = jnp.zeros((1, 85)).at[:, 0].set(1.2)
    d = smpl.get_details(m, theta)
    f2pts, fim, wim = rz.render_fim_wim(d["verts"], d["cam"], m.faces, size=64, chunk=2048)
    assert f2pts.shape == (1, 13776, 3, 2)
    assert fim.shape == (1, 64, 64)
    assert wim.shape == (1, 64, 64, 3)
    fim_np = np.asarray(fim)
    cover = (fim_np >= 0).mean()
    assert 0.1 < cover < 0.9, f"body should cover part of the frame, got {cover}"
    # weights of covered pixels sum to 1
    w = np.asarray(wim)[fim_np >= 0]
    np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-3)
