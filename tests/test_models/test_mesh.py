import numpy as np
import jax.numpy as jnp

from ipercore_tpu.models import mesh, smpl


def test_synthetic_uv_atlas_no_overlap():
    uv_verts, obj_faces = mesh.synthetic_uv_atlas(100)
    assert uv_verts.shape == (300, 2)
    assert obj_faces.shape == (100, 3)
    assert uv_verts.min() >= 0 and uv_verts.max() <= 1
    # triangles live in disjoint cells: bounding boxes must not intersect
    tris = uv_verts[obj_faces]  # (100, 3, 2)
    mins, maxs = tris.min(1), tris.max(1)
    for i in range(0, 100, 17):
        for j in range(i + 1, 100, 13):
            sep = (maxs[i] <= mins[j]).any() or (maxs[j] <= mins[i]).any()
            assert sep


def test_load_assets_synthetic_fallback():
    m = smpl.synthetic_model()
    assets = mesh.load_assets(m, uv_map_path="/nonexistent", part_path="/nonexistent")
    assert assets.f2uvs.shape == (13776, 3, 2)
    assert assets.map_fn.shape == (13777, 3)
    assert assets.face_parts.shape == (13776,)
    assert int(assets.face_parts.max()) < mesh.N_PARTS
    assert assets.face_k_nearest.shape == (13776, 3)


def test_part_face_mask_composites():
    m = smpl.synthetic_model()
    assets = mesh.load_assets(m, uv_map_path="/nonexistent", part_path="/nonexistent")
    upper = np.asarray(mesh.part_face_mask(assets, ["upper"]))
    head = np.asarray(mesh.part_face_mask(assets, ["head"]))
    body = np.asarray(mesh.part_face_mask(assets, ["body"]))
    assert upper.shape == (13776,)
    assert not (upper & head).any()  # upper excludes head
    assert (upper & body).sum() == upper.sum()  # upper is a subset of body


def test_real_reference_uv_template_loads_if_present():
    path = mesh.find_asset("mapper_uv.txt")
    if path is None:
        return  # hermetic environments skip silently
    obj = mesh.load_obj(path)
    assert obj["faces"].shape == (13776, 3)
    assert obj["uvs"] is not None and obj["uvs"].shape == (7576, 2)
    uvs = obj["uvs"][obj["uv_faces"]]
    assert uvs.min() >= -0.01 and uvs.max() <= 1.01
    m = smpl.synthetic_model()
    assets = mesh.load_assets(m)  # picks up the real template
    assert assets.f2uvs.shape == (13776, 3, 2)
    f2 = np.asarray(assets.f2uvs)
    assert f2.min() >= -1.01 and f2.max() <= 1.01


def test_build_map_fn_background_row():
    parts = np.zeros((5,), np.int32)
    table = mesh.build_map_fn(parts)
    assert table.shape == (6, 3)
    np.testing.assert_array_equal(table[-1], [0, 0, 0])
