"""Background-inpaint mask hygiene (`preprocessor.py` stage 1.6).

The r5 self-imitation run found the subject baked into background.png:
stage 1.6 accumulated background over the RAW matting visibility, so every
person pixel the alpha missed (alpha coverage on real media ~0.73) counted
as visible background and ghosted through all composites.
`background_visibility` must over-cover the person: union of matting-person
and SMPL silhouette, dilated (reference convention: dilated-mask inpaint,
`base_preprocessor.py` bg stage).
"""
import numpy as np

from ipercore_tpu.tools.preprocessor import background_visibility


def _make(S=64):
    # matting person: a square that UNDER-covers (half the true person)
    masks = np.ones((2, S, S, 1), np.float32)  # bg=1
    masks[:, 20:40, 20:30, :] = 0.0            # matting found left half only
    sil = np.zeros((2, S, S, 1), np.float32)   # SMPL person=1
    sil[:, 22:38, 28:40, :] = 1.0              # geometry covers right side
    return masks, sil


def test_person_union_excluded():
    masks, sil = _make()
    vis = background_visibility(masks, sil, image_size=64)
    # every pixel either evidence source calls person must be invisible
    person = np.maximum(1.0 - masks, sil)
    assert vis[person > 0.5].max() == 0.0


def test_dilation_margin():
    masks, sil = _make()
    vis = background_visibility(masks, sil, image_size=64)
    # pixels a few px OUTSIDE the union (halo band) are also excluded
    assert vis[0, 19, 25, 0] == 0.0  # just above the matting square
    assert vis[0, 30, 42, 0] == 0.0  # just right of the silhouette
    # far-away background stays visible
    assert vis[0, 5, 5, 0] == 1.0
    assert vis[0, 60, 60, 0] == 1.0


def test_shapes_and_binary():
    masks, sil = _make()
    vis = background_visibility(masks, sil, image_size=64)
    assert vis.shape == (2, 64, 64, 1)
    assert set(np.unique(vis)).issubset({0.0, 1.0})
