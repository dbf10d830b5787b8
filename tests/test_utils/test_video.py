import os

import numpy as np

from ipercore_tpu.utils.video import (
    write_png, read_png, save_image, load_image, fuse_side_by_side, list_frames,
)


def test_png_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (16, 24, 3), np.uint8)
    p = str(tmp_path / "x.png")
    write_png(p, img)
    back = read_png(p)
    np.testing.assert_array_equal(back, img)


def test_png_rgba_roundtrip(tmp_path):
    rng = np.random.RandomState(2)
    img = rng.randint(0, 255, (12, 18, 4), np.uint8)
    p = str(tmp_path / "a.png")
    write_png(p, img)
    back = read_png(p)
    # read_png normalizes to 3 channels; RGB must survive exactly.
    np.testing.assert_array_equal(back, img[..., :3])


def test_png_gray_roundtrip(tmp_path):
    rng = np.random.RandomState(3)
    img = rng.randint(0, 255, (9, 7), np.uint8)
    p = str(tmp_path / "g.png")
    write_png(p, img)
    back = read_png(p)
    np.testing.assert_array_equal(back, np.repeat(img[..., None], 3, axis=2))


def test_float_image_roundtrip(tmp_path):
    rng = np.random.RandomState(1)
    img = rng.uniform(-1, 1, (8, 8, 3)).astype(np.float32)
    p = str(tmp_path / "f.png")
    save_image(p, img)
    back = load_image(p)
    assert back.shape == (8, 8, 3)
    assert np.abs(back - img).max() < 2.0 / 255 + 1e-3


def test_load_image_resizes(tmp_path):
    img = np.zeros((10, 10, 3), np.uint8)
    p = str(tmp_path / "r.png")
    write_png(p, img)
    out = load_image(p, size=16)
    assert out.shape == (16, 16, 3)


def test_fuse_grid():
    a = np.zeros((4, 4, 3)); b = np.ones((4, 4, 3))
    grid = fuse_side_by_side([[a, b], [b, a]])
    assert grid.shape == (8, 8, 3)
    assert grid[0, 5, 0] == 1 and grid[5, 5, 0] == 0


def test_list_frames_sorted(tmp_path):
    for name in ["b.png", "a.png", "c.txt"]:
        (tmp_path / name).write_bytes(b"")
    frames = list_frames(str(tmp_path))
    assert [os.path.basename(f) for f in frames] == ["a.png", "b.png"]
