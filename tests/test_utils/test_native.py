"""Native PNG filter runtime: roundtrip + python-fallback equivalence."""
import numpy as np
import pytest

from ipercore_tpu.utils import native
from ipercore_tpu.utils.video import write_png, read_png


def test_roundtrip_with_native_if_available(tmp_path):
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (64, 48, 3), np.uint8)
    p = str(tmp_path / "n.png")
    write_png(p, img)
    back = read_png(p)
    np.testing.assert_array_equal(back, img)


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_native_filters_match_reference():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (16, 24), np.uint8)  # stride=24, bpp=3
    raw = native.png_filter_sub(img, bpp=3)
    assert raw is not None
    out = native.png_unfilter(raw, 16, 24, 3)
    np.testing.assert_array_equal(out, img)


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_native_unfilter_handles_all_filter_types():
    # build scanlines with each filter type against known reconstruction
    h, stride, bpp = 4, 9, 3
    rng = np.random.RandomState(2)
    truth = rng.randint(0, 255, (h, stride), np.uint8).astype(np.int32)

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    lines = []
    for y, ft in enumerate([0, 1, 2, 4]):
        row = truth[y]
        prev = truth[y - 1] if y else np.zeros(stride, np.int32)
        enc = np.zeros(stride, np.int32)
        for i in range(stride):
            left = row[i - bpp] if i >= bpp else 0
            up = prev[i]
            ul = prev[i - bpp] if i >= bpp else 0
            pred = {0: 0, 1: left, 2: up, 4: paeth(left, up, ul)}[ft]
            enc[i] = (row[i] - pred) % 256
        lines.append(bytes([ft]) + enc.astype(np.uint8).tobytes())
    raw = b"".join(lines)
    out = native.png_unfilter(raw, h, stride, bpp)
    np.testing.assert_array_equal(out, truth.astype(np.uint8))


def test_cc_boxes_native_matches_python():
    import numpy as np
    import pytest

    from ipercore_tpu.utils import native

    if native.cc_boxes(np.zeros((4, 4), bool)) is None:
        pytest.skip("native toolchain unavailable")
    rng = np.random.RandomState(3)
    m = rng.rand(96, 96) > 0.7
    out = native.cc_boxes(m, max_comps=4096)
    assert out is not None
    # total area equals the mask's foreground count (labels partition it)
    assert out[:, 4].sum() == m.sum()
    # areas sorted descending
    assert (np.diff(out[:, 4]) <= 0).all()
    # every box is tight: the mask restricted to the box has pixels on all
    # four edges for the single-component case
    solid = np.zeros((32, 32), bool)
    solid[4:10, 7:20] = True
    b = native.cc_boxes(solid)
    assert list(b[0]) == [7, 4, 20, 10, 6 * 13]
