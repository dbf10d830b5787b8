"""Multi-person OpenPose decode: NMS peaks + PAF grouping must separate two
people where the argmax decode provably mixes them (VERDICT r1 item 5)."""
import numpy as np

from ipercore_tpu.tools.pose2d import decode_single_person, N_BODY25_JOINTS
from ipercore_tpu.tools.pose2d_decode import (
    BODY25_LIMBS, BODY25_PAF_IDS, OneEuroFilter, decode_multi_person,
    extract_peaks, pick_largest_person,
)

H = W = 96


def _gauss(h, w, cx, cy, sigma=2.0):
    ys, xs = np.mgrid[0:h, 0:w]
    return np.exp(-((xs - cx) ** 2 + (ys - cy) ** 2) / (2 * sigma ** 2))


def _scene_two_people():
    """Synthetic heatmaps/PAFs: person A on the left, person B (stronger
    signal on some joints) on the right."""
    # joint positions for a tiny 5-joint chain: nose(0) neck(1) midhip(8)
    # rshoulder(2) relbow(3)
    people = [
        {0: (20, 14), 1: (20, 24), 8: (20, 52), 2: (13, 24), 3: (11, 38)},
        {0: (70, 16), 1: (70, 26), 8: (70, 54), 2: (63, 26), 3: (61, 40)},
    ]
    strengths = [
        {0: 1.0, 1: 1.0, 8: 1.0, 2: 1.0, 3: 1.0},
        {0: 0.8, 1: 0.9, 8: 1.2, 2: 1.2, 3: 1.2},  # B stronger on some joints
    ]
    hm = np.zeros((H, W, N_BODY25_JOINTS + 1), np.float32)
    for p, s in zip(people, strengths):
        for j, (x, y) in p.items():
            hm[..., j] += s[j] * _gauss(H, W, x, y)
    pafs = np.zeros((H, W, 52), np.float32)
    for p in people:
        for (ja, jb), (cx, cy) in zip(BODY25_LIMBS, BODY25_PAF_IDS):
            if ja not in p or jb not in p:
                continue
            a = np.asarray(p[ja], np.float32)
            b = np.asarray(p[jb], np.float32)
            u = (b - a) / (np.linalg.norm(b - a) + 1e-6)
            ts = np.linspace(0, 1, 40)
            for t in ts:
                x, y = a + t * (b - a)
                xi, yi = int(round(x)), int(round(y))
                for dy in (-1, 0, 1):
                    for dx in (-1, 0, 1):
                        yy, xx = np.clip(yi + dy, 0, H - 1), np.clip(xi + dx, 0, W - 1)
                        pafs[yy, xx, cx] = u[0]
                        pafs[yy, xx, cy] = u[1]
    return hm, pafs, people


def test_extract_peaks_finds_both():
    hm, _, people = _scene_two_people()
    peaks = extract_peaks(hm[..., 1])
    assert len(peaks) == 2
    xs = sorted(peaks[:, 0].tolist())
    assert abs(xs[0] - 20) <= 1 and abs(xs[1] - 70) <= 1


def test_grouping_separates_people_where_argmax_mixes():
    hm, pafs, people = _scene_two_people()

    # argmax decode demonstrably mixes the two people: strongest nose is A's,
    # strongest shoulder/elbow are B's
    kps, scores, valid = decode_single_person(hm[None])
    px = (np.asarray(kps[0, :, 0]) + 1) * W / 2 - 0.5
    assert abs(px[0] - 20) < 3   # nose from person A
    assert abs(px[2] - 63) < 3   # shoulder from person B -> mixed skeleton!

    # PAF grouping returns two coherent people
    found = decode_multi_person(hm, pafs)
    assert len(found) == 2
    for person in found:
        v = ~np.isnan(person["kps"][:, 0])
        xs = person["kps"][v, 0]
        # all joints of one person lie on one side (coherent, not mixed)
        assert xs.max() - xs.min() < 30, xs
    centers = sorted(np.nanmean(p["kps"][:, 0]) for p in found)
    assert centers[0] < 30 and centers[1] > 55


def test_pick_largest_person():
    hm, pafs, _ = _scene_two_people()
    found = decode_multi_person(hm, pafs)
    best = pick_largest_person(found)
    assert best is not None and best["n"] >= 4


def test_one_euro_filter_smooths_jitter():
    rng = np.random.RandomState(0)
    f = OneEuroFilter(freq=15, beta=0.05)
    xs = []
    true = np.zeros((5, 2))
    for t in range(60):
        noisy = true + rng.randn(5, 2) * 2.0
        xs.append(f(noisy))
    out = np.stack(xs[10:])
    # filtered variance well below the raw noise variance
    assert out.std() < 1.2, out.std()


def test_one_euro_filter_tracks_motion():
    f = OneEuroFilter(freq=15, beta=0.5, mincutoff=1.0)
    x = None
    for t in range(30):
        x = f(np.asarray([[float(t) * 4.0]]))
    # fast motion passes through with low lag (adaptive cutoff)
    assert abs(float(x[0, 0]) - 29 * 4.0) < 8.0


def test_one_euro_filter_nan_passthrough():
    f = OneEuroFilter()
    f(np.asarray([1.0, 1.0]))
    out = f(np.asarray([np.nan, 2.0]))
    assert np.isnan(out[0]) and np.isfinite(out[1])
    out = f(np.asarray([3.0, 3.0]))  # filter state survived the NaN
    assert np.isfinite(out).all()


def test_flip_tta_tables_match_target_builder():
    """Advisor r4: the flip-TTA joint/PAF tables were verified only by hand.
    Validate them against an independent source of limb/joint semantics: the
    supervision target builder. Mirroring the *keypoints* (NDC x -> -x, joints
    permuted) and rebuilding targets must equal applying the TTA transform
    (spatial x-reverse + channel perm + PAF x-sign) to the original targets.
    The pixel mapping px=(ndc+1)/2*S-0.5 makes NDC flip == exact index
    reversal, so the comparison is tight."""
    from ipercore_tpu.tools.pose2d import (BODY25_FLIP_JOINTS,
                                           _body25_paf_flip_tables)
    from ipercore_tpu.tools import synth_data as sd

    rng = np.random.RandomState(0)
    j2d = rng.uniform(-0.8, 0.8, size=(2, 19, 2)).astype(np.float32)
    b25, valid = sd.body25_from_cocoplus(np.asarray(j2d))
    b25 = np.asarray(b25)
    hm, paf, _, _ = sd._pose2d_targets(b25, valid, 32, 1.5,
                                       BODY25_LIMBS, BODY25_PAF_IDS, 52)
    # mirrored keypoints: flip NDC x and permute joint slots
    jp = np.asarray(BODY25_FLIP_JOINTS[:25])
    b25_m = (b25 * np.asarray([-1.0, 1.0]))[:, jp]
    valid_m = valid[jp]
    hm_m, paf_m, _, _ = sd._pose2d_targets(b25_m, valid_m, 32, 1.5,
                                           BODY25_LIMBS, BODY25_PAF_IDS, 52)
    perm, sign = _body25_paf_flip_tables()
    hm_t = np.asarray(hm)[:, :, ::-1, :][..., np.asarray(BODY25_FLIP_JOINTS)]
    paf_t = np.asarray(paf)[:, :, ::-1, :][..., np.asarray(perm)] * np.asarray(sign)
    np.testing.assert_allclose(np.asarray(hm_m), hm_t, atol=1e-5)
    np.testing.assert_allclose(np.asarray(paf_m), paf_t, atol=1e-5)


def test_degenerate_decode_detector():
    """The flat-heatmap argmax failure: all joints grid-quantized on the
    crop midline with healthy scores (measured on the bundled real still,
    r5). `_degenerate_decode` must flag it; a real spread must pass."""
    import numpy as np

    from ipercore_tpu.tools.pose2d import _degenerate_decode

    conf = np.full(25, 0.6, np.float32)
    flat = np.zeros((25, 2), np.float32)
    flat[:, 0] = np.random.RandomState(0).choice([-0.025, 0.025], 25)
    flat[:, 1] = np.linspace(-0.6, 0.6, 25)
    assert _degenerate_decode(flat, conf)
    real = np.zeros((25, 2), np.float32)
    real[:, 0] = np.random.RandomState(1).uniform(-0.2, 0.2, 25)
    real[:, 1] = np.linspace(-0.6, 0.6, 25)
    assert not _degenerate_decode(real, conf)
    # too few confident joints is degenerate regardless of layout
    assert _degenerate_decode(real, np.full(25, 0.05, np.float32))


def test_affine_window_mapping():
    """A point at window NDC u maps to image NDC u*s + (dx, dy): place a
    bright pixel, re-crop, and verify it lands where the inverse map says."""
    import numpy as np

    from ipercore_tpu.tools.pose2d import _affine_window

    H = W = 64
    img = np.zeros((H, W, 3), np.float32)
    # bright pixel at image NDC (0.25, -0.125)
    px, py = int((0.25 + 1) / 2 * W), int((-0.125 + 1) / 2 * H)
    img[py, px] = 1.0
    s, dx, dy = 0.8, 0.1, 0.0
    out = _affine_window(img, s, dx, dy)
    yy, xx = np.unravel_index(out[..., 0].argmax(), out[..., 0].shape)
    # expected window NDC: u = (x_img - dx) / s
    ex = ((0.25 - dx) / s + 1) / 2 * W
    ey = ((-0.125 - dy) / s + 1) / 2 * H
    assert abs(xx - ex) <= 2 and abs(yy - ey) <= 2, (xx, yy, ex, ey)


def test_run_tracked_robust_retry_and_mapping():
    """The retry/selection logic, isolated from the net: a degenerate
    primary decode triggers jittered re-crops; the winning jitter decode's
    keypoints must map back through the window affine (x_img = x_crop*s+d),
    and a healthy primary decode must short-circuit (no retries)."""
    import types

    import numpy as np

    from ipercore_tpu.tools.pose2d import OpenPoseRunner

    rng = np.random.RandomState(0)
    good = np.zeros((25, 2), np.float32)
    good[:, 0] = rng.uniform(-0.2, 0.2, 25)
    good[:, 1] = np.linspace(-0.6, 0.6, 25)
    flat = np.zeros((25, 2), np.float32)
    flat[:, 1] = np.linspace(-0.6, 0.6, 25)
    conf = np.full((25,), 0.6, np.float32)

    r = object.__new__(OpenPoseRunner)  # skip heavy __init__
    calls = []

    def fake_run_tracked(self, images, smooth=True):
        calls.append(images.shape)
        n = len(images)
        # first call (the full batch) is degenerate; every retry is good
        k = flat if len(calls) == 1 else good
        return (np.repeat(k[None], n, 0).copy(),
                np.repeat(conf[None], n, 0).copy(),
                np.ones((n, 25), bool))

    r.run_tracked = types.MethodType(fake_run_tracked, r)
    img = np.zeros((1, 64, 64, 3), np.float32)
    kps, scores, valid = OpenPoseRunner.run_tracked_robust(r, img)
    assert len(calls) > 1  # retried
    # first jitter (s=0.8, d=0) wins ties by confidence -> mapping is k*0.8
    np.testing.assert_allclose(kps[0], good * 0.8, atol=1e-6)
    assert valid[0].all()

    # healthy primary -> no retries
    calls.clear()

    def fake_good(self, images, smooth=True):
        calls.append(images.shape)
        n = len(images)
        return (np.repeat(good[None], n, 0).copy(),
                np.repeat(conf[None], n, 0).copy(),
                np.ones((n, 25), bool))

    r.run_tracked = types.MethodType(fake_good, r)
    kps2, _, _ = OpenPoseRunner.run_tracked_robust(r, img)
    assert len(calls) == 1
    np.testing.assert_allclose(kps2[0], good)
