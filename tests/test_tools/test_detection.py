"""Stage-1.1 person detection: median-background segmenter + MaxBoxTracker.

The VERDICT round-1 gap: every frame got a full-frame box
(`tools/preprocessor.py` stage 1.1 stub). These tests fabricate a small
off-center person moving over a static textured background and assert the
crop contains and centers them — parity with the reference's detect+crop
behavior (`base_preprocessor.py:167-243`, `process_utils.py:111-362`)."""
import numpy as np

from ipercore_tpu.tools.detection import (
    PersonDetector, track_person_boxes, connected_component_boxes,
)
from ipercore_tpu.tools.preprocessor import (
    update_active_boxes, fmt_active_boxes, process_crop_img,
)


def _scene(n=8, H=120, W=160, person_hw=(30, 14), start=(70, 20), step=(0, 3), seed=0):
    """Static textured background + a small moving colored 'person'."""
    rng = np.random.RandomState(seed)
    bg = rng.uniform(-1, 1, (H, W, 3)).astype(np.float32) * 0.3
    frames = np.repeat(bg[None], n, axis=0).copy()
    ph, pw = person_hw
    boxes = []
    for i in range(n):
        y = start[0] + step[0] * i
        x = start[1] + step[1] * i
        frames[i, y:y + ph, x:x + pw] = np.asarray([0.9, -0.7, 0.4])
        boxes.append([x, y, x + pw, y + ph])
    return frames, np.asarray(boxes, np.float32)


def test_connected_components_boxes():
    m = np.zeros((20, 20), bool)
    m[2:5, 3:8] = True
    m[10:18, 12:16] = True
    boxes = connected_component_boxes(m, min_area=4)
    assert boxes.shape == (2, 4)
    assert [3, 2, 8, 5] in boxes.tolist()
    assert [12, 10, 16, 18] in boxes.tolist()


def test_detector_finds_moving_person():
    frames, gt = _scene()
    det = PersonDetector()
    per_frame = det.run(frames)
    hits = 0
    for boxes, g in zip(per_frame, gt):
        if len(boxes) == 0:
            continue
        b = boxes[np.argmax((boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1]))]
        # detection box overlaps ground truth and is person-scale (not frame)
        ix = max(0.0, min(b[2], g[2]) - max(b[0], g[0]))
        iy = max(0.0, min(b[3], g[3]) - max(b[1], g[1]))
        if ix * iy > 0.3 * (g[2] - g[0]) * (g[3] - g[1]):
            hits += 1
    assert hits >= len(frames) // 2, f"only {hits} frames detected"


def test_tracked_crop_contains_and_centers_person():
    frames, gt = _scene()
    H, W = frames.shape[1:3]
    tracked = track_person_boxes(frames)
    assert tracked is not None, "detector fell back to full frame"

    active = None
    for b in tracked:
        active = update_active_boxes(b, active)
    box = fmt_active_boxes(active, (H, W), factor=1.25)
    # the crop box is much smaller than the frame and contains every gt box
    assert (box[2] - box[0]) * (box[3] - box[1]) < 0.5 * H * W
    assert box[0] <= gt[:, 0].min() and box[1] <= gt[:, 1].min()
    assert box[2] >= gt[:, 2].max() and box[3] >= gt[:, 3].max()

    # cropping the middle frame centers the person
    i = len(frames) // 2
    crop, geom = process_crop_img(frames[i], box, 64)
    fg = np.abs(crop - np.asarray([0.9, -0.7, 0.4])).sum(-1) < 0.5
    assert fg.any(), "person missing from crop"
    ys, xs = np.nonzero(fg)
    cy, cx = ys.mean() / 64, xs.mean() / 64
    assert 0.25 < cy < 0.75 and 0.25 < cx < 0.75, (cy, cx)
    # the person occupies far more of the crop than of the raw frame
    raw_frac = (gt[i, 2] - gt[i, 0]) * (gt[i, 3] - gt[i, 1]) / (H * W)
    assert fg.mean() > 2.0 * raw_frac


def test_single_image_falls_back():
    frames, _ = _scene(n=1)
    assert track_person_boxes(frames) is None


def test_static_person_with_camera_noise_none_or_box():
    # pure noise, no person: should not hallucinate a tiny box
    rng = np.random.RandomState(1)
    frames = rng.uniform(-1, 1, (6, 80, 80, 3)).astype(np.float32)
    out = track_person_boxes(frames)
    # either no detection (fallback) or a near-full-frame union — caller's
    # fmt_active_boxes keeps behavior sane either way
    if out is not None:
        u = [out[:, 0].min(), out[:, 1].min(), out[:, 2].max(), out[:, 3].max()]
        assert (u[2] - u[0]) * (u[3] - u[1]) >= 0.01 * 80 * 80


def test_color_model_still_box():
    """A single still with a distinct centered person on textured background:
    the GrabCut-lite color model must localize it (no temporal signal)."""
    from ipercore_tpu.tools.detection import still_person_boxes

    rng = np.random.RandomState(2)
    H, W = 120, 160
    img = (rng.uniform(-1, 1, (H, W, 3)) * 0.2 - 0.5).astype(np.float32)
    img[30:100, 60:95] = np.asarray([0.8, 0.1, -0.2], np.float32)
    boxes = still_person_boxes(img[None])
    assert len(boxes[0]) >= 1
    x0, y0, x1, y1 = boxes[0][0]
    # overlaps the person and is much tighter than the frame
    assert x0 < 95 and x1 > 60 and y0 < 100 and y1 > 30
    assert (x1 - x0) * (y1 - y0) < 0.6 * H * W


def test_mask_compactness_gate():
    from ipercore_tpu.tools.detection import mask_is_compact

    solid = np.zeros((64, 64), bool)
    solid[10:50, 20:40] = True
    assert mask_is_compact(solid)
    # all-fired mask: no localization value
    assert not mask_is_compact(np.ones((64, 64), bool))
    # scattered speckle: rejected
    rng = np.random.RandomState(0)
    assert not mask_is_compact(rng.rand(64, 64) > 0.65)
    # empty
    assert not mask_is_compact(np.zeros((64, 64), bool))


def test_detect_person_boxes_still_photo_real():
    """VERDICT r2 item 3: stage-1.1 must produce a NON-full-frame box on the
    bundled real still (`assets/samples/sources/donald_trump_2/00000.PNG`)."""
    import os
    import pytest

    path = "/root/reference/assets/samples/sources/donald_trump_2/00000.PNG"
    if not os.path.exists(path):
        pytest.skip("reference sample absent")
    from PIL import Image

    from ipercore_tpu.tools.detection import SegmentationDetector, detect_person_boxes

    im = Image.open(path).convert("RGB")
    arr = np.asarray(im).astype(np.float32) / 127.5 - 1.0
    H, W = arr.shape[:2]
    boxes, method = detect_person_boxes(arr[None], seg_detector=SegmentationDetector())
    assert boxes is not None and method != "none"
    x0, y0, x1, y1 = boxes[0]
    assert (x1 - x0) * (y1 - y0) < 0.8 * H * W  # not the full frame
    # overlaps the hand-annotated GT person box (assets/real_gt.json,
    # trump_still) with decent IoU — the round-4 promotion gate is measured
    # by scripts/eval_real_photos.py; this is the regression floor
    gt = np.asarray([0.33 * W, 0.17 * H, 0.52 * W, 0.94 * H])
    from ipercore_tpu.tools.detection import _iou

    assert _iou(np.asarray([x0, y0, x1, y1]), gt) > 0.55, (boxes[0], gt)


def test_pose_person_boxes_gating():
    """Untrained pose runner -> no boxes; a trained-like runner returning a
    confident skeleton -> one box with crown margin above the top joint."""
    from ipercore_tpu.tools.detection import pose_person_boxes

    frames = np.zeros((2, 128, 96, 3), np.float32)

    class Untrained:
        trained = False

    out = pose_person_boxes(frames, pose2d=Untrained())
    assert all(len(b) == 0 for b in out)

    class Fake:
        trained = True

        def run_tracked(self, x, smooth=False):
            n = len(x)
            kps = np.zeros((n, 25, 2), np.float32)
            scores = np.zeros((n, 25), np.float32)
            # coherent standing person: neck..ankles spanning y in [-0.4, 0.8]
            ys = np.linspace(-0.4, 0.8, 10)
            ids = [1, 2, 5, 9, 12, 10, 13, 11, 14, 8]
            for j, y in zip(ids, ys):
                kps[:, j] = [0.1, y]
                scores[:, j] = 0.8
            return kps, scores, scores > 0.1

    out = pose_person_boxes(frames, pose2d=Fake())
    assert all(len(b) == 1 for b in out)
    x0, y0, x1, y1 = out[0][0]
    H = 128
    top_joint_px = (1 - 0.4) * 0.5 * H
    assert y0 < top_joint_px  # crown margin raised the top edge
    # no head joint was confident -> the larger (35%) margin applies
    span = (0.8 - (-0.4)) * 0.5 * H  # joint box height in px
    assert y0 <= top_joint_px - 0.3 * span

    class TooFew(Fake):
        def run_tracked(self, x, smooth=False):
            kps, scores, valid = super().run_tracked(x, smooth)
            scores[:, :] = 0.0
            scores[:, 1] = 0.8  # single confident joint: reject
            return kps, scores, scores > 0.1

    out = pose_person_boxes(frames, pose2d=TooFew())
    assert all(len(b) == 0 for b in out)


def test_person_components_scoring_prefers_person_shape():
    """`person_components` must rank a tall solid blob above a wide flat one
    (pavement/hedge) and above scattered speckle, even when the flat blob is
    larger — the failure mode that full-mask `mask_is_compact` gating had."""
    from ipercore_tpu.tools.detection import person_components

    prob = np.zeros((128, 128), np.float32)
    prob[20:90, 40:60] = 0.95     # person-ish: 70x20, ar 3.5
    prob[100:110, 5:125] = 0.9    # pavement: 10x120, ar 0.08 (bigger area)
    boxes, scores = person_components(prob, min_area=32)
    assert len(boxes) == 2
    x0, y0, x1, y1 = boxes[0]
    assert 35 <= x0 <= 45 and 15 <= y0 <= 25  # the tall blob wins
    assert scores[0] > 3 * scores[1]


def test_merge_aligned_components_recovers_split_person():
    """A torso and legs split by a bright waistline share a column range and
    must merge; an off-column blob must not."""
    from ipercore_tpu.tools.detection import (_merge_aligned_components,
                                              person_components)

    prob = np.zeros((128, 128), np.float32)
    prob[10:50, 40:60] = 0.95    # torso
    prob[55:100, 42:58] = 0.9    # legs (same columns)
    prob[60:80, 100:120] = 0.9   # unrelated blob to the right
    boxes, scores = person_components(prob, min_area=32)
    merged = _merge_aligned_components(boxes, scores)
    assert merged[1] <= 10 and merged[3] >= 100      # spans torso+legs rows
    assert merged[0] >= 35 and merged[2] <= 65       # excludes the side blob
