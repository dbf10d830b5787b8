"""Self-training pseudo-labels for the 2D pose chain on the bundled real video.

The sim2real ladder (docs/PARITY.md) stalled at OpenPose real val PCK 0.38:
procedural SMPL renders cannot close the *appearance* gap to real clothed
humans. This script closes it with the standard self-training recipe — label
the unlabeled REAL frames with the current net under its strongest inference
configuration, keep only the labels that survive independent quality filters,
then fine-tune on a synthetic/real mix (`train_openpose.py --pseudo ...`).

The teacher is strictly stronger than the raw student: horizontal-flip TTA
(one jitted program), PAF-grouped decode, and *temporal* median consistency
over the video — a filter no single-frame prediction gets. Joints whose raw
prediction deviates from the local temporal median by more than a fraction of
the person height, or whose heatmap peak is weak, are dropped (per-joint
validity masks, `synth_data.make_pose2d_targets_b25`); the median position
itself becomes the label, so jitter is not distilled.

Leakage discipline: only akun frames < 160 (the SELECT side of
`assets/real_gt.json`'s round-5 split) are ever labeled; the held-out val
band (frames >= 160) and the independent stills never enter training in any
form. Boxes come from the production v7 segmenter path (no GT boxes used).

Reference counterpart: none — the reference downloads CMU-trained weights
(`assets/download.sh`); this is the offline substitute for that supervision.

Usage:
  python scripts/pseudo_label_pose.py                # writes .cache/pseudo_pose/akun_pseudo.npz
  python scripts/pseudo_label_pose.py --report       # stats only
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT_DIR = os.path.join(REPO, ".cache", "pseudo_pose")
VAL_BAND_START = 160  # frames >= this are the held-out val band: never label
N_FRAMES = 219
CROP = 320  # stored crop resolution (trainers resize to their input size)


def detect_boxes(frames: np.ndarray) -> np.ndarray:
    """Production stage-1.1 seg boxes per frame + temporal median smoothing.

    frames: (N, H, W, 3) [-1, 1]. Returns (N, 4) xyxy px. Frames where the
    seg path finds nothing inherit the temporally-nearest good box.
    """
    from ipercore_tpu.tools.detection import (SegmentationDetector,
                                              _merge_aligned_components,
                                              person_components)

    det = SegmentationDetector()
    if not det.available:
        raise SystemExit("no trained person_seg weights; run train_person_seg first")
    N, H, W = frames.shape[:3]
    probs = det.run_probs(frames)
    work = det.work
    min_area = max(int(det.min_area_frac * work * work), 8)
    boxes = np.full((N, 4), np.nan, np.float32)
    s = np.asarray([W / work, H / work] * 2, np.float32)
    for i in range(N):
        cb, cs = person_components(probs[i], min_area=min_area)
        if len(cb):
            boxes[i] = _merge_aligned_components(cb, cs) * s
    # fill gaps from nearest good frame, then median-smooth (window 9)
    good = np.where(np.isfinite(boxes[:, 0]))[0]
    if len(good) == 0:
        raise SystemExit("segmenter found no person in any frame")
    for i in range(N):
        if not np.isfinite(boxes[i, 0]):
            boxes[i] = boxes[good[np.argmin(np.abs(good - i))]]
    sm = np.empty_like(boxes)
    for i in range(N):
        lo, hi = max(0, i - 4), min(N, i + 5)
        sm[i] = np.median(boxes[lo:hi], axis=0)
    return sm


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--score_thr", type=float, default=0.25,
                    help="min heatmap peak score for a joint label")
    ap.add_argument("--dev_thr", type=float, default=0.05,
                    help="max |raw - temporal median| as a fraction of person "
                         "height for a joint label")
    ap.add_argument("--min_joints", type=int, default=8,
                    help="drop frames with fewer valid joints than this")
    ap.add_argument("--out", type=str,
                    default=os.path.join(OUT_DIR, "akun_pseudo.npz"))
    ap.add_argument("--report", action="store_true", help="stats only, no write")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".cache", "jax_compilation"))
    from PIL import Image

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from eval_real_photos import FRAME_DIR, _square_crop, ensure_frames

    from ipercore_tpu.tools.pose2d import build_pose2d_estimator

    frames_idx = [i for i in range(N_FRAMES) if i < VAL_BAND_START]
    ensure_frames(frames_idx)
    imgs = []
    for i in frames_idx:
        path = os.path.join(FRAME_DIR, f"akun_{i:04d}.png")
        imgs.append(np.asarray(Image.open(path).convert("RGB"), np.float32)
                    / 127.5 - 1.0)
    imgs = np.stack(imgs)  # (N, H, W, 3)
    N, H, W = imgs.shape[:3]
    print(f"loaded {N} frames {W}x{H}", flush=True)

    boxes = detect_boxes(imgs)
    person_h = boxes[:, 3] - boxes[:, 1]

    # square crops the production framing would feed the pose nets
    crops = np.empty((N, CROP, CROP, 3), np.float32)
    origins = np.empty((N, 3), np.float32)  # (x0, y0, side)
    for i in range(N):
        pad, (x0, y0, side) = _square_crop(imgs[i], boxes[i])
        crops[i] = np.asarray(jax.image.resize(
            jax.numpy.asarray(pad[None]), (1, CROP, CROP, 3), "linear"))[0]
        origins[i] = (x0, y0, side)

    pose2d = build_pose2d_estimator()
    if not getattr(pose2d, "trained", False):
        raise SystemExit("no trained openpose weights")
    # teacher runs at its scale-calibrated resolution (checkpoint metadata)
    t_size = getattr(pose2d, "trained_size", None) or CROP
    teach_in = crops
    if t_size != CROP:
        import jax.numpy as jnp

        teach_in = np.asarray(jax.image.resize(
            jnp.asarray(crops), (N, t_size, t_size, 3), "linear"))
    kps, scores, valid = pose2d.run_tracked(teach_in, smooth=False)
    # crop NDC -> frame px
    px = (kps + 1.0) * 0.5 * origins[:, None, 2:3] + origins[:, None, :2]

    # temporal median (window 7) per joint; deviation gates validity and the
    # median becomes the label (don't distill single-frame jitter)
    med = np.empty_like(px)
    for i in range(N):
        lo, hi = max(0, i - 3), min(N, i + 4)
        med[i] = np.nanmedian(px[lo:hi], axis=0)
    dev = np.linalg.norm(px - med, axis=-1)  # (N, 25)
    ok = ((np.asarray(scores) > args.score_thr)
          & (dev < args.dev_thr * person_h[:, None])
          & np.isfinite(med).all(axis=-1)
          & np.asarray(valid).astype(bool))
    ok[:, 19:25] = False  # toes/heels: the net never had supervision there

    n_per_frame = ok.sum(axis=1)
    keep = n_per_frame >= args.min_joints
    # frame px (median) -> crop NDC labels
    lab_ndc = (med - origins[:, None, :2]) / origins[:, None, 2:3] * 2.0 - 1.0
    lab_ndc = np.where(ok[..., None], lab_ndc, 0.0).astype(np.float32)

    stats = {
        "n_frames": int(N),
        "n_kept": int(keep.sum()),
        "joints_per_kept_frame": round(float(n_per_frame[keep].mean()), 2)
        if keep.any() else 0.0,
        "score_thr": args.score_thr, "dev_thr": args.dev_thr,
        "mean_dev_px": round(float(np.nanmean(dev)), 2),
        "val_band_start": VAL_BAND_START,
    }
    print(json.dumps(stats), flush=True)
    if args.report or not keep.any():
        return
    os.makedirs(OUT_DIR, exist_ok=True)
    np.savez_compressed(
        args.out,
        crops=crops[keep].astype(np.float16),
        kps_ndc=lab_ndc[keep],
        valid=ok[keep].astype(np.float32),
        frames=np.asarray(frames_idx)[keep],
        boxes=boxes[keep], origins=origins[keep],
        meta=json.dumps(stats))
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
