"""Evaluate person-seg weights on the bundled REAL sample media.

The only non-synthetic ground truth available offline is hand-annotated
person boxes on the reference checkout's sample media (the real still
`sources/donald_trump_2/00000.PNG` and frames of `references/akun_1.mp4`).
For a candidate weights file this reports, per image:

  * in-box coverage   — mask area inside the GT person box / box area
                        (a full person silhouette fills ~0.4-0.6 of its box)
  * out-box fp        — mask area outside the box / outside area
  * seg-path box IoU  — `person_components` + `_merge_aligned_components`
                        + `zoom_refine` end-to-end box vs the GT box, i.e.
                        exactly what preprocessing stage 1.1 would produce

and a scalar `quality = mean(iou)` for recipe A/B comparison. Used to pick
which training recipe's weights get promoted to `assets/person_seg.npz`.

Usage: python scripts/eval_real_photos.py --weights /tmp/person_seg_v4.npz
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

STILL = "/root/reference/assets/samples/sources/donald_trump_2/00000.PNG"
AKUN_RAW = os.path.join(REPO, "real_media_run/primitives/akun_1/processed/raw")

# GT person boxes as (x0, y0, x1, y1) fractions of (W, H), hand-annotated.
GT = {
    "trump_still": (STILL, (0.33, 0.18, 0.51, 0.95)),
    "akun_f030": (os.path.join(AKUN_RAW, "frame_00000030.png"),
                  (0.31, 0.26, 0.63, 0.97)),
    "akun_f100": (os.path.join(AKUN_RAW, "frame_00000100.png"),
                  (0.31, 0.20, 0.63, 0.98)),
    "akun_f180": (os.path.join(AKUN_RAW, "frame_00000180.png"),
                  (0.31, 0.19, 0.55, 1.0)),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", type=str,
                    default=os.path.join(REPO, "assets", "person_seg.npz"))
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".cache", "jax_compilation"))
    from PIL import Image

    from ipercore_tpu.tools.detection import (SegmentationDetector, _iou,
                                              _merge_aligned_components,
                                              person_components)
    from ipercore_tpu.tools.mattors import HumanMattor

    mattor = HumanMattor(image_size=256, weights_path=args.weights)
    det = SegmentationDetector(mattor=mattor)
    if not det.available:
        print(json.dumps({"error": f"no trained weights at {args.weights}"}))
        return

    out = {"weights": args.weights}
    ious = []
    for name, (path, gt_frac) in GT.items():
        if not os.path.exists(path):
            out[name] = "input absent"
            continue
        im = Image.open(path).convert("RGB")
        arr = np.asarray(im).astype(np.float32) / 127.5 - 1.0
        H, W = arr.shape[:2]
        gt = np.asarray([gt_frac[0] * W, gt_frac[1] * H,
                         gt_frac[2] * W, gt_frac[3] * H])
        prob = det.run_probs(arr[None])[0]
        work = det.work
        gx = (gt * np.asarray([work / W, work / H] * 2)).astype(int)
        inside = prob[gx[1]:gx[3], gx[0]:gx[2]] > 0.5
        outside_area = work * work - inside.size
        fp = ((prob > 0.5).sum() - inside.sum()) / max(outside_area, 1)
        rec = {"in_box_coverage": round(float(inside.mean()), 4),
               "out_box_fp": round(float(fp), 4)}
        # the production stage-1.1 seg path
        min_area = max(int(det.min_area_frac * work * work), 8)
        cb, cs = person_components(prob, min_area=min_area)
        if len(cb):
            s = np.asarray([W / work, H / work] * 2, np.float32)
            coarse = _merge_aligned_components(cb, cs) * s
            refined, ok = det.zoom_refine(arr[None], coarse[None])
            box = refined[0] if ok[0] else coarse
            rec["box"] = [round(float(v), 1) for v in box]
            rec["box_iou"] = round(_iou(box, gt), 4)
            ious.append(rec["box_iou"])
        else:
            rec["box"] = None
            rec["box_iou"] = 0.0
            ious.append(0.0)
        out[name] = rec
    out["quality"] = round(float(np.mean(ious)), 4) if ious else 0.0
    print(json.dumps(out))


if __name__ == "__main__":
    main()
