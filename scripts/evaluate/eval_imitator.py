"""Imitation evaluator CLI: SSIM / PSNR / LPIPS / FID-proxy over frame dirs.

The reference documents this script (`docs/evaluate.md:4-11`) but does not
ship it (SURVEY.md §2.8); built here from the doc description over
`ipercore_tpu.services.evaluate`.

Usage:
    python scripts/evaluate/eval_imitator.py --pred_dir ./out/synthesis \
        --gt_dir ./gt_frames [--image_size 256]
Prints one JSON line of metrics.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--pred_dir", required=True)
    p.add_argument("--gt_dir", required=True)
    p.add_argument("--image_size", type=int, default=256)
    p.add_argument("--max_frames", type=int, default=500)
    args = p.parse_args(argv)

    import numpy as np

    from ipercore_tpu.services.evaluate import evaluate_frames
    from ipercore_tpu.utils import video as vid

    preds = vid.list_frames(args.pred_dir)[: args.max_frames]
    gts = vid.list_frames(args.gt_dir)[: args.max_frames]
    n = min(len(preds), len(gts))
    if n == 0:
        print(json.dumps({"error": "no frames"}))
        return 1
    a = np.stack([vid.load_image(p, size=args.image_size) for p in preds[:n]])
    b = np.stack([vid.load_image(p, size=args.image_size) for p in gts[:n]])
    metrics = evaluate_frames(a, b)
    metrics["n_frames"] = n
    print(json.dumps(metrics))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
