"""Dataset preparation: run preprocessing over a whole dataset tree.

Rebuilds `scripts/train/prepare_iPER_dataset.py:207` (process_data) minus the
archive downloads (no network here): given a root of raw videos/image-folders,
run the full preprocessing pipeline per video and emit train/val splits.

Usage:
    python scripts/prepare_dataset.py --raw_dir ./raw_videos \
        --output_dir ./dataset --image_size 512 [--val_frac 0.1] [--smoke]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--raw_dir", required=True, help="folder of videos / image folders")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--image_size", type=int, default=512)
    p.add_argument("--val_frac", type=float, default=0.1)
    p.add_argument("--smoke", action="store_true")
    args = p.parse_args(argv)

    from ipercore_tpu.services.options import setup
    from ipercore_tpu.services.preprocess import preprocess_one
    from ipercore_tpu.services.meta_info import SrcMetaInfo
    from ipercore_tpu.utils.video import is_video_file

    opt = setup(None, [])
    opt.image_size = args.image_size
    opt.output_dir = args.output_dir
    opt.preproc_smoke = args.smoke

    entries = sorted(os.listdir(args.raw_dir))
    names = []
    for e in entries:
        path = os.path.join(args.raw_dir, e)
        if not (os.path.isdir(path) or is_video_file(path)):
            continue
        name = os.path.splitext(e)[0]
        meta = SrcMetaInfo(path=path, name=name)
        print(f"[prepare] {name}", flush=True)
        info = preprocess_one(opt, meta, is_src=True)
        if info.get_array("smpls") is not None:
            names.append(name)

    n_val = max(1, int(len(names) * args.val_frac)) if len(names) > 1 else 0
    train, val = names[n_val:], names[:n_val]
    os.makedirs(args.output_dir, exist_ok=True)
    with open(os.path.join(args.output_dir, "train.txt"), "w") as f:
        f.write("\n".join(train) + "\n")
    with open(os.path.join(args.output_dir, "val.txt"), "w") as f:
        f.write("\n".join(val) + "\n")
    print(f"[prepare] done: {len(train)} train / {len(val)} val")


if __name__ == "__main__":
    main()
