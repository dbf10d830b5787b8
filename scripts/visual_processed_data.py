"""Inspect a processed dataset by rendering flow-composition inputs to PNGs.

Role of `scripts/train/visual_processed_data.py` (reference: live visdom
panels of `FlowCompositionForTrainer.forward` outputs). Headless TPU-native
version: for each sampled batch, write a grid png per sample —
src | target | uv image | tsf condition | masked src — so a dataset
preprocessed by `services.preprocess` can be eyeballed before training.

Usage:
  python scripts/visual_processed_data.py --dataset_dir <root> \
      --out_dir ./inspect [--num_batches 4] [--image_size 256]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset_dir", required=True, nargs="+")
    ap.add_argument("--out_dir", default="./inspect_processed")
    ap.add_argument("--image_size", type=int, default=256)
    ap.add_argument("--num_source", type=int, default=2)
    ap.add_argument("--time_step", type=int, default=2)
    ap.add_argument("--num_batches", type=int, default=4)
    ap.add_argument("--smoke_model", action="store_true")
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    from ipercore_tpu.data import build_dataset
    from ipercore_tpu.models import flow_composition as fc
    from ipercore_tpu.models import smpl as smpl_mod
    from ipercore_tpu.models.mesh import load_assets
    from ipercore_tpu.utils import video as vid

    S = args.image_size
    ns = args.num_source
    model = (smpl_mod.synthetic_model(nu=20, nv=18) if args.smoke_model
             else smpl_mod.resolve_body_model(None))
    assets = load_assets(model)
    comp = fc.make_composer(model, assets, image_size=S, out_dilate_ks=11)

    ds = build_dataset("ProcessedVideo", dataset_dirs=args.dataset_dir,
                       image_size=S, num_source=ns, time_step=args.time_step)
    if len(ds) == 0:
        print("no processed videos found under", args.dataset_dir)
        return 1
    os.makedirs(args.out_dir, exist_ok=True)

    it = ds.iterate(batch_size=1)
    for b in range(args.num_batches):
        batch = next(it)
        images = jnp.asarray(batch["images"])
        smpls = jnp.asarray(batch["smpls"])
        masks = jnp.asarray(batch["masks"])
        out = fc.forward(comp, images[:, :ns], images[:, ns:],
                         smpls[:, :ns], smpls[:, ns:],
                         src_mask=masks[:, :ns], ref_mask=masks[:, ns:])
        src = np.asarray(images[0, 0])
        tgt = np.asarray(images[0, ns])
        uv = np.asarray(out["uv_img"][0]) if "uv_img" in out else np.zeros_like(src)
        tsf_cond = np.asarray(out["input_G_tsf"][0, 0, ..., 3:6])
        masked_src = np.asarray(out["input_G_bg"][0, 0, ..., :3])
        row = [src, tgt, uv, tsf_cond, masked_src]
        grid = vid.fuse_side_by_side([row])
        path = os.path.join(args.out_dir, f"batch_{b:03d}.png")
        vid.save_image(path, grid)
        print("wrote", path)
    print("inspection grids in", args.out_dir)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
