"""Background-subtraction pseudo-masks for the person segmenter (seg v8).

The r4/r5 segmenter is box-good but mask-thin (measured r5: real mask IoU
0.26-0.47, in-poly coverage 0.34-0.68 — `eval_real_photos --mask`). The
bundled driving video is STATIC-CAMERA, so a temporal median background
model gives near-ground-truth foreground masks for free — exactly the
supervision the thin-mask problem needs, in the exact full-frame work
resolution the production segmenter consumes (`SegmentationDetector.work`).

Per frame < 160 (the select side; the val band and stills never enter):
median background over the clip -> per-pixel color distance -> threshold +
morphological close -> largest connected component. Frames whose mask is
non-compact or implausibly sized are dropped.

Usage: python scripts/pseudo_label_seg.py  # -> .cache/pseudo_pose/akun_seg.npz
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = os.path.join(REPO, ".cache", "pseudo_pose", "akun_seg.npz")
VAL_BAND_START = 160


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", type=int, default=256)
    ap.add_argument("--thr", type=float, default=0.15,
                    help="color-distance threshold in [-1,1] units")
    ap.add_argument("--out", type=str, default=OUT)
    ap.add_argument("--report", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".cache", "jax_compilation"))
    from PIL import Image

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from eval_real_photos import FRAME_DIR, ensure_frames

    from ipercore_tpu.tools.detection import mask_is_compact
    from ipercore_tpu.ops.morphology import dilate, erode

    frames_idx = list(range(VAL_BAND_START))
    ensure_frames(frames_idx)
    W = args.work
    imgs = []
    for i in frames_idx:
        im = Image.open(os.path.join(FRAME_DIR, f"akun_{i:04d}.png")).convert("RGB")
        arr = np.asarray(im, np.float32) / 127.5 - 1.0
        imgs.append(np.asarray(jax.image.resize(
            jnp.asarray(arr[None]), (1, W, W, 3), "linear"))[0])
    imgs = np.stack(imgs)
    bg = np.median(imgs, axis=0)

    dist = np.linalg.norm(imgs - bg[None], axis=-1)  # (N, W, W)
    fg = (dist > args.thr).astype(np.float32)[..., None]
    # close small holes, trim speckle
    fg = np.asarray(erode(dilate(jnp.asarray(fg), 5), 5))
    fg = np.asarray(dilate(erode(jnp.asarray(fg), 3), 3))

    from scipy import ndimage as ndi

    # pose-consistency gate: the self-trained pose labels give per-frame
    # joints; a mask that misses detected joints (gray pants melting into
    # the tan floor cuts legs off) would teach exactly the thin-mask
    # failure this script exists to fix
    joints_px = {}
    pose_npz = os.path.join(os.path.dirname(args.out), "akun_pseudo.npz")
    if os.path.exists(pose_npz):
        pd = np.load(pose_npz, allow_pickle=True)
        for f, kps, val, org in zip(pd["frames"], pd["kps_ndc"],
                                    pd["valid"], pd["origins"]):
            px = (kps + 1.0) * 0.5 * org[2] + org[:2]  # frame px (1920x1080)
            sel = val > 0
            joints_px[int(f)] = px[sel] * np.asarray([W / 1920.0, W / 1080.0])

    keep, masks = [], []
    for i in range(len(imgs)):
        m = fg[i, ..., 0] > 0.5
        # LARGEST connected component only (the logo/decal smears in the
        # top corners also move slightly between frames and would survive a
        # keep-all-boxes policy), then fill interior holes — the person
        # stands near frame center all clip, so the median background
        # contains person colors there and distance drops out inside the
        # torso
        lab, n = ndi.label(m)
        if n == 0:
            continue
        sizes = ndi.sum(m, lab, index=np.arange(1, n + 1))
        m = lab == (1 + int(np.argmax(sizes)))
        m = ndi.binary_fill_holes(m)
        frac = m.mean()
        if not (0.02 < frac < 0.5) or not mask_is_compact(m):
            continue
        jp = joints_px.get(int(frames_idx[i]))
        if jp is not None and len(jp):
            md = ndi.binary_dilation(m, iterations=3)
            xi = np.clip(jp.astype(int), 0, W - 1)
            inside = md[xi[:, 1], xi[:, 0]].mean()
            if inside < 0.9:
                continue
        keep.append(i)
        masks.append(m)
    stats = {"n_frames": len(imgs), "kept": len(keep),
             "mean_mask_frac": round(float(np.mean([m.mean() for m in masks])), 4)
             if masks else 0.0, "work": W, "thr": args.thr}
    print(json.dumps(stats), flush=True)
    if args.report or not keep:
        return
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    np.savez_compressed(
        args.out,
        imgs=imgs[keep].astype(np.float16),
        masks=np.stack(masks).astype(np.uint8),
        frames=np.asarray(frames_idx)[keep], meta=json.dumps(stats))
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
