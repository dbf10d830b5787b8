"""Appearance-transfer (swap) service.

Rebuilds `iPERCore/services/run_swapper.py` (merge_all_source_processed_info:13,
swap:38, run_swapper:132): merge N source people's caches with per-part face
selection (primary person gets the leftover faces), then run the imitation
machinery with the merged cache.
"""
from __future__ import annotations

import os

import numpy as np

from ipercore_tpu.services.meta_info import MetaProcess, parse_ref_input, parse_src_input
from ipercore_tpu.services.process_info import ProcessInfo
from ipercore_tpu.services.run_imitator import build_runtime, imitate_sequence, load_source_cache
from ipercore_tpu.utils import video as vid
from ipercore_tpu.utils.smoothing import temporal_smooth_smpls


def swap(opt) -> list[str]:
    """`swap:38`: merge sources by parts, imitate references."""
    import jax.numpy as jnp

    from ipercore_tpu.models import imitator as imit
    from ipercore_tpu.models.mesh import part_face_mask

    model, comp, gen, params = build_runtime(opt)
    src_metas = parse_src_input(opt.src_path)
    ref_metas = parse_ref_input(opt.ref_path)

    caches, masks = [], []
    claimed = None
    # non-primary people claim their parts; primary (first) gets the leftovers
    # (`imitator.py:502-547` semantics)
    for i, meta in enumerate(src_metas):
        cache, src, offsets, links_ids = load_source_cache(opt, comp, gen, params, meta)
        caches.append(cache)
        if i == 0:
            masks.append(None)  # resolved after the others claim
        else:
            m = part_face_mask(comp.assets, meta.parts)
            masks.append(m)
            claimed = m if claimed is None else (claimed | m)
    leftover = (~claimed) if claimed is not None else part_face_mask(comp.assets, ["all"])
    masks[0] = leftover

    merged = imit.merge_source_caches(comp, caches, masks)

    outputs = []
    names = "+".join(m.name for m in src_metas)
    for ref_meta in ref_metas:
        proc_dir = MetaProcess(ref_meta.name, opt.output_dir).processed_dir
        ref_info = ProcessInfo.deserialize(proc_dir).read_ref_info()
        smpls = temporal_smooth_smpls(
            np.asarray(ref_info["smpls"], np.float32), ref_meta.pose_fc, ref_meta.cam_fc)
        # Cam swap/stabilize vs the primary person's camera —
        # `call_imitator_inference` passes `opt.cam_strategy` (run_swapper.py:108).
        smpls = imit.prepare_target_smpls(
            comp.model, merged, smpls,
            cam_strategy=str(opt.get("cam_strategy", "smooth")))
        frames = imitate_sequence(comp, gen, params, merged, smpls)
        out_dir = MetaProcess(
            f"{names}-{ref_meta.name}-swap", opt.output_dir).make_dirs().synthesis_dir
        paths = []
        for i, f in enumerate(frames):
            p = os.path.join(out_dir, f"pred_{i:08d}.png")
            vid.save_image(p, f)
            paths.append(p)
        # make_video has its own cv2 fallback on ffmpeg-less hosts — do not
        # gate on has_ffmpeg() (it skipped encoding entirely on this box)
        try:
            mp4 = os.path.join(out_dir, "swap.mp4")
            vid.make_video(paths, mp4, fps=ref_meta.fps, audio_path=ref_meta.audio)
            outputs.append(mp4)
        except Exception:
            outputs.append(out_dir)
    return outputs


def run_swapper(opt) -> list[str]:
    """`run_swapper:132`: preprocess -> personalize -> swap."""
    from ipercore_tpu.services.preprocess import preprocess
    from ipercore_tpu.services.personalization import personalize

    preprocess(opt)
    personalize(opt)
    return swap(opt)


def main(argv=None):  # pragma: no cover
    from ipercore_tpu.services.options import parse_args

    return run_swapper(parse_args(argv))


if __name__ == "__main__":  # pragma: no cover
    main()
