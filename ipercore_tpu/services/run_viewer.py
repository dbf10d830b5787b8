"""Novel-view / bullet-time synthesis service.

Rebuilds `iPERCore/services/run_viewer.py` (novel_view:17, run_viewer:96):
build a 180-frame 360-degree rotation ring of SMPLs (T-pose or source pose)
and run the same synthesis machinery as the imitator.
"""
from __future__ import annotations

import os

import numpy as np

from ipercore_tpu.services.meta_info import MetaProcess, parse_src_input
from ipercore_tpu.services.run_imitator import build_runtime, imitate_sequence, load_source_cache
from ipercore_tpu.utils import video as vid


def novel_view(opt) -> list[str]:
    """`novel_view:17`: per source, synthesize the rotation ring."""
    import jax.numpy as jnp

    from ipercore_tpu.models import imitator as imit

    model, comp, gen, params = build_runtime(opt)
    outputs = []
    for src_meta in parse_src_input(opt.src_path):
        cache, src, offsets, links_ids = load_source_cache(opt, comp, gen, params, src_meta)
        base = jnp.asarray(np.asarray(src["smpls"][0], np.float32))
        smpls = imit.make_novel_view_smpls(
            base, n_frames=int(opt.get("view_frames", 180)),
            use_t_pose=bool(opt.get("T_pose", False)))
        # Camera stabilize + swap, same as `Viewer.inference` (ref
        # `imitator.py:420-423` + run_viewer.py:79 cam_strategy="smooth").
        smpls = imit.prepare_target_smpls(
            comp.model, cache, np.asarray(smpls),
            cam_strategy=str(opt.get("cam_strategy", "smooth")))
        frames = imitate_sequence(comp, gen, params, cache, smpls,
                                  offsets=jnp.asarray(offsets), links_ids=links_ids)
        out_dir = MetaProcess(
            f"{src_meta.name}-novel_view", opt.output_dir).make_dirs().synthesis_dir
        paths = []
        for i, f in enumerate(frames):
            p = os.path.join(out_dir, f"pred_{i:08d}.png")
            vid.save_image(p, f)
            paths.append(p)
        # make_video falls back to cv2 itself — no has_ffmpeg() gate
        try:
            mp4 = os.path.join(out_dir, "novel_view.mp4")
            vid.make_video(paths, mp4, fps=25)
            outputs.append(mp4)
        except Exception:
            outputs.append(out_dir)
    return outputs


def run_viewer(opt) -> list[str]:
    """`run_viewer:96`: preprocess -> personalize -> novel_view."""
    from ipercore_tpu.services.preprocess import preprocess
    from ipercore_tpu.services.personalization import personalize

    preprocess(opt)
    personalize(opt)
    return novel_view(opt)


def main(argv=None):  # pragma: no cover
    from ipercore_tpu.services.options import parse_args

    return run_viewer(parse_args(argv))


if __name__ == "__main__":  # pragma: no cover
    main()
