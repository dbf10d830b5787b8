"""Preprocessing service: video/images -> ProcessInfo manifest.

Rebuilds `iPERCore/services/preprocess.py` (human_estimate:227,
digital_deform:279, post_update_opt:330, preprocess:383) and the 7-stage
pipeline of `tools/processors/base_preprocessor.py:39`. The reference fans out
one OS process per GPU; on TPU the perception models are jitted frame-batched
stages run sequentially per input (stage-level resume via ProcessInfo).

Stages: 1 detect -> 2 crop -> 3 pose3d (SPIN+SMPLify) -> 4 matting ->
5 find-front -> 6 background inpaint -> 7 (visual). Each stage serializes the
manifest so a crash resumes at stage granularity (SURVEY.md §5).

When the perception checkpoints are unavailable (no network in this
environment), the pipeline still runs end-to-end with geometry-driven
fallbacks: untrained detectors degrade to full-frame boxes, the pose stage to
camera-centered default SMPLs, and matting to the SMPL-silhouette mask. The
stage structure/API is the product surface; converted torch weights drop in
via `ipercore_tpu.utils.checkpoint.convert_torch_state_dict`.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ipercore_tpu.services.meta_info import MetaProcess, parse_ref_input, parse_src_input
from ipercore_tpu.services.process_info import ProcessInfo
from ipercore_tpu.utils import video as vid


def _collect_frames(path: str, out_dir: str) -> list[str]:
    """Video -> frame pngs; image folder/file -> copied list."""
    os.makedirs(out_dir, exist_ok=True)
    if os.path.isdir(path):
        frames = vid.list_frames(path)
    elif vid.is_video_file(path):
        # video2frames prefers ffmpeg, falls back to cv2 on this box
        return vid.video2frames(path, out_dir)
    elif os.path.isfile(path):
        frames = [path]
    else:
        frames = []
    out = []
    for i, f in enumerate(frames):
        dst = os.path.join(out_dir, f"frame_{i:08d}.png")
        if not os.path.exists(dst):
            img = vid.load_image(f)
            vid.save_image(dst, img)
        out.append(dst)
    return out


def _prepare_one(opt, meta) -> tuple[ProcessInfo, Optional[list[str]]]:
    """Host-side prep for one input: dirs + manifest + frame extraction.

    Pure host IO (ffmpeg/PNG decode) — safe to run concurrently across
    inputs; returns `frames=None` when the input is already processed."""
    mp = MetaProcess(meta.name, opt.output_dir).make_dirs()
    info = ProcessInfo.deserialize(mp.processed_dir)
    info.name = meta.name
    info.meta["name"] = meta.name
    if info.check_has_been_processed():
        return info, None
    raw_dir = os.path.join(mp.processed_dir, "raw")
    return info, _collect_frames(meta.path, raw_dir)


def preprocess_one(opt, meta, is_src: bool, pre=None) -> ProcessInfo:
    """Run all stages for one input — `Preprocessor.execute`
    (`base_preprocessor.py:39-165`)."""
    from ipercore_tpu.tools.preprocessor import Preprocessor

    info, frames = _prepare_one(opt, meta)
    if frames is None:
        return info
    if not frames:
        info.serialize()
        return info
    if pre is None:
        pre = Preprocessor(image_size=int(opt.image_size),
                           smoke=bool(opt.get("preproc_smoke", False)))
    mp = MetaProcess(meta.name, opt.output_dir)
    pre.execute(info, frames, os.path.join(mp.processed_dir, "images"), is_src=is_src)
    info.serialize()
    return info


def human_estimate(opt) -> None:
    """`human_estimate:227`: run the stage pipeline over all src + ref inputs.

    The reference fans one consumer process per GPU
    (`preprocess.py:human_estimate:227-268`); with a single TPU chip the
    device stages stay serialized, but the host-bound prep (video decode,
    frame PNG io) of ALL inputs runs concurrently in a thread pool and
    overlaps the device stages of earlier inputs."""
    from concurrent.futures import ThreadPoolExecutor

    from ipercore_tpu.tools.preprocessor import Preprocessor

    metas = [(m, True) for m in parse_src_input(opt.src_path) if m.path]
    metas += [(m, False) for m in parse_ref_input(opt.ref_path) if m.path]
    if not metas:
        return

    workers = max(1, int(opt.get("preproc_workers", 4)))
    pre = None
    with ThreadPoolExecutor(max_workers=workers) as ex:
        futs = [ex.submit(_prepare_one, opt, m) for m, _ in metas]
        for (meta, is_src), fut in zip(metas, futs):
            info, frames = fut.result()
            if frames is None:
                continue
            if not frames:
                info.serialize()
                continue
            if pre is None:
                pre = Preprocessor(image_size=int(opt.image_size),
                                   smoke=bool(opt.get("preproc_smoke", False)))
            mp = MetaProcess(meta.name, opt.output_dir)
            pre.execute(info, frames, os.path.join(mp.processed_dir, "images"),
                        is_src=is_src)
            info.serialize()


def digital_deform(opt) -> None:
    """`digital_deform:279`: cloth-link / silhouette offsets for src inputs.

    Reference order (`HumanDigitalDeformConsumer.run:119-165`): first try the
    SCHP skirt/dress cloth-link finder; only when no cloth is found fall back
    to the 500-step silhouette offset fit. The SCHP path needs converted
    weights (`opt.schp_weights` npz) — absent those, the silhouette fit runs
    for every source (the parser's random filters would produce garbage)."""
    from ipercore_tpu.tools.deformers import (
        find_cloth_links_schp, run_sil2smpl_offsets)
    from ipercore_tpu.tools.parsers import build_parser

    parser = build_parser(opt.get("schp_weights") or None)

    for meta in parse_src_input(opt.src_path):
        if not meta.path:
            continue
        mp = MetaProcess(meta.name, opt.output_dir)
        info = ProcessInfo.deserialize(mp.processed_dir)
        if info.has_run("deform") or not info.has_run("pose3d"):
            continue
        found = False
        if parser is not None:
            from ipercore_tpu.models import smpl as smpl_mod

            img_dir = os.path.join(mp.processed_dir, "images")
            frames = vid.list_frames(img_dir) if os.path.isdir(img_dir) else []
            smpls = info.get_array("smpls")
            if frames and smpls is not None and len(smpls):
                model = smpl_mod.resolve_body_model(opt)
                found, links = find_cloth_links_schp(
                    parser, vid.load_image(frames[0]), smpls[0], model)
                if found:
                    info.set_array("links_ids", links.astype(np.int64))
        if not found:
            offsets = run_sil2smpl_offsets(opt, info)
            info.set_array("offsets", offsets)
        info.mark_run("deform")
        info.serialize()


def post_update_opt(opt) -> None:
    """`post_update_opt:330-380`: drop failed inputs from opt, clamp
    num_source to the valid-source count, write personalization.txt.

    Reference semantics: a source is valid iff all preprocessing stages ran;
    `num_source = min(opt.num_source, max over valid sources of available
    source frames)`; invalid inputs are REMOVED from opt.src_path (round 1
    kept them and clamped num_source from the frame count of every source,
    valid or not)."""
    from ipercore_tpu.services.meta_info import checkpoints_dir

    metas = parse_src_input(opt.src_path)
    valid, cur_num_source = [], 1
    for meta in metas:
        mp = MetaProcess(meta.name, opt.output_dir)
        info = ProcessInfo.deserialize(mp.processed_dir)
        smpls = info.get_array("smpls")
        if info.check_has_been_processed() and smpls is not None and len(smpls):
            valid.append(meta)
            cur_num_source = max(cur_num_source, len(smpls))
    if valid:
        opt.src_path = "|".join(m.to_str() for m in valid)
    opt.num_source = min(int(opt.num_source), cur_num_source)

    # `personalization.txt` lists the usable primitives dirs (`:364-368`)
    ckpt_dir = checkpoints_dir(opt.output_dir, opt.model_id)
    os.makedirs(ckpt_dir, exist_ok=True)
    with open(os.path.join(ckpt_dir, "personalization.txt"), "w") as f:
        for meta in valid:
            f.write(MetaProcess(meta.name, opt.output_dir).primitives_dir + "\n")

    ref_valid = []
    for meta in parse_ref_input(opt.ref_path):
        info = ProcessInfo.deserialize(MetaProcess(meta.name, opt.output_dir).processed_dir)
        if info.check_has_been_processed():
            ref_valid.append(meta)
    if ref_valid:
        opt.ref_path = "|".join(m.to_str() for m in ref_valid)


def preprocess(opt) -> None:
    """`preprocess:383`: estimate -> deform -> update opt."""
    human_estimate(opt)
    digital_deform(opt)
    post_update_opt(opt)
