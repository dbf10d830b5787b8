"""Motion-imitation service: preprocess -> personalize -> imitate.

Rebuilds `iPERCore/services/run_imitator.py` (call_imitator_inference:19,
imitate:87, run_imitator:185). The per-frame python loop + per-frame png write
of the reference becomes chunked, jitted frame-batch synthesis with async host
writes; SMPL sequences are smoothed on host, effects applied, hands padded.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ipercore_tpu.services.meta_info import MetaProcess, parse_ref_input, parse_src_input, checkpoints_dir
from ipercore_tpu.services.process_info import ProcessInfo
from ipercore_tpu.utils import video as vid
from ipercore_tpu.utils.smoothing import temporal_smooth_smpls


def build_runtime(opt, part_masks: Optional[list] = None):
    """Construct the model/composer/generator rig from an options AttrDict.

    Loads the real SMPL pickle when `opt.smpl_model` exists, else the synthetic
    stand-in; generator weights come from `personalized.npz` if present.
    """
    import jax
    import jax.numpy as jnp

    from ipercore_tpu.models import smpl as smpl_mod
    from ipercore_tpu.models import flow_composition as fc
    from ipercore_tpu.models.mesh import load_assets
    from ipercore_tpu.models.networks import build_generator
    from ipercore_tpu.utils.checkpoint import load_params, save_params  # noqa: F401

    model = smpl_mod.resolve_body_model(opt)
    if opt.get("smoke_model", False):
        assets = load_assets(model, uv_map_path="/nonexistent", part_path="/nonexistent")
    else:
        assets = load_assets(model)
    comp = fc.make_composer(
        model, assets,
        image_size=int(opt.image_size),
        bg_ks=int(opt.get("bg_ks", 11)),
        conf_erode_ks=int(opt.get("conf_erode_ks", 3)),
        out_dilate_ks=int(opt.get("out_dilate_ks", 51)),
        only_vis=bool(opt.get("only_vis", False)),
    )
    gen = build_generator(opt.get("gen_name", "AttLWB-SPADE"), opt.Generator,
                          temporal=bool(opt.get("temporal", False)),
                          # TPU throughput knob (docs/BENCHMARKS.md): 2 =
                          # strided LWB feature warps, ~1.24x fps at 512^2
                          feat_warp_stride=int(opt.get("feat_warp_stride", 1)))

    S = int(opt.image_size)
    ns = int(opt.num_source)
    bg = jnp.zeros((1, 1, S, S, 4))
    src = jnp.zeros((1, ns, S, S, 6))
    tsf = jnp.zeros((1, 1, S, S, 6))
    Tst = jnp.zeros((1, 1, ns, S, S, 2))
    params = jax.jit(
        lambda r: gen.init(r, bg, src, tsf, Tst, None, False))(jax.random.PRNGKey(0))

    ckpt_dir = checkpoints_dir(opt.output_dir, opt.model_id)
    personalized = os.path.join(ckpt_dir, "personalized.npz")
    if os.path.exists(personalized):
        params = load_params(personalized, like=params)

    return model, comp, gen, params


def imitate_sequence(
    comp, gen, params, cache, tgt_smpls: np.ndarray,
    chunk: int = 16, temporal: bool = False,
    offsets=0.0, links_ids=None, compute_dtype="auto",
):
    """Run frame synthesis in jitted chunks — replaces the per-frame loop
    (`imitator.py:328-397`). Returns (N, S, S, 3) float frames in [-1, 1].

    compute_dtype: "auto" uses bfloat16 for the generator on TPU (f32
    geometry), None forces full f32, or pass an explicit dtype."""
    import jax
    import jax.numpy as jnp

    from ipercore_tpu.models import imitator as imit

    if compute_dtype == "auto":
        compute_dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else None

    n = len(tgt_smpls)
    if temporal:
        preds, _ = imit.synthesize_frames_temporal(
            comp, gen, params, cache, jnp.asarray(tgt_smpls), offsets, links_ids)
        return np.asarray(preds)

    pad = (-n) % chunk
    padded = np.concatenate([tgt_smpls, np.repeat(tgt_smpls[-1:], pad, axis=0)], axis=0) \
        if pad else tgt_smpls

    @jax.jit
    def run(p, c, s):
        return imit.synthesize_frames(comp, gen, p, c, s, offsets, links_ids,
                                      compute_dtype=compute_dtype)

    outs = []
    for i in range(0, len(padded), chunk):
        preds, _ = run(params, cache, jnp.asarray(padded[i:i + chunk]))
        outs.append(np.asarray(preds))
    return np.concatenate(outs, axis=0)[:n]


def load_source_cache(opt, comp, gen, params, src_meta, proc_dir: Optional[str] = None):
    """Deserialize a source's ProcessInfo, load its frames/masks, and build the
    SourceCache — `get_src_info_for_inference` (`base_runner.py:154`) +
    `Imitator.source_setup`."""
    import jax
    import jax.numpy as jnp

    from ipercore_tpu.models import imitator as imit

    proc_dir = proc_dir or MetaProcess(src_meta.name, opt.output_dir).processed_dir
    info = ProcessInfo.deserialize(proc_dir)
    src = info.read_src_info(num_source=int(opt.num_source))
    S = int(opt.image_size)

    img_dir = os.path.join(proc_dir, "images")
    imgs = []
    for name in src["img_names"]:
        imgs.append(vid.load_image(os.path.join(img_dir, name), size=S))
    src_img = jnp.asarray(np.stack(imgs))[None]  # (1, ns, S, S, 3)

    masks = None
    mask_arr = info.get_array("masks")
    if mask_arr is not None:
        masks = jnp.asarray(mask_arr[src["src_ids"]].astype(np.float32))[None]
        if masks.ndim == 4:
            masks = masks[..., None]

    bg_img = None
    if src_meta.bg_path and os.path.exists(src_meta.bg_path):
        bg_img = jnp.asarray(vid.load_image(src_meta.bg_path, size=S))[None]
    else:
        # Prefer the preprocessed background (stage 1.6: real pixels where
        # visible + two-stage inpaint under the person) over the BGNet
        # forward: personalization explicitly supervises BGNet TOWARD this
        # image (`personalization.make_personalized_batches` "bg" target),
        # so compositing with the target itself is strictly closer to the
        # supervision and stays photo-crisp where the scene was observed.
        # BGNet remains the fallback (e.g. train-time aug-bg, missing file)
        # and the only path the swapper's non-primary sources ever hit.
        proc_bg = os.path.join(proc_dir, "background.png")
        if os.path.exists(proc_bg):
            bg_img = jnp.asarray(vid.load_image(proc_bg, size=S))[None]

    V = comp.model.v_template.shape[0]
    offsets = src["offsets"]
    if offsets is None or offsets.shape[0] != V:
        offsets = np.zeros((V, 3), np.float32)
    offsets = offsets.astype(np.float32)
    links = src["links_ids"]
    links_ids = jnp.asarray(links) if links is not None else None

    cache = jax.jit(
        lambda p, si, ss: imit.setup_source(
            comp, gen, p, si, ss, masks=masks, bg_img=bg_img,
            offsets=jnp.asarray(offsets), links_ids=links_ids)
    )(params, src_img, jnp.asarray(src["smpls"].astype(np.float32))[None])
    return cache, src, offsets, links_ids


def imitate(opt) -> list[str]:
    """The imitation stage — `imitate` (`run_imitator.py:87-182`): for every
    (source, reference) pair, smooth the reference SMPLs, apply effects, run
    synthesis, write frames + mp4."""
    import jax.numpy as jnp

    from ipercore_tpu.models import imitator as imit

    model, comp, gen, params = build_runtime(opt)
    src_metas = parse_src_input(opt.src_path)
    ref_metas = parse_ref_input(opt.ref_path)

    outputs = []
    for src_meta in src_metas:
        cache, src, offsets, links_ids = load_source_cache(opt, comp, gen, params, src_meta)
        src_proc = MetaProcess(src_meta.name, opt.output_dir).processed_dir
        src_imgs = [vid.load_image(os.path.join(src_proc, "images", n),
                                   size=int(opt.image_size))
                    for n in src["img_names"]]
        for ref_meta in ref_metas:
            # fps/audio from the reference video when not explicit
            # (`meta_info.py:288-303`)
            ref_meta.resolve_media(opt.output_dir)
            proc_dir = MetaProcess(ref_meta.name, opt.output_dir).processed_dir
            pinfo = ProcessInfo.deserialize(proc_dir)
            ref_info = pinfo.read_ref_info()
            smpls = np.asarray(ref_info["smpls"], np.float32)

            smpls = temporal_smooth_smpls(smpls, ref_meta.pose_fc, ref_meta.cam_fc)

            if "View" in ref_meta.effect:
                smpls = np.asarray(imit.add_view_effect(jnp.asarray(smpls), ref_meta.effect["View"]))
            for frame, dur in ref_meta.effect.get("BT", []):
                smpls = np.asarray(imit.add_bullet_time_effect(jnp.asarray(smpls), [frame], dur))

            # Camera swap + stabilization: output framing follows the SOURCE
            # camera (`imitator.py:248-258,337-341`).
            smpls = imit.prepare_target_smpls(
                comp.model, cache, smpls,
                cam_strategy=str(opt.get("cam_strategy", "smooth")))

            frames = imitate_sequence(
                comp, gen, params, cache, smpls,
                temporal=bool(opt.get("temporal", False)),
                offsets=jnp.asarray(offsets), links_ids=links_ids)

            out_dir = MetaProcess(
                f"{src_meta.name}-{ref_meta.name}", opt.output_dir).make_dirs().synthesis_dir
            paths = []
            for i, f in enumerate(frames):
                p = os.path.join(out_dir, f"pred_{i:08d}.png")
                vid.save_image(p, f)
                paths.append(p)

            # fused src | ref | out deliverable —
            # `fuse_source_reference_output` (`multimedia/video.py:404-528`)
            ref_names = pinfo.meta.get("valid_img_names", [])
            fused_paths = []
            if ref_names:
                src_panel = np.concatenate(src_imgs, axis=1)
                for i, f in enumerate(frames):
                    rn = ref_names[min(i, len(ref_names) - 1)]
                    ref_img = vid.load_image(os.path.join(proc_dir, "images", rn),
                                             size=int(opt.image_size))
                    fused = vid.fuse_side_by_side([[src_panel, ref_img, f]])
                    fp = os.path.join(out_dir, f"fused_{i:08d}.png")
                    vid.save_image(fp, fused)
                    fused_paths.append(fp)

            # make_video falls back to the cv2 encoder when ffmpeg is absent
            mp4 = os.path.join(out_dir, "imitation.mp4")
            try:
                vid.make_video(paths, mp4, fps=ref_meta.fps, audio_path=ref_meta.audio)
                if fused_paths:
                    vid.make_video(fused_paths,
                                   os.path.join(out_dir, "imitation_fused.mp4"),
                                   fps=ref_meta.fps, audio_path=ref_meta.audio)
                outputs.append(mp4)
            except Exception:
                outputs.append(out_dir)
    return outputs


def run_imitator(opt) -> list[str]:
    """3-stage pipeline — `run_imitator:185`: preprocess -> personalize -> imitate."""
    from ipercore_tpu.services.preprocess import preprocess
    from ipercore_tpu.services.personalization import personalize

    preprocess(opt)
    personalize(opt)
    return imitate(opt)


def main(argv=None):  # pragma: no cover - CLI shim
    from ipercore_tpu.services.options import parse_args

    opt = parse_args(argv)
    return run_imitator(opt)


if __name__ == "__main__":  # pragma: no cover
    main()
