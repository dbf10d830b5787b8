"""Inference runners: Imitator / Viewer / Swapper as functional pipelines.

TPU-native rebuild of `iPERCore/models/imitator.py` (Imitator:130, Viewer:404,
Swapper:468) and `base_model.py:8-95`. The reference holds mutable module state
and loops frames in python (`imitator.py:341`); here:

  * `setup_source()` produces an immutable `SourceCache` (encoded SIDNet
    features, merged UV image, background) — computed once per subject;
  * `synthesize_frames()` is a pure jitted function mapping a *batch* of target
    SMPLs to frames, so the frame axis is MXU-batched and can be sharded
    across chips (`ipercore_tpu/parallel/inference.py`);
  * temporal mode threads a FIFO of previous predictions through `lax.scan`
    (replacing `TemporalFIFO`, `imitator.py:18-127`).
"""
from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ipercore_tpu.models import smpl as smpl_mod
from ipercore_tpu.models import flow_composition as fc
from ipercore_tpu.ops import rasterizer as rz


def use_csr_raster() -> bool:
    """CSR (sort-binned, manual-DMA) raster kernel for the fused raster+flow
    pass — ~4x cheaper binning than the top_k table path. Opt-out escape
    hatch: IPERCORE_CSR_RASTER=0."""
    import os

    return os.environ.get("IPERCORE_CSR_RASTER", "1") != "0"


class SourceCache(NamedTuple):
    """Everything the per-frame loop needs about the source subject.

    src_enc_outs / src_res_outs: tuples of (1, ns, h_i, w_i, c_i) SIDNet stages;
    uv_img: (1, S, S, 3); bg_img: (1, S, S, 3);
    src_f2pts: (1*ns, F, 3, 2) flow sources (vis-filtered per config);
    src_info: rendered source geometry (kept for swapper part re-selection).
    """

    src_enc_outs: tuple
    src_res_outs: tuple
    uv_img: jnp.ndarray
    bg_img: jnp.ndarray
    src_f2pts: jnp.ndarray
    src_cam: jnp.ndarray
    src_shape: jnp.ndarray


def setup_source(
    comp: fc.FlowComposer,
    generator,
    params,
    src_img: jnp.ndarray,
    src_smpl: jnp.ndarray,
    masks: Optional[jnp.ndarray] = None,
    bg_img: Optional[jnp.ndarray] = None,
    offsets: jnp.ndarray | float = 0.0,
    links_ids: Optional[jnp.ndarray] = None,
    part_mask: Optional[jnp.ndarray] = None,
) -> SourceCache:
    """One-time source processing — `Imitator.source_setup` (`imitator.py:178-328`).

    Args:
        src_img: (1, ns, S, S, 3) in [-1, 1]; src_smpl: (1, ns, 85);
        masks: optional (1, ns, S, S, 1), background=1;
        bg_img: optional provided background (1, S, S, 3); otherwise BGNet
            inpaints it;
        part_mask: optional (F,) bool to restrict flows (swapper).
    """
    bs, ns = src_img.shape[0], src_img.shape[1]
    S = comp.image_size

    details = smpl_mod.get_details(comp.model, src_smpl.reshape(bs * ns, -1), offsets, links_ids)
    m_flat = masks.reshape(bs * ns, S, S, 1) if masks is not None else None
    src_info = fc.render_smpl_info(
        comp, details["verts"], details["cam"], masks=m_flat, use_morph=True, get_uv_info=True)
    if m_flat is not None:
        src_info["masks"] = m_flat

    uv_img, input_G_bg, input_G_src = fc.process_source(comp, src_img, src_info)

    if bg_img is None:
        bg = generator.apply(params, input_G_bg, method=generator.forward_bg)[:, 0]
    else:
        bg = bg_img

    enc_outs, res_outs = generator.apply(
        params, input_G_src, True, method=generator.forward_src)

    if part_mask is not None:
        src_info = fc.add_selected_f2pts(src_info, part_mask)
        f2pts = src_info["selected_f2pts"]
    else:
        f2pts = src_info["only_vis_f2pts"] if comp.only_vis else src_info["f2pts"]

    return SourceCache(
        src_enc_outs=tuple(enc_outs),
        src_res_outs=tuple(res_outs),
        uv_img=uv_img,
        bg_img=bg,
        src_f2pts=f2pts,
        src_cam=details["cam"],
        src_shape=details["shape"],
    )


def infer_foot_y(model, smpls: np.ndarray, chunk: int = 64) -> np.ndarray:
    """Per-frame max body-vertex y (screen-down = lowest point) from the SMPL
    forward pass — `WeakPerspectiveCamera.infer_smpl_foot_y`
    (`cam_pose_utils.py:102-130`). Shape is locked to frame 0's betas, as the
    reference does before inferring.

    Args:
        smpls: (N, 85) host array.

    Returns:
        (N,) numpy foot-y track.
    """
    import numpy as np

    smpls = np.asarray(smpls, np.float32)
    theta = smpls.copy()
    theta[:, 75:] = theta[0:1, 75:]

    ys = []
    run = jax.jit(lambda t: jnp.max(
        smpl_mod.get_details(model, t)["verts"][:, :, 1], axis=1))
    pad = (-len(theta)) % chunk
    padded = np.concatenate([theta, np.repeat(theta[-1:], pad, axis=0)]) if pad else theta
    for i in range(0, len(padded), chunk):
        ys.append(np.asarray(run(jnp.asarray(padded[i:i + chunk]))))
    return np.concatenate(ys)[:len(theta)]


def prepare_target_smpls(
    model,
    cache: SourceCache,
    tgt_smpls: np.ndarray,
    cam_strategy: str = "smooth",
    primary_id: int = 0,
) -> np.ndarray:
    """Sequence-level target preparation before synthesis — the camera
    swap + stabilization the reference runs inside `Imitator.inference`
    (`imitator.py:337-341` stabilize, `:248-258` swap_params via
    `make_inputs_for_tsf:299-305`).

    The camera is swapped so output framing/scale follows the SOURCE person's
    camera (strategy "smooth" keeps the reference's motion deltas), and the
    body shape is replaced by the source's betas. Runs once per sequence on
    host (cheap: one batched SMPL pass for foot-y), so chunked synthesis sees
    consistent `first_cam` state.

    Args:
        tgt_smpls: (N, 85) reference-video SMPLs.
        cam_strategy: smooth | source | ref_txty | copy.

    Returns:
        (N, 85) numpy SMPLs ready for `synthesize_frames`.
    """
    import numpy as np

    from ipercore_tpu.utils import camera as cam_utils

    smpls = np.asarray(tgt_smpls, np.float32)
    if cam_strategy == "smooth":
        foot_y = infer_foot_y(model, smpls)
        smpls = cam_utils.stabilize_smpls(smpls, foot_y)

    src_cam = np.broadcast_to(
        np.asarray(cache.src_cam[primary_id:primary_id + 1], np.float32),
        (len(smpls), 3))
    src_shape = np.asarray(cache.src_shape[primary_id:primary_id + 1], np.float32)
    first_cam = smpls[0:1, 0:3]
    new_cam = np.asarray(cam_utils.cam_swap(
        jnp.asarray(src_cam), jnp.asarray(smpls[:, 0:3]),
        jnp.asarray(first_cam), cam_strategy))
    return np.concatenate(
        [new_cam, smpls[:, 3:75], np.repeat(src_shape, len(smpls), axis=0)], axis=1)


def make_frame_inputs(
    comp: fc.FlowComposer,
    cache: SourceCache,
    tgt_smpl: jnp.ndarray,
    offsets: jnp.ndarray | float = 0.0,
    links_ids: Optional[jnp.ndarray] = None,
    tst_stride: Optional[int] = None,
    sample_dtype: Optional[jnp.dtype] = None,
    full_ref_info: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, dict]:
    """Per-frame-batch geometry — `make_inputs_for_tsf` (`imitator.py:259-327`).

    Args:
        tgt_smpl: (T, 85) target SMPL batch.
        tst_stride: subsample factor for the Tst feature-warping flow. The
            finest feature warp in the generator runs at S/2, so computing
            Tst at S/2 (stride 2) loses nothing downstream and quarters the
            flow-gather cost; default: 2 when S >= 512, else 1.
        sample_dtype: optional dtype (jnp.bfloat16) for the UV image sampling —
            halves the gather traffic of the Tuv2t warp; coordinates stay f32.

    Returns:
        tsf_inputs (T, S, S, 6), Tst (T, ns, S/stride, S/stride, 2), ref_info.
    """
    T = tgt_smpl.shape[0]
    ns = cache.src_f2pts.shape[0]
    S = comp.image_size
    if tst_stride is None:
        tst_stride = 2 if S >= 512 else 1

    details = smpl_mod.get_details(comp.model, tgt_smpl, offsets, links_ids)

    from ipercore_tpu.ops.sampling import grid_sample

    if rz._use_pallas(S) and not full_ref_info:
        # Fused path: one kernel pass emits fim + the UV flow + all source
        # flows (matches the cal_bc_transform path within the tested
        # tolerances: >=99.9% fim agreement, flow err < 1e-2 on z-tie pixels —
        # tests/test_ops/test_rasterizer_pallas.py).
        proj = rz.project_verts(details["verts"], details["cam"])
        face_verts = rz.verts_to_faces(proj, comp.model.faces)  # (T, F, 3, 3)
        aux = jnp.concatenate(
            [comp.assets.f2uvs[None], cache.src_f2pts], axis=0)  # (1+ns, F, 3, 2)
        if use_csr_raster():
            from ipercore_tpu.ops.rasterizer_pallas import rasterize_flows_pallas_csr

            fim, flows = rasterize_flows_pallas_csr(face_verts, aux, S)
        else:
            from ipercore_tpu.ops.rasterizer_pallas import rasterize_flows_pallas

            fim, flows = jax.vmap(
                lambda fv: rasterize_flows_pallas(fv, aux, S))(face_verts)
        cond = rz.encode_fim(fim, comp.assets.map_fn)
        ref_info = {"fim": fim, "cond": cond, "cam": details["cam"],
                    "verts": details["verts"], "j2d": details["j2d"]}
        Tuv2t = flows[..., 0, :]  # (T, S, S, 2)
        Tst = jnp.moveaxis(
            flows[:, ::tst_stride, ::tst_stride, 1:, :], 3, 1)  # (T, ns, Sf, Sf, 2)
    else:
        ref_info = fc.render_smpl_info(
            comp, details["verts"], details["cam"], use_morph=False,
            get_uv_info=False, need_vis=False)
        f2uvs = jnp.broadcast_to(comp.assets.f2uvs, (T,) + comp.assets.f2uvs.shape)
        Tuv2t = rz.cal_bc_transform(f2uvs, ref_info["fim"], ref_info["wim"])
        fim_s = ref_info["fim"][:, ::tst_stride, ::tst_stride]
        wim_s = ref_info["wim"][:, ::tst_stride, ::tst_stride]
        Sf = fim_s.shape[1]
        src_rep = jnp.broadcast_to(
            cache.src_f2pts[None], (T,) + cache.src_f2pts.shape).reshape(T * ns, -1, 3, 2)
        Tst = rz.cal_bc_transform(
            src_rep, jnp.repeat(fim_s, ns, axis=0), jnp.repeat(wim_s, ns, axis=0)
        ).reshape(T, ns, Sf, Sf, 2)

    # Tuv2t warp of the UV image + target condition. On TPU the 4-tap XLA
    # gather costs a full VMEM tile per index (~11.5 ms/frame at 512²); the
    # Pallas one-hot-matmul sampler does it in ~4.8 ms (ops/sampling_pallas).
    uv_img = cache.uv_img if sample_dtype is None else cache.uv_img.astype(sample_dtype)
    uv_rep = jnp.broadcast_to(uv_img, (T,) + uv_img.shape[1:])
    from ipercore_tpu.ops.sampling_pallas import grid_sample_pallas, use_pallas_sampling

    if use_pallas_sampling():
        syn = grid_sample_pallas(uv_rep, Tuv2t).astype(cache.uv_img.dtype)
    else:
        syn = grid_sample(uv_rep, Tuv2t).astype(cache.uv_img.dtype)
    tsf_inputs = jnp.concatenate([syn, ref_info["cond"]], axis=-1)  # (T, S, S, 6)

    return tsf_inputs, Tst, ref_info


def synthesize_frames(
    comp: fc.FlowComposer,
    generator,
    params,
    cache: SourceCache,
    tgt_smpl: jnp.ndarray,
    offsets: jnp.ndarray | float = 0.0,
    links_ids: Optional[jnp.ndarray] = None,
    compute_dtype: Optional[jnp.dtype] = None,
    tst_stride: Optional[int] = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Synthesize a batch of frames — the hot path (`Imitator.inference:328` +
    `forward:384`, frame-batched instead of frame-serial).

    Args:
        tgt_smpl: (T, 85).
        compute_dtype: optional lower precision (jnp.bfloat16) for the
            generator compute — geometry/flows stay f32; outputs cast back.
        tst_stride: override the Tst flow subsampling (None = resolution
            default). `scripts/evaluate/accuracy_cost.py` measures the
            quality cost of both knobs.

    Returns:
        preds (T, S, S, 3) composited frames in [-1, 1];
        masks (T, S, S, 1) predicted attention masks (1 = background).
    """
    T = tgt_smpl.shape[0]
    tsf_inputs, Tst, _ = make_frame_inputs(
        comp, cache, tgt_smpl, offsets, links_ids, sample_dtype=compute_dtype,
        tst_stride=tst_stride)

    # Broadcast the cached per-source features over the frame axis.
    def rep(x):  # (1, ns, ...) -> (T, ns, ...)
        return jnp.broadcast_to(x, (T,) + x.shape[1:])

    enc = [rep(e) for e in cache.src_enc_outs]
    res = [rep(r) for r in cache.src_res_outs]

    net_params = params
    if compute_dtype is not None:
        cast = lambda t: jax.tree_util.tree_map(
            lambda x: x.astype(compute_dtype)
            if hasattr(x, "astype") and jnp.issubdtype(x.dtype, jnp.floating) else x, t)
        net_params = cast(params)
        tsf_inputs = tsf_inputs.astype(compute_dtype)
        enc = [e.astype(compute_dtype) for e in enc]
        res = [r.astype(compute_dtype) for r in res]

    tsf_img, tsf_mask = generator.apply(
        net_params, tsf_inputs, enc, res, Tst, method=generator.forward_tsf)
    tsf_img = tsf_img.astype(jnp.float32)
    tsf_mask = tsf_mask.astype(jnp.float32)

    bg = jnp.broadcast_to(cache.bg_img, (T,) + cache.bg_img.shape[1:])
    pred = tsf_mask * bg + (1.0 - tsf_mask) * tsf_img  # `imitator.py:393`
    return pred, tsf_mask


def synthesize_frames_temporal(
    comp: fc.FlowComposer,
    generator,
    params,
    cache: SourceCache,
    tgt_smpl: jnp.ndarray,
    offsets: jnp.ndarray | float = 0.0,
    links_ids: Optional[jnp.ndarray] = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Temporal-mode synthesis: frames scanned serially with the previous
    prediction fed back (replaces `TemporalFIFO` + `post_update`,
    `imitator.py:18-127,397`).

    Args:
        tgt_smpl: (T, 85).
    """
    T = tgt_smpl.shape[0]
    S = comp.image_size
    ns = cache.src_f2pts.shape[0]
    F = comp.model.faces.shape[0]

    if rz._use_pallas(S):
        tsf_inputs, Tst, Ttt_seq = make_temporal_inputs_fused(
            comp, cache, tgt_smpl, offsets, links_ids)
    else:
        tsf_inputs, Tst, ref_info = make_frame_inputs(
            comp, cache, tgt_smpl, offsets, links_ids, full_ref_info=True)
        # Ttt between consecutive frames: prev f2pts -> current fim/wim.
        f2pts_seq = ref_info["f2pts"]  # (T, F, 3, 2)
        prev_f2pts = jnp.concatenate([f2pts_seq[:1], f2pts_seq[:-1]], axis=0)
        Ttt_seq = rz.cal_bc_transform(
            prev_f2pts, ref_info["fim"], ref_info["wim"])  # (T, S, S, 2)

    def rep1(x):
        return x[0:1] if x.shape[0] == 1 else x

    def step(carry, xs):
        prev_img, prev_mask, prev_syn = carry
        tsf_in, tst, ttt = xs
        # Previous prediction as an extra temporal source. Channel layout must
        # match TRAINING's feedback (`generators.py` forward: fg-masked pred +
        # channels 0:3 of the previous tsf input, i.e. the warped appearance —
        # ref `attlwb_spade_resunet.py:680`), or a temporally-trained G runs
        # on inputs it never saw.
        temp_in = jnp.concatenate([prev_img * (1.0 - prev_mask), prev_syn], axis=-1)[None, None]
        temp_enc, temp_res = generator.apply(
            params, temp_in, True, method=generator.forward_src)
        img, mask = generator.apply(
            params, tsf_in[None], cache.src_enc_outs, cache.src_res_outs, tst[None],
            temp_enc, temp_res, ttt[None, None],
            method=generator.forward_tsf)
        pred = mask * cache.bg_img + (1.0 - mask) * img
        syn = tsf_in[..., 0:3]
        return (img[0], mask[0], syn), (pred[0], mask[0])

    init_syn = tsf_inputs[0, ..., 0:3]
    init = (jnp.zeros((S, S, 3), tsf_inputs.dtype), jnp.ones((S, S, 1), tsf_inputs.dtype), init_syn)
    _, (preds, masks) = jax.lax.scan(step, init, (tsf_inputs, Tst, Ttt_seq))
    return preds, masks


# ---------------------------------------------------------------------------
# Viewer: target SMPLs synthesized from camera-ring rotations
# ---------------------------------------------------------------------------


def make_temporal_inputs_fused(
    comp: fc.FlowComposer,
    cache: SourceCache,
    tgt_smpl: jnp.ndarray,
    offsets: jnp.ndarray | float = 0.0,
    links_ids: Optional[jnp.ndarray] = None,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Temporal-mode geometry through ONE fused kernel pass per frame.

    The per-frame aux set carries the previous frame's screen f2pts next to
    the UV/source coordinates, so Ttt (prev->current flow) costs no extra
    raster — replacing the render_smpl_info + 3x cal_bc_transform fallback.

    Returns:
        (tsf_inputs (T, S, S, 6), Tst (T, ns, S/st, S/st, 2), Ttt (T, S, S, 2))
    """
    from ipercore_tpu.ops.rasterizer_pallas import rasterize_flows_pallas_csr
    from ipercore_tpu.ops.sampling_pallas import (
        grid_sample_pallas, use_pallas_sampling)
    from ipercore_tpu.ops.sampling import grid_sample

    S = comp.image_size
    T = tgt_smpl.shape[0]
    ns = cache.src_f2pts.shape[0]
    details = smpl_mod.get_details(comp.model, tgt_smpl, offsets, links_ids)
    proj = rz.project_verts(details["verts"], details["cam"])
    face_verts = rz.verts_to_faces(proj, comp.model.faces)  # (T, F, 3, 3)
    f2pts_seq = face_verts[..., :2]  # (T, F, 3, 2)
    prev_f2pts = jnp.concatenate([f2pts_seq[:1], f2pts_seq[:-1]], axis=0)
    shared = jnp.concatenate(
        [comp.assets.f2uvs[None], cache.src_f2pts], axis=0)  # (1+ns, F, 3, 2)
    aux = jnp.concatenate(
        [jnp.broadcast_to(shared, (T,) + shared.shape),
         prev_f2pts[:, None]], axis=1)  # (T, 2+ns, F, 3, 2)
    fim, flows = rasterize_flows_pallas_csr(face_verts, aux, S,
                                            interpret=interpret)
    cond = rz.encode_fim(fim, comp.assets.map_fn)
    Tuv2t = flows[..., 0, :]
    st = 2 if S >= 512 else 1  # finest feature warp runs at S/2
    Tst = jnp.moveaxis(flows[:, ::st, ::st, 1:1 + ns, :], 3, 1)
    Ttt_seq = flows[..., 1 + ns, :]  # (T, S, S, 2)
    uv_rep = jnp.broadcast_to(cache.uv_img, (T,) + cache.uv_img.shape[1:])
    if use_pallas_sampling() and not interpret:
        syn = grid_sample_pallas(uv_rep, Tuv2t).astype(cache.uv_img.dtype)
    else:
        syn = grid_sample(uv_rep, Tuv2t).astype(cache.uv_img.dtype)
    tsf_inputs = jnp.concatenate([syn, cond], axis=-1)  # (T, S, S, 6)
    return tsf_inputs, Tst, Ttt_seq


def make_novel_view_smpls(
    src_smpl: jnp.ndarray, n_frames: int = 180, use_t_pose: bool = False
) -> jnp.ndarray:
    """360-degree y-rotation ring of SMPLs — `create_T_pose_novel_view_smpl`
    (`services/base_runner.py:11-31`) + `add_view_effect` (`:58-78`).

    Args:
        src_smpl: (85,) source pose.

    Returns:
        (n_frames, 85)
    """
    from ipercore_tpu.ops.rotations import rodrigues, rotmat_to_axis_angle

    base = jnp.broadcast_to(src_smpl, (n_frames, 85))
    if use_t_pose:
        base = base.at[:, 3 + 3:75].set(0.0)

    angles = jnp.linspace(0.0, 2.0 * jnp.pi, n_frames, endpoint=False)
    ring = rodrigues(jnp.stack([jnp.zeros_like(angles), angles, jnp.zeros_like(angles)], axis=-1))
    global_rot = rodrigues(base[:, 3:6])
    new_global = rotmat_to_axis_angle(ring @ global_rot)
    return base.at[:, 3:6].set(new_global)


def add_view_effect(smpls: jnp.ndarray, angle_deg: float) -> jnp.ndarray:
    """Rotate all frames' global orientation by a fixed y angle —
    `add_view_effect` (`base_runner.py:58`)."""
    from ipercore_tpu.ops.rotations import rodrigues, rotmat_to_axis_angle

    a = jnp.deg2rad(jnp.asarray(angle_deg, smpls.dtype))
    R = rodrigues(jnp.asarray([0.0, 1.0, 0.0]) * a)
    g = rodrigues(smpls[:, 3:6])
    return smpls.at[:, 3:6].set(rotmat_to_axis_angle(R[None] @ g))


def add_bullet_time_effect(smpls: jnp.ndarray, frame_ids: list[int], duration: int = 60) -> jnp.ndarray:
    """Freeze pose at `frame_ids` and insert a 360-degree ring of `duration`
    frames — `add_bullet_time_effect` (`base_runner.py:80-127`). Host-side
    (numpy) splicing: output length is data-dependent."""
    import numpy as np

    s = np.asarray(smpls)
    out = []
    prev = 0
    for fid in sorted(frame_ids):
        fid = min(max(fid, 0), len(s) - 1)
        out.append(s[prev:fid + 1])
        ring = np.asarray(make_novel_view_smpls(jnp.asarray(s[fid]), n_frames=duration))
        out.append(ring)
        prev = fid + 1
    out.append(s[prev:])
    return jnp.asarray(np.concatenate(out, axis=0))


# ---------------------------------------------------------------------------
# Swapper: merge multiple sources' caches by part selection
# ---------------------------------------------------------------------------


def merge_source_caches(
    comp: fc.FlowComposer,
    caches: list[SourceCache],
    part_masks: list[jnp.ndarray],
) -> SourceCache:
    """Merge per-person source caches for appearance transfer —
    `Swapper.swap_source_setup` (`imitator.py:548-621`): concatenate encoded
    features along the source axis; restrict each person's flow sources to its
    selected faces; merge UV images preferring the primary person.

    Args:
        caches: one SourceCache per person (primary first);
        part_masks: (F,) bool per person (primary gets leftover faces).
    """
    enc = [jnp.concatenate(xs, axis=1) for xs in zip(*[c.src_enc_outs for c in caches])]
    res = [jnp.concatenate(xs, axis=1) for xs in zip(*[c.src_res_outs for c in caches])]

    f2pts = []
    for cache, mask in zip(caches, part_masks):
        f2pts.append(rz.select_f2pts(cache.src_f2pts, jnp.broadcast_to(
            mask, (cache.src_f2pts.shape[0],) + mask.shape)))
    f2pts = jnp.concatenate(f2pts, axis=0)

    uv_imgs = jnp.concatenate([c.uv_img for c in caches], axis=0)  # (P, S, S, 3)
    vis = (jnp.sum(jnp.abs(uv_imgs), axis=-1, keepdims=True) > 1e-6).astype(uv_imgs.dtype)
    uv = fc.merge_uv_img(uv_imgs, vis)[None]

    return SourceCache(
        src_enc_outs=tuple(enc),
        src_res_outs=tuple(res),
        uv_img=uv,
        bg_img=caches[0].bg_img,
        src_f2pts=f2pts,
        src_cam=jnp.concatenate([c.src_cam for c in caches], axis=0),
        src_shape=jnp.concatenate([c.src_shape for c in caches], axis=0),
    )
