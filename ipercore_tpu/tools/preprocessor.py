"""The 7-stage preprocessing pipeline over one input's frames.

Rebuilds `iPERCore/tools/processors/base_preprocessor.py:39-431` +
`preprocessors.py:21-425`:

  1.1 detect person boxes (pose2d peaks -> bbox; running active-box union)
  1.2 square crop + resize (`process_utils.py:111-362` geometry)
  1.3 3D pose (SPIN batched + SMPLify refinement)
  1.4 matting (person alpha/mask)
  1.5 find-front (render fim per frame, count front-body/facial faces)
  1.6 background inpainting (median background + diffusion/gated-conv fill)
  1.7 visual (skipped in headless runs)

Each stage marks `has_run_*` in the ProcessInfo manifest and serializes, so a
crashed run resumes at stage granularity.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ipercore_tpu.services.process_info import ProcessInfo
from ipercore_tpu.utils import video as vid


def update_active_boxes(cur_box: np.ndarray, active_box: Optional[np.ndarray]) -> np.ndarray:
    """Running union of person boxes — `process_utils.update_active_boxes:111`."""
    if active_box is None:
        return cur_box.copy()
    return np.asarray([
        min(cur_box[0], active_box[0]), min(cur_box[1], active_box[1]),
        max(cur_box[2], active_box[2]), max(cur_box[3], active_box[3]),
    ], np.float32)


def fmt_active_boxes(box: np.ndarray, img_hw: tuple[int, int], factor: float = 1.25) -> np.ndarray:
    """Enlarge + clamp a box — `fmt_active_boxes:132`."""
    h, w = img_hw
    cx, cy = (box[0] + box[2]) / 2, (box[1] + box[3]) / 2
    bw, bh = (box[2] - box[0]) * factor, (box[3] - box[1]) * factor
    side = max(bw, bh)
    x0, y0 = cx - side / 2, cy - side / 2
    x1, y1 = cx + side / 2, cy + side / 2
    return np.asarray([max(0, x0), max(0, y0), min(w, x1), min(h, y1)], np.float32)


def process_crop_img(img: np.ndarray, box: np.ndarray, out_size: int) -> tuple[np.ndarray, dict]:
    """Square crop + pad + resize — `process_crop_img:194`.

    Returns the crop and the geometry needed to map coordinates back.
    """
    import jax

    H, W = img.shape[:2]
    x0, y0, x1, y1 = [int(round(float(v))) for v in box]
    x0, y0 = max(0, x0), max(0, y0)
    x1, y1 = min(W, x1), min(H, y1)
    crop = img[y0:y1, x0:x1]
    ch, cw = crop.shape[:2]
    side = max(ch, cw, 1)
    pad_y, pad_x = (side - ch) // 2, (side - cw) // 2
    sq = np.zeros((side, side, img.shape[2]), img.dtype)
    sq[pad_y:pad_y + ch, pad_x:pad_x + cw] = crop
    out = np.asarray(jax.image.resize(sq, (out_size, out_size, img.shape[2]), "linear"))
    geom = {
        "start_pt": (x0 - pad_x, y0 - pad_y),
        "scale": out_size / side,
        "crop_box": (x0, y0, x1, y1),
    }
    return out, geom


def background_visibility(masks: np.ndarray, sil: np.ndarray,
                          image_size: int) -> np.ndarray:
    """Per-frame background-visibility weights for bg accumulation/inpaint.

    masks: (N, S, S, 1) float, background=1 (the stage-1.4 convention);
    sil: (N, S, S, 1) float, person=1 (rendered SMPL silhouette).
    Returns (N, S, S, 1) float in {0, 1}, 1 = trustworthy background pixel.

    The person region to EXCLUDE must over-cover: any person pixel the
    matting alpha misses is baked into the background image and ghosts
    through every composite (measured in the r5 self-imitation run — a
    0.73-coverage alpha left the subject visible in background.png). Union
    the two independent person-evidence sources, then dilate by ~S/32 px
    for halos/soft hair — the reference's dilated-mask inpaint convention
    (`base_preprocessor.py` bg stage).
    """
    import jax.numpy as jnp

    from ipercore_tpu.ops.morphology import dilate as _dilate

    person = np.maximum(1.0 - masks, sil)
    ks = max(9, (image_size // 32) | 1)
    person = np.concatenate(
        [np.asarray(_dilate(jnp.asarray(person[i:i + 16]), ks))
         for i in range(0, len(person), 16)])
    return 1.0 - person


class Preprocessor:
    """The stage pipeline — `Preprocessor` (`preprocessors.py:21`)."""

    def __init__(self, image_size: int = 512, use_smplify: bool = True,
                 find_front_size: int = 256, body_model=None, smoke: bool = False):
        """`smoke=True` shrinks every model (tiny body mesh, no SMPLify, small
        nets) so the full stage pipeline runs in seconds — used by hermetic
        tests and dry runs; the stage structure and manifest are identical."""
        self.image_size = image_size
        self.smoke = smoke
        self.use_smplify = use_smplify and not smoke
        self.find_front_size = 128 if smoke else find_front_size
        self.save_visual = not smoke
        self._body_model = body_model
        self._pose2d = None
        self._spin = None
        self._mattor = None
        self._inpaintor = None

    @property
    def body_model(self):
        if self._body_model is None:
            from ipercore_tpu.models import smpl as smpl_mod

            self._body_model = (smpl_mod.synthetic_model(nu=20, nv=18)
                                if self.smoke else smpl_mod.template_model())
        return self._body_model

    # lazy builders (each model compiles on first use)
    @property
    def pose2d(self):
        if self._pose2d is None:
            from ipercore_tpu.tools.pose2d import OpenPoseRunner

            self._pose2d = OpenPoseRunner()
        return self._pose2d

    @property
    def spin(self):
        if self._spin is None:
            from ipercore_tpu.tools.pose3d import SPINRunner

            self._spin = SPINRunner()
        return self._spin

    @property
    def mattor(self):
        if self._mattor is None:
            from ipercore_tpu.tools.mattors import build_mattor

            self._mattor = build_mattor(image_size=self.image_size)
        return self._mattor

    @property
    def inpaintor(self):
        if self._inpaintor is None:
            from ipercore_tpu.tools.inpaintors import build_background_inpaintors

            self._inpaintor = build_background_inpaintors(
                control_size=64 if self.smoke else 256)
        return self._inpaintor

    # ------------------------------------------------------------------
    def execute(self, info: ProcessInfo, frame_paths: list[str], out_img_dir: str,
                is_src: bool = False) -> ProcessInfo:
        """Run stages 1.1-1.6 — `BaseProcessor.execute:39`."""
        os.makedirs(out_img_dir, exist_ok=True)
        S = self.image_size

        # --- 1.1 + 1.2: detect + crop ----------------------------------
        if not info.has_run("cropper"):
            from ipercore_tpu.tools.detection import (
                SegmentationDetector, detect_person_boxes, track_person_boxes)

            names, geoms = [], []
            frames = np.stack([vid.load_image(p) for p in frame_paths])
            H, W = frames.shape[1:3]

            # 1.1: person detection — median-background tracker for static
            # video, the trained PersonSegUNet for stills / moving cameras,
            # with cross-checking and recorded provenance
            # (`_execute_detector:167` + PointRend boxes
            # `point_render_parser.py:29-130`). Full-frame is the last resort.
            if self.smoke:
                tracked, method = track_person_boxes(frames), "median_bg"
                if tracked is None:
                    method = "none"
            else:
                tracked, method = detect_person_boxes(
                    frames, seg_detector=SegmentationDetector(),
                    pose2d=self.pose2d)
            if tracked is not None:
                active_box = None
                for b in tracked:
                    active_box = update_active_boxes(b, active_box)
                box = fmt_active_boxes(active_box, (H, W), factor=1.25)
            else:
                box = fmt_active_boxes(
                    np.asarray([0, 0, W, H], np.float32), (H, W), factor=1.0)

            for i, img in enumerate(frames):
                crop, geom = process_crop_img(img, box, S)
                name = f"{i:08d}.png"
                vid.save_image(os.path.join(out_img_dir, name), crop)
                names.append(name)
                geoms.append([*geom["start_pt"], geom["scale"]])
            info.meta["valid_img_names"] = names
            info.set_array("crop_geom", np.asarray(geoms, np.float32))
            if tracked is not None:
                info.set_array("person_boxes", tracked.astype(np.float32))
            info.mark_run("detector", n_frames=len(names),
                          detected=bool(tracked is not None), method=method)
            info.mark_run("cropper", box=[float(v) for v in box])
            info.serialize()

        names = info.meta["valid_img_names"]
        imgs = np.stack([
            vid.load_image(os.path.join(out_img_dir, n), size=S) for n in names
        ])

        # --- 1.3 pose3d -------------------------------------------------
        if not info.has_run("pose3d"):
            import jax
            import jax.numpy as jnp

            from ipercore_tpu.tools.pose3d import (
                GMM_DEFAULT_WEIGHTS, load_gmm_prior, smplify_refine_multi)

            if self.smoke:
                # default camera-centered thetas: keeps the pipeline exact in
                # structure without the heavy nets
                theta = np.zeros((len(imgs), 85), np.float32)
                theta[:, 0] = 1.1
            else:
                spin_in = np.asarray(
                    jax.image.resize(jnp.asarray(imgs), (len(imgs), 224, 224, 3), "linear"))
                theta = self.spin.run(spin_in)
                # SMPLify refinement only against real keypoints: with an
                # untrained OpenPose (no checkpoint), random keypoints would
                # actively corrupt the SPIN estimate
                if self.use_smplify and self.pose2d.trained:
                    # pose2d runs at ITS trained scale (checkpoint metadata);
                    # SPIN keeps its fixed 224 HMR contract
                    p2s = self.pose2d.trained_size or 224
                    pose_in = spin_in if p2s == 224 else np.asarray(
                        jax.image.resize(jnp.asarray(imgs),
                                         (len(imgs), p2s, p2s, 3), "linear"))
                    # NMS + PAF grouping + 1-euro filter (multi-person-safe),
                    # with degenerate-decode recovery over jittered crops
                    # (the flat-heatmap midline failure measured on the
                    # bundled real still, pose2d.run_tracked_robust)
                    kps, scores, valid = self.pose2d.run_tracked_robust(pose_in)
                    from ipercore_tpu.tools.pose2d import body25_to_cocoplus

                    if len(kps) > 5:
                        # left/right swap fix by NN re-permutation against the
                        # median track (`smooth.py:141-190`)
                        from ipercore_tpu.utils.smoothing import pose2d_temporal_filter

                        stacked = np.concatenate(
                            [kps, (scores * valid)[..., None]], axis=-1)
                        stacked = pose2d_temporal_filter(stacked, window_size=5)
                        kps = stacked[..., :2]
                        scores = stacked[..., 2]
                        valid = (scores > 0).astype(np.float32)
                        kps19, conf19 = body25_to_cocoplus(kps, scores)
                    else:
                        kps19, conf19 = body25_to_cocoplus(kps, scores * valid)
                    init_theta = theta
                    # max-mixture pose prior when shipped (fit from the
                    # natural-pose mixture, scripts/fit_gmm_prior.py — the
                    # reference's gmm_08.pkl role): the pose term then pulls
                    # toward plausible human poses instead of anchoring to
                    # the SPIN init's mistakes on photographs
                    prior = load_gmm_prior(GMM_DEFAULT_WEIGHTS)
                    # np.array (copy): asarray of a jax array is read-only.
                    # Multi-hypothesis refinement (SPIN init + SPIN-free
                    # natural-stance/keypoint-camera init, per-frame winner):
                    # a wrong SPIN fit on photographs cannot anchor the
                    # result when the keypoints disagree.
                    theta = np.array(smplify_refine_multi(
                        self.body_model, jnp.asarray(theta),
                        jnp.asarray(kps19), jnp.asarray(conf19),
                        prior=prior))
                    # outlier SMPLify results fall back to the SPIN init
                    # (`smooth.py:223-251`) — but only when the init actually
                    # explains the keypoints better. The reference can trust
                    # its downloaded SPIN unconditionally; ours can be the
                    # outlier, and multi-init wins routinely sit far from it.
                    from ipercore_tpu.tools.pose3d import reprojection_error
                    from ipercore_tpu.utils.smoothing import pose_temporal_smooth

                    fb = pose_temporal_smooth(
                        init_theta[:, 3:-10], theta[:, 3:-10])
                    diverged = np.abs(fb - theta[:, 3:-10]).sum(1) > 1e-6
                    if diverged.any():
                        e_init = np.asarray(reprojection_error(
                            self.body_model, jnp.asarray(init_theta),
                            jnp.asarray(kps19), jnp.asarray(conf19)))
                        e_opt = np.asarray(reprojection_error(
                            self.body_model, jnp.asarray(theta),
                            jnp.asarray(kps19), jnp.asarray(conf19)))
                        take = diverged & (e_init < e_opt)
                        theta[take, 3:-10] = init_theta[take, 3:-10]
            info.set_array("smpls", theta.astype(np.float32))
            info.mark_run("pose3d")
            info.serialize()

        theta = info.get_array("smpls")

        # --- 1.4 matting --------------------------------------------------
        if not info.has_run("parser"):
            sil = self._smpl_silhouette(theta)
            alpha, mask = self.mattor.run(imgs, fallback_mask=sil)
            # store background=1 convention (reference masks: 1 - alpha)
            info.set_array("masks", (1.0 - alpha).astype(np.float32))
            info.mark_run("parser")
            info.serialize()

        # --- 1.5 find front ------------------------------------------------
        if not info.has_run("find_front"):
            ft_ids, bk_ids = self._find_front(theta)
            info.set_array("ft_ids", ft_ids)
            info.set_array("bk_ids", bk_ids)
            info.mark_run("find_front")
            info.serialize()

        # --- 1.6 background inpaint (src only needs it) ---------------------
        if not info.has_run("inpaintor"):
            if is_src:
                masks = info.get_array("masks")  # (N, S, S, 1) bg=1
                vis = background_visibility(
                    masks, self._smpl_silhouette(theta), self.image_size)
                # mean background over frames where pixels are visible
                acc = (imgs * vis).sum(0) / np.maximum(vis.sum(0), 1e-5)
                hole = (vis.sum(0) < 0.5).astype(np.float32)
                bg = self.inpaintor.run_inpainting(acc, hole)
                vid.save_image(os.path.join(os.path.dirname(out_img_dir), "background.png"), bg)
            info.mark_run("inpaintor")
            info.serialize()

        # --- 1.7 visual QA overlay (`preprocessors._save_visual:379`) --------
        if self.save_visual:
            from ipercore_tpu.utils.visualizer import write_visual_video

            write_visual_video(
                imgs, theta,
                os.path.join(os.path.dirname(out_img_dir), "visual.mp4"),
                model=self.body_model)

        return info

    # ------------------------------------------------------------------
    def _smpl_silhouette(self, theta: np.ndarray, batch_size: int = 16) -> np.ndarray:
        """Rendered SMPL body silhouette as the matting fallback (person=1).

        Chunked over frames: one full-clip raster at image_size materializes
        (N*S*S, aux) buffers — 438 frames at 512² was a 58 GB allocation.
        The raster itself runs at <=256² (a trimap seed does not need pixel
        precision) and is upsampled: a 32-frame 512² raster chunk alone
        exceeded a 16 GB HBM chip on the real akun_1 clip."""
        import jax
        import jax.numpy as jnp

        from ipercore_tpu.models import smpl as smpl_mod
        from ipercore_tpu.ops import rasterizer as rz

        model = self.body_model
        S = self.image_size
        rS = min(S, 256)
        out = []
        for i in range(0, len(theta), batch_size):
            d = smpl_mod.get_details(model, jnp.asarray(theta[i:i + batch_size]))
            _, fim, _ = rz.render_fim_wim(d["verts"], d["cam"], model.faces, rS)
            sil = (fim >= 0).astype(jnp.float32)[..., None]
            if rS != S:
                sil = jax.image.resize(sil, (sil.shape[0], S, S, 1), "linear")
                sil = (sil > 0.5).astype(jnp.float32)
            out.append(np.asarray(sil))
        return np.concatenate(out)

    def _find_front(self, theta: np.ndarray):
        """Count front-body/facial faces per frame — `_execute_post_find_front:257`."""
        import jax.numpy as jnp

        from ipercore_tpu.models import smpl as smpl_mod
        from ipercore_tpu.models.mesh import load_assets
        from ipercore_tpu.ops import rasterizer as rz

        model = self.body_model
        assets = load_assets(
            model, uv_map_path="/nonexistent" if self.smoke else None,
            part_path="/nonexistent" if self.smoke else None)
        size = self.find_front_size if self.find_front_size % 128 == 0 else 256
        counts = []
        for i in range(0, len(theta), 32):  # chunked: bound raster buffers
            d = smpl_mod.get_details(model, jnp.asarray(theta[i:i + 32]))
            _, fim, _ = rz.render_fim_wim(d["verts"], d["cam"], model.faces, size)
            vis = rz.visible_face_mask(fim, model.faces.shape[0])  # (n, F)
            counts.append(np.asarray(
                jnp.sum(vis & assets.facial_face_mask[None], axis=1)
                + jnp.sum(vis & assets.front_face_mask[None], axis=1)))
        front_count = np.concatenate(counts)
        order = np.argsort(-front_count)
        n = len(order)
        ft_ids = order[: max(n // 2, 1)].astype(np.int32)
        bk_ids = order[max(n // 2, 1):][::-1].astype(np.int32)
        if len(bk_ids) == 0:
            bk_ids = ft_ids
        return ft_ids, bk_ids
