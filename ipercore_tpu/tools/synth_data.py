"""Procedural supervision scenes for training the perception stack on-device.

The reference ships downloaded checkpoints for its perception models (SPIN,
OpenPose, PointRend/GCA, deepfillv2 — `assets/download.sh`); this environment
has no network, so those nets would otherwise run untrained behind geometry
fallbacks. This module synthesizes *labeled* scenes entirely on the TPU:
random SMPL pose/shape/camera rendered through the production rasterizer
gives exact silhouettes, part maps and projected joints; textures are random
color transforms of the SMPL part-condition map (distinct colors per body
part — clothing-like limb cues); backgrounds are procedural (gradients /
checkers / noise). Every label is exact by construction:

  * soft alpha + binary mask        -> person segmenter / matting refiner
  * theta (cam, pose, shape) + j2d  -> SPIN regressor
  * Body-25 joints + limb PAFs      -> OpenPose
  * clean background + random holes -> background inpaintor

Used by `scripts/train_person_seg.py`, `scripts/train_spin.py`,
`scripts/train_openpose.py`, `scripts/train_inpaintor.py`.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ipercore_tpu.models import smpl as smpl_mod
from ipercore_tpu.ops import rasterizer as rz
from ipercore_tpu.ops.rotations import rodrigues, rotmat_to_axis_angle


class SceneBatch(NamedTuple):
    """One batch of labeled synthetic scenes (image units: [-1, 1])."""

    img: jnp.ndarray     # (B, S, S, 3) composited scene
    alpha: jnp.ndarray   # (B, S, S, 1) soft person alpha (supersampled render)
    mask: jnp.ndarray    # (B, S, S, 1) binary person mask (alpha > .5)
    bg: jnp.ndarray      # (B, S, S, 3) the clean background plate
    theta: jnp.ndarray   # (B, 85) cam(3) + pose_aa(72) + shape(10)
    j2d: jnp.ndarray     # (B, 19, 2) cocoplus joints, NDC (x right, y down)


# SMPL joint ids (parent-relative axis-angle triplets in pose[3*j : 3*j+3]).
_J_LHIP, _J_RHIP, _J_LKNEE, _J_RKNEE = 1, 2, 4, 5
_J_LANK, _J_RANK, _J_SPINE = 7, 8, (3, 6, 9)
_J_NECK, _J_LCOLL, _J_RCOLL, _J_HEAD = 12, 13, 14, 15
_J_LSH, _J_RSH, _J_LELB, _J_RELB = 16, 17, 18, 19


def natural_pose(key, batch: int) -> jnp.ndarray:
    """Sample 72-dim SMPL body poses from a hand-built *natural-stance* prior.

    The isotropic N(0, pose_std) prior in `make_theta` is centered on the
    SMPL zero pose — a T-pose with arms horizontal. A person standing with
    arms at their sides (the dominant pose in photographs, e.g. the bundled
    real sample media) is ~5 sigma outside that prior at the shoulders, so
    perception nets trained on it never see ordinary standing/walking people
    (round-4 real-probe PCK@0.1: OpenPose 0.0-0.23, SPIN 0.0-0.08 — the SMPL
    fit the reference gets from its mocap-pretrained SPIN checkpoint,
    `spin/runner.py:198`, comes from exactly this kind of pose prior).

    Built as arms-down adduction (shoulder z; sign verified by rendering in
    this repo's flipped frame: L +, R -) with independently jittered elbow
    flexion, walk/dance swing at hips+knees (sagittal x, sign-preserved under
    the frame flip), spine/neck sway, and a small isotropic floor. Angles are
    in the repo's convention = reference SMPL values with y/z negated
    (template flipped 180 deg about x, `models/smpl.py:template_model`).
    """
    ks = jax.random.split(key, 12)
    pose = 0.06 * jax.random.normal(ks[0], (batch, 72))

    def setj(p, j, axis, val):
        return p.at[:, 3 * j + axis].set(val + p[:, 3 * j + axis])

    # shoulders: arms down (adduction about z), [~A-pose .. tight at sides].
    # The synthesized smooth skinning dilutes bone rotation (~0.55x at the
    # visual arm), so tight-at-sides needs ~2.0-2.3 rad (render-calibrated).
    add = jax.random.uniform(ks[1], (batch, 2), minval=0.8, maxval=2.3)
    pose = setj(pose, _J_LSH, 2, add[:, 0])
    pose = setj(pose, _J_RSH, 2, -add[:, 1])
    # collarbones shrug symmetrically: one draw, mirrored signs (intentional)
    coll = 0.12 * jax.random.uniform(ks[2], (batch,))
    pose = setj(pose, _J_LCOLL, 2, coll)
    pose = setj(pose, _J_RCOLL, 2, -coll)
    # elbows: flexion about y (repo frame), 0 (straight) .. 1.6 (hands up)
    elb = jnp.abs(0.45 * jax.random.normal(ks[3], (batch, 2))) \
        + jax.random.uniform(ks[4], (batch, 2), maxval=0.35)
    pose = setj(pose, _J_LELB, 1, elb[:, 0])
    pose = setj(pose, _J_RELB, 1, -elb[:, 1])
    # walk/dance leg swing: hips sagittal (x), opposite-ish phase + noise
    swing = 0.35 * jax.random.normal(ks[5], (batch,))
    hip_n = 0.15 * jax.random.normal(ks[6], (batch, 2))
    pose = setj(pose, _J_LHIP, 0, swing + hip_n[:, 0])
    pose = setj(pose, _J_RHIP, 0, -swing + hip_n[:, 1])
    # knees: one-sided flexion (x >= 0)
    knee = jnp.abs(0.4 * jax.random.normal(ks[7], (batch, 2)))
    pose = setj(pose, _J_LKNEE, 0, knee[:, 0])
    pose = setj(pose, _J_RKNEE, 0, knee[:, 1])
    # ankles flex together in stance: one draw for both sides (intentional)
    ank = 0.15 * jax.random.normal(ks[8], (batch,))
    pose = setj(pose, _J_LANK, 0, ank)
    pose = setj(pose, _J_RANK, 0, ank)
    # torso sway + head turn
    for j in _J_SPINE:
        pose = pose.at[:, 3 * j: 3 * j + 3].add(
            0.07 * jax.random.normal(jax.random.fold_in(ks[9], j), (batch, 3)))
    pose = pose.at[:, 3 * _J_NECK: 3 * _J_NECK + 3].add(
        0.1 * jax.random.normal(ks[10], (batch, 3)))
    pose = pose.at[:, 3 * _J_HEAD: 3 * _J_HEAD + 3].add(
        0.1 * jax.random.normal(ks[11], (batch, 3)))
    return pose


def make_theta(key, batch: int, pose_std: float = 0.25, yaw: bool = True,
               scale_range=(0.55, 1.6), tx_range=0.5,
               natural_frac: float = 0.0) -> jnp.ndarray:
    """Random plausible SMPL thetas.

    Global orientation is a full random yaw (so front/back/side views all
    occur — find-front and pose estimation need the full ring) composed with
    the canonical upright flip and a small random tilt.

    natural_frac: fraction of samples drawn from the `natural_pose`
    arms-down/walking prior instead of the isotropic T-pose-centered one
    (round-4 sim2real fix — see natural_pose docstring).
    """
    k1, k2, k3, k4, k5, k6, k7, k8 = jax.random.split(key, 8)
    scale = jax.random.uniform(k1, (batch, 1), minval=scale_range[0],
                               maxval=scale_range[1])
    txy = jax.random.uniform(k2, (batch, 2), minval=-tx_range, maxval=tx_range)
    pose = jax.random.normal(k3, (batch, 72)) * pose_std
    if natural_frac > 0.0:
        nat = natural_pose(k7, batch)
        use_nat = jax.random.bernoulli(k8, natural_frac, (batch, 1))
        pose = jnp.where(use_nat, nat, pose)
    beta = jax.random.normal(k4, (batch, 10))
    if yaw:
        # theta == 0 renders upright facing the camera in this repo's
        # convention (screen y down); compose a full random yaw about the
        # body's vertical axis with a small random tilt
        ang = jax.random.uniform(k5, (batch,), minval=-np.pi, maxval=np.pi)
        tilt = jax.random.normal(k6, (batch, 3)) * 0.1
        spin = rodrigues(jnp.stack([jnp.zeros_like(ang), ang,
                                    jnp.zeros_like(ang)], axis=-1))
        wobble = rodrigues(tilt)
        orient = rotmat_to_axis_angle(jnp.einsum("bij,bjk->bik", wobble, spin))
        pose = pose.at[:, 0:3].set(orient)
    theta = jnp.concatenate([scale, txy, pose, beta], axis=-1)
    return theta


def render_fim(model, theta: jnp.ndarray, size: int,
               f2uvs: jnp.ndarray | None = None,
               details: dict | None = None) -> jnp.ndarray:
    """Rasterize thetas to a face-index map with the production kernels.

    Returns fim (B, size, size) int32 (-1 background).
    """
    if details is None:
        details = smpl_mod.get_details(model, theta)
    proj = rz.project_verts(details["verts"], details["cam"])
    fv = rz.verts_to_faces(proj, model.faces)
    if rz._use_pallas(size):
        from ipercore_tpu.ops.rasterizer_pallas import rasterize_flows_pallas_csr

        aux = (f2uvs if f2uvs is not None
               else jnp.zeros((model.faces.shape[0], 3, 2), jnp.float32))
        fim, _ = rasterize_flows_pallas_csr(fv, aux[None], size)
    else:
        fim = jax.vmap(lambda f: rz.rasterize(f, size).fim)(fv)
    return fim


def _downsample2(x: jnp.ndarray) -> jnp.ndarray:
    """2x average pool over (B, H, W, C)."""
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID") / 4.0


def synth_background(key, batch: int, size: int) -> jnp.ndarray:
    """Procedural background plates: gradient + checker + noise mix."""
    k = jax.random.split(key, 8)
    yy, xx = jnp.meshgrid(jnp.linspace(-1, 1, size), jnp.linspace(-1, 1, size),
                          indexing="ij")
    ang = jax.random.uniform(k[0], (batch, 1, 1), minval=0, maxval=np.pi)
    g = (jnp.cos(ang) * xx[None] + jnp.sin(ang) * yy[None])[..., None]
    ca = jax.random.uniform(k[1], (batch, 1, 1, 3), minval=-1, maxval=1)
    cb = jax.random.uniform(k[2], (batch, 1, 1, 3), minval=-1, maxval=1)
    grad = ca + (cb - ca) * (g * 0.5 + 0.5)
    fx = jax.random.uniform(k[3], (batch, 1, 1), minval=2, maxval=14)
    fy = jax.random.uniform(k[4], (batch, 1, 1), minval=2, maxval=14)
    check = jnp.sign(jnp.sin(xx[None] * fx * np.pi)
                     * jnp.sin(yy[None] * fy * np.pi))[..., None]
    check = check * jax.random.uniform(k[5], (batch, 1, 1, 3),
                                       minval=-0.8, maxval=0.8)
    noise = jax.random.uniform(k[6], (batch, size, size, 3), minval=-1, maxval=1)
    w = jax.random.dirichlet(k[7], jnp.ones(3), (batch,))[:, None, None, :]
    bg = w[..., 0:1] * grad + w[..., 1:2] * check + w[..., 2:3] * noise
    return jnp.clip(bg, -1, 1)


def fractal_noise(key, batch: int, size: int, channels: int = 3,
                  octaves: int = 5) -> jnp.ndarray:
    """Multi-octave value noise in [-1, 1]: random low-res grids bilinearly
    upsampled and summed with 1/2^o weights — cloud/vegetation-like textures
    that read photographic, unlike per-pixel uniform noise. Shapes static."""
    ks = jax.random.split(key, octaves)
    out = jnp.zeros((batch, size, size, channels))
    amp_sum = 0.0
    for o in range(octaves):
        res = max(2, 2 ** (o + 2))  # 4, 8, 16, 32, 64
        if res > size:
            break
        g = jax.random.uniform(ks[o], (batch, res, res, channels),
                               minval=-1.0, maxval=1.0)
        up = jax.image.resize(g, (batch, size, size, channels), "linear")
        amp = 1.0 / (2 ** o)
        out = out + amp * up
        amp_sum += amp
    return out / amp_sum


def synth_background_photo(key, batch: int, size: int) -> jnp.ndarray:
    """Photo-statistics background plates (the sim2real upgrade of
    `synth_background`): fractal value noise as the base 'scene texture',
    plus 0-4 random clutter rectangles (structures/furniture), plus an
    illumination gradient. Output in [-1, 1]."""
    k = jax.random.split(key, 6)
    base = fractal_noise(k[0], batch, size, 3)
    # global tint + contrast per scene
    tint = jax.random.uniform(k[1], (batch, 1, 1, 3), minval=-0.6, maxval=0.6)
    contrast = jax.random.uniform(k[2], (batch, 1, 1, 1), minval=0.3, maxval=1.0)
    bg = jnp.clip(base * contrast + tint, -1, 1)
    # clutter rectangles: axis-aligned color blocks with soft edges
    yy, xx = jnp.meshgrid(jnp.linspace(0, 1, size), jnp.linspace(0, 1, size),
                          indexing="ij")
    kr = jax.random.split(k[3], 4)
    for i in range(4):
        kk = jax.random.split(kr[i], 5)
        c0 = jax.random.uniform(kk[0], (batch, 2), minval=0.0, maxval=0.8)
        wh = jax.random.uniform(kk[1], (batch, 2), minval=0.05, maxval=0.5)
        col = jax.random.uniform(kk[2], (batch, 1, 1, 3), minval=-1, maxval=1)
        on = jax.random.bernoulli(kk[4], 0.5, (batch, 1, 1, 1))
        inside = ((xx[None] >= c0[:, 0, None, None])
                  & (xx[None] <= (c0[:, 0] + wh[:, 0])[:, None, None])
                  & (yy[None] >= c0[:, 1, None, None])
                  & (yy[None] <= (c0[:, 1] + wh[:, 1])[:, None, None]))
        m = inside[..., None].astype(bg.dtype) * on
        blend = jax.random.uniform(kk[3], (batch, 1, 1, 1), minval=0.4, maxval=1.0)
        bg = bg * (1 - m * blend) + col * m * blend
    # illumination gradient
    ang = jax.random.uniform(k[4], (batch, 1, 1), minval=0, maxval=2 * np.pi)
    g = (jnp.cos(ang) * (xx[None] - 0.5) + jnp.sin(ang) * (yy[None] - 0.5))[..., None]
    amp = jax.random.uniform(k[5], (batch, 1, 1, 1), minval=0.0, maxval=0.5)
    return jnp.clip(bg + amp * g, -1, 1)


def synth_background_studio(key, batch: int, size: int) -> jnp.ndarray:
    """Studio / indoor-stage background plates — the deployment scene class
    the round-3 segmenter false-fired on hardest (the bundled akun_1 video:
    near-flat bright wall, saturated diagonal stripe decals, a wall/floor
    split with plank texture, logo glyphs, corner vignette). All elements
    are randomized; nothing is sampled from the evaluation media.

    Output (B, size, size, 3) in [-1, 1]."""
    k = jax.random.split(key, 15)
    yy, xx = jnp.meshgrid(jnp.linspace(0, 1, size), jnp.linspace(0, 1, size),
                          indexing="ij")
    # near-flat bright wall with a soft illumination gradient + faint texture
    wall = jax.random.uniform(k[0], (batch, 1, 1, 3), minval=0.25, maxval=0.95)
    wall = wall + 0.06 * fractal_noise(k[1], batch, size, 3)
    ang = jax.random.uniform(k[2], (batch, 1, 1), minval=0, maxval=2 * np.pi)
    g = (jnp.cos(ang) * (xx[None] - 0.5) + jnp.sin(ang) * (yy[None] - 0.5))[..., None]
    amp = jax.random.uniform(k[12], (batch, 1, 1, 1), minval=0.0, maxval=0.3)
    bg = wall + amp * g

    # wall/floor split: floor below a horizon line, distinct muted color with
    # horizontal plank stripes that darken toward the horizon (fake depth)
    horizon = jax.random.uniform(k[3], (batch, 1, 1), minval=0.55, maxval=0.95)
    floor_m = (yy[None] > horizon)[..., None].astype(bg.dtype)
    fcol = jax.random.uniform(k[4], (batch, 1, 1, 3), minval=-0.4, maxval=0.6)
    depth = jnp.clip((yy[None, ..., None] - horizon[..., None]) * 4.0, 0, 1)
    plank_f = jax.random.uniform(k[5], (batch, 1, 1), minval=20.0, maxval=90.0)
    planks = 0.08 * jnp.sin(yy[None] * plank_f)[..., None]
    floor = fcol * (0.75 + 0.25 * depth) + planks
    use_floor = jax.random.bernoulli(k[13], 0.8, (batch, 1, 1, 1)).astype(bg.dtype)
    bg = bg * (1 - floor_m * use_floor) + floor * floor_m * use_floor

    # 0-2 saturated diagonal stripe bands (decals on the wall only)
    for i in range(2):
        kk = jax.random.split(k[6 + i], 5)
        a = jax.random.uniform(kk[0], (batch, 1, 1), minval=0, maxval=np.pi)
        off = jax.random.uniform(kk[1], (batch, 1, 1), minval=-0.8, maxval=1.2)
        width = jax.random.uniform(kk[2], (batch, 1, 1), minval=0.04, maxval=0.22)
        d = jnp.cos(a) * xx[None] + jnp.sin(a) * yy[None] - off
        band = ((jnp.abs(d) < width)[..., None]).astype(bg.dtype)
        col = jax.random.uniform(kk[3], (batch, 1, 1, 3), minval=-1.0, maxval=1.0)
        on = jax.random.bernoulli(kk[4], 0.6, (batch, 1, 1, 1)).astype(bg.dtype)
        band = band * on * (1 - floor_m * use_floor)
        bg = bg * (1 - band) + col * band

    # 0-2 logo glyphs: high-contrast framed blocks with inner structure,
    # upper half of the wall (the class of FP the '100' logo produced)
    for i in range(2):
        kk = jax.random.split(k[8 + i], 6)
        c = jax.random.uniform(kk[0], (batch, 2), minval=0.05, maxval=0.75)
        c = c.at[:, 1].mul(0.5)  # upper half
        wh = jax.random.uniform(kk[1], (batch, 2), minval=0.04, maxval=0.16)
        dx = (xx[None] - c[:, 0, None, None]) / wh[:, 0, None, None]
        dy = (yy[None] - c[:, 1, None, None]) / wh[:, 1, None, None]
        outer = ((jnp.abs(dx) < 1.0) & (jnp.abs(dy) < 1.0))[..., None]
        inner = ((jnp.abs(dx) < 0.6) & (jnp.abs(dy) < 0.6))[..., None]
        bars = (jnp.sin(dx * 7.0) > 0.2)[..., None] & inner
        col = jax.random.uniform(kk[2], (batch, 1, 1, 3), minval=-1.0, maxval=0.4)
        on = jax.random.bernoulli(kk[3], 0.5, (batch, 1, 1, 1)).astype(bg.dtype)
        m_out = outer.astype(bg.dtype) * on
        bg = bg * (1 - m_out) + col * m_out
        m_bar = bars.astype(bg.dtype) * on
        bg = bg * (1 - m_bar) + (-col) * m_bar

    # corner vignette / soft dark blob (stage lighting falloff)
    cx = jax.random.uniform(k[10], (batch, 1, 1), minval=-0.2, maxval=1.2)
    cy = jax.random.uniform(k[14], (batch, 1, 1), minval=-0.2, maxval=0.4)
    r2 = (xx[None] - cx) ** 2 + (yy[None] - cy) ** 2
    vig = jnp.exp(-r2 / 0.08)[..., None]
    vamp = jax.random.uniform(k[11], (batch, 1, 1, 1), minval=0.0, maxval=0.9)
    bg = bg - vamp * vig * (bg + 1.0) * 0.5
    return jnp.clip(bg, -1, 1)


# SMPL part label -> garment group (see mesh.synthetic_face_parts):
#   0 skin (head, facial, hands), 1 top (torso, arms), 2 bottom (legs),
#   3 shoes (feet)
_PART_TO_GARMENT = np.asarray([0, 1, 2, 2, 1, 1, 3, 3, 0, 0, 0], np.int32)


def garment_tables(key, batch: int, face_parts: np.ndarray) -> jnp.ndarray:
    """Per-sample realistic garment color tables for `encode_fim`.

    Real clothing is overwhelmingly muted/dark (the bundled akun subject:
    black top, gray pants) while the procedural `person_texture_mix` draws
    psychedelic uniform colors — a domain cue the segmenter abuses. This
    samples, per scene: a skin tone (daylight flesh-tone band), a top color,
    a bottom color and a shoe color (muted, often dark), with variants
    (short sleeves -> arms take the skin tone; dress -> legs take the top
    color). Returns (B, F+1, 3) tables; the background row is black (unused
    — the caller composites over its own plates)."""
    k = jax.random.split(key, 8)
    F = int(face_parts.shape[0])
    # skin: correlated RGB around a flesh-tone axis, wide brightness range
    base = jax.random.uniform(k[0], (batch, 1), minval=-0.35, maxval=0.75)
    skin = jnp.concatenate([base + 0.18, base, base - 0.12], axis=-1)
    skin = skin + 0.05 * jax.random.normal(k[1], (batch, 3))

    def muted(kk, dark_bias):
        hue = jax.random.uniform(kk, (batch, 3), minval=-1.0, maxval=1.0)
        lum = jax.random.uniform(
            jax.random.fold_in(kk, 1), (batch, 1), minval=-0.9, maxval=0.5 - dark_bias)
        sat = jax.random.uniform(
            jax.random.fold_in(kk, 2), (batch, 1), minval=0.05, maxval=0.45)
        return jnp.clip(lum + sat * hue, -1, 1)

    top, bottom, shoes = muted(k[2], 0.0), muted(k[3], 0.0), muted(k[4], 0.4)
    # variants
    short_sleeve = jax.random.bernoulli(k[5], 0.3, (batch, 1))
    dress = jax.random.bernoulli(k[6], 0.15, (batch, 1))
    bottom = jnp.where(dress, top, bottom)
    groups = jnp.stack([skin, top, bottom, shoes], axis=1)  # (B, 4, 3)

    g_of_face = jnp.asarray(_PART_TO_GARMENT)[np.asarray(face_parts)]  # (F,)
    tables = jnp.take_along_axis(
        groups, g_of_face[None, :, None].repeat(3, -1) * jnp.ones(
            (batch, 1, 1), jnp.int32), axis=1)  # (B, F, 3)
    # short sleeves: arm faces (parts 4, 5) -> skin
    arm = jnp.asarray((np.asarray(face_parts) == 4)
                      | (np.asarray(face_parts) == 5), jnp.float32)[None, :, None]
    tables = jnp.where(short_sleeve[:, None] * arm > 0, skin[:, None], tables)
    bg_row = jnp.zeros((batch, 1, 3), tables.dtype)
    return jnp.concatenate([tables, bg_row], axis=1)  # (B, F+1, 3)


def garment_texture(key, fim_lo: jnp.ndarray, face_parts: np.ndarray) -> jnp.ndarray:
    """Realistic clothed-person texture from a (B, S, S) face-index map at
    OUTPUT resolution: per-sample garment color tables + fabric shading
    (low-amp fractal) + a vertical illumination ramp. In [-1, 1]."""
    k1, k2, k3 = jax.random.split(key, 3)
    B, S = fim_lo.shape[0], fim_lo.shape[1]
    tables = garment_tables(k1, B, face_parts)
    tex = jax.vmap(lambda f, t: rz.encode_fim(f[None], t)[0])(fim_lo, tables)
    shade = 1.0 + 0.18 * fractal_noise(k2, B, S, 1)
    ramp = 1.0 - 0.25 * jnp.linspace(0, 1, S)[None, :, None, None]
    amb = jax.random.uniform(k3, (B, 1, 1, 1), minval=0.75, maxval=1.05)
    return jnp.clip(tex * shade * ramp * amb, -1, 1)


_TEXTURE_BANK = None


def _texture_bank() -> np.ndarray:
    """Small bank of REAL photographs available offline (sklearn's bundled
    sample images: an outdoor temple scene and a vegetation macro). Random
    crops of these carry true photographic texture statistics — grass,
    foliage, sky, architecture — that no procedural generator matches, and
    they are exactly the textures the segmenter false-fires on when trained
    purely procedurally. Returns (N, H, W, 3) in [-1, 1]; N=0 when sklearn
    is unavailable (callers fall back to procedural plates).

    Cached as HOST numpy (a jnp array materialized inside a jit trace would
    be a tracer and leak across traces); callers convert per-trace."""
    global _TEXTURE_BANK
    if _TEXTURE_BANK is None:
        imgs = []
        try:
            from sklearn.datasets import load_sample_images

            for im in load_sample_images().images:
                imgs.append(np.asarray(im, np.float32) / 127.5 - 1.0)
        except Exception:
            pass
        # NOTE: matplotlib's grace_hopper.jpg is deliberately NOT in this
        # bank — it contains a person, and background/fabric plates must be
        # person-free (a visible face labeled 'background' is anti-signal).
        # It serves as a held-out real probe instead (assets/real_gt.json).
        if imgs:
            h = min(i.shape[0] for i in imgs)
            w = min(i.shape[1] for i in imgs)
            _TEXTURE_BANK = np.stack([i[:h, :w] for i in imgs])
        else:
            _TEXTURE_BANK = np.zeros((0, 2, 2, 3), np.float32)
    return _TEXTURE_BANK


def synth_background_real(key, batch: int, size: int) -> jnp.ndarray:
    """Background plates cropped from REAL photographs (`_texture_bank`):
    random image / zoom (25-100% of the frame) / offset / h-flip / color
    jitter. Axis-aligned crops make the bilinear gather separable (two 1-D
    gathers instead of a 2-D grid sample). Falls back to
    `synth_background_photo` when no bank is available."""
    bank_np = _texture_bank()
    if bank_np.shape[0] == 0:
        return synth_background_photo(key, batch, size)
    bank = jnp.asarray(bank_np)
    n, H, W, _ = bank.shape
    kb, ks, kt, kf, kc1, kc2 = jax.random.split(key, 6)
    idx = jax.random.randint(kb, (batch,), 0, n)
    side = jax.random.uniform(ks, (batch, 1), minval=0.25, maxval=1.0)
    txy = jax.random.uniform(kt, (batch, 2), minval=0.0, maxval=1.0)
    flip = jax.random.bernoulli(kf, 0.5, (batch, 1))
    u = jnp.linspace(0.0, 1.0, size)[None]
    gx = (txy[:, 0:1] * (1 - side) + u * side) * (W - 1)
    gy = (txy[:, 1:2] * (1 - side) + u * side) * (H - 1)
    gx = jnp.where(flip, (W - 1) - gx, gx)

    def crop_one(i, gy, gx):
        img = bank[i]  # (H, W, 3)
        y0 = jnp.clip(jnp.floor(gy).astype(jnp.int32), 0, H - 2)
        x0 = jnp.clip(jnp.floor(gx).astype(jnp.int32), 0, W - 2)
        wy = (gy - y0)[:, None, None]
        wx = (gx - x0)[None, :, None]
        rows = img[y0] * (1 - wy) + img[y0 + 1] * wy        # (size, W, 3)
        return rows[:, x0] * (1 - wx) + rows[:, x0 + 1] * wx

    out = jax.vmap(crop_one)(idx, gy, gx)
    scale = jax.random.uniform(kc1, (batch, 1, 1, 3), minval=0.6, maxval=1.4)
    shift = jax.random.uniform(kc2, (batch, 1, 1, 3), minval=-0.25, maxval=0.25)
    return jnp.clip(out * scale + shift, -1, 1)


def synth_background_mix(key, batch: int, size: int,
                         real_frac: float = 0.0) -> jnp.ndarray:
    """The background distribution for perception training: `real_frac`
    real-photo crops, and of the rest 75% photo-statistics procedural / 25%
    legacy procedural (gradients+checkers+noise).

    real_frac defaults to 0: the offline real bank is only TWO photographs
    (`_texture_bank`), and measured on the bundled real media a net trained
    with real_frac 0.5 memorizes their statistics as 'background' and stops
    firing on real people entirely (round-3 A/B: person mask on the real
    still collapsed 0.21 -> 0.02 coverage). Keep it a light regularizer
    (<0.2) unless the bank grows."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    photo = synth_background_photo(k2, batch, size)
    old = synth_background(k3, batch, size)
    u = jax.random.uniform(k4, (batch, 1, 1, 1))
    cut = real_frac + 0.75 * (1.0 - real_frac)
    out = jnp.where(u < cut, photo, old)
    if real_frac > 0.0:
        real = synth_background_real(k1, batch, size)
        out = jnp.where(u < real_frac, real, out)
    return out


def person_texture_mix(key, cond: jnp.ndarray, batch: int, size: int,
                       real_frac: float = 0.0) -> jnp.ndarray:
    """Person appearance for composited training scenes.

    Half procedural (random per-part linear color transform of the SMPL
    part-condition map + fractal shading — gives part-distinct 'clothing'
    cues), half REAL texture crops (fabric/texture statistics from
    `_texture_bank`, shaded by the part map for limb structure). Without the
    real half, 'looks photographic' perfectly separates fg from bg once real
    backgrounds are in the mix, and the segmenter learns exactly that —
    rejecting real people in real photos.
    """
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    M = jax.random.uniform(k1, (batch, 3, 3), minval=-1, maxval=1)
    proc = jnp.einsum("bhwc,bcd->bhwd", cond, M)
    proc = proc + 0.35 * fractal_noise(k2, batch, size, 1)
    proc = jnp.tanh(proc + 0.15 * jax.random.normal(k3, proc.shape))
    # real fabric: tighter crops (more zoomed) than background plates, with
    # part-map shading so limbs stay distinguishable
    if real_frac <= 0.0:
        return proc
    real = synth_background_real(k4, batch, size)
    shade = 0.65 + 0.35 * jnp.mean(cond, axis=-1, keepdims=True)
    real = jnp.clip(real * shade, -1, 1)
    use_real = jax.random.bernoulli(k5, real_frac, (batch, 1, 1, 1))
    return jnp.where(use_real, real, proc)


def _blur3(x: jnp.ndarray, strength: jnp.ndarray) -> jnp.ndarray:
    """Separable 3-tap blur with per-sample strength in [0, 1]."""
    w = jnp.asarray([0.25, 0.5, 0.25])
    pad = ((0, 0), (1, 1), (0, 0), (0, 0))
    xp = jnp.pad(x, pad, mode="edge")
    h = w[0] * xp[:, :-2] + w[1] * xp[:, 1:-1] + w[2] * xp[:, 2:]
    pad = ((0, 0), (0, 0), (1, 1), (0, 0))
    hp = jnp.pad(h, pad, mode="edge")
    b = w[0] * hp[:, :, :-2] + w[1] * hp[:, :, 1:-1] + w[2] * hp[:, :, 2:]
    return x + strength * (b - x)


def photo_augment(key, img: jnp.ndarray, strength: float = 1.0) -> jnp.ndarray:
    """Camera-pipeline augmentation: resolution jitter, blur, per-channel
    color jitter, grayscale mixing, gamma, posterization, vignette, sensor
    noise — the photometric gap between clean renders and photographs.
    Measured on the bundled real media, sim2real transfer of nets trained on
    these scenes peaks early then decays as they overfit clean-render
    statistics; heavier invariance pressure here moves the synthetic optimum
    toward the photo domain. img (B, H, W, C) in [-1, 1]."""
    b, h, w_, c = img.shape
    k = jax.random.split(key, 11)
    # resolution jitter: blend with 1/2- and 1/4-res reconstructions (real
    # video frames at detection work-res are soft; renders are pixel-crisp)
    lo2 = jax.image.resize(jax.image.resize(
        img, (b, h // 2, w_ // 2, c), "linear"), (b, h, w_, c), "linear")
    lo4 = jax.image.resize(jax.image.resize(
        img, (b, h // 4, w_ // 4, c), "linear"), (b, h, w_, c), "linear")
    w2 = jax.random.uniform(k[6], (b, 1, 1, 1)) ** 2 * strength
    w4 = jax.random.uniform(k[7], (b, 1, 1, 1)) ** 3 * strength
    img = img * (1 - w2 - w4 * 0.5) + lo2 * w2 + lo4 * (w4 * 0.5)
    img = _blur3(img, jax.random.uniform(k[0], (b, 1, 1, 1), minval=0.0,
                                         maxval=min(1.0, strength)))
    scale = jax.random.uniform(k[1], (b, 1, 1, 3), minval=0.7, maxval=1.3)
    shift = jax.random.uniform(k[2], (b, 1, 1, 3), minval=-0.15, maxval=0.15)
    img = img * scale + shift
    # grayscale mixing: force shape cues over color identity
    g = jnp.mean(img, axis=-1, keepdims=True)
    a = jax.random.uniform(k[8], (b, 1, 1, 1), minval=0.0,
                           maxval=0.6 * strength)
    img = img * (1 - a) + g * a
    # gamma in [0.7, 1.4] applied in [0, 1] space
    gamma = jax.random.uniform(k[3], (b, 1, 1, 1), minval=0.7, maxval=1.4)
    img01 = jnp.clip((img + 1) * 0.5, 1e-4, 1.0)
    img = jnp.power(img01, gamma) * 2.0 - 1.0
    # posterization (codec-ish quantization), q levels in [8, 40]
    q = jax.random.uniform(k[9], (b, 1, 1, 1), minval=8.0, maxval=40.0)
    post = jnp.round((img + 1.0) * 0.5 * q) / q * 2.0 - 1.0
    use_post = (jax.random.uniform(k[10], (b, 1, 1, 1)) < 0.4 * strength)
    img = jnp.where(use_post, post, img)
    # vignette
    yy, xx = jnp.meshgrid(jnp.linspace(-1, 1, h), jnp.linspace(-1, 1, w_),
                          indexing="ij")
    r2 = (xx ** 2 + yy ** 2)[None, ..., None]
    vig = jax.random.uniform(k[4], (b, 1, 1, 1), minval=0.0, maxval=0.4)
    img = img - vig * r2
    img = img + 0.04 * jax.random.normal(k[5], img.shape)
    return jnp.clip(img, -1, 1)


def motion_blur(key, img: jnp.ndarray, max_len: float = 12.0,
                p: float = 0.5) -> jnp.ndarray:
    """Directional motion-blur augmentation.

    The real driving video's fast limbs carry heavy motion blur while
    procedural renders are pixel-sharp — a measured sim2real cue (the r4/r5
    pose ladders fail hardest on moving wrists/elbows). Each sample gets a
    random line kernel (angle uniform, length 1..max_len px, gaussian
    cross-section) with probability p. Labels are unchanged: the blur is
    symmetric about the true joint position.

    img: (B, H, W, C) any range. Returns same shape/dtype domain.
    """
    B, H, W, C = img.shape
    k1, k2, k3 = jax.random.split(key, 3)
    ang = jax.random.uniform(k1, (B,), maxval=np.pi)
    ln = jax.random.uniform(k2, (B,), minval=1.0, maxval=max_len)
    use = jax.random.bernoulli(k3, p, (B,))
    K = 13
    off = jnp.arange(K, dtype=jnp.float32) - K // 2
    dy, dx = jnp.meshgrid(off, off, indexing="ij")
    ca, sa = jnp.cos(ang)[:, None, None], jnp.sin(ang)[:, None, None]
    along = dx * ca + dy * sa
    perp = dy * ca - dx * sa
    w = jnp.exp(-(perp ** 2) / 0.5) * (jnp.abs(along) <= ln[:, None, None] / 2)
    w = w / jnp.maximum(w.sum(axis=(1, 2), keepdims=True), 1e-6)

    def one(im, kk):
        return jax.lax.conv_general_dilated(
            im.transpose(2, 0, 1)[None],
            jnp.broadcast_to(kk[None, None], (C, 1, K, K)),
            (1, 1), "SAME", feature_group_count=C)[0].transpose(1, 2, 0)

    blurred = jax.vmap(one)(img, w)
    return jnp.where(use[:, None, None, None], blurred, img)


def compose_scene(key, model, assets, batch: int, size: int,
                  pose_std: float = 0.25, yaw: bool = True,
                  noise: float = 0.05, photo: bool = True,
                  real_frac: float = 0.0, studio_frac: float = 0.0,
                  garment_frac: float = 0.0,
                  natural_frac: float = 0.0) -> SceneBatch:
    """Full labeled scene batch at `size`, rendered supersampled 2x.

    photo=True (default, round-3 sim2real upgrade): 75% photo-statistics
    backgrounds, fractal person shading, contact shadow, and the
    camera-pipeline augmentation — the domain-randomization stack that
    makes perception nets trained here transfer to photographs.

    studio_frac / garment_frac (round-4 v7 upgrades): fraction of scenes
    with studio/stage backgrounds (`synth_background_studio`) and of people
    clothed in realistic muted garments (`garment_texture`) — the recipe
    that lifted the person segmenter's real-photo box IoU (docs/PARITY.md)."""
    ka, kb, kc, kd, ke, kf, kg, kh, ki = jax.random.split(key, 9)
    theta = make_theta(ka, batch, pose_std=pose_std, yaw=yaw,
                       natural_frac=natural_frac)
    details = smpl_mod.get_details(model, theta)
    fim = render_fim(model, theta, size * 2, f2uvs=assets.f2uvs, details=details)
    hard_hi = (fim >= 0).astype(jnp.float32)[..., None]
    alpha = _downsample2(hard_hi)
    cond = _downsample2(rz.encode_fim(fim, assets.map_fn))
    if photo:
        bg = synth_background_mix(kb, batch, size, real_frac=real_frac)
        if studio_frac > 0.0:
            studio = synth_background_studio(kf, batch, size)
            use_st = jax.random.bernoulli(
                jax.random.fold_in(kf, 1), studio_frac,
                (batch, 1, 1, 1)).astype(jnp.float32)
            bg = bg * (1 - use_st) + studio * use_st
    else:
        bg = synth_background(kb, batch, size)
    if photo:
        tex = person_texture_mix(kc, cond, batch, size, real_frac=real_frac)
        if garment_frac > 0.0:
            garm = _downsample2(garment_texture(kg, fim, assets.face_parts))
            use_g = jax.random.bernoulli(
                jax.random.fold_in(kg, 1), garment_frac,
                (batch, 1, 1, 1)).astype(jnp.float32)
            tex = tex * (1 - use_g) + garm * use_g
        # contact shadow under the person
        sh = jnp.roll(alpha, (size // 32, size // 24), axis=(1, 2))
        sh = jax.lax.reduce_window(sh, 0.0, jax.lax.add,
                                   (1, 5, 5, 1), (1, 1, 1, 1), "SAME") / 25.0
        amp = jax.random.uniform(ki, (batch, 1, 1, 1), minval=0.0, maxval=0.5)
        bg = bg - amp * sh * (bg + 1.0) * 0.5
        del kd, kh
    else:
        M = jax.random.uniform(kc, (batch, 3, 3), minval=-1, maxval=1)
        tex = jnp.einsum("bhwc,bcd->bhwd", cond, M)
        tex = jnp.tanh(tex + 0.15 * jax.random.normal(kd, tex.shape))
    img = tex * alpha + bg * (1.0 - alpha)
    if photo:
        img = photo_augment(ke, img)
    else:
        img = jnp.clip(img + noise * jax.random.normal(ke, img.shape), -1, 1)
    j2d = details["j2d"]
    return SceneBatch(img=img, alpha=alpha,
                      mask=(alpha > 0.5).astype(jnp.float32),
                      bg=bg, theta=theta, j2d=j2d)


def random_holes(key, batch: int, size: int, max_holes: int = 4) -> jnp.ndarray:
    """Random rectangular + elliptical hole masks (1 = hole), (B, S, S, 1).

    The production inpainting hole is a dilated person mask; rectangles +
    ellipses of person-like aspect cover that support compactly.
    """
    yy, xx = jnp.meshgrid(jnp.linspace(0, 1, size), jnp.linspace(0, 1, size),
                          indexing="ij")
    ks = jax.random.split(key, max_holes)

    def one_hole(k):
        kc, kw, ke = jax.random.split(k, 3)
        c = jax.random.uniform(kc, (batch, 2, 1, 1), minval=0.1, maxval=0.9)
        wh = jax.random.uniform(kw, (batch, 2, 1, 1), minval=0.05, maxval=0.35)
        is_ellipse = jax.random.bernoulli(ke, 0.5, (batch, 1, 1))
        dx = jnp.abs(xx[None] - c[:, 0]) / wh[:, 0]
        dy = jnp.abs(yy[None] - c[:, 1]) / wh[:, 1]
        rect = (jnp.maximum(dx, dy) < 1.0)
        ell = (dx ** 2 + dy ** 2 < 1.0)
        return jnp.where(is_ellipse, ell, rect)

    holes = jnp.zeros((batch, size, size), bool)
    for k in ks:
        holes = holes | one_hole(k)
    return holes.astype(jnp.float32)[..., None]


# ---------------------------------------------------------------------------
# OpenPose targets: Body-25 joints + PAFs from SMPL
# ---------------------------------------------------------------------------

def body25_from_cocoplus(j2d_coco: jnp.ndarray):
    """cocoplus-19 NDC joints -> (Body-25 joints (B, 25, 2), valid (25,) np).

    Inverse of `pose2d.BODY25_TO_COCOPLUS19`; the six unmapped Body-25
    channels (toes/heels, 19-24) are marked invalid and carry zero loss
    weight — the production decode path only consumes the mapped nineteen.
    `valid` stays a host numpy array so target-construction control flow can
    branch on it under jit.
    """
    from ipercore_tpu.tools.pose2d import BODY25_TO_COCOPLUS19

    B = j2d_coco.shape[0]
    out = jnp.zeros((B, 25, 2), j2d_coco.dtype)
    valid = np.zeros((25,), np.float32)
    m = np.asarray(BODY25_TO_COCOPLUS19)
    out = out.at[:, m, :].set(j2d_coco)
    valid[m] = 1.0
    return out, valid


def _pose2d_targets(joints_ndc: jnp.ndarray, valid: np.ndarray, hm_size: int,
                    sigma: float, limbs, paf_ids, n_paf_ch: int):
    """Shared builder: gaussian heatmaps (+background) and limb PAFs.

    joints_ndc: (B, J, 2) NDC; valid: host (J,) 0/1; limbs/paf_ids: topology.
    Returns (heatmaps (B, h, h, J+1), pafs (B, h, h, n_paf_ch),
    hm_weight (J+1,), paf_weight (n_paf_ch,)).
    """
    px = (joints_ndc + 1.0) * 0.5 * hm_size - 0.5  # heatmap pixel coords
    B = px.shape[0]
    yy, xx = jnp.meshgrid(jnp.arange(hm_size, dtype=jnp.float32),
                          jnp.arange(hm_size, dtype=jnp.float32), indexing="ij")
    d2 = ((xx[None, None] - px[:, :, 0, None, None]) ** 2
          + (yy[None, None] - px[:, :, 1, None, None]) ** 2)  # (B, J, h, h)
    hm = jnp.exp(-d2 / (2 * sigma ** 2)) * valid[None, :, None, None]
    bgc = jnp.clip(1.0 - hm.max(axis=1, keepdims=True), 0.0, 1.0)
    heatmaps = jnp.moveaxis(jnp.concatenate([hm, bgc], axis=1), 1, -1)
    hm_weight = np.concatenate([valid, np.ones((1,), np.float32)])

    pafs = jnp.zeros((B, n_paf_ch, hm_size, hm_size))
    paf_weight = np.zeros((n_paf_ch,), np.float32)
    for (ja, jb), (cx, cy) in zip(limbs, paf_ids):
        if not (float(valid[ja]) and float(valid[jb])):
            continue
        a, bpt = px[:, ja], px[:, jb]  # (B, 2)
        ab = bpt - a
        norm = jnp.maximum(jnp.linalg.norm(ab, axis=-1, keepdims=True), 1e-5)
        u = ab / norm  # (B, 2)
        rel_x = xx[None] - a[:, 0, None, None]
        rel_y = yy[None] - a[:, 1, None, None]
        along = rel_x * u[:, 0, None, None] + rel_y * u[:, 1, None, None]
        across = jnp.abs(rel_x * u[:, 1, None, None] - rel_y * u[:, 0, None, None])
        on_limb = ((along >= -1.0) & (along <= norm[:, :, None] + 1.0)
                   & (across <= 1.5)).astype(jnp.float32)
        pafs = pafs.at[:, cx].set(on_limb * u[:, 0, None, None])
        pafs = pafs.at[:, cy].set(on_limb * u[:, 1, None, None])
        paf_weight[cx] = paf_weight[cy] = 1.0
    return heatmaps, jnp.moveaxis(pafs, 1, -1), hm_weight, paf_weight


def make_pose2d_targets_b25(b25_ndc: jnp.ndarray, valid_b: jnp.ndarray,
                            hm_size: int, sigma: float = 1.5):
    """Per-sample-validity Body-25 targets for pseudo-labeled REAL crops.

    `_pose2d_targets` takes a host-static `valid` shared across the batch —
    right for synthetic scenes where the joint set is fixed by the cocoplus
    regressor. Pseudo labels from the self-training loop
    (`scripts/pseudo_label_pose.py`) instead carry per-sample, per-joint
    confidence, so validity must be traced.

    b25_ndc: (B, 25, 2) NDC; valid_b: (B, 25) 0/1 float.
    Returns (heatmaps (B,h,h,26), pafs (B,h,h,52), hm_w (B,1,1,26),
    paf_w (B,1,1,52)); the weight tensors broadcast against (B,h,h,C)
    losses, unlike the global channel weights of the synthetic builder.
    The background channel is supervised only where every production joint
    is valid — an unknown joint position must not teach "no person here".
    """
    from ipercore_tpu.tools.pose2d import BODY25_TO_COCOPLUS19
    from ipercore_tpu.tools.pose2d_decode import BODY25_LIMBS, BODY25_PAF_IDS

    S = hm_size
    # sanitize invalid slots (decoders emit NaN there): finite garbage,
    # weights zero it out of every loss term
    safe = jnp.where(valid_b[..., None] > 0, b25_ndc, -2.0)
    px = (safe + 1.0) * 0.5 * S - 0.5
    B = px.shape[0]
    yy, xx = jnp.meshgrid(jnp.arange(S, dtype=jnp.float32),
                          jnp.arange(S, dtype=jnp.float32), indexing="ij")
    d2 = ((xx[None, None] - px[:, :, 0, None, None]) ** 2
          + (yy[None, None] - px[:, :, 1, None, None]) ** 2)  # (B, 25, h, h)
    hm = jnp.exp(-d2 / (2 * sigma ** 2)) * valid_b[:, :, None, None]
    bgc = jnp.clip(1.0 - hm.max(axis=1, keepdims=True), 0.0, 1.0)
    heatmaps = jnp.moveaxis(jnp.concatenate([hm, bgc], axis=1), 1, -1)
    # the 19 production joints (toes/heels 19-24 never carry pseudo labels)
    prod = np.zeros((25,), np.float32)
    prod[np.asarray(BODY25_TO_COCOPLUS19)] = 1.0
    bg_w = jnp.prod(jnp.where(prod > 0, valid_b, 1.0), axis=1)  # (B,)
    hm_w = jnp.concatenate([valid_b, bg_w[:, None]], axis=1)  # (B, 26)

    pafs = jnp.zeros((B, 52, S, S))
    paf_w = jnp.zeros((B, 52))
    for (ja, jb), (cx, cy) in zip(BODY25_LIMBS, BODY25_PAF_IDS):
        w = valid_b[:, ja] * valid_b[:, jb]  # (B,)
        a, bpt = px[:, ja], px[:, jb]
        ab = bpt - a
        norm = jnp.maximum(jnp.linalg.norm(ab, axis=-1, keepdims=True), 1e-5)
        u = ab / norm
        rel_x = xx[None] - a[:, 0, None, None]
        rel_y = yy[None] - a[:, 1, None, None]
        along = rel_x * u[:, 0, None, None] + rel_y * u[:, 1, None, None]
        across = jnp.abs(rel_x * u[:, 1, None, None] - rel_y * u[:, 0, None, None])
        on_limb = ((along >= -1.0) & (along <= norm[:, :, None] + 1.0)
                   & (across <= 1.5)).astype(jnp.float32)
        pafs = pafs.at[:, cx].set(on_limb * u[:, 0, None, None])
        pafs = pafs.at[:, cy].set(on_limb * u[:, 1, None, None])
        paf_w = paf_w.at[:, cx].set(w)
        paf_w = paf_w.at[:, cy].set(w)
    return (heatmaps, jnp.moveaxis(pafs, 1, -1),
            hm_w[:, None, None, :], paf_w[:, None, None, :])


def make_pose2d_targets(j2d_coco: jnp.ndarray, hm_size: int,
                        sigma: float = 1.5):
    """Gaussian heatmaps + limb PAFs at `hm_size` from cocoplus joints.

    Returns (heatmaps (B, h, h, 26), pafs (B, h, h, 52), hm_weight (26,),
    paf_weight (52,)) matching `OpenPoseBody25` channel conventions
    (channel 25 = background).
    """
    from ipercore_tpu.tools.pose2d_decode import BODY25_LIMBS, BODY25_PAF_IDS

    b25, valid = body25_from_cocoplus(j2d_coco)  # NDC
    return _pose2d_targets(b25, valid, hm_size, sigma,
                           BODY25_LIMBS, BODY25_PAF_IDS, 52)


# cocoplus-19 index feeding each COCO-18 joint (Mobilenet variant head):
# nose, neck, R-sho/elb/wri, L-sho/elb/wri, R-hip/knee/ank, L-hip/knee/ank,
# R/L-eye, R/L-ear.
COCO18_FROM_COCOPLUS = np.asarray(
    [13, 12, 8, 7, 6, 9, 10, 11, 2, 1, 0, 3, 4, 5, 15, 17, 14, 16], np.int32)


def make_pose2d_targets_coco18(j2d_coco: jnp.ndarray, hm_size: int,
                               sigma: float = 1.5):
    """COCO-18 targets for `MobilenetOpenPose`: (B, h, h, 19) heatmaps
    (channel 18 = background) + (B, h, h, 38) PAFs."""
    from ipercore_tpu.tools.pose2d_decode import COCO18_LIMBS, COCO18_PAF_IDS

    j18 = j2d_coco[:, COCO18_FROM_COCOPLUS]
    valid = np.ones((18,), np.float32)
    return _pose2d_targets(j18, valid, hm_size, sigma,
                           COCO18_LIMBS, COCO18_PAF_IDS, 38)
