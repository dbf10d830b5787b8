"""Functional SMPL / SMPL-H body model (linear blend skinning) in JAX.

TPU-native rebuild of the reference's batched SMPL stack
(`iPERCore/tools/human_digitalizer/bodynets/batch_smpl.py`,
`batch_smplh.py`, `base_smpl.py`, and the vendored smplx `lbs.py:137`):
a pure function over a `SMPLModel` pytree of constants — no modules, no state.
Everything jits and vmaps; rodrigues is shared with `ipercore_tpu.ops.rotations`.

The standard 85-dim theta layout is kept: (cam 3 | pose 72 | shape 10)
(`base_smpl.py:51-73`). SMPL-H uses 156-dim pose (52 joints); 72-dim poses are
padded with the model's mean hand pose (`batch_smplh.py:276-301`).

Because the real SMPL pickle assets require a download the build environment
does not have, `synthetic_model()` fabricates a deterministic genus-0 body-ish
mesh with the exact SMPL cardinalities (6890 verts => 13776 faces by Euler's
formula), so every downstream shape/flow/network path runs and tests hermetically.
`load_model()` reads the real pickle when present and produces the same pytree.
"""
from __future__ import annotations

import pickle
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ipercore_tpu.ops.rotations import rodrigues

NUM_VERTS = 6890
NUM_FACES = 13776
NUM_JOINTS_SMPL = 24
NUM_JOINTS_SMPLH = 52
NUM_SHAPE = 10
NUM_COCOPLUS_JOINTS = 19
THETA_DIM = 85  # 3 cam + 72 pose + 10 shape
THETA_DIM_HAND = 156 + 3 + 10  # not used directly; SMPL-H pose is 156


class SMPLModel(NamedTuple):
    """Constant tensors defining a body model. All f32 / int32 arrays.

    v_template: (V, 3); shapedirs: (V, 3, 10); posedirs: (V, 3, 9*(J-1));
    j_regressor: (J, V); lbs_weights: (V, J); parents: (J,);
    joint_regressor: (19, V) cocoplus joints; faces: (F, 3);
    hands_mean: (pose_dim - 66,) mean hand pose for SMPL-H (zeros for SMPL).
    """

    v_template: jnp.ndarray
    shapedirs: jnp.ndarray
    posedirs: jnp.ndarray
    j_regressor: jnp.ndarray
    lbs_weights: jnp.ndarray
    parents: jnp.ndarray
    joint_regressor: jnp.ndarray
    faces: jnp.ndarray
    hands_mean: jnp.ndarray

    @property
    def n_joints(self) -> int:
        return self.parents.shape[0]

    @property
    def pose_dim(self) -> int:
        return self.n_joints * 3


def _np(x):
    """Convert possibly-chumpy/scipy-sparse arrays from SMPL pickles to numpy."""
    if hasattr(x, "toarray"):
        return np.asarray(x.toarray())
    if hasattr(x, "r"):
        return np.asarray(x.r)
    return np.asarray(x)


def load_model(path: str) -> SMPLModel:
    """Load a standard SMPL/SMPL-H pickle (as used at `batch_smpl.py` /
    `deploy.toml:33-34`) into an `SMPLModel` pytree."""
    with open(path, "rb") as f:
        data = pickle.load(f, encoding="latin1")

    v_template = _np(data["v_template"]).astype(np.float32)
    shapedirs = _np(data["shapedirs"]).astype(np.float32)[..., :NUM_SHAPE]
    posedirs = _np(data["posedirs"]).astype(np.float32)
    # stored as (V, 3, P); keep that layout
    j_regressor = _np(data["J_regressor"]).astype(np.float32)
    lbs_weights = _np(data["weights"]).astype(np.float32)
    parents = _np(data["kintree_table"])[0].astype(np.int32)
    parents[0] = 0
    faces = _np(data["f"]).astype(np.int32)
    n_joints = j_regressor.shape[0]
    if "cocoplus_regressor" in data:
        joint_regressor = _np(data["cocoplus_regressor"]).astype(np.float32)
    elif "joint_regressor" in data:
        jr = _np(data["joint_regressor"]).astype(np.float32)
        joint_regressor = jr.T if jr.shape[0] == v_template.shape[0] else jr
    else:
        # fall back to the first 19 kinematic joints
        joint_regressor = j_regressor[:NUM_COCOPLUS_JOINTS]
    if "hands_mean" in data:
        hands_mean = _np(data["hands_mean"]).astype(np.float32)
    else:
        hands_mean = np.zeros((n_joints * 3 - 66,), np.float32) if n_joints > 24 else np.zeros((6,), np.float32)[:0]
    if n_joints <= 24:
        hands_mean = np.zeros((0,), np.float32)

    return SMPLModel(
        v_template=jnp.asarray(v_template),
        shapedirs=jnp.asarray(shapedirs),
        posedirs=jnp.asarray(posedirs),
        j_regressor=jnp.asarray(j_regressor),
        lbs_weights=jnp.asarray(lbs_weights),
        parents=jnp.asarray(parents),
        joint_regressor=jnp.asarray(joint_regressor),
        faces=jnp.asarray(faces),
        hands_mean=jnp.asarray(hands_mean),
    )


def synthetic_model(
    n_joints: int = NUM_JOINTS_SMPL, seed: int = 0, nu: int = 84, nv: int = 82
) -> SMPLModel:
    """Deterministic body-shaped stand-in with exact SMPL cardinalities.

    A UV-sphere (nu x nv grid + 2 poles; default 84 x 82 -> 6890 verts, 13776
    faces — the SMPL counts) squashed into a rough humanoid silhouette; smooth
    distance-based skinning weights to a spine of joints; small random
    shape/pose blendshapes. Numerically tame so golden tests are stable across
    backends. Pass smaller (nu, nv) for cheap compile-validation meshes.
    """
    rng = np.random.RandomState(seed)
    V = nu * nv + 2

    # --- vertices: unit sphere -> elongated "body"
    thetas = np.pi * (np.arange(1, nv + 1)) / (nv + 1)  # (nv,) polar, exclusive
    phis = 2 * np.pi * np.arange(nu) / nu  # (nu,)
    tg, pg = np.meshgrid(thetas, phis, indexing="ij")  # (nv, nu)
    x = np.sin(tg) * np.cos(pg)
    y = np.cos(tg)
    z = np.sin(tg) * np.sin(pg)
    # modulate radius along height to fake head/shoulders/waist
    r = 0.28 + 0.1 * np.sin(np.pi * (y + 1) / 2) - 0.08 * np.exp(-((y - 0.72) ** 2) / 0.01)
    verts_grid = np.stack([x * r, y * 0.95, z * r], axis=-1).reshape(-1, 3)
    poles = np.array([[0.0, 0.97, 0.0], [0.0, -0.97, 0.0]])
    v_template = np.concatenate([poles[:1], verts_grid, poles[1:]], axis=0).astype(np.float32)
    assert v_template.shape[0] == V

    # --- faces: top cap, grid quads (2 tris each), bottom cap
    def vid(i, j):  # ring i (0..nv-1), column j (0..nu-1)
        return 1 + i * nu + (j % nu)

    faces = []
    for j in range(nu):  # top cap
        faces.append([0, vid(0, j), vid(0, j + 1)])
    for i in range(nv - 1):
        for j in range(nu):
            a, b, c, d = vid(i, j), vid(i, j + 1), vid(i + 1, j), vid(i + 1, j + 1)
            faces.append([a, b, c])
            faces.append([b, d, c])
    last = V - 1
    for j in range(nu):  # bottom cap
        faces.append([last, vid(nv - 1, j + 1), vid(nv - 1, j)])
    faces = np.asarray(faces, np.int32)
    assert faces.shape[0] == 2 * nu * nv, faces.shape

    # --- joints on a spine + limb-ish offsets, kinematic chain
    J = n_joints
    parents = np.zeros((J,), np.int32)
    joints = np.zeros((J, 3), np.float32)
    joints[0] = [0, -0.2, 0]
    for i in range(1, min(J, 24)):
        parents[i] = max(0, (i - 1) // 2)  # simple binary-ish tree
        direction = rng.randn(3) * 0.1
        joints[i] = joints[parents[i]] + direction + [0, 0.05, 0]
    for i in range(24, J):  # hand joints for SMPL-H
        parents[i] = 20 + (i % 2)
        joints[i] = joints[parents[i]] + rng.randn(3) * 0.02

    # j_regressor: soft assignment of nearest vertices to each joint
    d2 = ((v_template[None, :, :] - joints[:, None, :]) ** 2).sum(-1)  # (J, V)
    jr = np.exp(-d2 / 0.02)
    j_regressor = (jr / jr.sum(axis=1, keepdims=True)).astype(np.float32)

    # lbs weights: softmax over joint distance
    w = np.exp(-d2.T / 0.05)  # (V, J)
    lbs_weights = (w / w.sum(axis=1, keepdims=True)).astype(np.float32)

    shapedirs = (rng.randn(V, 3, NUM_SHAPE) * 0.01).astype(np.float32)
    posedirs = (rng.randn(V, 3, 9 * (J - 1)) * 0.001).astype(np.float32)

    # cocoplus-ish 19-joint regressor: reuse first joints cyclically
    cjr = np.zeros((NUM_COCOPLUS_JOINTS, V), np.float32)
    for k in range(NUM_COCOPLUS_JOINTS):
        cjr[k] = j_regressor[k % min(J, 24)]

    hands_mean = (rng.randn(max(J * 3 - 66, 0)) * 0.05).astype(np.float32) if J > 24 else np.zeros((0,), np.float32)

    return SMPLModel(
        v_template=jnp.asarray(v_template),
        shapedirs=jnp.asarray(shapedirs),
        posedirs=jnp.asarray(posedirs),
        j_regressor=jnp.asarray(j_regressor),
        lbs_weights=jnp.asarray(lbs_weights),
        parents=jnp.asarray(parents),
        joint_regressor=jnp.asarray(cjr),
        faces=jnp.asarray(faces),
        hands_mean=jnp.asarray(hands_mean),
    )


# SMPL kinematic tree (24 joints) — `batch_smpl.py` kintree_table semantics.
_SMPL_PARENTS = np.array(
    [0, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17, 18, 19, 20, 21],
    np.int32)
# cocoplus-19 -> SMPL-24 joint correspondence (approximate; face kps -> head).
_COCOPLUS_FROM_SMPL = np.array(
    [8, 5, 2, 1, 4, 7, 21, 19, 17, 16, 18, 20, 12, 15, 15, 15, 15, 15, 15], np.int32)

_TEMPLATE_CACHE: dict = {}


def _band_centroid(pts: np.ndarray, axis_vals: np.ndarray, lo: float, hi: float) -> np.ndarray:
    """Centroid of the points whose axis value lies in the [lo, hi] quantile band."""
    a, b = np.quantile(axis_vals, [lo, hi])
    sel = (axis_vals >= a) & (axis_vals <= b)
    return pts[sel].mean(axis=0)


def template_model(
    uv_map_path: str | None = None,
    part_path: str | None = None,
    seed: int = 0,
) -> SMPLModel:
    """Body model on the REAL SMPL template: geometry + topology from the
    reference's `mapper_uv.txt` OBJ (6890 verts / 13776 faces —
    `assets/configs/pose3d/`, consumed by ref `mesh.get_f2vts:246`), with a
    skeleton derived from `smpl_part_info.json` part vertex sets and
    synthesized smooth skinning (the licensed SMPL pickle with the learned
    blend weights requires a download this environment does not have).

    The template is stored y-up; it is flipped (180° about x) so the rest
    pose matches this repo's screen convention (y down: feet at max y).

    Falls back to `synthetic_model()` when the asset files are absent.
    """
    from ipercore_tpu.models.mesh import find_asset, load_obj

    uv_map_path = uv_map_path or find_asset("mapper_uv.txt")
    part_path = part_path or find_asset("smpl_part_info.json")
    if not (uv_map_path and part_path):
        return synthetic_model(seed=seed)
    key = (uv_map_path, part_path, seed)
    if key in _TEMPLATE_CACHE:
        return _TEMPLATE_CACHE[key]

    import json

    obj = load_obj(uv_map_path)
    v = obj["vertices"].copy()
    v[:, 1] *= -1.0  # y-up -> y-down (screen)
    v[:, 2] *= -1.0
    faces = obj["faces"].astype(np.int32)
    V = v.shape[0]

    with open(part_path) as f:
        pi = json.load(f)

    def pverts(name):
        ids = np.asarray(pi[name]["vertex"], np.int64)
        return v[ids]

    # --- joints from part vertex bands (y down: smaller y = higher) ---------
    def leg_joints(name):
        p = pverts(name)
        y = p[:, 1]
        hip = _band_centroid(p, y, 0.0, 0.12)
        knee = _band_centroid(p, y, 0.45, 0.55)
        ankle = _band_centroid(p, y, 0.90, 1.0)
        return hip, knee, ankle

    def arm_joints(name):
        p = pverts(name)
        d = np.abs(p[:, 0])
        shoulder = _band_centroid(p, d, 0.0, 0.10)
        elbow = _band_centroid(p, d, 0.45, 0.55)
        wrist = _band_centroid(p, d, 0.92, 1.0)
        return shoulder, elbow, wrist

    l_hip, l_knee, l_ankle = leg_joints("02_left_leg")
    r_hip, r_knee, r_ankle = leg_joints("03_right_leg")
    l_sho, l_elb, l_wri = arm_joints("04_left_arm")
    r_sho, r_elb, r_wri = arm_joints("05_right_arm")
    l_foot = pverts("06_left_foot").mean(axis=0)
    r_foot = pverts("07_right_foot").mean(axis=0)
    l_hand = pverts("08_left_hand").mean(axis=0)
    r_hand = pverts("09_right_hand").mean(axis=0)

    torso = pverts("01_torso")
    neck = _band_centroid(torso, torso[:, 1], 0.0, 0.05)
    head_p = pverts("00_head")
    head = _band_centroid(head_p, head_p[:, 1], 0.3, 0.7)

    pelvis = 0.5 * (l_hip + r_hip)
    spine1 = pelvis + 0.3 * (neck - pelvis)
    spine2 = pelvis + 0.55 * (neck - pelvis)
    spine3 = pelvis + 0.8 * (neck - pelvis)
    l_col = 0.5 * (neck + l_sho)
    r_col = 0.5 * (neck + r_sho)

    joints = np.stack([
        pelvis, l_hip, r_hip, spine1, l_knee, r_knee, spine2, l_ankle, r_ankle,
        spine3, l_foot, r_foot, neck, l_col, r_col, head, l_sho, r_sho,
        l_elb, r_elb, l_wri, r_wri, l_hand, r_hand,
    ]).astype(np.float32)
    parents = _SMPL_PARENTS.copy()
    J = joints.shape[0]

    # --- skinning: softmax over distance to each joint's bone segment -------
    children: list[list[int]] = [[] for _ in range(J)]
    for j in range(1, J):
        children[parents[j]].append(j)

    def seg_dist(p, a, b):
        ab = b - a
        t = np.clip(((p - a) @ ab) / max(float(ab @ ab), 1e-8), 0.0, 1.0)
        proj = a + t[:, None] * ab
        return np.linalg.norm(p - proj, axis=1)

    d = np.empty((V, J), np.float32)
    for j in range(J):
        if children[j]:
            d[:, j] = np.min(
                np.stack([seg_dist(v, joints[j], joints[c]) for c in children[j]]),
                axis=0)
        else:
            d[:, j] = np.linalg.norm(v - joints[j], axis=1)
    w = np.exp(-(d / 0.08) ** 2)
    lbs_weights = (w / w.sum(axis=1, keepdims=True)).astype(np.float32)

    # j_regressor: gaussian over vertex distance to the joint point
    jr = np.exp(-(d.T / 0.05) ** 2)
    j_regressor = (jr / jr.sum(axis=1, keepdims=True)).astype(np.float32)

    rng = np.random.RandomState(seed)
    shapedirs = (rng.randn(V, 3, NUM_SHAPE) * 0.01).astype(np.float32)
    posedirs = (rng.randn(V, 3, 9 * (J - 1)) * 0.001).astype(np.float32)
    joint_regressor = j_regressor[_COCOPLUS_FROM_SMPL]

    model = SMPLModel(
        v_template=jnp.asarray(v.astype(np.float32)),
        shapedirs=jnp.asarray(shapedirs),
        posedirs=jnp.asarray(posedirs),
        j_regressor=jnp.asarray(j_regressor),
        lbs_weights=jnp.asarray(lbs_weights),
        parents=jnp.asarray(parents),
        joint_regressor=jnp.asarray(joint_regressor),
        faces=jnp.asarray(faces),
        hands_mean=jnp.asarray(np.zeros((0,), np.float32)),
    )
    _TEMPLATE_CACHE[key] = model
    return model


def _rigid_transform_chain(rot_mats: jnp.ndarray, joints: jnp.ndarray, parents: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Forward-kinematics chain. rot_mats: (J, 3, 3); joints: (J, 3).

    Returns posed joint locations (J, 3) and relative vert transforms (J, 4, 4)
    (world transform with rest-pose joint location factored out), matching the
    semantics of `batch_global_rigid_transformation` (`batch_smpl.py:~160`).
    """
    J = joints.shape[0]
    rel = joints - jnp.where((jnp.arange(J) == 0)[:, None], 0.0, joints[parents])

    def make_T(R, t):
        top = jnp.concatenate([R, t[..., None]], axis=-1)  # (..., 3, 4)
        bottom = jnp.broadcast_to(
            jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), top.shape[:-2] + (1, 4)
        )
        return jnp.concatenate([top, bottom], axis=-2)

    locals_T = make_T(rot_mats, rel)  # (J, 4, 4)

    parents_np = None if isinstance(parents, jax.core.Tracer) else np.asarray(parents)
    if parents_np is not None:
        # Static topology: walk the kinematic tree LEVEL-wise. The SMPL(-H)
        # tree is <= ~8 deep, so 52 sequential 4x4 matmuls collapse into
        # ~8 vectorized batches — the J-step fori_loop serialized tiny ops
        # and dominated LBS time on TPU.
        depth = np.zeros(J, np.int64)
        for j in range(1, J):
            depth[j] = depth[parents_np[j]] + 1
        A = locals_T
        for d in range(1, int(depth.max()) + 1):
            ids = np.nonzero(depth == d)[0]
            upd = A[parents_np[ids]] @ locals_T[ids]
            A = A.at[ids].set(upd)
    else:
        # traced parents fallback: sequential fori_loop chain
        def body(i, buf):
            T = buf[parents[i]] @ locals_T[i]
            return buf.at[i].set(T)

        buf = jnp.zeros((J, 4, 4), rot_mats.dtype).at[0].set(locals_T[0])
        A = jax.lax.fori_loop(1, J, body, buf)  # (J, 4, 4)

    posed_joints = A[:, :3, 3]
    # factor out rest joint positions: A_rel = A - [0 | A[:, :3, :3] @ j]
    correction = jnp.einsum("jab,jb->ja", A[:, :3, :3], joints)
    A_rel = A.at[:, :3, 3].add(-correction)
    return posed_joints, A_rel


def lbs(
    model: SMPLModel,
    shape: jnp.ndarray,
    pose: jnp.ndarray,
    offsets: jnp.ndarray | float = 0.0,
    links_ids: Optional[jnp.ndarray] = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Linear blend skinning for a single sample.

    Args:
        model: SMPLModel constants.
        shape: (10,) betas.
        pose: (J*3,) axis-angle per joint (or (72,) for SMPL-H, auto-padded
            with the mean hand pose — `batch_smplh.py:280-301`).
        offsets: (V, 3) per-vertex offsets (the digitalizer's cloth offsets) or 0.
        links_ids: optional (L, 3) int array of (from_vert, to_vert, flag):
            where flag==1, vertex `from` is snapped to vertex `to` after
            offsets (cloth links, `base_smpl.py:28-49`).

    Returns:
        verts: (V, 3); joints3d: (J, 3) posed kinematic joints.
    """
    J = model.n_joints
    if pose.shape[-1] < J * 3:
        # 72-dim SMPL pose -> SMPL-H: keep global + 21 body joints (66 dims),
        # drop SMPL's two coarse hand joints, append the mean hand pose
        # (90 dims for J=52) — `batch_smplh.py:280-301`.
        pose = jnp.concatenate([pose[..., :66], model.hands_mean], axis=-1)

    rot = rodrigues(pose.reshape(J, 3))  # (J, 3, 3)
    return lbs_from_rot(model, shape, rot, offsets, links_ids)


def lbs_from_rot(
    model: SMPLModel,
    shape: jnp.ndarray,
    rot: jnp.ndarray,
    offsets: jnp.ndarray | float = 0.0,
    links_ids: Optional[jnp.ndarray] = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """`lbs` with per-joint rotation matrices (J, 3, 3) already computed.

    The rotation-matrix entry point exists for training paths that predict
    rotations directly (the SPIN regressor's rot6d output): the axis-angle
    round-trip `rotmat_to_axis_angle` is singular at theta -> 0/pi and its
    gradient NaNs as predictions sharpen; differentiating through rotmats
    avoids the singularity entirely.
    """
    v_shaped = model.v_template + jnp.einsum("vds,s->vd", model.shapedirs, shape)
    joints = model.j_regressor @ v_shaped  # (J, 3)
    eye = jnp.eye(3, dtype=rot.dtype)
    pose_feature = (rot[1:] - eye).reshape(-1)  # (9*(J-1),)
    v_posed = v_shaped + jnp.einsum("vdp,p->vd", model.posedirs, pose_feature)

    if not isinstance(offsets, (int, float)):
        v_posed = v_posed + offsets

    if links_ids is not None:
        flag = links_ids[:, 2] == 1
        src = links_ids[:, 0]
        tgt = links_ids[:, 1]
        replacement = jnp.where(flag[:, None], v_posed[tgt], v_posed[src])
        v_posed = v_posed.at[src].set(replacement)

    posed_joints, A = _rigid_transform_chain(rot, joints, model.parents)

    T = jnp.einsum("vj,jab->vab", model.lbs_weights, A)  # (V, 4, 4)
    v_h = jnp.concatenate([v_posed, jnp.ones((v_posed.shape[0], 1), v_posed.dtype)], axis=1)
    verts = jnp.einsum("vab,vb->va", T, v_h)[:, :3]
    return verts, posed_joints


def batch_orth_proj_idrot(x3d: jnp.ndarray, cam: jnp.ndarray) -> jnp.ndarray:
    """Weak-perspective projection of 3D points; `base_smpl.py:7-18`.

    x3d: (..., P, 3); cam: (..., 3) = (s, tx, ty). Returns (..., P, 2).
    """
    return cam[..., None, 0:1] * (x3d[..., 0:2] + cam[..., None, 1:3])


def get_details(
    model: SMPLModel,
    theta: jnp.ndarray,
    offsets: jnp.ndarray | float = 0.0,
    links_ids: Optional[jnp.ndarray] = None,
) -> dict:
    """Batched SMPL details: the reference's `get_details` contract
    (`base_smpl.py:107-143`).

    Args:
        theta: (N, 85) = cam(3) + pose(72) + shape(10), or (N, 3+156+10) for
            SMPL-H full-hand poses.

    Returns:
        dict with theta/cam/pose/shape (N, ...), verts (N, V, 3),
        j3d (N, 19, 3), j2d (N, 19, 2).
    """
    cam = theta[:, 0:3]
    pose = theta[:, 3:-NUM_SHAPE]
    shape = theta[:, -NUM_SHAPE:]

    if isinstance(offsets, (int, float)):
        verts, _ = jax.vmap(lambda sh, po: lbs(model, sh, po, 0.0, links_ids))(shape, pose)
    elif offsets.ndim == 2:  # shared (V, 3) offsets for every sample
        verts, _ = jax.vmap(lambda sh, po: lbs(model, sh, po, offsets, links_ids))(shape, pose)
    else:  # per-sample (N, V, 3)
        verts, _ = jax.vmap(lambda sh, po, off: lbs(model, sh, po, off, links_ids))(shape, pose, offsets)

    j3d = jnp.einsum("kv,nvd->nkd", model.joint_regressor, verts)
    j2d = batch_orth_proj_idrot(j3d, cam)
    return {
        "theta": theta,
        "cam": cam,
        "pose": pose,
        "shape": shape,
        "verts": verts,
        "j3d": j3d,
        "j2d": j2d,
    }


def resolve_body_model(opt=None) -> SMPLModel:
    """One body-model choice for every service: explicit pickle path
    (`opt.smpl_model`) > tiny smoke mesh (`opt.smoke_model`) > real SMPL
    template from the reference assets > synthetic stand-in.

    Round-2 fix: preprocessing/personalization/training previously used
    `synthetic_model()` while imitation used `template_model()` — SMPL fits
    estimated on one body were consumed by another."""
    import os as _os

    get = getattr(opt, "get", None) if opt is not None else None
    smpl_path = get("smpl_model", "") if get else ""
    if smpl_path and _os.path.exists(smpl_path):
        return load_model(smpl_path)
    if get and get("smoke_model", False):
        return synthetic_model(nu=20, nv=18)
    return template_model()


def pad_theta_with_hands(theta: jnp.ndarray, model: SMPLModel) -> jnp.ndarray:
    """85-dim theta -> (3 + pose_dim + 10) theta using the model's mean hand pose.

    Mirrors `add_hands_params_to_smpl` (`services/base_runner.py:33`).
    """
    n = theta.shape[0]
    cam, pose, shape = theta[:, :3], theta[:, 3:75], theta[:, 75:]
    hands = jnp.broadcast_to(model.hands_mean, (n, model.hands_mean.shape[0]))
    return jnp.concatenate([cam, pose[:, :66], hands, shape], axis=1)
