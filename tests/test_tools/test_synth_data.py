"""Procedural supervision scenes (tools/synth_data.py) — CPU-hermetic."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ipercore_tpu.models import smpl as smpl_mod
from ipercore_tpu.models.mesh import load_assets
from ipercore_tpu.tools import synth_data as sd


@pytest.fixture(scope="module")
def scene_model():
    model = smpl_mod.synthetic_model(nu=16, nv=14)
    assets = load_assets(model, uv_map_path="/nonexistent", part_path="/nonexistent")
    return model, assets


def test_compose_scene_labels_consistent(scene_model):
    model, assets = scene_model
    # photo=False: the strict compositing invariant (img == bg outside the
    # person up to noise) holds only without the camera-pipeline augmentation
    sb = sd.compose_scene(jax.random.PRNGKey(0), model, assets, batch=2,
                          size=64, photo=False)
    assert sb.img.shape == (2, 64, 64, 3)
    assert sb.alpha.shape == (2, 64, 64, 1)
    assert sb.theta.shape == (2, 85)
    assert sb.j2d.shape == (2, 19, 2)
    # scene == background outside the person (up to noise)
    out_region = np.asarray(jnp.abs(sb.img - sb.bg) * (1 - sb.alpha))
    assert out_region.mean() < 0.1
    # the person occupies a plausible fraction of the frame
    frac = float(sb.mask.mean())
    assert 0.02 < frac < 0.6
    # labels are finite
    for f in sb._fields:
        assert np.isfinite(np.asarray(getattr(sb, f))).all(), f


def test_compose_scene_photo_domain(scene_model):
    """photo=True (default): augmented composite stays in range with the same
    geometric labels; the person still dominates its alpha region."""
    model, assets = scene_model
    sb = sd.compose_scene(jax.random.PRNGKey(0), model, assets, batch=2, size=64)
    assert np.abs(np.asarray(sb.img)).max() <= 1.0 + 1e-5
    assert 0.02 < float(sb.mask.mean()) < 0.6
    for f in sb._fields:
        assert np.isfinite(np.asarray(getattr(sb, f))).all(), f


def test_make_theta_yaw_distribution(scene_model):
    model, _ = scene_model
    theta = sd.make_theta(jax.random.PRNGKey(1), 64)
    orient = np.asarray(theta[:, 3:6])
    # full yaw ring: orientation magnitudes spread beyond the tilt scale
    mags = np.linalg.norm(orient, axis=1)
    assert mags.max() > 2.0 and mags.std() > 0.5
    # jit-compatible (constants stay host-side)
    jax.jit(lambda k: sd.make_theta(k, 4))(jax.random.PRNGKey(2))


def test_pose2d_targets_under_jit(scene_model):
    """Heatmap peaks land on the joints; PAF channel weights match validity;
    the whole target construction works inside jit (host-side masks)."""
    j2d = jnp.zeros((1, 19, 2))  # all joints at image center
    hm, paf, hm_w, paf_w = jax.jit(
        lambda j: sd.make_pose2d_targets(j, 16))(j2d)
    assert hm.shape == (1, 16, 16, 26) and paf.shape == (1, 16, 16, 52)
    # valid joint channels peak at the center
    c = 16 // 2
    peak = np.asarray(hm[0, :, :, 0])
    iy, ix = np.unravel_index(peak.argmax(), peak.shape)
    assert abs(iy - c) <= 1 and abs(ix - c) <= 1
    # toe/heel Body-25 channels (19-24) carry zero weight
    assert float(np.asarray(hm_w)[19:25].sum()) == 0.0
    assert float(np.asarray(hm_w)[:19].sum()) == 19.0


def test_no_prng_key_reuse_in_module():
    """Regression for the r3/r4 advisor findings (photo_augment k[9];
    synth_background_studio cx/cy both from k[10]): within any one function,
    no constant-indexed split key (`k[3]`, `kk[0]`, ...) may be passed as the
    key argument of more than one `jax.random.*` call — same key + same draw
    count means identical (or affinely dependent) samples, silently collapsing
    a documented N-dim augmentation range onto a lower-dim slice."""
    import ast
    import collections
    import inspect

    src = inspect.getsource(sd)
    tree = ast.parse(src)

    def assigned_names(node):
        out = set()
        for n in ast.walk(node):
            if isinstance(n, ast.Assign):
                for t in n.targets:
                    if isinstance(t, ast.Name):
                        out.add(t.id)
        return out

    def key_uses(body, skip_for_bodies=True):
        """Count constant-index key uses in `body` (a list of stmts).

        A `for` loop whose body reassigns a key array (e.g. `kk =
        jax.random.split(...)` per iteration) is its own scope — uses there
        are fresh per iteration — so it is counted separately, not merged."""
        uses = collections.Counter()
        scopes = []
        for stmt in body:
            for node in ast.walk(stmt):
                if skip_for_bodies and isinstance(node, ast.For):
                    inner_assigned = assigned_names(node)
                    # count the loop body as a separate scope for any name it
                    # reassigns; names NOT reassigned inside still merge up
                    scopes.append((node, inner_assigned))
        def count(node):
            if not isinstance(node, ast.Call):
                return None
            f = node.func
            # match jax.random.<anything>(first_arg, ...)
            if not (isinstance(f, ast.Attribute) and isinstance(f.value, ast.Attribute)
                    and isinstance(f.value.value, ast.Name)
                    and f.value.value.id == "jax" and f.value.attr == "random"):
                return None
            if not node.args:
                return None
            a = node.args[0]
            if (isinstance(a, ast.Subscript) and isinstance(a.value, ast.Name)
                    and isinstance(a.slice, ast.Constant)):
                return (a.value.id, a.slice.value)
            return None

        loop_nodes = [s[0] for s in scopes]
        sub_counts = []
        for loop, inner in scopes:
            c = collections.Counter()
            for n in ast.walk(loop):
                ku = count(n)
                if ku and ku[0] in inner:
                    c[ku] += 1
            sub_counts.append(c)
        for stmt in body:
            for n in ast.walk(stmt):
                ku = count(n)
                if ku is None:
                    continue
                # skip uses already attributed to a loop sub-scope
                in_sub = any(ku[0] in inner and _contains(loop, n)
                             for loop, inner in scopes)
                if not in_sub:
                    uses[ku] += 1
        return uses, sub_counts

    def _contains(parent, node):
        return any(n is node for n in ast.walk(parent))

    offenders = []
    for fn in [n for n in ast.walk(tree) if isinstance(n, ast.FunctionDef)]:
        uses, sub_counts = key_uses(fn.body)
        for c in [uses] + sub_counts:
            for (name, idx), n in c.items():
                if n > 1:
                    offenders.append(f"{fn.name}: {name}[{idx}] used {n}x")
    assert not offenders, "PRNG key reuse: " + "; ".join(offenders)


def test_random_holes_coverage():
    holes = sd.random_holes(jax.random.PRNGKey(3), 4, 64)
    assert holes.shape == (4, 64, 64, 1)
    m = np.asarray(holes).mean(axis=(1, 2, 3))
    assert (m > 0.0).all() and (m < 0.9).all()
