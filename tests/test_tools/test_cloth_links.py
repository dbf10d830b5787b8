"""SmplLinker-parity cloth links (`link_utils.py:57-197`) on a synthetic body."""
import numpy as np

from ipercore_tpu.models import smpl as smpl_mod
from ipercore_tpu.tools.deformers import smpl_link


def _legs(model):
    """Split low-body vertices into left/right by x sign (y-down: legs at
    large y)."""
    v = np.asarray(model.v_template)
    low = v[:, 1] > 0.3
    left = np.nonzero(low & (v[:, 0] > 0.02))[0]
    right = np.nonzero(low & (v[:, 0] < -0.02))[0]
    return left.astype(np.int64), right.astype(np.int64)


def test_smpl_link_gates_by_skirt_y():
    model = smpl_mod.synthetic_model(nu=20, nv=18)
    legs = _legs(model)
    theta = np.zeros((85,), np.float32)
    theta[0] = 1.0  # cam scale

    # hem at the very bottom of the frame: every inner vertex is above it
    none_links = smpl_link(model, theta, skirt_y=-1.5, leg_ids=legs)
    assert none_links.shape == (0, 3) or len(none_links) == 0

    # hem at the very top: all inner-leg vertices link
    all_links = smpl_link(model, theta, skirt_y=1.5, leg_ids=legs)
    assert len(all_links) > 0
    left, right = legs
    fr, to, flag = all_links[:, 0], all_links[:, 1], all_links[:, 2]
    assert np.all(flag == 1)
    # every link crosses legs: from-right -> to-left or from-left -> to-right
    in_l = np.isin(fr, left)
    in_r = np.isin(fr, right)
    assert np.all(in_l | in_r)
    assert np.all(np.isin(to[in_r], left))
    assert np.all(np.isin(to[in_l], right))

    # mid hem keeps strictly fewer links than the full set
    some_links = smpl_link(model, theta, skirt_y=0.6, leg_ids=legs)
    assert 0 < len(some_links) <= len(all_links)


def test_smpl_link_nearest_is_by_y():
    model = smpl_mod.synthetic_model(nu=20, nv=18)
    legs = _legs(model)
    theta = np.zeros((85,), np.float32)
    theta[0] = 1.0
    links = smpl_link(model, theta, skirt_y=1.5, leg_ids=legs)
    v = np.asarray(model.v_template)
    # spot-check: each target attains the minimal y distance on the opposite
    # leg (ties allowed — the sphere mesh has many equal-y vertices)
    left, right = legs
    for fr, to, _ in links[:5]:
        opp = left if fr in right else right
        dy = (v[fr, 1] - v[opp, 1]) ** 2
        assert abs(dy[list(opp).index(to)] - dy.min()) < 1e-10
