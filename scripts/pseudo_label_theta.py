"""Chain-distilled pseudo SMPL labels for SPIN on the bundled real video.

Direct sim2real retraining of the image->theta regressor stalls (r5: the
real-probe PCK sits at chance through 8k steps — procedural appearance does
not transfer). But the production *chain* does work on real frames: detected
keypoints (self-trained OpenPose, flip-TTA) + multi-hypothesis SMPLify
produce thetas whose reprojection matches the 2D evidence. This script
distills that chain into labels: run stage-1.3 over the pseudo-labeled crop
sequence (temporal terms active), keep frames whose confidence-weighted
reprojection error clears a gate, and save (crop, theta) pairs for
`train_spin.py --pseudo` — amortizing SMPLify into the regressor, which is
exactly SPIN's own "in the loop" training idea
(`/root/reference/iPERCore/tools/human_pose3d_estimators/spin/`), with the
optimizer output standing in for the unavailable downloaded checkpoint.

Leakage discipline: input is `.cache/pseudo_pose/akun_pseudo.npz`, which only
ever contains frames < 160; the val band and stills never enter.

Usage: python scripts/pseudo_label_theta.py [--err_gate 0.09]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

IN_NPZ = os.path.join(REPO, ".cache", "pseudo_pose", "akun_pseudo.npz")
OUT_NPZ = os.path.join(REPO, ".cache", "pseudo_pose", "akun_theta.npz")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--err_gate", type=float, default=0.09,
                    help="max confidence-weighted reprojection error (crop "
                         "NDC; person height is ~1.7 NDC) for a kept label")
    ap.add_argument("--iters", type=int, default=150,
                    help="SMPLify iterations (offline labeling can afford "
                         "far more than the preprocessing default)")
    ap.add_argument("--report", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".cache", "jax_compilation"))

    from ipercore_tpu.models import smpl as smpl_mod
    from ipercore_tpu.tools.pose2d import body25_to_cocoplus
    from ipercore_tpu.tools.pose3d import (GMM_DEFAULT_WEIGHTS, SMPLifyConfig,
                                           SPINRunner, load_gmm_prior,
                                           reprojection_error,
                                           smplify_refine_multi)

    d = np.load(IN_NPZ, allow_pickle=True)
    crops = np.asarray(d["crops"], np.float32)
    kps, valid = d["kps_ndc"], d["valid"]
    N = len(crops)
    print(f"{N} pseudo-labeled crops", flush=True)

    spin = SPINRunner()
    if not spin.trained:
        raise SystemExit("no trained spin weights")
    model = smpl_mod.template_model()
    c224 = np.asarray(jax.image.resize(
        jnp.asarray(crops), (N, 224, 224, 3), "linear"))
    theta0 = spin.run(c224)

    kps19, conf19 = body25_to_cocoplus(kps, valid)
    prior = load_gmm_prior(GMM_DEFAULT_WEIGHTS)
    cfg = SMPLifyConfig()._replace(n_iters=args.iters)
    theta = np.asarray(smplify_refine_multi(
        model, jnp.asarray(theta0), jnp.asarray(kps19), jnp.asarray(conf19),
        cfg=cfg, prior=prior))
    err = np.asarray(reprojection_error(
        model, jnp.asarray(theta), jnp.asarray(kps19), jnp.asarray(conf19)))
    keep = err < args.err_gate
    stats = {"n": int(N), "kept": int(keep.sum()),
             "err_mean": round(float(err.mean()), 4),
             "err_med": round(float(np.median(err)), 4),
             "err_gate": args.err_gate}
    print(json.dumps(stats), flush=True)
    if args.report or not keep.any():
        return
    np.savez_compressed(
        OUT_NPZ,
        crops=crops[keep].astype(np.float16),
        theta=theta[keep].astype(np.float32),
        frames=d["frames"][keep], meta=json.dumps(stats))
    print(f"wrote {OUT_NPZ}", flush=True)


if __name__ == "__main__":
    main()
