"""Fit and ship the SMPLify GMM pose prior (`assets/gmm_prior.npz`).

The reference's SMPLify uses a downloadable 8-component max-mixture prior
fit on CMU mocap (`smplify/prior.py:99-215`, gmm_08.pkl). No mocap data is
downloadable here, so this fits the same-shaped prior on samples from the
repo's realistic pose mixture (`synth_data.natural_pose` arms-down/walking
stance + the isotropic coverage floor) — the same distribution the round-4
perception nets are trained on. With the prior present, `smplify_refine`
switches its pose term from "L2 toward the SPIN init" (which anchors the
fit to SPIN's mistakes on photographs) to the max-mixture NLL that prefers
*plausible human poses* regardless of the init.

Usage: python scripts/fit_gmm_prior.py [--n 16384] [--k 8]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16384)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--natural_frac", type=float, default=0.7)
    ap.add_argument("--pose_std", type=float, default=0.25)
    ap.add_argument("--out", type=str,
                    default=os.path.join(REPO, "assets", "gmm_prior.npz"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ipercore_tpu.tools.pose3d import fit_gmm_raw, _build_gmm_prior, gmm_prior_nll
    from ipercore_tpu.tools.synth_data import natural_pose

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(7), 3)
    nat = natural_pose(k1, args.n)
    iso = jax.random.normal(k2, (args.n, 72)) * args.pose_std
    use = jax.random.bernoulli(k3, args.natural_frac, (args.n, 1))
    pose = np.asarray(jnp.where(use, nat, iso))
    body = pose[:, 3:]  # drop global orient -> 69-dim body pose

    means, covs, weights = fit_gmm_raw(body, k=args.k)
    np.savez(args.out, means=means, covars=covs, weights=weights)

    # sanity: NLL of held-out natural poses must be far below T-pose NLL
    prior = _build_gmm_prior(means, covs, weights)
    hold = np.asarray(natural_pose(jax.random.PRNGKey(99), 256))[:, 3:]
    nll_nat = float(np.mean(np.asarray(gmm_prior_nll(prior, jnp.asarray(hold)))))
    nll_tpose = float(np.mean(np.asarray(gmm_prior_nll(
        prior, jnp.zeros((1, 69))))))
    print(json.dumps({"out": args.out, "k": args.k, "n": args.n,
                      "nll_natural_holdout": round(nll_nat, 2),
                      "nll_tpose": round(nll_tpose, 2)}))


if __name__ == "__main__":
    main()
