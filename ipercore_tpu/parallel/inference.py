"""Sharded frame synthesis: split the target-frame axis across the mesh.

Frames are independent given the SourceCache (non-temporal mode), so inference
scales linearly over chips with zero collectives in the hot loop: the cache and
params are replicated, the SMPL batch is sharded on `frames`, and each chip
rasterizes + generates its slice. This replaces the reference's strictly
serial per-frame python loop (`iPERCore/models/imitator.py:341`).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ipercore_tpu.models import imitator as imit
from ipercore_tpu.models import flow_composition as fc
from ipercore_tpu.parallel.mesh import pad_to_multiple


def sharded_synthesize(
    comp: fc.FlowComposer,
    generator,
    params,
    cache: imit.SourceCache,
    tgt_smpl: jnp.ndarray,
    mesh: Mesh,
    axis_name: str = "frames",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Synthesize frames with the frame axis sharded over `mesh`.

    Args:
        tgt_smpl: (T, 85) — padded up to a device multiple internally.

    Returns:
        preds (T, S, S, 3), masks (T, S, S, 1) — unpadded.
    """
    n_dev = mesh.devices.size
    smpls, true_t = pad_to_multiple(tgt_smpl, n_dev, axis=0)

    frame_sharding = NamedSharding(mesh, P(axis_name))
    rep = NamedSharding(mesh, P())

    @functools.partial(
        jax.jit,
        in_shardings=(rep, rep, frame_sharding),
        out_shardings=(frame_sharding, frame_sharding),
    )
    def run(p, c, s):
        return imit.synthesize_frames(comp, generator, p, c, s)

    preds, masks = run(params, cache, smpls)
    return preds[:true_t], masks[:true_t]
