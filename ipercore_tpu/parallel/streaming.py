"""Double-buffered host<->device streaming synthesis.

The reference writes one png per frame synchronously inside its frame loop
(`iPERCore/models/imitator.py:368-374`), serializing host IO with GPU compute.
Here device work is dispatched asynchronously (JAX's default), one chunk ahead
of the host fetch, while a thread pool drains completed frames to disk — so
encode/decode rides under device compute.

    synth = StreamingSynthesizer(comp, gen, params, cache, chunk=8)
    paths = synth.run(tgt_smpls, out_dir)
"""
from __future__ import annotations

import concurrent.futures as cf
import os
from typing import Optional

import numpy as np


class StreamingSynthesizer:
    def __init__(self, comp, generator, params, cache, chunk: int = 8,
                 io_workers: int = 4, offsets=0.0, links_ids=None,
                 compute_dtype="auto"):
        import jax
        import jax.numpy as jnp

        from ipercore_tpu.models import imitator as imit

        self.comp = comp
        self.generator = generator
        self.params = params
        self.cache = cache
        self.chunk = chunk
        self.offsets = offsets
        self.links_ids = links_ids
        if compute_dtype == "auto":
            compute_dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else None

        @jax.jit
        def run_chunk(params, cache, smpls):
            return imit.synthesize_frames(comp, generator, params, cache, smpls,
                                          offsets, links_ids,
                                          compute_dtype=compute_dtype)

        self._run = run_chunk
        self._pool = cf.ThreadPoolExecutor(max_workers=io_workers)

    def run(self, tgt_smpls: np.ndarray, out_dir: Optional[str] = None,
            name_fmt: str = "pred_{:08d}.png") -> list:
        """Synthesize all frames with one-chunk-deep device pipelining.

        Returns the list of written paths (when out_dir) or frames (ndarray).
        """
        import jax.numpy as jnp

        from ipercore_tpu.utils import video as vid

        n = len(tgt_smpls)
        c = self.chunk
        pad = (-n) % c
        smpls = np.concatenate(
            [tgt_smpls, np.repeat(tgt_smpls[-1:], pad, axis=0)]) if pad else tgt_smpls
        n_chunks = len(smpls) // c

        if out_dir:
            os.makedirs(out_dir, exist_ok=True)

        futures = []
        results: list = [None] * n

        # dispatch chunk 0
        pending = self._run(self.params, self.cache, jnp.asarray(smpls[:c]))
        for ci in range(n_chunks):
            # dispatch next chunk before fetching the current one: device
            # compute overlaps the host transfer + png encode below
            nxt = None
            if ci + 1 < n_chunks:
                nxt = self._run(self.params, self.cache,
                                jnp.asarray(smpls[(ci + 1) * c:(ci + 2) * c]))
            preds, _ = pending
            host = np.asarray(preds)  # blocks on this chunk only
            for j in range(c):
                fi = ci * c + j
                if fi >= n:
                    break
                if out_dir:
                    path = os.path.join(out_dir, name_fmt.format(fi))
                    futures.append(self._pool.submit(vid.save_image, path, host[j]))
                    results[fi] = path
                else:
                    results[fi] = host[j]
            pending = nxt

        for f in futures:
            f.result()
        return results
