"""Batched multi-chip serving: shard a clip batch over the mesh 'data' axis.

The stretch config of BASELINE.json ("8 clips/batch over v5e-8"): the whole
inference pipeline is data-parallel per clip, so serving N clips on N chips
is one jitted program with batch-sharded inputs and replicated (or
TP-sharded) parameters — GSPMD splits every phase automatically. This is
the mesh-native counterpart of the reference's rank-sharded prompt list
(scripts/evaluation/ddp_wrapper.py).
"""

from __future__ import annotations

import jax

from tooncrafter_tpu.parallel import mesh as M


class BatchedPipeline:
    """Wraps models.diffusion.Pipeline with mesh shardings."""

    def __init__(self, pipeline, mesh=None, shard_params: bool = False):
        self.pipe = pipeline
        self.mesh = mesh or M.make_mesh()
        self.shard_params = shard_params

    def place_params(self, params):
        if self.shard_params:
            return jax.device_put(params,
                                  M.shard_params(params, self.mesh,
                                                 zero_shard=False))
        return jax.device_put(params, M.replicated(self.mesh))

    def __call__(self, params, videos, tokens, null_tokens, fs, rng):
        """videos: (B, T, H, W, 3) with B divisible by mesh['data']."""
        b = videos.shape[0]
        n_data = self.mesh.shape["data"]
        assert b % n_data == 0, (b, n_data)
        sh = M.batch_sharding(self.mesh)
        videos = jax.device_put(videos, sh)
        tokens = jax.device_put(tokens, sh)
        null_tokens = jax.device_put(null_tokens, sh)
        fs = jax.device_put(fs, sh)
        return self.pipe(params, videos, tokens, null_tokens, fs, rng)
