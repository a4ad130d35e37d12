"""Training observability: metric logging, LR monitor, sampled-video logger.

Counterparts of the reference callbacks (main/callbacks.py):
  * ImageLogger (:15-101): every N steps run full DDIM sampling from the
    current weights and dump an mp4 grid for eyeballing.
  * CUDACallback (:104-133): wall-time + memory per epoch -> here a per-step
    timing/throughput tracker plus jax device memory stats.
  * LearningRateMonitor -> scalar log of the optax schedule.

Logging goes to JSONL (always) and TensorBoard when tensorboardX /
tf.summary is importable; JSONL keeps the driver dependency-free.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional

import numpy as np


class MetricLogger:
    def __init__(self, logdir: str, flush_every: int = 20):
        os.makedirs(logdir, exist_ok=True)
        self.path = os.path.join(logdir, "metrics.jsonl")
        self._f = open(self.path, "a")
        self._n = 0
        self.flush_every = flush_every
        self._tb = None
        try:  # optional TensorBoard writer
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(logdir)
        except Exception:
            pass

    def log(self, step: int, metrics: Dict[str, Any]):
        row = {"step": int(step), "time": time.time()}
        for k, v in metrics.items():
            try:
                row[k] = float(v)
            except (TypeError, ValueError):
                continue
        self._f.write(json.dumps(row) + "\n")
        self._n += 1
        if self._n % self.flush_every == 0:
            self._f.flush()
        if self._tb is not None:
            for k, v in row.items():
                if k not in ("step", "time"):
                    self._tb.add_scalar(k, v, step)

    def close(self):
        self._f.flush()
        self._f.close()
        if self._tb is not None:
            self._tb.close()


class ThroughputTracker:
    """samples/sec + step time; the CUDACallback equivalent."""

    def __init__(self, batch_size: int):
        self.batch_size = batch_size
        self._t = None

    def step(self) -> Dict[str, float]:
        now = time.perf_counter()
        out = {}
        if self._t is not None:
            dt = now - self._t
            out = {"step_time_s": dt,
                   "samples_per_sec": self.batch_size / dt}
        self._t = now
        return out


def device_memory_stats() -> Dict[str, float]:
    import jax

    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        return {"hbm_bytes_in_use": float(stats.get("bytes_in_use", 0)),
                "hbm_peak_bytes": float(stats.get("peak_bytes_in_use", 0))}
    except Exception:
        return {}


class VideoSampleLogger:
    """Every N steps: run the full sampling pipeline on a fixed probe batch
    and write the result as mp4 (ImageLogger equivalent)."""

    def __init__(self, model, logdir: str, every_steps: int = 500,
                 ddim_steps: int = 25, cfg_scale: float = 7.5):
        self.model = model
        self.dir = os.path.join(logdir, "samples")
        os.makedirs(self.dir, exist_ok=True)
        self.every = every_steps
        self.ddim_steps = ddim_steps
        self.cfg_scale = cfg_scale

    def maybe_log(self, step: int, params, probe_batch, rng) -> Optional[str]:
        if step % self.every != 0:
            return None
        import jax
        import jax.numpy as jnp

        from tooncrafter_tpu.models.diffusion import middle_frame_splice
        from tooncrafter_tpu.sampling.ddim import GuidanceConfig
        from tooncrafter_tpu.utils.video_io import write_video

        video = jnp.asarray(probe_batch["video"][:1])
        tokens = jnp.asarray(probe_batch["tokens"][:1])
        null_tokens = jnp.asarray(probe_batch["null_tokens"][:1])
        fs = jnp.asarray(probe_batch["fs"][:1], jnp.float32)
        r1, r2, r3 = jax.random.split(rng, 3)
        z, refs = self.model.encode_first_stage(params, video, rng=r1)
        concat = self.model.build_concat_cond(z, "repeat")
        text = self.model.encode_text(params, tokens)
        uc_text = self.model.encode_text(params, null_tokens)
        img = self.model.encode_image_context(params, video[:, 0])
        uc_img = self.model.encode_image_context(
            params, jnp.zeros_like(video[:, 0]))
        contexts = jnp.stack([
            jnp.concatenate([uc_text, uc_img], axis=1),
            jnp.concatenate([text, img], axis=1)])
        x_T = jax.random.normal(r2, z.shape)
        samples = self.model.denoise(
            params, x_T, contexts, concat, fs, r3,
            GuidanceConfig(cfg_scale=self.cfg_scale),
            ddim_steps=self.ddim_steps)
        out = middle_frame_splice(self.model, params, samples, refs)
        path = os.path.join(self.dir, f"step_{step:08d}.mp4")
        return write_video(path, np.asarray(out[0], np.float32))
