"""Top-level latent visual diffusion model (ToonCrafter pipeline).

The functional equivalent of LatentVisualDiffusion
(/root/reference/lvdm/models/ddpm3d.py:1041-1240) plus the inference-side
conditioning assembly of scripts/evaluation/inference.py:180-277 — but as a
pure (params, rng, inputs) -> outputs pipeline:

  encode_first_stage . build_conditioning . ddim_sample . decode_first_stage

Everything between host IO boundaries jits into one graph per phase; the
hybrid conditioning contract (c_concat latents + [text || per-frame image]
cross-attn tokens) matches the reference exactly, including:
  * interp mode: c_concat zero except frames {0, -1} (inference.py:196-204)
  * latent scale factor 0.18215 (config `scale_factor`)
  * the dual-ref decoder consumes raw 1/scale latents with post_quant_conv
    skipped (autoencoder.py:112-116)
  * middle-frame splice: re-decode with latent frames {1, -2} dropped and
    overwrite the two center frames (inference.py:264-270)
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from tooncrafter_tpu.models.clip import (CLIPTextTower, CLIPVisionTower,
                                         clip_preprocess)
from tooncrafter_tpu.models.resampler import Resampler
from tooncrafter_tpu.models.unet import UNetModel
from tooncrafter_tpu.models.vae import AutoencoderKL, DiagonalGaussian
from tooncrafter_tpu.models.vae_dualref import DualRefVideoDecoder
from tooncrafter_tpu.ops import schedule as S
from tooncrafter_tpu.sampling.ddim import GuidanceConfig, ddim_sample
from tooncrafter_tpu.utils import rngs as R


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Shapes/hyperparameters of the shipped 320x512 interpolation model
    (configs/inference_512_v1.0.yaml)."""

    # diffusion
    timesteps: int = 1000
    linear_start: float = 0.00085
    linear_end: float = 0.012
    beta_schedule: str = "linear"
    rescale_betas_zero_snr: bool = True
    parameterization: str = "v"
    scale_factor: float = 0.18215
    uncond_type: str = "empty_seq"  # 'empty_seq' | 'zero_embed'
    use_dynamic_rescale: bool = True
    base_scale: float = 0.7
    turning_step: int = 400
    # loss weighting (ddpm3d.py:62-71,775-794). Shipped configs leave all
    # four at the inert defaults; the knobs are honored (not ignored) —
    # see training/trainer.diffusion_loss.
    learn_logvar: bool = False
    logvar_init: float = 0.0
    original_elbo_weight: float = 0.0
    l_simple_weight: float = 1.0
    # offset-noise strength (ddpm3d.py:753-757): adds noise_strength *
    # per-(batch,frame,channel) noise broadcast over H, W
    noise_strength: float = 0.0
    # which batch signal feeds the fps embedding during training:
    # 'fs' -> frame_stride, 'fps' -> real fps (ddpm3d.py:486,1124-1129);
    # the shipped ToonCrafter YAMLs set 'fps'
    fps_condition_type: str = "fs"
    # model-level memory behavior: chunked per-frame VAE passes
    # (ddpm3d.py:487,631,656); CLI --perframe_ae overrides when passed
    perframe_ae: bool = False
    # parsed for config parity; stored-but-never-read in the reference too
    # (ddpm3d.py:485,506 — loop behavior is driven by the CLI --loop flag)
    loop_video: bool = False
    # geometry
    video_length: int = 16
    latent_h: int = 40
    latent_w: int = 64
    # unet
    unet_in_channels: int = 8
    unet_out_channels: int = 4
    model_channels: int = 320
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (4, 2, 1)
    channel_mult: Sequence[int] = (1, 2, 4, 4)
    num_head_channels: int = 64
    transformer_depth: int = 1
    context_dim: int = 1024
    fs_condition: bool = True
    default_fs: int = 24
    image_cross_attention_scale_learnable: bool = False
    use_checkpoint: bool = False  # remat UNet blocks during training
    remat_policy: Any = None  # None | 'dots' | 'dots_no_batch' (unet.py)
    use_relative_position: bool = False
    use_causal_attention: bool = False
    # vae
    vae_ch: int = 128
    vae_ch_mult: Sequence[int] = (1, 2, 4, 4)
    vae_num_res_blocks: int = 2
    z_channels: int = 4
    dualref_attn_level: Sequence[int] = (2, 3)
    dualref_time_mode: str = "conv-only"  # 'all' | 'conv-only' | 'attn-only'
    # conditioning
    clip_text_width: int = 1024
    clip_text_heads: int = 16
    clip_text_layers: int = 24
    clip_vision_width: int = 1280
    clip_vision_heads: int = 16
    clip_vision_layers: int = 32
    clip_image_size: int = 224
    resampler_depth: int = 4
    resampler_heads: int = 12
    resampler_queries: int = 16
    # dtypes
    compute_dtype: Any = jnp.float32

    def tiny(self, **overrides) -> "ModelConfig":
        """A CPU-testable shrink of every tower (same topology)."""
        small = dict(
            video_length=4, latent_h=4, latent_w=4,
            model_channels=64, num_res_blocks=1, channel_mult=(1, 2),
            attention_resolutions=(1, 2), num_head_channels=32,
            context_dim=64,
            vae_ch=32, vae_ch_mult=(1, 2, 2, 2), vae_num_res_blocks=1,
            dualref_attn_level=(2, 3),
            clip_text_width=64, clip_text_heads=4, clip_text_layers=2,
            clip_vision_width=64, clip_vision_heads=4, clip_vision_layers=2,
            clip_image_size=28,
            resampler_depth=1, resampler_heads=4, resampler_queries=4,
        )
        small.update(overrides)
        return dataclasses.replace(self, **small)


class ToonCrafter:
    """Builds the module set and exposes pure pipeline functions.

    Parameter tree layout (one sub-tree per tower, matching the reference's
    module split for checkpoint conversion):
      {'unet', 'vae', 'dualref_decoder', 'text_encoder', 'image_encoder',
       'image_proj'}
    """

    def __init__(self, config: ModelConfig):
        self.config = c = config
        self.schedule = S.build_schedule(
            timesteps=c.timesteps, beta_schedule=c.beta_schedule,
            linear_start=c.linear_start, linear_end=c.linear_end,
            rescale_betas_zero_snr=c.rescale_betas_zero_snr,
            parameterization=c.parameterization,
            use_dynamic_rescale=c.use_dynamic_rescale,
            base_scale=c.base_scale, turning_step=c.turning_step)
        dt = c.compute_dtype
        self.unet = UNetModel(
            in_channels=c.unet_in_channels, model_channels=c.model_channels,
            out_channels=c.unet_out_channels,
            num_res_blocks=c.num_res_blocks,
            attention_resolutions=tuple(c.attention_resolutions),
            channel_mult=tuple(c.channel_mult),
            num_head_channels=c.num_head_channels,
            transformer_depth=c.transformer_depth,
            context_dim=c.context_dim, temporal_length=c.video_length,
            fs_condition=c.fs_condition, default_fs=c.default_fs,
            img_tokens_per_frame=c.resampler_queries,
            image_cross_attention_scale_learnable=(
                c.image_cross_attention_scale_learnable),
            use_checkpoint=c.use_checkpoint,
            remat_policy=c.remat_policy,
            use_relative_position=c.use_relative_position,
            use_causal_attention=c.use_causal_attention, dtype=dt)
        self.vae = AutoencoderKL(
            ch=c.vae_ch, ch_mult=tuple(c.vae_ch_mult),
            num_res_blocks=c.vae_num_res_blocks, z_channels=c.z_channels,
            embed_dim=c.z_channels, dtype=dt)
        self.dualref_decoder = DualRefVideoDecoder(
            ch=c.vae_ch, ch_mult=tuple(c.vae_ch_mult),
            num_res_blocks=c.vae_num_res_blocks,
            attn_level=tuple(c.dualref_attn_level),
            time_mode=c.dualref_time_mode, dtype=dt)
        self.text_encoder = CLIPTextTower(
            width=c.clip_text_width, heads=c.clip_text_heads,
            layers=c.clip_text_layers, dtype=dt)
        self.image_encoder = CLIPVisionTower(
            width=c.clip_vision_width, heads=c.clip_vision_heads,
            layers=c.clip_vision_layers, dtype=dt)
        self.image_proj = Resampler(
            dim=c.context_dim, depth=c.resampler_depth,
            heads=c.resampler_heads, num_queries=c.resampler_queries,
            embedding_dim=c.clip_vision_width, output_dim=c.context_dim,
            video_length=c.video_length, dtype=dt)

    # ------------------------------------------------------------------
    # init
    # ------------------------------------------------------------------

    def init_params(self, rng) -> Dict[str, Any]:
        """Jitted initialization — eager flax init dispatches thousands of
        host ops (minutes on remote-dispatch backends); one compiled init
        per tower is orders of magnitude faster."""
        c = self.config
        ks = jax.random.split(rng, 6)
        t = c.video_length
        h_px = c.latent_h * 8
        w_px = c.latent_w * 8
        frame = jnp.zeros((1, h_px, w_px, 3))
        z = jnp.zeros((1, t, c.latent_h, c.latent_w, c.z_channels))
        ctx = jnp.zeros((1, 77 + t * c.resampler_queries, c.context_dim))
        x = jnp.zeros((1, t, c.latent_h, c.latent_w, c.unet_in_channels))
        ts = jnp.zeros((1,))
        params = {}
        params["vae"] = jax.jit(self.vae.init)(ks[0], frame)["params"]
        # dual-ref decoder init needs ref taps shaped like encoder taps
        taps = self._tap_shapes(h_px, w_px)
        refs = [jnp.zeros((1, 2, th, tw, tc)) for (th, tw, tc) in taps]
        params["dualref_decoder"] = jax.jit(self.dualref_decoder.init)(
            ks[1], z, refs)["params"]
        params["unet"] = jax.jit(self.unet.init)(ks[2], x, ts, ctx, ts)["params"]
        toks = jnp.zeros((1, 77), jnp.int32)
        params["text_encoder"] = jax.jit(self.text_encoder.init)(ks[3], toks)["params"]
        sz = c.clip_image_size
        img = jnp.zeros((1, sz, sz, 3))
        params["image_encoder"] = jax.jit(self.image_encoder.init)(ks[4], img)["params"]
        n_patch = (sz // self.image_encoder.patch_size) ** 2 + 1
        vis_tokens = jnp.zeros((1, n_patch, c.clip_vision_width))
        params["image_proj"] = jax.jit(self.image_proj.init)(
            ks[5], vis_tokens)["params"]
        return params

    def param_shapes(self, rng=None):
        """Shape-only parameter template (jax.eval_shape; no compute) —
        used by the checkpoint converter for validation."""
        rng = jax.random.PRNGKey(0) if rng is None else rng
        return jax.eval_shape(self.init_params, rng)

    def _tap_shapes(self, h_px, w_px):
        c = self.config
        shapes = []
        h, w = h_px, w_px
        for i, mult in enumerate(c.vae_ch_mult):
            shapes.append((h, w, c.vae_ch * mult))
            if i != len(c.vae_ch_mult) - 1:
                h, w = (h + 1) // 2, (w + 1) // 2
        shapes.append((h_px, w_px, c.vae_ch))  # conv_in tap
        return shapes

    # ------------------------------------------------------------------
    # pipeline stages (pure)
    # ------------------------------------------------------------------

    def encode_first_stage(self, params, video, rng=None,
                           sample_posterior: bool = True,
                           chunk_size: Optional[int] = None):
        """video: (B, T, H, W, 3) in [-1,1] -> (z: (B,T,h,w,4) scaled,
        ref taps: list of (B,2,H_l,W_l,C_l) first/last-frame features).

        chunk_size bounds how many frames the encoder sees at once — the
        `perframe_ae` memory path (ddpm3d.py:630-640; the reference encodes
        one frame at a time). The encoder is per-frame, so chunking is
        numerically identical."""
        b, t = video.shape[:2]
        flat = video.reshape((b * t,) + video.shape[2:])

        def enc(x):
            return self.vae.apply(
                {"params": params["vae"]}, x, return_hidden_states=True,
                method=AutoencoderKL.encode)

        if chunk_size is None or flat.shape[0] <= chunk_size:
            moments, taps = enc(flat)
        else:
            parts = [enc(flat[i:i + chunk_size])
                     for i in range(0, flat.shape[0], chunk_size)]
            moments = jnp.concatenate([p[0] for p in parts], axis=0)
            taps = [jnp.concatenate([p[1][l] for p in parts], axis=0)
                    for l in range(len(parts[0][1]))]
        post = DiagonalGaussian(moments)
        if sample_posterior and rng is not None:
            if R.is_batched(rng):
                # per-item keys: draw each clip's posterior noise from its
                # own key so encode is batch-size invariant
                noise = R.normal(rng, (b, t) + post.mean.shape[1:],
                                 post.mean.dtype)
                noise = noise.reshape(post.mean.shape)
                z = post.mean + post.std * noise
            else:
                z = post.sample(rng)
        else:
            z = post.mode()
        z = z.reshape((b, t) + z.shape[1:]) * self.config.scale_factor
        refs = []
        for tap in taps:
            tap = tap.reshape((b, t) + tap.shape[1:])
            refs.append(jnp.concatenate([tap[:, :1], tap[:, -1:]], axis=1))
        return z, refs

    def encode_text(self, params, tokens):
        return self.text_encoder.apply(
            {"params": params["text_encoder"]}, jnp.asarray(tokens))

    def encode_image_context(self, params, frame):
        """frame: (B, H, W, 3) in [-1,1] -> (B, T*queries, context_dim)."""
        x = clip_preprocess(frame, self.config.clip_image_size)
        tokens = self.image_encoder.apply(
            {"params": params["image_encoder"]}, x)
        return self.image_proj.apply({"params": params["image_proj"]}, tokens)

    def build_concat_cond(self, z, mode: str = "interp"):
        """Hybrid c_concat: zeros except frames {0,-1} (interp) or the
        first-frame latent repeated (single-image i2v)."""
        if mode == "interp":
            zeros = jnp.zeros_like(z[:, 1:-1])
            return jnp.concatenate([z[:, :1], zeros, z[:, -1:]], axis=1)
        return jnp.tile(z[:, :1], (1, z.shape[1], 1, 1, 1))

    def denoise(self, params, x_T, contexts, concat, fs, rng,
                guidance: GuidanceConfig, ddim_steps: int = 50,
                eta: float = 1.0, spacing: str = "uniform_trailing",
                temperature: float = 1.0):
        ddim = S.build_ddim_schedule(self.schedule, ddim_steps, eta, spacing)

        def denoiser(x, ts, ctx, fs_):
            # the sampler stacks CFG branches over identical x/ts/fs
            # (ddim_sample tiles them); declare it so the UNet runs the
            # context-free stem once per clip instead of per branch
            return self.unet.apply({"params": params["unet"]}, x, ts, ctx,
                                   fs_, cfg_groups=guidance.num_branches)

        return ddim_sample(denoiser, self.schedule, ddim, x_T, contexts,
                           concat, fs, rng, guidance, temperature)

    def decode_first_stage(self, params, z, refs,
                           chunk_size: Optional[int] = None):
        """z: (B,T,h,w,4) scaled latents -> video (B,T,H,W,3); dual-ref
        decode with post_quant_conv skipped.

        chunk_size decodes in temporal chunks like the reference's
        `perframe_ae` decode_core (ddpm3d.py:647-679: chunks of
        temporal_length frames, each a fresh timesteps=len(chunk) decode
        with the same first/last-frame refs) — required for T > 16 and the
        memory-constrained path."""
        z = z / self.config.scale_factor

        def dec(zc):
            return self.dualref_decoder.apply(
                {"params": params["dualref_decoder"]}, zc, refs)

        t = z.shape[1]
        if chunk_size is None or t <= chunk_size:
            return dec(z)
        return jnp.concatenate(
            [dec(z[:, i:i + chunk_size])
             for i in range(0, t, chunk_size)], axis=1)

    def decode_plain(self, params, z):
        """Non-dualref decode path (DynamiCrafter-style single-image mode)."""
        b, t = z.shape[:2]
        flat = (z / self.config.scale_factor).reshape((b * t,) + z.shape[2:])
        out = self.vae.apply({"params": params["vae"]}, flat,
                             method=AutoencoderKL.decode)
        return out.reshape((b, t) + out.shape[1:])


class Pipeline:
    """Per-phase jitted inference pipeline.

    One monolithic jit of encode+denoise+decode produces a very large XLA
    program (slow to compile, especially via remote-compile backends);
    phase-splitting keeps each unit small, lets the denoise graph be reused
    across decode variants, and matches the natural host-sync points.
    """

    def __init__(self, model: ToonCrafter, ddim_steps: int = 50,
                 eta: float = 1.0, spacing: str = "uniform_trailing",
                 guidance: Optional["GuidanceConfig"] = None,
                 mode: str = "interp", use_splice: bool = True,
                 perframe_ae: bool = False):
        from tooncrafter_tpu.sampling.ddim import GuidanceConfig as GC

        self.model = model
        self.guidance = guidance or GC(cfg_scale=7.5, guidance_rescale=0.7)
        self.mode = mode
        self.use_splice = use_splice
        self._ddim = dict(ddim_steps=ddim_steps, eta=eta, spacing=spacing)
        # perframe_ae: chunk the VAE passes like the reference
        # (ddpm3d.py:630-679) — per-frame encode, temporal_length-frame
        # chunked decode
        self._enc_chunk = 1 if perframe_ae else None
        self._dec_chunk = model.config.video_length if perframe_ae else None

        m = model

        @jax.jit
        def encode(params, video, rng):
            z, refs = m.encode_first_stage(params, video, rng=rng,
                                           chunk_size=self._enc_chunk)
            concat = m.build_concat_cond(z, self.mode)
            return z, refs, concat

        @jax.jit
        def conditioning(params, tokens, null_tokens, frame0):
            text = m.encode_text(params, tokens)
            # uncond text branch: empty-prompt embedding or plain zeros
            # (inference.py:206-210 / config `uncond_type`)
            if m.config.uncond_type == "zero_embed":
                uc_text = jnp.zeros_like(text)
            else:
                uc_text = m.encode_text(params, null_tokens)
            img = m.encode_image_context(params, frame0)
            uc_img = m.encode_image_context(params, jnp.zeros_like(frame0))
            cond = jnp.concatenate([text, img], axis=1)
            uc = jnp.concatenate([uc_text, uc_img], axis=1)
            if self.guidance.num_branches == 3:
                uc2 = jnp.concatenate([uc_text, img], axis=1)
                return jnp.stack([uc, uc2, cond])
            if self.guidance.num_branches == 2:
                return jnp.stack([uc, cond])
            return cond[None]

        @jax.jit
        def denoise(params, z_shape_like, contexts, concat, fs, rng):
            r1, r2 = R.split(rng)
            x_T = R.normal(r1, z_shape_like.shape)
            return m.denoise(params, x_T, contexts, concat, fs, r2,
                             self.guidance, **self._ddim)

        @jax.jit
        def decode(params, samples, refs):
            return m.decode_first_stage(params, samples, refs,
                                        chunk_size=self._dec_chunk)

        self._encode = encode
        self._conditioning = conditioning
        self._denoise = denoise
        self._decode = decode

    def __call__(self, params, video, tokens, null_tokens, fs, rng):
        # distinct keys per phase: _encode consumes its key in the VAE
        # posterior sample; reusing it for the denoise noise would correlate
        # the two streams. `rng` may be one key OR a (B,2) per-item key
        # stack (utils/rngs.py) — the latter makes every draw per-clip, so
        # batched runs reproduce B=1 runs exactly
        enc_rng, den_rng = R.split(rng)
        z, refs, concat = self._encode(params, video, enc_rng)
        contexts = self._conditioning(params, tokens, null_tokens,
                                      video[:, 0])
        samples = self._denoise(params, z, contexts, concat, fs, den_rng)
        full = self._decode(params, samples, refs)
        if not self.use_splice:
            return full
        t = samples.shape[1]
        keep = [i for i in range(t) if i not in (1, t - 2)]
        partial = self._decode(params, samples[:, keep], refs)
        mid = full.shape[1] // 2
        return full.at[:, mid - 1:mid + 1].set(partial[:, mid - 2:mid])


def middle_frame_splice(model: ToonCrafter, params, samples, refs):
    """Decode twice and splice the two center frames from a decode whose
    latent frames {1, -2} were dropped (inference.py:262-270)."""
    full = model.decode_first_stage(params, samples, refs)
    t = samples.shape[1]
    keep = [i for i in range(t) if i not in (1, t - 2)]
    partial = model.decode_first_stage(params, samples[:, keep], refs)
    mid = full.shape[1] // 2
    spliced = full.at[:, mid - 1:mid + 1].set(
        partial[:, mid - 2:mid])
    return spliced
