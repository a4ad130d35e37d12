"""tooncrafter_tpu — a TPU-native generative cartoon-interpolation framework.

A from-scratch JAX/Flax/Pallas rebuild of the capabilities of ToonCrafter
(reference: Doubiiu/ToonCrafter): given a start frame and an end frame of a
cartoon plus an optional text prompt, synthesize the 16-frame video between
them with a latent video-diffusion model and a dual-reference 3D VAE decoder.

Design stance (TPU-first, not a port):
  * channels-last layouts everywhere ((B,T,H,W,C)); convs hit the MXU natively
  * one functional pipeline (params, rng, conds) -> video, fully jittable
  * DDIM denoising as a single `lax.scan`, CFG folded into one batched call
  * bf16 compute with fp32 GroupNorm/softmax/schedule islands
  * Pallas flash-attention for the quadratic hot spots
  * scaling via jax.sharding.Mesh + shard_map, not NCCL translation
"""

__version__ = "0.1.0"
