"""Serving backends.

`Image2Video` is the persistent-device counterpart of the reference's
gradio backend (`scripts/gradio/i2v_test_application.py`): the model stays
resident on the TPU (the reference shuttles cuda<->cpu around every request,
:51,:114 — a serving anti-pattern), the pipeline is jitted once per
resolution, and requests are pure function calls.

`build_gradio_app` mirrors gradio_app.py's Blocks UI (2 input images,
prompt, seed/eta/CFG/steps/FS sliders) and is import-gated: the library
works without gradio installed.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Optional

import numpy as np


class Image2Video:
    def __init__(self, ckpt_path: Optional[str] = None,
                 config_path: Optional[str] = None,
                 bpe_path: Optional[str] = None,
                 result_dir: str = "./gradio_results",
                 resolution=(320, 512), video_length: int = 16):
        import jax
        import jax.numpy as jnp

        from tooncrafter_tpu.config import model_config_from_yaml
        from tooncrafter_tpu.models.diffusion import ModelConfig, ToonCrafter
        from tooncrafter_tpu.utils.tokenizer import ClipTokenizer

        cfg = (model_config_from_yaml(config_path) if config_path
               else ModelConfig())
        cfg = dataclasses.replace(
            cfg, video_length=video_length,
            latent_h=resolution[0] // 8, latent_w=resolution[1] // 8,
            compute_dtype=jnp.bfloat16
            if jax.default_backend() != "cpu" else jnp.float32)
        self.cfg = cfg
        self.model = ToonCrafter(cfg)
        self.resolution = tuple(resolution)
        self.result_dir = result_dir
        os.makedirs(result_dir, exist_ok=True)
        rng = jax.random.PRNGKey(0)
        if ckpt_path:
            from tooncrafter_tpu.utils.checkpoint import load_checkpoint

            template = self.model.init_params(rng)
            self.params, _ = load_checkpoint(ckpt_path, cfg, template)
        else:
            self.params = self.model.init_params(rng)
        if bpe_path:
            self.tokenizer = ClipTokenizer(bpe_path=bpe_path)
        else:
            import warnings

            warnings.warn(
                "no bpe_path: prompts will be IGNORED (zero tokens for both "
                "cond and uncond) — smoke mode only", stacklevel=2)
            self.tokenizer = None
        self._jitted = None

    def _pipeline(self, steps: int, cfg_scale: float, eta: float,
                  mode: str = "interp"):
        from tooncrafter_tpu.models.diffusion import Pipeline
        from tooncrafter_tpu.sampling.ddim import GuidanceConfig

        key = (steps, cfg_scale, eta, mode)
        if self._jitted is None:
            self._jitted = {}
        if key not in self._jitted:
            self._jitted[key] = Pipeline(
                self.model, ddim_steps=steps, eta=eta,
                guidance=GuidanceConfig(cfg_scale=cfg_scale,
                                        guidance_rescale=0.7),
                mode=mode)
        return self._jitted[key]

    def get_image(self, image_a: np.ndarray, prompt: str,
                  steps: int = 50, cfg_scale: float = 7.5, eta: float = 1.0,
                  fs: int = 10, seed: int = 123,
                  image_b: Optional[np.ndarray] = None) -> str:
        """image_a/b: (H,W,3) uint8 RGB. Returns the mp4 path."""
        import jax
        import jax.numpy as jnp

        from tooncrafter_tpu.ops.resize import center_crop_resize
        from tooncrafter_tpu.utils.video_io import write_video

        t0 = time.time()
        h, w = self.resolution
        t = self.cfg.video_length

        def prep(img):
            x = jnp.asarray(img, jnp.float32) / 127.5 - 1.0
            return np.asarray(center_crop_resize(x[None], h, w))

        interp = image_b is not None
        fa = prep(image_a)
        fb = prep(image_b if interp else image_a)
        half = t // 2
        video = np.concatenate([np.repeat(fa, half, 0),
                                np.repeat(fb, t - half, 0)], 0)[None]
        if self.tokenizer is not None:
            tokens = jnp.asarray(self.tokenizer([prompt]))
            null_tokens = jnp.asarray(self.tokenizer([""]))
        else:
            tokens = jnp.zeros((1, 77), jnp.int32)
            null_tokens = tokens
        pipe = self._pipeline(int(steps), float(cfg_scale), float(eta),
                              mode="interp" if interp else "repeat")
        out = pipe(self.params, jnp.asarray(video), tokens, null_tokens,
                   jnp.full((1,), float(fs)), jax.random.PRNGKey(seed))
        name = f"i2v_{int(time.time())}.mp4"
        path = write_video(os.path.join(self.result_dir, name),
                           np.asarray(out[0], np.float32), fps=8)
        print(f"request served in {time.time() - t0:.2f}s -> {path}")
        return path


def build_gradio_app(backend: Image2Video):
    try:
        import gradio as gr
    except ImportError as e:
        raise RuntimeError("gradio is not installed in this image; the "
                           "Image2Video backend works standalone") from e

    with gr.Blocks() as demo:
        gr.Markdown("## ToonCrafter (TPU) — cartoon interpolation")
        with gr.Row():
            img_a = gr.Image(label="start frame")
            img_b = gr.Image(label="end frame")
        prompt = gr.Textbox(label="prompt")
        with gr.Row():
            steps = gr.Slider(1, 60, value=50, step=1, label="DDIM steps")
            cfg = gr.Slider(1.0, 15.0, value=7.5, step=0.5, label="CFG")
            eta = gr.Slider(0.0, 1.0, value=1.0, step=0.1, label="ETA")
            fs = gr.Slider(5, 20, value=10, step=1, label="FS")
            seed = gr.Slider(0, 50000, value=123, step=1, label="seed")
        out = gr.Video(label="result")
        btn = gr.Button("Generate")
        btn.click(
            fn=lambda a, p, s, c, e, f, sd, b: backend.get_image(
                a, p, int(s), float(c), float(e), int(f), int(sd), b),
            inputs=[img_a, prompt, steps, cfg, eta, fs, seed, img_b],
            outputs=[out])
        demo.queue(max_size=12)
    return demo


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--ckpt_path", default=None)
    p.add_argument("--config", default=None)
    p.add_argument("--bpe_path", default=None)
    p.add_argument("--port", type=int, default=7860)
    args = p.parse_args()
    backend = Image2Video(args.ckpt_path, args.config, args.bpe_path)
    app = build_gradio_app(backend)
    app.launch(server_port=args.port)


if __name__ == "__main__":
    main()
