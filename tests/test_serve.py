"""Serving backend test: Image2Video request path on the tiny config."""

import numpy as np
import pytest
import yaml


@pytest.fixture(scope="module")
def tiny_yaml(tmp_path_factory):
    cfg = {
        "model": {
            "target": "lvdm.models.ddpm3d.LatentVisualDiffusion",
            "params": {
                "unet_config": {
                    "target":
                        "lvdm.modules.networks.openaimodel3d.UNetModel",
                    "params": {
                        "model_channels": 64, "num_res_blocks": 1,
                        "channel_mult": [1, 2],
                        "attention_resolutions": [1, 2],
                        "num_head_channels": 32, "context_dim": 64,
                        "temporal_length": 4,
                    },
                },
                "first_stage_config": {
                    "target":
                        "lvdm.models.autoencoder.AutoencoderKL_Dualref",
                    "params": {"embed_dim": 4, "ddconfig": {
                        "z_channels": 4, "ch": 32, "ch_mult": [1, 2, 2, 2],
                        "num_res_blocks": 1}},
                },
                "cond_stage_config": {
                    "target":
                        "lvdm.modules.encoders.condition."
                        "FrozenOpenCLIPEmbedder",
                    "params": {"width": 64, "heads": 4, "layers": 2},
                },
                "img_cond_stage_config": {
                    "target":
                        "lvdm.modules.encoders.condition."
                        "FrozenOpenCLIPImageEmbedderV2",
                    "params": {"width": 64, "heads": 4, "layers": 2,
                               "image_size": 28},
                },
                "image_proj_stage_config": {
                    "target": "lvdm.modules.encoders.resampler.Resampler",
                    "params": {"depth": 1, "heads": 4, "num_queries": 4},
                },
            },
        },
    }
    p = tmp_path_factory.mktemp("cfg") / "tiny.yaml"
    p.write_text(yaml.safe_dump(cfg))
    return str(p)


def test_image2video_interp_request(tiny_yaml, tmp_path):
    from tooncrafter_tpu.cli.serve import Image2Video

    backend = Image2Video(config_path=tiny_yaml,
                          result_dir=str(tmp_path),
                          resolution=(32, 32), video_length=4)
    rng = np.random.default_rng(0)
    img_a = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
    img_b = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
    path = backend.get_image(img_a, "walk cycle", steps=2, image_b=img_b)
    import os
    assert os.path.exists(path)
    # second request with the same knobs reuses the compiled pipeline
    assert (2, 7.5, 1.0, "interp") in backend._jitted
    path2 = backend.get_image(img_a, "другой prompt", steps=2, image_b=img_b)
    assert os.path.exists(path2)


def test_gradio_gate_raises_without_gradio(tiny_yaml, tmp_path):
    from tooncrafter_tpu.cli import serve

    try:
        import gradio  # noqa: F401
        pytest.skip("gradio installed")
    except ImportError:
        pass
    backend = object()  # never touched before the import check
    with pytest.raises(RuntimeError):
        serve.build_gradio_app(backend)
