"""CLI surface tests (no model execution)."""

import os

import numpy as np
import pytest
from PIL import Image

from tooncrafter_tpu.cli import inference as CLI


def test_parser_reference_flags():
    p = CLI.get_parser()
    args = p.parse_args([
        "--prompt_dir", "x", "--height", "320", "--width", "512",
        "--interp", "--text_input", "--unconditional_guidance_scale", "7.5",
        "--ddim_steps", "50", "--ddim_eta", "1.0",
        "--timestep_spacing", "uniform_trailing", "--guidance_rescale",
        "0.7", "--frame_stride", "10", "--seed", "123", "--perframe_ae",
        "--multiple_cond_cfg", "--cfg_img", "1.2", "--loop",
        "--negative_prompt", "--video_length", "16", "--bs", "1",
    ])
    assert args.interp and args.text_input
    assert args.timestep_spacing == "uniform_trailing"
    assert args.cfg_img == 1.2


def test_host_shard_balanced():
    """Every item is assigned exactly once and shard sizes differ by at
    most 1 — incl. the n_items < n_proc corner where the old split gave
    one host everything (ADVICE r3; reference inference.py:314-320 drops
    the remainder outright)."""
    for n_items, n_proc in [(10, 4), (3, 8), (8, 8), (0, 4), (7, 1)]:
        slices = [CLI.host_shard(n_items, p, n_proc) for p in range(n_proc)]
        covered = [i for s in slices for i in range(n_items)[s]]
        assert covered == list(range(n_items)), (n_items, n_proc)
        sizes = [len(range(n_items)[s]) for s in slices]
        assert max(sizes) - min(sizes) <= 1, (n_items, n_proc, sizes)


@pytest.fixture
def prompt_dir(tmp_path):
    rng = np.random.default_rng(0)
    for name in ("a1.png", "a2.png", "b1.png", "b2.png"):
        Image.fromarray(
            rng.integers(0, 255, (40, 60, 3), dtype=np.uint8).astype("uint8")
        ).save(tmp_path / name)
    (tmp_path / "prompts.txt").write_text("first pair\nsecond pair\n")
    return str(tmp_path)


def test_load_data_prompts_interp_packing(prompt_dir):
    names, data, prompts = CLI.load_data_prompts(
        prompt_dir, (32, 48), video_frames=8, interp=True)
    assert prompts == ["first pair", "second pair"]
    assert len(data) == 2
    vid = data[0]
    assert vid.shape == (8, 32, 48, 3)
    # first half = frame A repeated, second half = frame B repeated
    np.testing.assert_array_equal(vid[0], vid[3])
    np.testing.assert_array_equal(vid[4], vid[7])
    assert not np.array_equal(vid[0], vid[7])
    assert names[0] == "a1.png"


def test_load_data_prompts_single_image(prompt_dir):
    names, data, prompts = CLI.load_data_prompts(
        prompt_dir, (32, 48), video_frames=4, interp=False)
    vid = data[0]
    assert vid.shape == (4, 32, 48, 3)
    np.testing.assert_array_equal(vid[0], vid[3])  # repeated single frame
