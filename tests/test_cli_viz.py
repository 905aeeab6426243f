"""CLI + visualization tests (the reference's empty main.py/visualizer.py,
realised and covered)."""

import json
import os

import numpy as np
import pytest

from pbrl_tpu.cli import build_parser, main
from pbrl_tpu.viz import dump_trajectory, load_trajectory, render_video, save_video


def test_parser_covers_commands():
    p = build_parser()
    for cmd in ("info", "replay", "train", "eval", "bench"):
        args = p.parse_args([cmd] + (["--checkpoint-dir", "x"] if cmd == "eval" else []))
        assert args.command == cmd


def test_cli_info(capsys):
    assert main(["info"]) == 0
    out = capsys.readouterr().out
    assert "nq=35" in out and "walk" in out and "humanoid_mimic" in out


def test_cli_replay_dumps_trajectory(tmp_path, capsys):
    out = tmp_path / "traj.npz"
    assert main(["replay", "--clip", "walk", "--steps", "10", "--out", str(out)]) == 0
    z = load_trajectory(str(out))
    assert z["qpos"].shape == (10, 35)
    assert float(z["fps"]) == pytest.approx(60.0)


@pytest.mark.slow
def test_cli_train_smoke(capsys):
    rc = main([
        "train", "--clip", "walk", "--num-envs", "8", "--unroll-length", "4",
        "--total-steps", "64", "--quiet",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    payload = json.loads(out.strip().splitlines()[-1])
    assert "final" in payload and "reward_mean" in payload["final"]


def test_dump_load_roundtrip(tmp_path):
    q = np.random.default_rng(0).normal(size=(7, 35)).astype(np.float32)
    p = str(tmp_path / "t.npz")
    dump_trajectory(p, q, 60.0, metrics={"reward": np.ones(7)})
    z = load_trajectory(p)
    np.testing.assert_allclose(z["qpos"], q)
    np.testing.assert_allclose(z["metric_reward"], 1.0)


def test_render_video_frames(tmp_path):
    """Host MuJoCo renders our exported humanoid MJCF."""
    pytest.importorskip("mujoco")
    from pbrl_tpu.mocap import load_clip
    from pbrl_tpu.model import humanoid_spec

    clip = load_clip("walk")
    qpos = np.asarray(clip.qpos[:3])
    try:
        frames = render_video(humanoid_spec(), qpos, width=128, height=96)
    except Exception as e:  # headless GL may be unavailable in CI images
        pytest.skip(f"offscreen GL unavailable: {e}")
    assert frames.shape == (3, 96, 128, 3)
    assert frames.dtype == np.uint8
    assert frames.std() > 0  # not a blank screen
    out = save_video(str(tmp_path / "v.mp4"), frames, fps=30)
    assert os.path.exists(out)


def test_save_video_gif_fallback(tmp_path):
    """No ffmpeg in this image: save_video must fall back to an animated GIF
    (viewable artifact), not just the npz frame dump."""
    frames = (np.random.rand(4, 16, 16, 3) * 255).astype(np.uint8)
    out = save_video(str(tmp_path / "clip.mp4"), frames, fps=10)
    assert out.endswith((".mp4", ".gif")), out
    assert os.path.getsize(out) > 0
