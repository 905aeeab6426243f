"""Trajectory dump + offline rendering via the host MuJoCo renderer.

Realises the reference's empty ``visualizer.py`` stub: simulation produces a
device-side qpos trajectory; rendering happens host-side only, by exporting
our compiled model back to MJCF (``pbrl_tpu.model.mjcf.to_mjcf``) and
driving ``mujoco.Renderer`` over the frames — the same offscreen path the
reference notebooks used (``testing_pd_mjx.ipynb`` cells 2/8), but decoupled
from the hot loop (SURVEY.md §5: viz never runs on TPU).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def dump_trajectory(path: str, qpos: np.ndarray, fps: float, *, qvel=None,
                    metrics: Optional[dict] = None) -> None:
    """Save a (T, nq) trajectory (+optional qvel/metrics) as .npz."""
    payload = {"qpos": np.asarray(qpos), "fps": np.asarray(fps)}
    if qvel is not None:
        payload["qvel"] = np.asarray(qvel)
    for k, v in (metrics or {}).items():
        payload[f"metric_{k}"] = np.asarray(v)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(path, **payload)


def load_trajectory(path: str) -> dict:
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def render_video(spec_or_model, qpos: np.ndarray, *, width=640, height=480,
                 camera: Optional[str] = None) -> np.ndarray:
    """(T, H, W, 3) uint8 frames of a qpos trajectory, rendered by host
    MuJoCo. Accepts a ModelSpec (preferred) or a compiled Model's spec."""
    # Headless boxes (no DISPLAY): MuJoCo needs an explicit offscreen GL
    # backend or mjr_makeContext aborts. EGL is the one present in this image.
    if "MUJOCO_GL" not in os.environ and not os.environ.get("DISPLAY"):
        os.environ["MUJOCO_GL"] = "egl"
    import mujoco

    from pbrl_tpu.model.mjcf import to_mjcf
    from pbrl_tpu.model.spec import ModelSpec

    if not isinstance(spec_or_model, ModelSpec):
        raise TypeError("render_video needs the ModelSpec (e.g. humanoid_spec())")
    mj = mujoco.MjModel.from_xml_string(to_mjcf(spec_or_model))
    # Readability: our exported MJCF defines no lights or materials, and
    # MuJoCo's default headlight renders everything near-black on the gray
    # background. Brighten the headlight and give the robot/floor
    # distinguishable colors (visual-only; never touches simulation).
    mj.vis.headlight.ambient[:] = (0.35, 0.35, 0.35)
    mj.vis.headlight.diffuse[:] = (0.9, 0.9, 0.9)
    mj.vis.headlight.specular[:] = (0.3, 0.3, 0.3)
    plane = mj.geom_type == mujoco.mjtGeom.mjGEOM_PLANE
    mj.geom_rgba[plane] = (0.82, 0.84, 0.87, 1.0)
    mj.geom_rgba[~plane] = (0.35, 0.48, 0.78, 1.0)
    data = mujoco.MjData(mj)
    renderer = mujoco.Renderer(mj, height=height, width=width)
    frames = []
    qpos = np.asarray(qpos)
    for q in qpos:
        data.qpos[: mj.nq] = q
        mujoco.mj_forward(mj, data)
        if camera:
            renderer.update_scene(data, camera=camera)
        else:
            renderer.update_scene(data)
        frames.append(renderer.render().copy())
    renderer.close()
    return np.stack(frames)


def save_video(path: str, frames: np.ndarray, fps: float = 30.0) -> str:
    """Write frames to an mp4 (mediapy if available, else imageio, else a
    .npz fallback so the data is never lost)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    try:
        import mediapy

        mediapy.write_video(path, frames, fps=fps)
        return path
    except Exception:
        pass
    try:
        import imageio

        imageio.mimwrite(path, frames, fps=fps)
        return path
    except Exception:
        pass
    try:
        # No ffmpeg in the image: animated GIF via imageio's PIL plugin
        # keeps the rollout viewable.
        import imageio

        alt = os.path.splitext(path)[0] + ".gif"
        imageio.mimwrite(alt, frames, duration=1000.0 / fps, loop=0)
        return alt
    except Exception:
        alt = os.path.splitext(path)[0] + "_frames.npz"
        np.savez_compressed(alt, frames=frames, fps=fps)
        return alt
