"""Device-resident motion clips with time-indexed reference lookup.

Replaces the reference's host-side clip indexing (the ``duration_dict``
wall-clock loop in ``testing_forward_env.ipynb`` cell 20, SURVEY.md §3.3)
with a pure device-side ``reference_state(clip, t)``: the whole rollout stays
inside one XLA program, no host sync per step.

DeepMimic clips are uniform-dt, so the frame index is a multiply + floor; a
``wrap`` clip loops in time with the root's horizontal displacement
accumulated per cycle (DeepMimic cycle-offset semantics) so walking
references keep moving forward instead of teleporting back.
"""

from __future__ import annotations

import glob
import os
from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import struct

from pbrl_tpu.maths import quaternion as quat
from pbrl_tpu.mocap.convert import ParsedClip, parse_deepmimic

_ASSET_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "assets", "motions")


@struct.dataclass
class MotionClip:
    """Static clip data living in HBM. Shapes: T frames, nq=35, nv=34."""

    qpos: jnp.ndarray        # (T, nq)
    qvel: jnp.ndarray        # (T, nv)
    dt: jnp.ndarray          # () uniform frame dt
    cycle_time: jnp.ndarray  # () total clip time
    cycle_offset: jnp.ndarray  # (3,) root displacement per cycle (z zeroed)
    loop: bool = struct.field(pytree_node=False)
    num_frames: int = struct.field(pytree_node=False)
    # Optional FK-derived reference quantities (filled by
    # pbrl_tpu.envs.humanoid_task.augment_clip for the imitation reward).
    ee_pos: Optional[jnp.ndarray] = None   # (T, n_ee, 3) world end-effectors
    com: Optional[jnp.ndarray] = None      # (T, 3) world centre of mass
    name: str = struct.field(pytree_node=False, default="clip")


def _np_slerp(q0: np.ndarray, q1: np.ndarray, alpha: float) -> np.ndarray:
    """Host-side f64 quaternion slerp (wxyz) for clip resampling."""
    d = float(np.dot(q0, q1))
    if d < 0.0:
        q1, d = -q1, -d
    d = min(d, 1.0)
    theta = np.arccos(d)
    if theta < 1e-8:
        out = q0 + alpha * (q1 - q0)
    else:
        s = np.sin(theta)
        out = (np.sin((1 - alpha) * theta) * q0 + np.sin(alpha * theta) * q1) / s
    return out / np.linalg.norm(out)


def resample_uniform(p: ParsedClip) -> ParsedClip:
    """Resample a non-uniform-dt clip to the median frame interval.

    Subsumes the reference's ``duration_dict`` per-frame-dt generality
    (``utils/SimpleConverter.py:226-238``) into the uniform grid the
    device-side ``t/dt`` lookup requires: linear interpolation on qpos/qvel
    (joint eulers are branch-continuous by construction, mocap/convert.py)
    with the root quaternion slerped on the manifold.
    """
    inter = np.asarray(p.durations[:-1], np.float64)
    dt = float(np.median(inter))
    T_new = int(np.floor(p.total_time / dt + 1e-9)) + 1
    ct = p.cum_time  # (T,) cumulative start times
    qpos = np.empty((T_new, p.qpos.shape[1]))
    qvel = np.empty((T_new, p.qvel.shape[1]))
    for k in range(T_new):
        t = min(k * dt, p.total_time - 1e-9)
        i = int(np.searchsorted(ct, t, side="right")) - 1
        i = min(max(i, 0), len(ct) - 1)
        if i >= len(ct) - 1:
            qpos[k], qvel[k] = p.qpos[-1], p.qvel[-1]
            continue
        a = (t - ct[i]) / max(float(p.durations[i]), 1e-12)
        a = min(max(a, 0.0), 1.0)
        qpos[k] = p.qpos[i] + a * (p.qpos[i + 1] - p.qpos[i])
        qpos[k, 3:7] = _np_slerp(p.qpos[i, 3:7], p.qpos[i + 1, 3:7], a)
        qvel[k] = p.qvel[i] + a * (p.qvel[i + 1] - p.qvel[i])
    durations = np.full(T_new, dt)
    durations[-1] = 0.0  # DeepMimic convention: last frame closes the clip
    out = ParsedClip(qpos, qvel, durations, loop=p.loop, source=p.source)
    # preserve the true cycle length (sum of new durations may differ by <dt)
    out.total_time = (T_new - 1) * dt
    return out


def from_parsed(p: ParsedClip, name: str = "clip", dtype=jnp.float32) -> MotionClip:
    # Device-side lookup assumes uniform frame spacing (index = t/dt). The
    # parser faithfully records per-frame ``durations`` (the reference's
    # ``duration_dict`` generality, SimpleConverter.py:226-238); non-uniform
    # clips are resampled to a uniform grid. DeepMimic files store the
    # interval *to the next frame*, so the final frame's duration (0 in all
    # bundled clips) is excluded from the check.
    inter = np.asarray(p.durations[:-1], np.float64)
    if inter.size and not np.allclose(inter, inter[0], rtol=1e-5, atol=1e-9):
        p = resample_uniform(p)
    offset = p.qpos[-1, :3] - p.qpos[0, :3]
    offset[2] = 0.0  # vertical displacement never accumulates
    return MotionClip(
        qpos=jnp.asarray(p.qpos, dtype),
        qvel=jnp.asarray(p.qvel, dtype),
        dt=jnp.asarray(p.dt, dtype),
        cycle_time=jnp.asarray(p.total_time, dtype),
        cycle_offset=jnp.asarray(offset, dtype),
        loop=p.loop == "wrap",
        num_frames=p.num_frames,
        name=name,
    )


def load_clip(name_or_path: str, dtype=jnp.float32, **kw) -> MotionClip:
    """Load a clip: bundled short name ('walk'), a DeepMimic .txt path, or a
    DiffMimic .npy path (per-body world poses, see mocap/diffmimic.py)."""
    if name_or_path.endswith(".npy"):
        from pbrl_tpu.mocap.diffmimic import parse_diffmimic_npy

        if not os.path.exists(name_or_path):
            alt = os.path.join(_ASSET_DIR, "..", "motion_diffmimic", name_or_path)
            if os.path.exists(alt):
                name_or_path = alt
            else:
                raise FileNotFoundError(name_or_path)
        name = os.path.splitext(os.path.basename(name_or_path))[0]
        return from_parsed(parse_diffmimic_npy(name_or_path, **kw), name=name,
                           dtype=dtype)
    if os.path.exists(name_or_path):
        path, name = name_or_path, os.path.splitext(os.path.basename(name_or_path))[0]
    else:
        path = os.path.join(_ASSET_DIR, f"humanoid3d_{name_or_path}.txt")
        name = name_or_path
        if not os.path.exists(path):
            avail = sorted(
                os.path.basename(p)[11:-4]
                for p in glob.glob(os.path.join(_ASSET_DIR, "humanoid3d_*.txt"))
            )
            raise FileNotFoundError(
                f"no clip {name_or_path!r}; bundled clips: {avail}"
            )
    return from_parsed(parse_deepmimic(path, **kw), name=name, dtype=dtype)


def _frame_and_cycle(clip: MotionClip, t):
    """(frame_float, cycle_count) for query time t (traced)."""
    if clip.loop:
        cycle = jnp.floor(t / clip.cycle_time)
        t_mod = t - cycle * clip.cycle_time
    else:
        cycle = jnp.zeros_like(t)
        t_mod = jnp.clip(t, 0.0, clip.cycle_time)
    return t_mod / clip.dt, cycle


def reference_state(clip: MotionClip, t, interpolate: bool = True):
    """(qpos, qvel) of the reference motion at time ``t`` (scalar, traced).

    Linear interpolation between frames; the root quaternion is slerped on
    the manifold. ``wrap`` clips accumulate the horizontal cycle offset.
    """
    f, cycle = _frame_and_cycle(clip, t)
    T = clip.num_frames
    i0 = jnp.clip(jnp.floor(f).astype(jnp.int32), 0, T - 1)
    if not interpolate:
        qpos = clip.qpos[i0]
        qvel = clip.qvel[i0]
    else:
        alpha = f - i0.astype(f.dtype)
        i1 = jnp.where(clip.loop, (i0 + 1) % T, jnp.minimum(i0 + 1, T - 1))
        q0, q1 = clip.qpos[i0], clip.qpos[i1]
        # wrap-around interval: frame T-1 -> frame 0 shifted by cycle_offset
        wrapped = (i1 < i0).astype(q0.dtype)
        q1 = q1.at[:3].add(wrapped * clip.cycle_offset)
        qpos = q0 + alpha * (q1 - q0)
        # root quaternion: slerp q0 -> q1
        rq = quat.mul(
            q0[3:7],
            quat.from_rotvec(alpha * quat.to_rotvec(quat.mul(quat.conj(q0[3:7]), q1[3:7]))),
        )
        qpos = qpos.at[3:7].set(quat.normalize(rq))
        qvel = clip.qvel[i0] + alpha * (clip.qvel[i1] - clip.qvel[i0])
    qpos = qpos.at[:3].add(cycle * clip.cycle_offset)
    return qpos, qvel


def reference_aux(clip: MotionClip, t):
    """Interpolated (ee_pos, com) reference quantities at time ``t``.

    Requires an augmented clip (``ee_pos``/``com`` filled). World positions
    get the same horizontal cycle-offset treatment as the root in
    :func:`reference_state`.
    """
    if clip.ee_pos is None or clip.com is None:
        raise ValueError("clip not augmented: call envs.humanoid_task.augment_clip")
    f, cycle = _frame_and_cycle(clip, t)
    T = clip.num_frames
    i0 = jnp.clip(jnp.floor(f).astype(jnp.int32), 0, T - 1)
    alpha = f - i0.astype(f.dtype)
    i1 = jnp.where(clip.loop, (i0 + 1) % T, jnp.minimum(i0 + 1, T - 1))
    wrapped = (i1 < i0).astype(clip.com.dtype)
    shift = wrapped * clip.cycle_offset
    ee = clip.ee_pos[i0] + alpha * (clip.ee_pos[i1] + shift - clip.ee_pos[i0])
    com = clip.com[i0] + alpha * (clip.com[i1] + shift - clip.com[i0])
    total = cycle * clip.cycle_offset
    return ee + total, com + total


def reference_frame_index(clip: MotionClip, t) -> jnp.ndarray:
    """Integer frame index at time t (the reference's ``duration_dict``
    pointer logic, device-side)."""
    f, _ = _frame_and_cycle(clip, t)
    return jnp.clip(jnp.floor(f).astype(jnp.int32), 0, clip.num_frames - 1)


def phase(clip: MotionClip, t) -> jnp.ndarray:
    """Normalized clip phase in [0, 1) — DeepMimic's phase observation."""
    if clip.loop:
        return (t % clip.cycle_time) / clip.cycle_time
    return jnp.clip(t / clip.cycle_time, 0.0, 1.0)


def bundled_clip_names():
    return sorted(
        os.path.basename(p)[11:-4]
        for p in glob.glob(os.path.join(_ASSET_DIR, "humanoid3d_*.txt"))
    )
