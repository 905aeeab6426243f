"""Humanoid imitation task quantities: EE/COM, pose error, fall detection.

Device-side building blocks for the DeepMimic imitation reward the reference
left as placeholders (``reward=jp.zeros(3)`` at ``agents_env/
agent_mimic.py:84``, ``done=1.0`` at ``:72``; the metric names
``step_index/pose_error/fall`` appear at ``agent_env_template.py:93`` but are
never updated).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pbrl_tpu.engine import forward as engine_forward
from pbrl_tpu.engine.data import Data
from pbrl_tpu.engine.kinematics import kinematics as run_kinematics
from pbrl_tpu.engine.data import make_data
from pbrl_tpu.maths import quaternion as quat
from pbrl_tpu.maths.numeric import safe_norm
from pbrl_tpu.mocap.clip import MotionClip
from pbrl_tpu.mocap.skeleton import DOF, MODEL_JOINT_ORDER
from pbrl_tpu.model.spec import Model

# End-effector points: (body name, offset in body frame). Wrist sphere and
# foot box centres from the builder geometry (matching the reference model's
# hand/foot geoms, ``models/final_humanoid.xml``).
EE_SPECS = (
    ("right_elbow", (0.0, 0.0, -0.258947)),
    ("left_elbow", (0.0, 0.0, -0.258947)),
    ("right_ankle", (0.045, 0.0, -0.0225)),
    ("left_ankle", (0.045, 0.0, -0.0225)),
)


def ee_positions(model: Model, data: Data) -> jnp.ndarray:
    """(n_ee, 3) world positions of the end-effector points."""
    bids = jnp.asarray([model.body_id(n) for n, _ in EE_SPECS], jnp.int32)
    offsets = jnp.asarray([o for _, o in EE_SPECS], data.qpos.dtype)
    return data.xpos[bids] + quat.rotate(data.xquat[bids], offsets)


def center_of_mass(model: Model, data: Data) -> jnp.ndarray:
    """(3,) whole-body centre of mass."""
    total = jnp.sum(model.body_mass)
    return jnp.einsum("b,bx->x", model.body_mass, data.xipos) / total


def joint_slices(model: Model) -> Tuple[Tuple[int, int], ...]:
    """Static ((qposadr, dof), ...) for the 12 mocap joints in model order."""
    out = []
    for name in MODEL_JOINT_ORDER:
        dof = DOF[name]
        jname = name if dof == 1 else f"{name}_x"
        j = model.joint_id(jname)
        out.append((model.jnt_qposadr[j], dof))
    return tuple(out)


def joint_pose_errors(model: Model, qpos: jnp.ndarray, qpos_ref: jnp.ndarray) -> jnp.ndarray:
    """(12,) per-joint geodesic rotation error in radians.

    Hinge triples are composed back to quaternions so a 3-DoF joint's error
    is a single angle (DeepMimic pose-term semantics), not a euclidean
    euler-difference.
    """
    slices = joint_slices(model)
    errs = []
    for qadr, dof in slices:
        if dof == 1:
            errs.append(jnp.abs(qpos[qadr] - qpos_ref[qadr]))
        else:
            q1 = quat.from_euler_rxyz(qpos[qadr : qadr + 3])
            q2 = quat.from_euler_rxyz(qpos_ref[qadr : qadr + 3])
            errs.append(quat.angle_between(q1, q2))
    return jnp.stack(errs)


def root_pose_error(qpos: jnp.ndarray, qpos_ref: jnp.ndarray):
    """(pos_err(3-norm), rot_err angle) of the free root."""
    pos = safe_norm(qpos[:3] - qpos_ref[:3])
    rot = quat.angle_between(quat.normalize(qpos[3:7]), quat.normalize(qpos_ref[3:7]))
    return pos, rot


def fall_mask(model: Model, allowed_body_names: Tuple[str, ...]):
    """Static (ncon,) mask: plane-contact slots whose body is NOT allowed to
    touch the ground (fall when any of them activates)."""
    from pbrl_tpu.engine import collision

    allowed = {model.body_id(n) for n in allowed_body_names}
    mask = []
    # Contact slot layout must mirror collision.collide's emit order.
    for t, pairs in sorted(collision._plane_groups(model).items()):
        per = collision.plane_contact_count(t)
        for _, other in pairs:
            b = model.geom_bodyid[other]
            mask.extend([b not in allowed] * per)
    for (t1, t2), pairs in sorted(collision._pair_groups(model).items()):
        # body-body contacts never "fall"
        mask.extend([False] * (collision.pair_contact_count(t1, t2) * len(pairs)))
    assert len(mask) == collision.ncon_max(model), "layout drifted from collide()"
    return np.asarray(mask, bool)


def detect_fall(model: Model, data: Data, static_mask) -> jnp.ndarray:
    """() bool: any disallowed body touching the ground this step."""
    mask = jnp.asarray(static_mask)
    active = data.contact.dist < 0.0
    return jnp.any(active & mask)


def augment_clip(model: Model, clip: MotionClip) -> MotionClip:
    """Fill ``ee_pos``/``com`` by running FK over every clip frame (one-time,
    jitted + vmapped on device)."""

    def fk(qpos):
        d = make_data(model, qpos=qpos)
        d = run_kinematics(model, d)
        return ee_positions(model, d), center_of_mass(model, d)

    ee, com = jax.jit(jax.vmap(fk))(clip.qpos)
    return clip.replace(ee_pos=ee, com=com)
