"""Forward kinematics and velocity kinematics.

From-scratch replacement for the FK inside ``mjx.forward`` /
``pipeline_init`` that the reference leans on (``agents_env/
agent_replay_motion.py:74``, SURVEY.md §3.3). The body tree is tiny and
static, so the tree walk is unrolled in Python at trace time — each step is a
batched vector op over the env axis under ``vmap``, which is exactly what the
VPU wants. No dynamic control flow enters the compiled program.

World-origin Plücker motion axes (``subspace``, shape (nv, 6)) are produced
here once per kinematic evaluation; CRBA, RNEA, contact Jacobians and
actuation all reuse them as masked einsums (see ``maths/spatial.py``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pbrl_tpu.maths import quaternion as quat
from pbrl_tpu.model.spec import JointType, Model
from pbrl_tpu.engine.data import Data


def kinematics(model: Model, data: Data) -> Data:
    """Compute xpos/xquat/xipos/site/geom poses and dof motion subspace."""
    qpos = data.qpos
    nb = model.nbody

    xpos = [None] * nb
    xquat = [None] * nb
    s_ang = [None] * model.nv  # world angular part of each dof axis
    s_anchor = [None] * model.nv  # world anchor point of each dof
    s_is_linear = [False] * model.nv

    # Group joints by body (static metadata, python-side).
    joints_of = [[] for _ in range(nb)]
    for j in range(model.njnt):
        joints_of[model.jnt_bodyid[j]].append(j)

    for b in range(nb):
        p = model.body_parent[b]
        if p == -1:
            pq = jnp.array([1.0, 0.0, 0.0, 0.0], dtype=qpos.dtype)
            pp = jnp.zeros(3, dtype=qpos.dtype)
        else:
            pq, pp = xquat[p], xpos[p]
        bq = quat.mul(pq, model.body_quat[b])
        bp = pp + quat.rotate(pq, model.body_pos[b])

        for j in joints_of[b]:
            jt = model.jnt_type[j]
            qa = model.jnt_qposadr[j]
            da = model.jnt_dofadr[j]
            if jt == JointType.FREE:
                bp = qpos[qa : qa + 3]
                bq = quat.normalize(qpos[qa + 3 : qa + 7])
                # 3 translational dofs (world axes) + 3 rotational dofs.
                for k in range(3):
                    e = jnp.zeros(3, dtype=qpos.dtype).at[k].set(1.0)
                    s_ang[da + k] = jnp.zeros(3, dtype=qpos.dtype)
                    s_anchor[da + k] = e  # reused as the linear direction
                    s_is_linear[da + k] = True
                for k in range(3):
                    # Angular velocity stored in the *child body local frame*
                    # (MuJoCo free-joint convention): world axis = R(bq) e_k.
                    e = jnp.zeros(3, dtype=qpos.dtype).at[k].set(1.0)
                    s_ang[da + 3 + k] = quat.rotate(bq, e)
                    s_anchor[da + 3 + k] = bp
            elif jt == JointType.HINGE:
                angle = qpos[qa]
                axis_w = quat.rotate(bq, model.jnt_axis[j])
                anchor_w = bp + quat.rotate(bq, model.jnt_pos[j])
                ql = quat.from_axis_angle(model.jnt_axis[j], angle)
                bq_new = quat.mul(bq, ql)
                # rotate about the anchor: origin moves unless jnt_pos == 0
                bp = anchor_w - quat.rotate(bq_new, model.jnt_pos[j])
                bq = bq_new
                s_ang[da] = axis_w
                s_anchor[da] = anchor_w
            elif jt == JointType.SLIDE:
                axis_w = quat.rotate(bq, model.jnt_axis[j])
                bp = bp + axis_w * qpos[qa]
                s_ang[da] = jnp.zeros(3, dtype=qpos.dtype)
                s_anchor[da] = axis_w
                s_is_linear[da] = True
            else:
                raise ValueError(f"unsupported joint type {jt}")
        xpos[b] = bp
        xquat[b] = quat.normalize(bq)

    origin = xpos[0]  # root body position: reference point for all spatial math
    xpos = jnp.stack(xpos)
    xquat = jnp.stack(xquat)

    # Motion subspace in origin-shifted Plücker coords: S = [w, v(origin)].
    # Anchors are measured from `origin` so lever arms stay body-scale.
    rows = []
    for i in range(model.nv):
        if s_is_linear[i]:
            rows.append(jnp.concatenate([jnp.zeros(3, dtype=qpos.dtype), s_anchor[i]]))
        else:
            arm = s_anchor[i] - origin
            rows.append(jnp.concatenate([s_ang[i], jnp.cross(arm, s_ang[i])]))
    subspace = jnp.stack(rows)

    ximat = quat.to_matrix(xquat)
    xipos = xpos + quat.rotate(xquat, model.body_ipos)

    # Sites / geoms (world geoms keep their model-frame pose). Body-id tables
    # are static tuples; materialise them as constants for the gathers.
    if model.nsite:
        sb = jnp.asarray(model.site_bodyid, jnp.int32)
        site_xpos = xpos[sb] + quat.rotate(xquat[sb], model.site_pos)
    else:
        site_xpos = jnp.zeros((0, 3), dtype=qpos.dtype)

    gb = jnp.asarray(model.geom_bodyid, jnp.int32)
    is_world = gb < 0
    gb_safe = jnp.maximum(gb, 0)
    gxpos = jnp.where(
        is_world[:, None],
        model.geom_pos,
        xpos[gb_safe] + quat.rotate(xquat[gb_safe], model.geom_pos),
    )
    gxquat = jnp.where(
        is_world[:, None],
        model.geom_quat,
        quat.mul(xquat[gb_safe], model.geom_quat),
    )

    return data.replace(
        origin=origin,
        xpos=xpos,
        xquat=xquat,
        xipos=xipos,
        ximat=ximat,
        site_xpos=site_xpos,
        geom_xpos=gxpos,
        geom_xquat=gxquat,
        subspace=subspace,
    )


def com_velocity(model: Model, data: Data) -> Data:
    """Body spatial velocities: ``cvel[b] = sum_i anc[b,i] S_i qvel_i``."""
    weighted = model.ancestor_mask * data.qvel[None, :]  # (nb, nv)
    cvel = jnp.einsum("bi,ix->bx", weighted, data.subspace,
                      precision=jax.lax.Precision.HIGHEST)  # (nb, 6)
    return data.replace(cvel=cvel)


def body_velocity(model: Model, data: Data, body_id: int) -> jnp.ndarray:
    """(6,) [angular, linear@body-origin] world velocity of one body."""
    v = data.cvel[body_id]
    lin = v[3:] + jnp.cross(v[:3], data.xpos[body_id] - data.origin)
    return jnp.concatenate([v[:3], lin])


def point_velocities(data: Data, body_ids: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Linear world velocities of ``points`` (n,3) on bodies ``body_ids`` (n,)."""
    v = data.cvel[body_ids]
    return v[:, 3:] + jnp.cross(v[:, :3], points - data.origin)
