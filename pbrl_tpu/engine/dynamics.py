"""Inertial dynamics: CRBA mass matrix, RNEA bias forces, passive forces.

From-scratch, TPU-shaped replacements for the quantities the reference pulls
out of MuJoCo/MJX: the dense mass matrix (``mujoco.mj_fullM`` at
``pds_controllers_mjx.py:66-68``, ``state.pipeline_state.qM`` at
``pds_controllers_agents.py:69``) and ``qfrc_bias``
(``pds_controllers_agents.py:65``).

Formulation: with world-origin Plücker motion axes ``S (nv, 6)`` and the
static ancestor mask ``A (nbody, nv)`` (see kinematics.py), the CRBA reduces
to a masked quadratic form

    M = sum_b (A_b ⊙ S) I_b (A_b ⊙ S)^T        (+ armature on the diagonal)

i.e. three small batched einsums — no tree recursion, no per-body frames.
Under ``vmap`` these become (B, nv, 6)x(B, 6, 6) batched GEMMs that XLA maps
straight onto the MXU. RNEA needs one unrolled 13-step downward pass for body
accelerations (qacc = 0), then a single masked einsum for the projection.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pbrl_tpu.maths import spatial
from pbrl_tpu.model.spec import Model
from pbrl_tpu.engine.data import Data


_HI = jax.lax.Precision.HIGHEST  # full-f32 passes for the tiny inertial einsums


def _spatial_inertias(model: Model, data: Data) -> jnp.ndarray:
    """(nbody, 6, 6) world-frame spatial inertia about ``data.origin``."""
    rot = data.ximat
    inertia_w = jnp.einsum("bij,bjk,blk->bil", rot, model.body_inertia, rot, precision=_HI)
    return spatial.inertia_at_origin(model.body_mass, data.xipos - data.origin, inertia_w)


def crba(model: Model, data: Data) -> Data:
    """Dense joint-space mass matrix (composite rigid body algorithm)."""
    imats = _spatial_inertias(model, data)  # (nb, 6, 6)
    s_masked = model.ancestor_mask[:, :, None] * data.subspace[None, :, :]  # (nb, nv, 6)
    is_ = jnp.einsum("bxy,bvy->bvx", imats, s_masked, precision=_HI)  # (nb, nv, 6)
    m = jnp.einsum("bvx,bwx->vw", s_masked, is_, precision=_HI)
    m = m + jnp.diag(model.dof_armature)
    return data.replace(qM=m)


def rnea_bias(model: Model, data: Data) -> Data:
    """Coriolis + centrifugal + gravity generalized force (qacc = 0).

    Sign convention matches MuJoCo: ``M qacc + qfrc_bias = qfrc_applied +
    qfrc_actuator + qfrc_passive + qfrc_constraint``.
    """
    nb = model.nbody
    imats = _spatial_inertias(model, data)
    v = data.cvel  # (nb, 6)

    # Downward pass for body accelerations with qacc = 0. Gravity enters as a
    # fictitious base acceleration of -g (standard RNEA trick).
    g = model.option.gravity
    a_base = jnp.concatenate([jnp.zeros(3, dtype=g.dtype), -g])

    from pbrl_tpu.model.spec import JointType

    # Static per-body joint lists for the unrolled pass.
    joints_of = [[] for _ in range(nb)]
    for j in range(model.njnt):
        joints_of[model.jnt_bodyid[j]].append(j)

    # Velocity-product acceleration: a_bias = sum_i Sdot_i qvel_i, where
    # Sdot depends on which frame carries dof i's axis:
    #   * free-joint translation: world-fixed axis  -> Sdot = 0;
    #   * free-joint rotation:    child-body axis   -> Sdot = v_body x S;
    #   * hinge/slide:            predecessor frame -> Sdot = v_run x S with
    #     v_run the partial velocity accumulated over preceding dofs (same-body
    #     hinge triples make this distinction matter: later hinges rotate the
    #     axes of earlier ones).
    acc = [None] * nb
    for b in range(nb):
        p = model.body_parent[b]
        a = a_base if p == -1 else acc[p]
        v_run = jnp.zeros(6, dtype=data.qvel.dtype) if p == -1 else v[p]
        for j in joints_of[b]:
            da = model.jnt_dofadr[j]
            if model.jnt_type[j] == JointType.FREE:
                vj_rot = jnp.einsum(
                    "ix,i->x", data.subspace[da + 3 : da + 6], data.qvel[da + 3 : da + 6]
                )
                a = a + spatial.motion_cross(v[b], vj_rot)
                v_run = v[b]
            else:  # hinge / slide: one dof
                s = data.subspace[da]
                a = a + spatial.motion_cross(v_run, s) * data.qvel[da]
                v_run = v_run + s * data.qvel[da]
        acc[b] = a
    acc = jnp.stack(acc)  # (nb, 6)

    momentum = jnp.einsum("bxy,by->bx", imats, v, precision=_HI)
    f = jnp.einsum("bxy,by->bx", imats, acc, precision=_HI) + spatial.force_cross(v, momentum)
    bias = jnp.einsum("bi,ix,bx->i", model.ancestor_mask, data.subspace, f, precision=_HI)
    return data.replace(qfrc_bias=bias)


def passive(model: Model, data: Data) -> Data:
    """Joint damping (explicit part; Euler integration adds the implicit part
    by augmenting M with ``dt * damping`` — MuJoCo's default eulerdamp)."""
    return data.replace(qfrc_passive=-model.dof_damping * data.qvel)


def actuation(model: Model, data: Data) -> Data:
    """Torque motors: ``tau = gear * clip(ctrl, ctrlrange)`` on target dofs.

    Reference semantics: motor gears 50-200 with ctrlrange ±0.5
    (``models/final_humanoid.xml:8,127-162``).
    """
    if model.nu == 0:
        return data.replace(qfrc_actuator=jnp.zeros(model.nv, dtype=data.qvel.dtype))
    ctrl = jnp.clip(
        data.ctrl, model.actuator_ctrlrange[:, 0], model.actuator_ctrlrange[:, 1]
    )
    torque = model.actuator_gear * ctrl
    dofadr = jnp.asarray(model.actuator_dofadr, jnp.int32)
    qfrc = jnp.zeros(model.nv, dtype=data.qvel.dtype).at[dofadr].add(torque)
    return data.replace(qfrc_actuator=qfrc)


def full_mass_matrix(model: Model, data: Data) -> jnp.ndarray:
    """Dense M for external callers (the reference built this on the host via
    ``mujoco.mj_fullM`` each step, ``pds_controllers_mjx.py:66-71`` — here it
    is a device-resident byproduct of the step)."""
    return data.qM
