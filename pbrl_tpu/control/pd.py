"""PD controller families: standard, inverse-dynamics, Stable PD.

From-scratch rebuilds of the reference's three controller families
(``agents_env/pds_controllers_agents.py:17-172`` and their raw-MJX twins
``pds_controllers_mjx.py:17-191``) as pure functions of ``(Model, Data)``.
Differences by design:

* One implementation instead of two flavors: our ``Data`` always carries a
  device-resident dense ``qM``/``qfrc_bias`` (the MJX flavor rebuilt them on
  the host each step via ``mujoco.mj_fullM`` — and from a *stale* initial
  pose, ``pds_controllers_mjx.py:66-71``; that host round-trip and bug do
  not exist here).
* All controllers are batched-first (vmap over envs) and jit-safe; the
  Stable-PD solve is a batched Cholesky on ``(M + dt*KD)``, symmetrised and
  Tikhonov-regularised once rather than the reference's trace-time condition
  warning (``pds_controllers_mjx.py:104-126``).
* Torques are returned per actuated dof (nu,) and can be clamped to the
  model's gear-derived limits with :func:`clamp_torque`.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from pbrl_tpu.engine.data import Data
from pbrl_tpu.model.spec import Model


class Gains(NamedTuple):
    kp: jnp.ndarray  # (nu,)
    kd: jnp.ndarray  # (nu,)


def _actuated(model: Model, data: Data):
    """(q, qd) on the actuated dofs, plus the dof index map."""
    dofadr = jnp.asarray(model.actuator_dofadr, jnp.int32)
    qposadr = jnp.asarray(model.actuator_qposadr, jnp.int32)
    return data.qpos[qposadr], data.qvel[dofadr], dofadr


def standard_pd(model: Model, data: Data, target: jnp.ndarray, gains: Gains) -> jnp.ndarray:
    """tau = -kp (q - q*) - kd qd (``pds_controllers_agents.py:17-34``)."""
    q, qd, _ = _actuated(model, data)
    return -gains.kp * (q - target) - gains.kd * qd


def inverse_dynamics_pd(
    model: Model, data: Data, target: jnp.ndarray, gains: Gains
) -> jnp.ndarray:
    """Computed-torque PD: tau = (M u + qfrc_bias)[actuated].

    The PD law acts in acceleration space and is mapped through the full
    inertia (``feedback_pd_controller``, ``pds_controllers_agents.py:42-78``).
    Uses the live device-resident M — not the host-stale copy of the
    reference's MJX flavor.
    """
    q, qd, dofadr = _actuated(model, data)
    u = jnp.zeros(model.nv, dtype=data.qvel.dtype)
    u = u.at[dofadr].set(-gains.kp * (q - target) - gains.kd * qd)
    tau_full = data.qM @ u + data.qfrc_bias
    return tau_full[dofadr]


def stable_pd(
    model: Model,
    data: Data,
    target_next: jnp.ndarray,
    gains: Gains,
    *,
    target_vel_next=None,
    reg: float = 1e-6,
) -> jnp.ndarray:
    """Stable PD (Tan et al. 2011), implicit-damping formulation.

    With dt-lookahead target q*_{t+dt} (``stable_pd_controller_custom_
    trajectory``, ``pds_controllers_agents.py:137-172``):

        e      = (q + dt qd) - q*_{t+dt}           (actuated dofs)
        (M + dt KD) qacc = -C - KP e - KD qd + tau_ext
        tau    = -kp e - kd (qd + dt qacc - qd*_{t+dt})

    The (nv, nv) solve is a Cholesky factorisation per env; under vmap XLA
    batches it across the env axis.
    """
    dt = model.option.timestep
    q, qd, dofadr = _actuated(model, data)
    e = jnp.zeros(model.nv, dtype=data.qvel.dtype)
    e = e.at[dofadr].set(q + dt * qd - target_next)
    kp_full = jnp.zeros(model.nv, dtype=data.qvel.dtype).at[dofadr].set(gains.kp)
    kd_full = jnp.zeros(model.nv, dtype=data.qvel.dtype).at[dofadr].set(gains.kd)

    rhs = (
        -data.qfrc_bias
        - kp_full * e
        - kd_full * data.qvel
        + data.qfrc_applied
    )
    m_impl = data.qM + dt * jnp.diag(kd_full)
    m_impl = 0.5 * (m_impl + m_impl.T) + reg * jnp.eye(model.nv, dtype=m_impl.dtype)
    from pbrl_tpu.ops.linalg import solve_spd

    qacc = solve_spd(m_impl, rhs)

    qd_next = qd + dt * qacc[dofadr]
    if target_vel_next is not None:
        qd_next = qd_next - target_vel_next
    return -gains.kp * e[dofadr] - gains.kd * qd_next


def implicit_pd(
    model: Model,
    data: Data,
    target_next: jnp.ndarray,
    gains: Gains,
    *,
    target_vel_next=None,
    clamp: bool = True,
    clamp_scale: float = 1.0,
):
    """Stable PD fused into the integrator's implicit solve (zero extra cost).

    Mathematically the same control law as :func:`stable_pd` — substituting
    tau = -kp e - kd (qd + dt qacc) into ``M qacc = f + tau`` gives

        (M + dt (D + KD)) qacc = f - kp e - kd qd

    i.e. the engine's own implicit-damping Euler solve with KD added to the
    diagonal. So instead of a second per-substep Cholesky (the standalone
    Stable PD's (M + dt KD) factorisation, reference ``pds_controllers_
    agents.py:99-132``), the explicit part rides ``qfrc_applied`` and kd
    rides ``Data.imp_damping``. One factorisation per substep total — this
    is the production controller; the standalone functions exist for parity
    and for host-side experiments.

    ``clamp`` clips the explicit part to the gear-derived torque envelope
    (the implicit -kd dt qacc correction is unclamped by construction).
    """
    dt = model.option.timestep
    q, qd, dofadr = _actuated(model, data)
    e = q + dt * qd - target_next
    qd_err = qd if target_vel_next is None else qd - target_vel_next
    tau = -gains.kp * e - gains.kd * qd_err
    if clamp:
        tau = clamp_torque(model, tau, clamp_scale)
    qfrc = jnp.zeros(model.nv, dtype=data.qvel.dtype).at[dofadr].set(tau)
    imp = jnp.zeros(model.nv, dtype=data.qvel.dtype).at[dofadr].set(gains.kd)
    return data.replace(qfrc_applied=qfrc, imp_damping=imp)


def clamp_torque(model: Model, tau: jnp.ndarray, scale: float = 1.0) -> jnp.ndarray:
    """Clamp per-actuator torque to gear-derived limits.

    The reference realises torque limits through motor ``gear`` x
    ``ctrlrange`` (±0.5, ``models/final_humanoid.xml:8,127-162``); the same
    envelope applies here directly in torque units. ``scale`` widens the
    envelope (scale=2 == DeepMimic's full-gear limits — needed for
    high-power skills like backflip; the ±0.5 ctrlrange halves them).
    """
    hi = model.actuator_gear * model.actuator_ctrlrange[:, 1] * scale
    lo = model.actuator_gear * model.actuator_ctrlrange[:, 0] * scale
    return jnp.clip(tau, lo, hi)


def torque_to_qfrc(model: Model, tau: jnp.ndarray) -> jnp.ndarray:
    """Scatter (nu,) actuated torques into a (nv,) generalized force."""
    dofadr = jnp.asarray(model.actuator_dofadr, jnp.int32)
    return jnp.zeros(model.nv, dtype=tau.dtype).at[dofadr].set(tau)


def masked_torque(tau: jnp.ndarray, actuator_mask: jnp.ndarray) -> jnp.ndarray:
    """Zero torques outside ``actuator_mask``.

    Generalises the reference's positional-argument masked-step variants
    (``step_selected_joints_custom_target_and_joints{,6}``,
    ``agents_env/agent_mimic.py:94-190``) into a single boolean mask.
    """
    return tau * actuator_mask.astype(tau.dtype)
