"""Forward dynamics pipeline and integrator: the TPU-native ``mjx.step``.

Pipeline (all pure functions of ``(Model, Data)``):

    kinematics -> collide -> com_velocity -> crba -> rnea_bias -> passive
    -> actuation -> constraint_forces -> acceleration -> integrate

``step`` advances one physics substep; ``step_n`` runs ``n`` substeps under
``lax.scan`` (the reference's ``pipeline_step`` with ``n_frames`` substeps,
``agents_env/agent_env_template.py:68``). Batch over envs with ``jax.vmap``;
everything is static-shaped and jit-compiles into a single XLA program.

Acceleration uses MuJoCo's implicit-damping Euler: ``(M + h*diag(damping))
qacc = qfrc_smooth + qfrc_constraint`` so the default humanoid (damping=1 on
all 28 hinges, ``final_humanoid.xml:5``) integrates stably at h = 2 ms.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from pbrl_tpu.maths import quaternion as quat
from pbrl_tpu.model.spec import JointType, Model
from pbrl_tpu.engine import collision, dynamics, kinematics, solver
from pbrl_tpu.engine.data import Data, make_data  # noqa: F401 (re-export)


def fwd_position(model: Model, data: Data) -> Data:
    data = kinematics.kinematics(model, data)
    data = collision.collide(model, data)
    return data


def fwd_velocity(model: Model, data: Data) -> Data:
    data = kinematics.com_velocity(model, data)
    data = dynamics.crba(model, data)
    data = dynamics.rnea_bias(model, data)
    data = dynamics.passive(model, data)
    return data


def fwd_acceleration(model: Model, data: Data) -> Data:
    h = model.option.timestep
    qfrc_smooth = (
        data.qfrc_applied
        + data.qfrc_actuator
        + data.qfrc_passive
        - data.qfrc_bias
    )
    rhs = qfrc_smooth + data.qfrc_constraint
    # Implicit damping: fold h*D into the mass matrix before the solve. The
    # explicit -D*qvel is already in qfrc_passive; together they realise
    # M qacc = f - D qvel_{t+1} (MuJoCo Euler default). ``imp_damping``
    # carries extra implicit diagonal terms injected by controllers
    # (implicit/Stable PD's kd, see control/pd.py:implicit_pd).
    m_impl = data.qM + h * jnp.diag(model.dof_damping + data.imp_damping)
    # Dense SPD solve, nv x nv (34x34 for the humanoid), via the unrolled
    # TPU-shaped Cholesky (ops/linalg.py) — XLA's generic blocked Cholesky
    # is >10x slower at this size/batch.
    from pbrl_tpu.ops.linalg import solve_spd

    qacc = solve_spd(m_impl, rhs)
    return data.replace(qacc=qacc)


def forward_smooth(model: Model, data: Data) -> Data:
    """Kinematics + inertial quantities only (qM, qfrc_bias, cvel) — the
    inputs PD controllers need (the reference read them off Brax pipeline
    state, ``pds_controllers_agents.py:65-69``). No collision/constraint work.
    """
    data = kinematics.kinematics(model, data)
    data = fwd_velocity(model, data)
    return data


def forward(model: Model, data: Data, qfrc_fn=None, held_self=None,
            use_held=None, return_self_masses: bool = False):
    """Full forward dynamics: fills every derived field including qacc.

    ``qfrc_fn(model, data)`` — optional in-loop controller hook, invoked
    after the inertial quantities (qM, qfrc_bias, cvel) are cached and
    before the constraint solve. It may return a ``(nv,)`` force (replaces
    ``qfrc_applied``) or a whole ``Data`` (e.g. implicit PD also sets
    ``imp_damping``). This is how PD control runs *inside* the physics
    substep loop (the reference could only apply torque once per policy
    step from outside, ``agents_env/agent_mimic.py:220-228``).

    ``held_self`` / ``use_held`` / ``return_self_masses`` — 'step'
    self-contact-mass mode plumbing (Option.self_contact_mass): the held
    policy-step-entry masses, the traced per-substep gate, and whether to
    also return this substep's fresh Delassus masses so the caller's scan
    carry can capture the entry substep's values (see solver.contact_forces).
    """
    data = fwd_position(model, data)
    data = fwd_velocity(model, data)
    data = dynamics.actuation(model, data)
    if qfrc_fn is not None:
        out = qfrc_fn(model, data)
        data = out if isinstance(out, Data) else data.replace(qfrc_applied=out)
    out = solver.constraint_forces(model, data, held_self=held_self,
                                   use_held=use_held,
                                   return_masses=return_self_masses)
    data, masses = out if return_self_masses else (out, None)
    data = fwd_acceleration(model, data)
    return (data, masses) if return_self_masses else data


def _integrate_qpos(model: Model, qpos: jnp.ndarray, qvel: jnp.ndarray, h) -> jnp.ndarray:
    """Position integration per joint type (free-joint quat on the manifold)."""
    out = qpos
    for j in range(model.njnt):
        qa, da = model.jnt_qposadr[j], model.jnt_dofadr[j]
        jt = model.jnt_type[j]
        if jt == JointType.FREE:
            out = out.at[qa : qa + 3].add(h * qvel[da : da + 3])
            q = quat.integrate(qpos[qa + 3 : qa + 7], qvel[da + 3 : da + 6], h)
            out = out.at[qa + 3 : qa + 7].set(q)
        else:
            out = out.at[qa].add(h * qvel[da])
    return out


_QVEL_LIMIT = 1e3  # defensive clamp: keeps f32 contact blowups from
                   # cascading into NaNs (failure containment, SURVEY.md §5)


def integrate(model: Model, data: Data) -> Data:
    """Semi-implicit Euler: velocity first, then position with new velocity."""
    h = model.option.timestep
    qvel = jnp.clip(data.qvel + h * data.qacc, -_QVEL_LIMIT, _QVEL_LIMIT)
    qpos = _integrate_qpos(model, data.qpos, qvel, h)
    return data.replace(qpos=qpos, qvel=qvel, time=data.time + h)


def step(model: Model, data: Data, ctrl: Optional[jnp.ndarray] = None,
         qfrc_fn=None, held_self=None, use_held=None,
         return_self_masses: bool = False):
    """One physics substep. ``ctrl`` (if given) is held for the substep.

    With ``return_self_masses=True`` also returns this substep's fresh
    per-row Delassus masses ``(ncon,)`` (see :func:`forward`)."""
    if ctrl is not None:
        data = data.replace(ctrl=ctrl)
    out = forward(model, data, qfrc_fn=qfrc_fn, held_self=held_self,
                  use_held=use_held, return_self_masses=return_self_masses)
    data, masses = out if return_self_masses else (out, None)
    data = integrate(model, data)
    return (data, masses) if return_self_masses else data


def step_n(
    model: Model,
    data: Data,
    n: int,
    ctrl: Optional[jnp.ndarray] = None,
    qfrc_fn=None,
) -> Data:
    """``n`` substeps with held control, as a ``lax.scan`` (static n).

    With ``qfrc_fn`` the controller re-evaluates every substep against the
    fresh state (DeepMimic-style PD at the physics rate). In 'step'
    self-contact-mass mode the entry substep's own constraint solve
    supplies the exact self-contact masses, carried by the scan for
    substeps 1..n-1 — no separate entry-state pass (the fused kernel gets
    the same effect by unrolling substep 0, ops/mimic_kernel.py:49-61)."""
    if ctrl is not None:
        data = data.replace(ctrl=ctrl)

    ncon = data.contact.dist.shape[0]
    if model.option.self_contact_mass == "step" and ncon > 0:

        def body(carry, i):
            d, held = carry
            d, masses = step(model, d, qfrc_fn=qfrc_fn, held_self=held,
                             use_held=i > 0, return_self_masses=True)
            held = jnp.where(i == 0, masses, held)
            return (d, held), None

        init = (data, jnp.zeros((ncon,), dtype=data.qvel.dtype))
        (data, _), _ = jax.lax.scan(body, init, jnp.arange(n))
        return data

    def body(d, _):
        return step(model, d, qfrc_fn=qfrc_fn), None

    data, _ = jax.lax.scan(body, data, None, length=n)
    return data
