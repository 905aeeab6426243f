"""Constraint forces: contacts (normal + Coulomb friction) and joint limits.

Replaces the constraint solve inside ``mjx.step`` (SURVEY.md §2.2). Round-1
solver is a fully vectorized compliant (spring-damper) model with a friction
cone clamp — no sequential per-contact iteration, so it runs as a handful of
fused VPU blocks over the env batch:

* normal:   ``f_n = m_eff * (-(1/tc^2) * penetration - (2*zeta/tc) * v_n)``
  clamped to ``f_n >= 0`` (unilateral), active only while penetrating;
* friction: ``f_t = -m_eff * (2/tc) * v_t`` clamped to the Coulomb cone
  ``|f_t| <= mu * f_n``;
* limits:   one-sided spring-damper in joint space scaled by ``M[ii]``.

``m_eff`` for EVERY contact is the exact Delassus effective mass
``1/(J M^-1 J^T)`` along the contact normal, recomputed every substep from
the live configuration — the normal-direction error dynamics are then
exactly the normalized ``-pen/tc^2 - 2 zeta vn / tc`` regardless of leg
configuration, and a loaded foot settles ~mm instead of ~cm (the round-2
parity transient, PARITY.md). Self-contacts use the same formula with the
two-body row ``J = (anc[b2] - anc[b1]) * (S . f_hat)`` — the common
ancestor path cancels in J but re-enters through the triangular solve
(round-4; round 2/3 used a static pairwise harmonic surrogate here, the
same fidelity-gap class as the round-2 ground surrogate). The fused kernel
applies the identical policy (``field_physics.SubstepSpec.self_contact_
mass``) so the engines stay differential-testable. Cost semantics by
backend: the fused kernel skips the self-row Delassus solve on the n-1
held substeps (~1/8 of the solve cost in 'step' mode); this einsum engine
keeps self rows inside the one batched per-substep solve (a few extra rows
of an already-batched triangular solve) and substitutes the held values —
like the kernel, the entry substep's own fresh solve supplies the held
masses (``contact_forces(return_masses=True)`` captured by the scan carry
in ``forward.step_n``), so no separate entry-state pass runs. Force application
uses the same Jacobian row implicitly: the generalized force is assembled
with the ancestor-mask einsum

    qfrc[i] = S_i . sum_c (anc[b2_c, i] - anc[b1_c, i]) * F_c

with ``F_c`` the world spatial force of contact c about the origin.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pbrl_tpu.maths.numeric import safe_norm
from pbrl_tpu.model.spec import JointType, Model
from pbrl_tpu.engine.data import Data


def _padded_ancestors(model: Model) -> jnp.ndarray:
    """(nbody+1, nv) ancestor mask with a zero row for the world (-1)."""
    zero = jnp.zeros((1, model.nv), dtype=model.ancestor_mask.dtype)
    return jnp.concatenate([model.ancestor_mask, zero], axis=0)


def _delassus_masses(model: Model, data: Data) -> jnp.ndarray:
    """Exact per-row Delassus effective mass 1/(J M^-1 J^T) along each
    contact normal, (ncon,), from the live configuration. Requires
    kinematics + collision + qM on ``data``."""
    con = data.contact
    anc = _padded_ancestors(model)
    b1 = jnp.where(con.body1 < 0, model.nbody, con.body1)
    b2 = jnp.where(con.body2 < 0, model.nbody, con.body2)
    danc = anc[b2] - anc[b1]  # (ncon, nv)
    arm = con.pos - data.origin
    n_w = con.frame[:, 0, :]
    f_hat = jnp.concatenate([jnp.cross(arm, n_w), n_w], axis=-1)  # (ncon, 6)
    jrow = danc * jnp.einsum("ix,cx->ci", data.subspace, f_hat,
                             precision=jax.lax.Precision.HIGHEST)
    from pbrl_tpu.ops.linalg import _solve_lower, cholesky_factor

    chol = cholesky_factor(data.qM)
    y = _solve_lower(chol, jrow)  # (ncon, nv)
    w = jnp.sum(y * y, axis=-1)
    return 1.0 / jnp.maximum(w, 1e-6)


def contact_forces(model: Model, data: Data,
                   held_self: jnp.ndarray | None = None,
                   use_held: jnp.ndarray | None = None,
                   return_masses: bool = False):
    """Solve contact forces and accumulate them into qfrc_constraint.

    ``held_self``: optional (ncon,) masses from the policy-step entry state
    ('step' self-contact-mass mode, see Option.self_contact_mass) — used
    for self-contact rows only; ground rows always recompute exactly.

    ``use_held``: optional traced bool scalar gating ``held_self`` per
    substep inside a ``lax.scan`` (False on the entry substep, where the
    fresh per-substep value IS the entry value; True on the held substeps).
    When None, ``held_self is not None`` alone selects the held path.

    ``return_masses``: also return the fresh per-substep Delassus masses
    ``(ncon,)`` so the caller can capture the entry substep's values as the
    held carry — this is how step_n gets 'step'-mode masses without a
    separate entry pass.
    """
    con = data.contact
    ncon = con.dist.shape[0]
    if ncon == 0:
        out = data.replace(qfrc_constraint=jnp.zeros(model.nv, dtype=data.qvel.dtype))
        return (out, jnp.zeros((0,), data.qvel.dtype)) if return_masses else out

    anc = _padded_ancestors(model)
    b1 = jnp.where(con.body1 < 0, model.nbody, con.body1)
    b2 = jnp.where(con.body2 < 0, model.nbody, con.body2)
    danc = anc[b2] - anc[b1]  # (ncon, nv)

    # Relative velocity of body2 wrt body1 at the contact point.
    cvel_pad = jnp.concatenate([data.cvel, jnp.zeros((1, 6), dtype=data.cvel.dtype)], axis=0)
    v1 = cvel_pad[b1]
    v2 = cvel_pad[b2]

    arm = con.pos - data.origin  # lever arms about the spatial reference point

    def point_vel(v):
        return v[:, 3:] + jnp.cross(v[:, :3], arm)

    vrel = point_vel(v2) - point_vel(v1)  # (ncon, 3)
    # Components in the contact frame (rows: normal, t1, t2).
    v_frame = jnp.einsum("cij,cj->ci", con.frame, vrel)
    vn, vt = v_frame[:, 0], v_frame[:, 1:]

    # Effective mass: exact Delassus 1/(J M^-1 J^T) along the normal. The
    # J row is danc[c,i] * (S_i . [arm x n, n]) — danc differences the two
    # bodies' ancestor masks, so the same row is correct for ground AND
    # two-body self-contacts (see _delassus_masses). Self rows follow
    # Option.self_contact_mass: 'substep' = fresh every substep, 'step' =
    # the held entry-state value when provided, 'static' = the round-2/3
    # pairwise harmonic surrogate.
    m_delassus = _delassus_masses(model, data)
    smode = model.option.self_contact_mass
    is_ground = con.body1 < 0
    if smode == "static":
        inv_mass = jnp.concatenate(
            [1.0 / jnp.maximum(model.body_mass, 1e-9),
             jnp.zeros(1, dtype=data.qvel.dtype)])
        m_harmonic = 1.0 / jnp.maximum(inv_mass[b1] + inv_mass[b2], 1e-9)
        m_eff = jnp.where(is_ground, m_delassus, m_harmonic)
    elif smode == "step" and held_self is not None:
        m_self = (held_self if use_held is None
                  else jnp.where(use_held, held_self, m_delassus))
        m_eff = jnp.where(is_ground, m_delassus, m_self)
    else:  # 'substep', or 'step' at the policy-step entry substep
        m_eff = m_delassus

    tc = jnp.maximum(model.option.contact_timeconst, 2.0 * model.option.timestep)
    zeta = model.option.contact_dampratio
    k = 1.0 / (tc * tc)
    b = 2.0 * zeta / tc

    pen = jnp.minimum(con.dist, 0.0)  # <= 0 while penetrating
    active = (con.dist < 0.0).astype(data.qvel.dtype)
    fn = m_eff * (-k * pen - b * vn)
    fn = jnp.maximum(fn, 0.0) * active

    ft_raw = -m_eff[:, None] * (2.0 / tc) * vt
    # safe_norm: ft_raw is EXACTLY zero at rest and on zero-mass held
    # self-contact rows — linalg.norm's backward would inject NaN there.
    ft_norm = safe_norm(ft_raw, axis=-1)
    cone = con.friction * fn
    scale = jnp.where(ft_norm > 1e-9, jnp.minimum(1.0, cone / jnp.maximum(ft_norm, 1e-9)), 0.0)
    ft = ft_raw * scale[:, None] * active[:, None]

    f_frame = jnp.concatenate([fn[:, None], ft], axis=-1)  # (ncon, 3)
    f_world = jnp.einsum("cji,cj->ci", con.frame, f_frame)  # frame rows -> world

    # Spatial force about data.origin, applied +f to body2, -f to body1.
    spatial_f = jnp.concatenate([jnp.cross(arm, f_world), f_world], axis=-1)  # (ncon, 6)
    per_dof = jnp.einsum("ci,cx->ix", danc, spatial_f, precision=jax.lax.Precision.HIGHEST)  # (nv, 6)
    qfrc = jnp.sum(data.subspace * per_dof, axis=-1)

    out = data.replace(
        qfrc_constraint=data.qfrc_constraint + qfrc,
        contact=con.replace(force=f_frame),
    )
    return (out, m_delassus) if return_masses else out


def limit_forces(model: Model, data: Data) -> Data:
    """One-sided compliant joint-limit torques for limited hinge/slide dofs."""
    rows = []
    for j in range(model.njnt):
        if model.jnt_type[j] == JointType.FREE or not model.jnt_limited[j]:
            continue
        rows.append(j)
    if not rows:
        return data

    qadr = jnp.asarray([model.jnt_qposadr[j] for j in rows], jnp.int32)
    dadr = jnp.asarray([model.jnt_dofadr[j] for j in rows], jnp.int32)
    rng = model.jnt_range[jnp.asarray(rows, jnp.int32)]

    q = data.qpos[qadr]
    qd = data.qvel[dadr]
    m_eff = data.qM[dadr, dadr]

    tc = jnp.maximum(model.option.limit_timeconst, 2.0 * model.option.timestep)
    k = 1.0 / (tc * tc)
    b = 2.0 * model.option.limit_dampratio / tc

    over_hi = jnp.maximum(q - rng[:, 1], 0.0)
    over_lo = jnp.maximum(rng[:, 0] - q, 0.0)
    tau_hi = jnp.where(over_hi > 0, m_eff * (-k * over_hi - b * qd), 0.0)
    tau_hi = jnp.minimum(tau_hi, 0.0)  # limit can only push back
    tau_lo = jnp.where(over_lo > 0, m_eff * (k * over_lo - b * qd), 0.0)
    tau_lo = jnp.maximum(tau_lo, 0.0)
    tau = tau_hi + tau_lo

    qfrc = jnp.zeros(model.nv, dtype=data.qvel.dtype).at[dadr].add(tau)
    return data.replace(qfrc_constraint=data.qfrc_constraint + qfrc)


def constraint_forces(model: Model, data: Data,
                      held_self: jnp.ndarray | None = None,
                      use_held: jnp.ndarray | None = None,
                      return_masses: bool = False):
    data = data.replace(qfrc_constraint=jnp.zeros(model.nv, dtype=data.qvel.dtype))
    out = contact_forces(model, data, held_self=held_self, use_held=use_held,
                         return_masses=return_masses)
    data, masses = out if return_masses else (out, None)
    data = limit_forces(model, data)
    return (data, masses) if return_masses else data
