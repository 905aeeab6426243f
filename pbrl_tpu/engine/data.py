"""Per-environment simulation state (``Data``) pytree.

Mirrors the role of MuJoCo's ``mjData``/MJX's device data (the reference reads
``qpos/qvel/qM/qfrc_bias/qfrc_applied/ctrl/time`` from Brax pipeline state,
e.g. ``agents_env/pds_controllers_agents.py:65-88``) but is a flat immutable
pytree: one env per instance, batched by ``jax.vmap``, sharded by
``shard_map``. Derived quantities (kinematics, mass matrix, bias forces,
contacts) are (re)computed by :func:`pbrl_tpu.engine.forward.forward` and
cached on the same structure so controllers can read them without host trips.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from pbrl_tpu.model.spec import Model


@struct.dataclass
class Contact:
    """Fixed-size batch of candidate contact points (static slot count).

    Inactive slots have ``dist > includemargin`` and are masked out by the
    solver; shapes never depend on runtime state (XLA-friendly).
    """

    dist: jnp.ndarray      # (ncon,) signed gap (negative = penetration)
    pos: jnp.ndarray       # (ncon, 3) world contact point
    frame: jnp.ndarray     # (ncon, 3, 3) rows = [normal, tangent1, tangent2]
    friction: jnp.ndarray  # (ncon,) tangential friction coefficient
    includemargin: jnp.ndarray  # (ncon,)
    body1: jnp.ndarray     # (ncon,) i32 (static content, -1 = world)
    body2: jnp.ndarray     # (ncon,) i32
    force: jnp.ndarray     # (ncon, 3) solved contact force in contact frame

    @property
    def active(self) -> jnp.ndarray:
        return self.dist < self.includemargin


@struct.dataclass
class Data:
    """State + derived cache for one environment."""

    # --- integrated state ---
    qpos: jnp.ndarray          # (nq,)
    qvel: jnp.ndarray          # (nv,)
    time: jnp.ndarray          # ()
    ctrl: jnp.ndarray          # (nu,)
    qfrc_applied: jnp.ndarray  # (nv,) user-injected generalized force
    imp_damping: jnp.ndarray   # (nv,) extra implicit damping folded into the
                               # integrator's (M + h*diag(.)) solve; used by
                               # implicit/Stable PD controllers

    # --- kinematics cache ---
    origin: jnp.ndarray        # (3,) reference point for all Plücker/spatial
                               # quantities (the root body position). Keeping
                               # lever arms body-scale instead of world-scale
                               # preserves precision under TPU bf16 matmul
                               # passes and as the character walks away from
                               # the world origin.
    xpos: jnp.ndarray          # (nbody, 3) body frame origin, world
    xquat: jnp.ndarray         # (nbody, 4)
    xipos: jnp.ndarray         # (nbody, 3) body com, world
    ximat: jnp.ndarray         # (nbody, 3, 3) body rotation, world
    site_xpos: jnp.ndarray     # (nsite, 3)
    geom_xpos: jnp.ndarray     # (ngeom, 3)
    geom_xquat: jnp.ndarray    # (ngeom, 4)
    subspace: jnp.ndarray      # (nv, 6) world-origin Plücker motion axes S
    cvel: jnp.ndarray          # (nbody, 6) body spatial velocity [w, v@origin]

    # --- dynamics cache ---
    qM: jnp.ndarray            # (nv, nv) dense mass matrix (incl. armature)
    qfrc_bias: jnp.ndarray     # (nv,) Coriolis + centrifugal + gravity
    qfrc_passive: jnp.ndarray  # (nv,) damping (+ springs)
    qfrc_actuator: jnp.ndarray # (nv,) actuation force
    qfrc_constraint: jnp.ndarray  # (nv,) contact + limit force
    qacc: jnp.ndarray          # (nv,)
    contact: Contact


def _zero_contact(model: Model) -> Contact:
    from pbrl_tpu.engine import collision

    ncon = collision.ncon_max(model)
    return Contact(
        dist=jnp.full((ncon,), 1e10),
        pos=jnp.zeros((ncon, 3)),
        frame=jnp.tile(jnp.eye(3), (ncon, 1, 1)),
        friction=jnp.ones((ncon,)),
        includemargin=jnp.zeros((ncon,)),
        body1=jnp.zeros((ncon,), jnp.int32),
        body2=jnp.zeros((ncon,), jnp.int32),
        force=jnp.zeros((ncon, 3)),
    )


def make_data(model: Model, qpos=None, qvel=None) -> Data:
    """Fresh Data at ``qpos`` (defaults to the model's reference pose)."""
    nb, nv, nq = model.nbody, model.nv, model.nq
    return Data(
        qpos=jnp.asarray(qpos) if qpos is not None else model.qpos0,
        qvel=jnp.asarray(qvel) if qvel is not None else jnp.zeros(nv),
        time=jnp.zeros(()),
        ctrl=jnp.zeros(model.nu),
        qfrc_applied=jnp.zeros(nv),
        imp_damping=jnp.zeros(nv),
        origin=jnp.zeros(3),
        xpos=jnp.zeros((nb, 3)),
        xquat=jnp.tile(jnp.array([1.0, 0, 0, 0]), (nb, 1)),
        xipos=jnp.zeros((nb, 3)),
        ximat=jnp.tile(jnp.eye(3), (nb, 1, 1)),
        site_xpos=jnp.zeros((model.nsite, 3)),
        geom_xpos=jnp.zeros((model.ngeom, 3)),
        geom_xquat=jnp.tile(jnp.array([1.0, 0, 0, 0]), (model.ngeom, 1)),
        subspace=jnp.zeros((nv, 6)),
        cvel=jnp.zeros((nb, 6)),
        qM=jnp.zeros((nv, nv)),
        qfrc_bias=jnp.zeros(nv),
        qfrc_passive=jnp.zeros(nv),
        qfrc_actuator=jnp.zeros(nv),
        qfrc_constraint=jnp.zeros(nv),
        qacc=jnp.zeros(nv),
        contact=_zero_contact(model),
    )
