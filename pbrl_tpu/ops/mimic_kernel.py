"""Fused physics-substep Pallas kernel.

Wraps the field-form program (ops/field_physics.py) into ONE Pallas kernel
per policy step: all ``n_substeps`` physics substeps (implicit-PD control,
FK, CRBA/RNEA, contacts, sparse tree Cholesky, integration) run as
straight-line VPU code over 1024-env tiles — one (8, 128) f32 tile per
scalar field — with the substep loop as an in-kernel ``fori_loop`` whose
state lives in the output VMEM refs. This removes the ~1200-op-per-substep
XLA dispatch overhead that capped the einsum engine at ~75k substeps/s/chip.

Layout: batched state enters as ``(B, K)`` arrays, is transposed/reshaped to
``(K, B/128, 128)`` (env batch on lanes), and tiled 8 sublane-blocks per
grid step. B is padded to a multiple of 1024 with the model's rest pose.

Outputs per policy step: final qpos/qvel, final-pose body frames (for the
imitation reward), and a fall flag (any disallowed ground contact during
any substep).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pbrl_tpu.model.spec import Model
from pbrl_tpu.ops import field_physics as fp

_SUB = 8      # sublanes per tile
_LANE = 128   # lanes per tile
TILE_ENVS = _SUB * _LANE


def _kernel(spec: fp.SubstepSpec, qpos_ref, qvel_ref, target_ref,
            oq_ref, ov_ref, xp_ref, xq_ref, fall_ref):
    nq, nv, nu, nb = spec.nq, spec.nv, spec.nu, spec.nbody

    oq_ref[...] = qpos_ref[...]
    ov_ref[...] = qvel_ref[...]
    fall_ref[...] = jnp.zeros_like(fall_ref)

    target = [target_ref[a] for a in range(nu)]

    # Substep 0 runs unrolled: in 'step' self-contact-mass mode it solves
    # the exact self-contact Delassus masses from the policy-step entry
    # state; the fori_loop body closes over them as loop-invariant values
    # for substeps 1..n-1 (~1/8 the per-substep solve cost).
    qpos = [oq_ref[i] for i in range(nq)]
    qvel = [ov_ref[i] for i in range(nv)]
    qpos2, qvel2, fall0, held = fp.substep(spec, qpos, qvel, target)
    for i in range(nq):
        oq_ref[i] = qpos2[i]
    for i in range(nv):
        ov_ref[i] = qvel2[i]
    fall_ref[0] = jnp.maximum(fall_ref[0], fall0)
    held = held or None

    def body(_, carry):
        qpos = [oq_ref[i] for i in range(nq)]
        qvel = [ov_ref[i] for i in range(nv)]
        qpos2, qvel2, fall, _ = fp.substep(spec, qpos, qvel, target,
                                           held_self=held)
        for i in range(nq):
            oq_ref[i] = qpos2[i]
        for i in range(nv):
            ov_ref[i] = qvel2[i]
        fall_ref[0] = jnp.maximum(fall_ref[0], fall)
        return carry

    jax.lax.fori_loop(1, spec.n_substeps, body, 0)

    # final-pose FK for the reward terms
    qpos = [oq_ref[i] for i in range(nq)]
    xpos, xquat = fp.fk_outputs(spec, qpos)
    for b in range(nb):
        for k in range(3):
            xp_ref[3 * b + k] = xpos[b][k]
        for k in range(4):
            xq_ref[4 * b + k] = xquat[b][k]


def _pack(arr, K, nb128):
    """(B, K) -> (K, nb128, 128) with B = nb128*128."""
    return jnp.transpose(arr, (1, 0)).reshape(K, nb128, _LANE)


def _unpack(arr):
    """(K, nb128, 128) -> (B, K)."""
    K = arr.shape[0]
    return jnp.transpose(arr.reshape(K, -1), (1, 0))


def build_mimic_step(
    model: Model,
    kp=None,
    kd=None,
    n_substeps: int = 8,
    mode: str = "pd",
    fall_allowed_bodies: Sequence[str] = (),
    interpret: bool = False,
    torque_scale: float = 1.0,
):
    """Returns ``step(qpos (B,nq), qvel (B,nv), u (B,nu)) ->
    (qpos', qvel', xpos (B,nbody,3), xquat (B,nbody,4), fall (B,))``.

    ``interpret=True`` runs the kernel in the Pallas interpreter (CPU tests).
    """
    spec = fp.build_spec(model, kp=kp, kd=kd, n_substeps=n_substeps,
                         mode=mode, fall_allowed_bodies=fall_allowed_bodies,
                         torque_scale=torque_scale)
    nq, nv, nu, nb = spec.nq, spec.nv, spec.nu, spec.nbody
    kernel = functools.partial(_kernel, spec)
    qpos0 = jnp.asarray(np.asarray(model.qpos0), jnp.float32)

    def step(qpos, qvel, u):
        B = qpos.shape[0]
        if nu == 0:
            u = jnp.zeros((B, 1), qpos.dtype)
        Bp = max(TILE_ENVS, ((B + TILE_ENVS - 1) // TILE_ENVS) * TILE_ENVS)
        if Bp != B:
            padq = jnp.tile(qpos0[None], (Bp - B, 1))
            qpos = jnp.concatenate([qpos, padq], axis=0)
            qvel = jnp.concatenate([qvel, jnp.zeros((Bp - B, nv), qvel.dtype)], 0)
            u = jnp.concatenate([u, jnp.zeros((Bp - B, u.shape[1]), u.dtype)], 0)
        nb128 = Bp // _LANE
        grid = (Bp // TILE_ENVS,)

        def spec3(K):
            return pl.BlockSpec((K, _SUB, _LANE), lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM)

        out_shapes = (
            jax.ShapeDtypeStruct((nq, nb128, _LANE), jnp.float32),
            jax.ShapeDtypeStruct((nv, nb128, _LANE), jnp.float32),
            jax.ShapeDtypeStruct((3 * nb, nb128, _LANE), jnp.float32),
            jax.ShapeDtypeStruct((4 * nb, nb128, _LANE), jnp.float32),
            jax.ShapeDtypeStruct((1, nb128, _LANE), jnp.float32),
        )
        oq, ov, xp, xq, fall = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[spec3(nq), spec3(nv), spec3(max(nu, 1))],
            out_specs=(spec3(nq), spec3(nv), spec3(3 * nb), spec3(4 * nb),
                       spec3(1)),
            out_shape=out_shapes,
            interpret=interpret,
        )(
            _pack(qpos.astype(jnp.float32), nq, nb128),
            _pack(qvel.astype(jnp.float32), nv, nb128),
            _pack(u.astype(jnp.float32), max(nu, 1), nb128),
        )
        qpos2 = _unpack(oq)[:B]
        qvel2 = _unpack(ov)[:B]
        xpos = _unpack(xp)[:B].reshape(B, nb, 3)
        xquat = _unpack(xq)[:B].reshape(B, nb, 4)
        return qpos2, qvel2, xpos, xquat, _unpack(fall)[:B, 0]

    return step, spec
