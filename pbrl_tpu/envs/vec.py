"""Vectorized mimic environment: batch-first step over the fused kernel.

``MimicVecEnv`` is the production batched counterpart of
:class:`~pbrl_tpu.envs.mimic.MimicEnv`: the whole env batch advances through
ONE Pallas kernel per policy step (ops/mimic_kernel.py — all substeps,
implicit-PD control, contacts and integration fused), with only the lean
parts (reference lookup, reward terms, termination, observation assembly)
in XLA. Reward/termination semantics match MimicEnv; throughput is ~3
orders of magnitude higher on TPU.

``backend="xla"`` runs the same batched API over the einsum engine (vmapped)
— used on CPU (tests, the multi-chip dry run) where Mosaic is unavailable;
``backend="auto"`` picks the kernel on TPU.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from pbrl_tpu.control import default_gains
from pbrl_tpu.engine.data import make_data
from pbrl_tpu.engine.forward import step_n
from pbrl_tpu.engine.kinematics import kinematics as run_kinematics
from pbrl_tpu.envs import humanoid_task as task
from pbrl_tpu.envs.base import EnvConfig
from pbrl_tpu.maths import quaternion as quat
from pbrl_tpu.mocap.clip import MotionClip, phase, reference_aux, reference_frame_index, reference_state
from pbrl_tpu.mocap.skeleton import DOF, MODEL_JOINT_ORDER
from pbrl_tpu.model.spec import Model


@struct.dataclass
class VecState:
    """Lean batched state: no per-substep caches, kernel owns the physics."""

    qpos: jnp.ndarray      # (B, nq)
    qvel: jnp.ndarray      # (B, nv)
    time: jnp.ndarray      # (B,)
    episode_start: jnp.ndarray  # (B,)
    obs: jnp.ndarray       # (B, obs_dim)
    reward: jnp.ndarray    # (B,)
    done: jnp.ndarray      # (B,)
    metrics: dict          # (B,) each
    rng: jnp.ndarray       # (B, 2) per-env keys


class MimicVecEnv:
    """Batch-first DeepMimic imitation env over the fused physics kernel."""

    is_vectorized = True

    def __init__(
        self,
        model: Model,
        clip: MotionClip,
        config: EnvConfig = EnvConfig(),
        gains=None,
        backend: str = "auto",
    ):
        model = model.replace(
            option=model.option.replace(timestep=jnp.asarray(config.physics_dt))
        )
        if not config.enforce_joint_limits:
            model = model.replace(jnt_limited=tuple(False for _ in model.jnt_limited))
        self.model = model
        self.config = config
        self.clip = clip if clip.ee_pos is not None else task.augment_clip(model, clip)
        self.gains = gains or default_gains()
        if backend == "auto":
            backend = "kernel" if jax.default_backend() not in ("cpu",) else "xla"
        self.backend = backend
        allowed = config.fall_contact_bodies or ("right_ankle", "left_ankle")
        self._allowed = allowed
        self._qposadr = jnp.asarray(model.actuator_qposadr, jnp.int32)
        self._dofadr = jnp.asarray(model.actuator_dofadr, jnp.int32)

        mode = "torque" if config.action_mode == "torque" else "pd"
        if backend == "kernel":
            if config.controller not in ("implicit_pd", "stable_pd"):
                raise ValueError(
                    f"kernel backend implements implicit/Stable PD; use "
                    f"backend='xla' for {config.controller!r}")
            from pbrl_tpu.ops.mimic_kernel import build_mimic_step

            self._kstep, self._kspec = build_mimic_step(
                model, kp=np.asarray(self.gains.kp), kd=np.asarray(self.gains.kd),
                n_substeps=config.n_substeps, mode=mode,
                fall_allowed_bodies=allowed,
                torque_scale=config.torque_limit_scale,
            )
        else:
            self._fall_mask = task.fall_mask(model, allowed)
            self._mode = mode

        # static reward tables
        self._ee_bids = jnp.asarray([model.body_id(n) for n, _ in task.EE_SPECS],
                                    jnp.int32)
        self._ee_off = jnp.asarray([o for _, o in task.EE_SPECS], jnp.float32)
        self._joint_slices = task.joint_slices(model)
        self._masses = model.body_mass

    # ------------------------------------------------------------------
    @property
    def observation_size(self) -> int:
        n = self.model.nq + self.model.nv
        if self.config.exclude_root_xy:
            n -= 2
        if self.config.include_phase:
            n += 1
        return n

    @property
    def action_size(self) -> int:
        return self.model.nu

    # ------------------------------------------------------------------
    def _obs(self, qpos, qvel, t):
        parts = [qpos[:, 2:] if self.config.exclude_root_xy else qpos, qvel]
        if self.config.include_phase:
            parts.append(jax.vmap(lambda tt: phase(self.clip, tt))(t)[:, None])
        return jnp.concatenate(parts, axis=1)

    def _reward_batch(self, qpos, qvel, t, xpos, xquat, fall):
        c = self.config
        q_ref, v_ref = jax.vmap(lambda tt: reference_state(self.clip, tt))(t)
        ee_ref, com_ref = jax.vmap(lambda tt: reference_aux(self.clip, tt))(t)

        # joint pose error: hinge triples composed to quats, geodesic angle
        errs = []
        for qadr, dof in self._joint_slices:
            if dof == 1:
                errs.append(jnp.abs(qpos[:, qadr] - q_ref[:, qadr]))
            else:
                q1 = quat.from_euler_rxyz(qpos[:, qadr : qadr + 3])
                q2 = quat.from_euler_rxyz(q_ref[:, qadr : qadr + 3])
                errs.append(quat.angle_between(q1, q2))
        joint_err = jnp.stack(errs, axis=1)  # (B, 12)
        root_rot = quat.angle_between(quat.normalize(qpos[:, 3:7]),
                                      quat.normalize(q_ref[:, 3:7]))
        pose_sq = jnp.sum(joint_err**2, axis=1) + root_rot**2
        r_pose = jnp.exp(-c.s_pose * pose_sq)

        r_vel = jnp.exp(-c.s_vel * jnp.sum((qvel - v_ref) ** 2, axis=1))

        ee = xpos[:, self._ee_bids] + quat.rotate(xquat[:, self._ee_bids],
                                                  self._ee_off[None])
        r_ee = jnp.exp(-c.s_ee * jnp.sum((ee - ee_ref) ** 2, axis=(1, 2))
                       / len(task.EE_SPECS))

        com = self._com(xpos, xquat)
        r_com = jnp.exp(-c.s_com * jnp.sum((com - com_ref) ** 2, axis=1))

        reward = (c.w_pose * r_pose + c.w_vel * r_vel + c.w_ee * r_ee
                  + c.w_com * r_com)
        # DeepMimic zeroes the terminal step's reward — only meaningful when
        # falls actually terminate; for floor-contact tasks (getup) ground
        # touches are part of the motion and must stay rewarded.
        if c.early_termination:
            reward = jnp.where(fall > 0, 0.0, reward)
        terms = {
            "reward_pose": r_pose, "reward_vel": r_vel, "reward_ee": r_ee,
            "reward_com": r_com, "pose_error": jnp.mean(joint_err, axis=1),
            "root_err": root_rot,
        }
        return reward, terms

    def _com(self, xpos, xquat):
        ip = self.model.body_ipos  # (nb, 3)
        xip = xpos + quat.rotate(xquat, ip[None])
        return jnp.einsum("b,nbk->nk", self._masses, xip) / jnp.sum(self._masses)

    def _target(self, qpos, t, action):
        mode = self.config.action_mode
        if mode == "residual":
            q_ref, _ = jax.vmap(
                lambda tt: reference_state(self.clip, tt + self.config.policy_dt)
            )(t)
            action = q_ref[:, self._qposadr] + action
        if not self.config.enforce_joint_limits:
            return action
        lo = self.model.jnt_range[1:, 0]
        hi = self.model.jnt_range[1:, 1]
        return jnp.clip(action, lo[None], hi[None])

    # ------------------------------------------------------------------
    def _physics(self, qpos, qvel, u):
        """(qpos', qvel', xpos, xquat, fall) via kernel or XLA fallback."""
        if self.backend == "kernel":
            return self._kstep(qpos, qvel, u)

        m = self.model
        gains = self.gains
        mode = self._mode
        n = self.config.n_substeps
        from pbrl_tpu.control import clamp_torque, implicit_pd, torque_to_qfrc

        ctrl_name = self.config.controller

        def one(q, v, uu):
            d = make_data(m, qpos=q, qvel=v)

            if mode == "pd":
                if ctrl_name in ("implicit_pd", "stable_pd"):
                    qfrc_fn = lambda mm, dd: implicit_pd(
                        mm, dd, uu, gains,
                        clamp_scale=self.config.torque_limit_scale)
                else:
                    from pbrl_tpu.control import (inverse_dynamics_pd,
                                                  standard_pd)

                    law = (standard_pd if ctrl_name == "standard_pd"
                           else inverse_dynamics_pd)

                    def qfrc_fn(mm, dd, law=law):
                        tau = clamp_torque(mm, law(mm, dd, uu, gains))
                        return torque_to_qfrc(mm, tau)

            else:
                tau = clamp_torque(m, uu, self.config.torque_limit_scale)
                qfrc_fn = lambda mm, dd, tau=tau: torque_to_qfrc(mm, tau)

            def sub(dd, _):
                from pbrl_tpu.engine.forward import step as engine_step

                dd = engine_step(m, dd, qfrc_fn=qfrc_fn)
                f = task.detect_fall(m, dd, self._fall_mask)
                return dd, f

            d, falls = jax.lax.scan(sub, d, None, length=n)
            d = run_kinematics(m, d)
            return d.qpos, d.qvel, d.xpos, d.xquat, jnp.max(falls.astype(jnp.float32))

        return jax.vmap(one)(qpos, qvel, u)

    # ------------------------------------------------------------------
    def reset(self, rngs: jnp.ndarray) -> VecState:
        """``rngs``: (B, 2) uint32 keys (e.g. jax.random.split(key, B))."""
        B = rngs.shape[0]
        keys = jax.vmap(jax.random.fold_in)(rngs, jnp.zeros((B,), jnp.uint32))
        if self.config.reference_state_init:
            hi = (self.clip.cycle_time if self.clip.loop
                  else 0.9 * self.clip.cycle_time)
            u = jax.vmap(lambda k: jax.random.uniform(k, ()))(keys)
            bias = self.config.rsi_phase_bias
            if bias > 0:
                u = u ** (1.0 / (1.0 + bias))
            elif bias < 0:
                u = u ** (1.0 - bias)
            t0 = hi * u
        else:
            t0 = jnp.zeros((B,))
        qpos, qvel = jax.vmap(lambda tt: reference_state(self.clip, tt))(t0)
        if self.config.rsi_noise_qpos > 0 or self.config.rsi_noise_qvel > 0:
            kq = jax.vmap(lambda k: jax.random.fold_in(k, 1))(keys)
            kv = jax.vmap(lambda k: jax.random.fold_in(k, 2))(keys)
            nq = jax.vmap(lambda k: jax.random.normal(k, (self.model.nq - 7,)))(kq)
            nv = jax.vmap(lambda k: jax.random.normal(k, (self.model.nv,)))(kv)
            qpos = qpos.at[:, 7:].add(self.config.rsi_noise_qpos * nq)
            qvel = qvel + self.config.rsi_noise_qvel * nv
        obs = self._obs(qpos, qvel, t0)
        zeros = jnp.zeros((B,))
        metrics = {
            "step_index": jax.vmap(
                lambda tt: reference_frame_index(self.clip, tt))(t0).astype(jnp.float32),
            "fall": zeros, "reward_pose": zeros, "reward_vel": zeros,
            "reward_ee": zeros, "reward_com": zeros, "pose_error": zeros,
            "root_err": zeros,
        }
        return VecState(qpos=qpos, qvel=qvel, time=t0, episode_start=t0,
                        obs=obs, reward=zeros, done=zeros, metrics=metrics,
                        rng=rngs)

    def step(self, state: VecState, action: jnp.ndarray) -> VecState:
        u = (action if self.config.action_mode == "torque"
             else self._target(state.qpos, state.time, action))
        qpos, qvel, xpos, xquat, fall = self._physics(state.qpos, state.qvel, u)
        t = state.time + self.config.n_substeps * self.config.physics_dt

        # Failure containment: a numerically-poisoned env (f32 contact blowup)
        # is terminated and sanitised so NaNs never reach the learner or the
        # running obs statistics; auto_reset then replaces it.
        bad = jnp.logical_not(
            jnp.all(jnp.isfinite(qpos), axis=1)
            & jnp.all(jnp.isfinite(qvel), axis=1))
        qpos = jnp.where(bad[:, None], jnp.nan_to_num(qpos), qpos)
        qvel = jnp.where(bad[:, None], jnp.nan_to_num(qvel), qvel)
        xpos = jnp.nan_to_num(xpos)
        xquat = jnp.where(jnp.isfinite(xquat), xquat, 1.0)
        fall = jnp.maximum(fall, bad.astype(fall.dtype))

        reward, terms = self._reward_batch(qpos, qvel, t, xpos, xquat, fall)
        reward = jnp.where(bad, 0.0, jnp.nan_to_num(reward))
        done = jnp.zeros_like(fall)
        if self.config.early_termination:
            done = jnp.maximum(done, fall)
        if self.config.pose_termination > 0:
            off_pose = (terms["root_err"] > self.config.pose_termination)
            reward = jnp.where(off_pose, 0.0, reward)
            done = jnp.maximum(done, off_pose.astype(done.dtype))
        done = jnp.maximum(
            done,
            (t - state.episode_start >= self.config.max_episode_time).astype(done.dtype),
        )
        if not self.clip.loop:
            done = jnp.maximum(done, (t >= self.clip.cycle_time).astype(done.dtype))
        metrics = {
            "step_index": jax.vmap(
                lambda tt: reference_frame_index(self.clip, tt))(t).astype(jnp.float32),
            "fall": fall,
            **terms,
        }
        return state.replace(qpos=qpos, qvel=qvel, time=t,
                             obs=self._obs(qpos, qvel, t), reward=reward,
                             done=done, metrics=metrics)

    def auto_reset(self, state: VecState, rngs: jnp.ndarray) -> VecState:
        """Re-initialise envs where done=1 (keeps finished-step reward/done)."""
        fresh = self.reset(rngs)
        d = state.done.astype(bool)

        def sel(a, b):
            return jnp.where(d.reshape((-1,) + (1,) * (a.ndim - 1)), a, b)

        merged = jax.tree.map(sel, fresh, state)
        return merged.replace(reward=state.reward, done=state.done,
                              metrics=state.metrics)
