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
        actuator_mask=None,
    ):
        model = model.replace(
            option=model.option.replace(
                timestep=jnp.asarray(config.physics_dt),
                self_contact_mass=config.self_contact_mass)
        )
        if config.contact_tc_scale != 1.0 or config.friction_scale != 1.0:
            # Dynamics-randomization knobs (see EnvConfig): perturb the
            # contact model the policy trains against so it cannot overfit
            # one engine's landing behavior. Eval resets both to 1.0.
            opt = model.option
            model = model.replace(
                option=opt.replace(
                    contact_timeconst=opt.contact_timeconst
                    * config.contact_tc_scale),
                geom_friction=model.geom_friction * config.friction_scale,
            )
        if not config.enforce_joint_limits:
            model = model.replace(jnt_limited=tuple(False for _ in model.jnt_limited))
        self.model = model
        self.config = config
        self.clip = clip if clip.ee_pos is not None else task.augment_clip(model, clip)
        self.gains = gains or default_gains()
        if config.kp_scale != 1.0 or config.kd_scale != 1.0:
            from pbrl_tpu.control.pd import Gains

            self.gains = Gains(kp=self.gains.kp * config.kp_scale,
                               kd=self.gains.kd * config.kd_scale)
        self.actuator_mask = actuator_mask
        if actuator_mask is not None:
            mk = jnp.asarray(actuator_mask).astype(self.gains.kp.dtype)
            self._mask = mk
            # For the implicit-PD law an actuator mask folds into the gains:
            # zero kp/kd = zero explicit torque and zero implicit diagonal
            # (reference masked-joint step variants, agent_mimic.py:94-190).
            from pbrl_tpu.control.pd import Gains

            self._masked_gains = Gains(kp=self.gains.kp * mk,
                                       kd=self.gains.kd * mk)
        else:
            self._mask = None
            self._masked_gains = self.gains
        if backend == "auto":
            backend = "kernel" if jax.default_backend() not in ("cpu",) else "xla"
        self.backend = backend
        allowed = config.fall_contact_bodies or ("right_ankle", "left_ankle")
        self._allowed = allowed
        self._qposadr = jnp.asarray(model.actuator_qposadr, jnp.int32)
        self._dofadr = jnp.asarray(model.actuator_dofadr, jnp.int32)
        self._act_jnt = jnp.asarray(model.actuator_jntid(), jnp.int32)

        mode = "torque" if config.action_mode == "torque" else "pd"
        # Held-torque semantics (pd_per_substep=False, the reference's
        # once-per-policy-step PD, agent_mimic.py:220-228): the torque is
        # evaluated in XLA from the pre-step state and the kernel runs in
        # its torque mode.
        self._held_pd = (mode == "pd" and not config.pd_per_substep)
        if self._held_pd and config.controller not in ("implicit_pd",
                                                       "stable_pd"):
            raise ValueError(
                "pd_per_substep=False currently implements the Stable-PD "
                f"law; use pd_per_substep=True for {config.controller!r}")
        if backend == "kernel":
            if config.controller not in ("implicit_pd", "stable_pd"):
                raise ValueError(
                    f"kernel backend implements implicit/Stable PD; use "
                    f"backend='xla' for {config.controller!r}")
            from pbrl_tpu.ops.mimic_kernel import build_mimic_step

            kmode = "torque" if self._held_pd else mode
            self._kstep, self._kspec = build_mimic_step(
                model, kp=np.asarray(self._masked_gains.kp),
                kd=np.asarray(self._masked_gains.kd),
                n_substeps=config.n_substeps, mode=kmode,
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
        if self.config.include_ref_root_offset:
            n += 2
        if self.config.include_link_obs:
            n += 7 * self.model.nbody
        return n

    @property
    def action_size(self) -> int:
        return self.model.nu

    # ------------------------------------------------------------------
    def _fk_batch(self, qpos, qvel):
        """Body frames via the einsum engine's FK (resets only; the hot
        step path reuses the physics kernel's FK outputs)."""

        def one(q, v):
            d = run_kinematics(self.model, make_data(self.model, qpos=q, qvel=v))
            return d.xpos, d.xquat

        return jax.vmap(one)(qpos, qvel)

    def _obs(self, qpos, qvel, t, xpos=None, xquat=None):
        parts = [qpos[:, 2:] if self.config.exclude_root_xy else qpos, qvel]
        if self.config.include_phase:
            parts.append(jax.vmap(lambda tt: phase(self.clip, tt))(t)[:, None])
        need_heading = (self.config.include_ref_root_offset
                        or self.config.include_link_obs)
        if need_heading:
            w, x, y, z = (qpos[:, 3], qpos[:, 4], qpos[:, 5], qpos[:, 6])
            yaw = jnp.arctan2(2.0 * (w * z + x * y),
                              1.0 - 2.0 * (y * y + z * z))
            c, s = jnp.cos(yaw), jnp.sin(yaw)
        if self.config.include_ref_root_offset:
            q_ref, _ = jax.vmap(lambda tt: reference_state(self.clip, tt))(t)
            d = q_ref[:, :2] - qpos[:, :2]
            # rotate into the root heading (yaw) frame: translation- and
            # heading-invariant drift signal
            parts.append(jnp.stack(
                [c * d[:, 0] + s * d[:, 1], -s * d[:, 0] + c * d[:, 1]],
                axis=1))
        if self.config.include_link_obs:
            if xpos is None:
                xpos, xquat = self._fk_batch(qpos, qvel)
            rel = xpos - qpos[:, None, :3]
            rx = c[:, None] * rel[..., 0] + s[:, None] * rel[..., 1]
            ry = -s[:, None] * rel[..., 0] + c[:, None] * rel[..., 1]
            # heading-normalized orientations: q_yaw^-1 * xquat
            h = 0.5 * yaw
            qh_inv = jnp.stack([jnp.cos(h), jnp.zeros_like(h),
                                jnp.zeros_like(h), -jnp.sin(h)], axis=1)
            qrel = quat.mul(qh_inv[:, None, :], xquat)
            B = qpos.shape[0]
            parts.append(jnp.concatenate(
                [rx, ry, rel[..., 2], qrel.reshape(B, -1)], axis=1))
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
        if c.aerial_window:
            # Flight-phase re-weighting: blend toward a root-rotation +
            # root-angular-velocity reward inside the window.
            lo, hi = c.aerial_window
            ph = jax.vmap(lambda tt: phase(self.clip, tt))(t)
            edge = max(c.aerial_edge, 1e-6)
            win = (jnp.clip((ph - lo) / edge, 0.0, 1.0)
                   * jnp.clip((hi - ph) / edge, 0.0, 1.0))
            r_root = jnp.exp(-c.aerial_s_root * root_rot**2)
            dw = qvel[:, 3:6] - v_ref[:, 3:6]
            r_angvel = jnp.exp(-c.aerial_s_angvel * jnp.sum(dw**2, axis=1))
            aerial = (c.aerial_w_pose * r_pose + c.aerial_w_root * r_root
                      + c.aerial_w_angvel * r_angvel + c.aerial_w_com * r_com)
            reward = (1.0 - win) * reward + win * aerial
        if c.drift_w > 0:
            # Training-only anti-drift shaping: gentle-scale root-xy term
            # whose gradient survives the 0.1-0.5 m drifts that saturate
            # the EE/COM exponentials (see EnvConfig.drift_w).
            dxy = qpos[:, :2] - q_ref[:, :2]
            r_drift = jnp.exp(-c.drift_s * jnp.sum(dxy**2, axis=1))
            reward = (1.0 - c.drift_w) * reward + c.drift_w * r_drift
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
            lead = self.config.policy_dt + self.config.ref_target_lead
            q_ref, _ = jax.vmap(
                lambda tt: reference_state(self.clip, tt + lead)
            )(t)
            action = q_ref[:, self._qposadr] + action
        if not self.config.enforce_joint_limits:
            return action
        rng = self.model.jnt_range[self._act_jnt]  # (nu, 2) actuator order
        return jnp.clip(action, rng[None, :, 0], rng[None, :, 1])

    # ------------------------------------------------------------------
    def _held_tau(self, qpos, qvel, target):
        """One Stable-PD torque per env from the pre-step state (the
        reference's per-policy-step PD, ``agent_mimic.py:220-228``)."""
        from pbrl_tpu.control import clamp_torque, masked_torque, stable_pd
        from pbrl_tpu.engine.forward import forward_smooth

        m = self.model

        def one(q, v, uu):
            d = forward_smooth(m, make_data(m, qpos=q, qvel=v))
            tau = clamp_torque(m, stable_pd(m, d, uu, self.gains),
                               self.config.torque_limit_scale)
            if self._mask is not None:
                tau = masked_torque(tau, self._mask)
            return tau

        return jax.vmap(one)(qpos, qvel, target)

    def _physics(self, qpos, qvel, u):
        """(qpos', qvel', xpos, xquat, fall) via kernel or XLA fallback."""
        if self._held_pd:
            u = self._held_tau(qpos, qvel, u)
        if self.backend == "kernel":
            return self._kstep(qpos, qvel, u)

        m = self.model
        gains = self._masked_gains
        mode = "torque" if self._held_pd else self._mode
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
                                                  masked_torque, standard_pd)

                    law = (standard_pd if ctrl_name == "standard_pd"
                           else inverse_dynamics_pd)

                    def qfrc_fn(mm, dd, law=law):
                        tau = clamp_torque(mm, law(mm, dd, uu, self.gains),
                                           self.config.torque_limit_scale)
                        if self._mask is not None:
                            tau = masked_torque(tau, self._mask)
                        return torque_to_qfrc(mm, tau)

            else:
                tau = clamp_torque(m, uu, self.config.torque_limit_scale)
                if self._mask is not None:
                    from pbrl_tpu.control import masked_torque

                    tau = masked_torque(tau, self._mask)
                qfrc_fn = lambda mm, dd, tau=tau: torque_to_qfrc(mm, tau)

            from pbrl_tpu.engine.forward import step as engine_step

            ncon = d.contact.dist.shape[0]
            if m.option.self_contact_mass == "step" and ncon > 0:
                # Entry substep's own solve supplies the held self-contact
                # masses; the scan carries them for substeps 1..n-1 (same
                # structure as the fused kernel's unrolled substep 0).
                def sub(carry, i):
                    dd, held = carry
                    dd, masses = engine_step(
                        m, dd, qfrc_fn=qfrc_fn, held_self=held,
                        use_held=i > 0, return_self_masses=True)
                    held = jnp.where(i == 0, masses, held)
                    f = task.detect_fall(m, dd, self._fall_mask)
                    return (dd, held), f

                init = (d, jnp.zeros((ncon,), dtype=d.qvel.dtype))
                (d, _), falls = jax.lax.scan(sub, init, jnp.arange(n))
            else:

                def sub(dd, _):
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
        if self.config.rsi_noise_root_xy > 0:
            kr = jax.vmap(lambda k: jax.random.fold_in(k, 3))(keys)
            nxy = jax.vmap(lambda k: jax.random.uniform(
                k, (2,), minval=-1.0, maxval=1.0))(kr)
            qpos = qpos.at[:, :2].add(self.config.rsi_noise_root_xy * nxy)
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
        if self.config.action_mode == "torque":
            u = action if self._mask is None else action * self._mask[None]
        else:
            u = self._target(state.qpos, state.time, action)
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

        obs = self._obs(qpos, qvel, t, xpos=xpos, xquat=xquat)
        reward, terms = self._reward_batch(qpos, qvel, t, xpos, xquat, fall)
        reward = jnp.where(bad, 0.0, jnp.nan_to_num(reward))
        done = jnp.zeros_like(fall)
        if self.config.early_termination:
            done = jnp.maximum(done, fall)
        if self.config.pose_termination > 0:
            thr = jnp.full_like(t, self.config.pose_termination)
            if self.config.pose_termination_after_cycle > 0:
                survived_cycle = (t - state.episode_start
                                  >= self.clip.cycle_time)
                thr = jnp.where(survived_cycle,
                                self.config.pose_termination_after_cycle, thr)
            off_pose = terms["root_err"] > thr
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
                             obs=obs, reward=reward,
                             done=done, metrics=metrics)

    def auto_reset(self, state: VecState, rngs: jnp.ndarray) -> VecState:
        """Re-initialise envs where done=1 (keeps finished-step reward/done)."""
        fresh = self.reset(rngs)
        p = self.config.curriculum_reset_prob
        if p > 0:
            # Takeoff-state curriculum: with probability p restart from the
            # current state of a random alive peer (optionally filtered to a
            # clip-phase window) instead of from the reference.
            B = state.done.shape[0]
            alive = state.done == 0
            if self.config.curriculum_phase_window:
                lo, hi = self.config.curriculum_phase_window
                ph = jax.vmap(lambda tt: phase(self.clip, tt))(state.time)
                ok = alive & (ph >= lo) & (ph <= hi)
            else:
                ok = alive
            logits = jnp.where(ok, 0.0, -1e9)
            u = jax.vmap(
                lambda k: jax.random.uniform(jax.random.fold_in(k, 7), ()))(rngs)
            peer = jax.vmap(
                lambda k: jax.random.categorical(
                    jax.random.fold_in(k, 8), logits))(rngs)
            # ok[peer] guards the all-masked case (categorical degenerates).
            use = (u < p) & ok[peer]
            peer_qpos = state.qpos[peer]
            if self.config.curriculum_recenter_xy:
                ref_q, _ = jax.vmap(
                    lambda tt: reference_state(self.clip, tt))(state.time[peer])
                peer_qpos = peer_qpos.at[:, :2].set(ref_q[:, :2])
            qpos0 = jnp.where(use[:, None], peer_qpos, fresh.qpos)
            qvel0 = jnp.where(use[:, None], state.qvel[peer], fresh.qvel)
            t0 = jnp.where(use, state.time[peer], fresh.time)
            es0 = jnp.where(use, state.time[peer], fresh.episode_start)
            fresh = fresh.replace(qpos=qpos0, qvel=qvel0, time=t0,
                                  episode_start=es0,
                                  obs=self._obs(qpos0, qvel0, t0))
        d = state.done.astype(bool)

        def sel(a, b):
            return jnp.where(d.reshape((-1,) + (1,) * (a.ndim - 1)), a, b)

        merged = jax.tree.map(sel, fresh, state)
        return merged.replace(reward=state.reward, done=state.done,
                              metrics=state.metrics)
