"""Motion-imitation environment: PD-driven humanoid with DeepMimic reward.

Rebuild + completion of the reference's ``HumanoidTrain``
(``agents_env/agent_mimic.py:34-271``): the action is the PD target, the
controller (standard / inverse-dynamics / Stable PD) turns it into torque,
and the physics advances ``n_substeps`` at the physics rate. What the
reference stubbed out is implemented for real:

* DeepMimic imitation reward — pose / velocity / end-effector / COM terms
  (reference placeholder: ``reward=jp.zeros(3)``, ``agent_mimic.py:84``);
* early termination on fall via contact inspection (placeholder
  ``done=1.0``, ``:72``);
* reference-state initialisation (RSI): reset at a random clip phase;
* live metrics: ``step_index``, ``pose_error``, ``fall`` (named but never
  updated at ``agent_env_template.py:93``) plus the reward terms.

PD torque is re-evaluated every physics substep against the fresh state
(``pd_per_substep``), which the reference architecture could not express —
its torque was computed once per policy step outside the substep loop.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from pbrl_tpu.control import pd as ctrl
from pbrl_tpu.engine.forward import forward_smooth, step_n
from pbrl_tpu.engine.data import make_data
from pbrl_tpu.engine.kinematics import kinematics as run_kinematics
from pbrl_tpu.envs import humanoid_task as task
from pbrl_tpu.envs.base import Env, EnvConfig, State
from pbrl_tpu.mocap.clip import (
    MotionClip,
    phase,
    reference_aux,
    reference_frame_index,
    reference_state,
)
from pbrl_tpu.model.spec import Model

_CONTROLLERS = ("implicit_pd", "stable_pd", "standard_pd", "inverse_dynamics_pd")


class MimicEnv(Env):
    """DeepMimic-style imitation of one motion clip."""

    def __init__(
        self,
        model: Model,
        clip: MotionClip,
        config: EnvConfig = EnvConfig(),
        gains: Optional[ctrl.Gains] = None,
        actuator_mask: Optional[jnp.ndarray] = None,
    ):
        if config.controller not in _CONTROLLERS:
            raise ValueError(
                f"unknown controller {config.controller!r}; one of {sorted(_CONTROLLERS)}"
            )
        # Pin the model timestep to the configured physics rate (the
        # reference forced opt.timestep the same way, agent_env_template.py:65).
        model = model.replace(
            option=model.option.replace(
                timestep=jnp.asarray(config.physics_dt),
                self_contact_mass=config.self_contact_mass)
        )
        if config.contact_tc_scale != 1.0 or config.friction_scale != 1.0:
            # Dynamics-randomization knobs — same transform as MimicVecEnv
            # (vec/per-env semantic parity).
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
        from pbrl_tpu.control import default_gains

        self.gains = gains or default_gains()
        if config.kp_scale != 1.0 or config.kd_scale != 1.0:
            self.gains = ctrl.Gains(kp=self.gains.kp * config.kp_scale,
                                    kd=self.gains.kd * config.kd_scale)
        self.actuator_mask = actuator_mask
        if actuator_mask is not None:
            mk = jnp.asarray(actuator_mask).astype(self.gains.kp.dtype)
            self._masked_gains = ctrl.Gains(kp=self.gains.kp * mk,
                                            kd=self.gains.kd * mk)
        else:
            self._masked_gains = self.gains
        allowed = config.fall_contact_bodies or ("right_ankle", "left_ankle")
        self._fall_mask = task.fall_mask(model, allowed)
        self._qposadr = jnp.asarray(model.actuator_qposadr, jnp.int32)
        self._dofadr = jnp.asarray(model.actuator_dofadr, jnp.int32)
        self._act_jnt = jnp.asarray(model.actuator_jntid(), jnp.int32)

    # -- sizes ------------------------------------------------------------
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

    # -- helpers ----------------------------------------------------------
    def _obs(self, data) -> jnp.ndarray:
        qpos = data.qpos[2:] if self.config.exclude_root_xy else data.qpos
        parts = [qpos, data.qvel]
        if self.config.include_phase:
            parts.append(phase(self.clip, data.time)[None])
        need_heading = (self.config.include_ref_root_offset
                        or self.config.include_link_obs)
        if need_heading:
            w, x, y, z = data.qpos[3:7]
            yaw = jnp.arctan2(2.0 * (w * z + x * y),
                              1.0 - 2.0 * (y * y + z * z))
            c, s = jnp.cos(yaw), jnp.sin(yaw)
        if self.config.include_ref_root_offset:
            q_ref, _ = reference_state(self.clip, data.time)
            d = q_ref[:2] - data.qpos[:2]
            parts.append(jnp.stack([c * d[0] + s * d[1],
                                    -s * d[0] + c * d[1]]))
        if self.config.include_link_obs:
            from pbrl_tpu.maths import quaternion as quat

            rel = data.xpos - data.qpos[None, :3]
            rx = c * rel[:, 0] + s * rel[:, 1]
            ry = -s * rel[:, 0] + c * rel[:, 1]
            h = 0.5 * yaw
            qh_inv = jnp.stack([jnp.cos(h), jnp.zeros_like(h),
                                jnp.zeros_like(h), -jnp.sin(h)])
            qrel = quat.mul(qh_inv[None, :], data.xquat)
            parts.append(jnp.concatenate(
                [rx, ry, rel[:, 2], qrel.reshape(-1)]))
        return jnp.concatenate(parts)

    def _target(self, data, action) -> jnp.ndarray:
        mode = self.config.action_mode
        if mode == "residual":
            lead = self.config.policy_dt + self.config.ref_target_lead
            ref_q, _ = reference_state(self.clip, data.time + lead)
            base = ref_q[self._qposadr]
            target = base + action
        elif mode in ("absolute", "torque"):
            target = action
        else:
            raise ValueError(f"unknown action_mode {mode!r}")
        if not self.config.enforce_joint_limits:
            return target
        rng = self.model.jnt_range[self._act_jnt]  # (nu, 2) actuator order
        return jnp.clip(target, rng[:, 0], rng[:, 1])

    def _torque_fn(self, target, explicit_only: bool = False):
        """qfrc callback evaluated inside each physics substep.

        ``explicit_only`` forces a plain-torque return even for the fused
        implicit controller — needed by the held-torque path
        (``pd_per_substep=False``), which must evaluate ONE torque vector
        from the pre-step state and hold it (reference semantics,
        ``agent_mimic.py:220-228``); the implicit form has no standalone
        torque to hold.
        """

        def qfrc(model, data):
            name = self.config.controller
            if name == "implicit_pd" and not explicit_only:
                # Fused Stable PD: explicit part + kd on the integrator
                # diagonal; no second Cholesky (see control/pd.py). An
                # actuator mask folds into the gains: zero kp/kd means zero
                # explicit torque AND zero implicit diagonal.
                return ctrl.implicit_pd(
                    model, data, target, self._masked_gains,
                    clamp_scale=self.config.torque_limit_scale)
            if name == "standard_pd":
                tau = ctrl.standard_pd(model, data, target, self.gains)
            elif name == "inverse_dynamics_pd":
                tau = ctrl.inverse_dynamics_pd(model, data, target, self.gains)
            else:  # stable_pd, or implicit_pd in explicit (held) form
                tau = ctrl.stable_pd(model, data, target, self.gains)
            tau = ctrl.clamp_torque(model, tau, self.config.torque_limit_scale)
            if self.actuator_mask is not None:
                tau = ctrl.masked_torque(tau, self.actuator_mask)
            return ctrl.torque_to_qfrc(model, tau)

        return qfrc

    def _reward(self, data, fall):
        c = self.config
        qpos_ref, qvel_ref = reference_state(self.clip, data.time)
        ee_ref, com_ref = reference_aux(self.clip, data.time)

        joint_err = task.joint_pose_errors(self.model, data.qpos, qpos_ref)
        _, root_rot_err = task.root_pose_error(data.qpos, qpos_ref)
        pose_sq = jnp.sum(joint_err**2) + root_rot_err**2
        r_pose = jnp.exp(-c.s_pose * pose_sq)

        vel_sq = jnp.sum((data.qvel - qvel_ref) ** 2)
        r_vel = jnp.exp(-c.s_vel * vel_sq)

        ee = task.ee_positions(self.model, data)
        r_ee = jnp.exp(-c.s_ee * jnp.sum((ee - ee_ref) ** 2) / len(task.EE_SPECS))

        com = task.center_of_mass(self.model, data)
        r_com = jnp.exp(-c.s_com * jnp.sum((com - com_ref) ** 2))

        reward = c.w_pose * r_pose + c.w_vel * r_vel + c.w_ee * r_ee + c.w_com * r_com
        if c.aerial_window:
            # Flight-phase re-weighting toward root rotation + angular
            # velocity (same blend as MimicVecEnv._reward_batch).
            lo, hi = c.aerial_window
            ph = phase(self.clip, data.time)
            edge = max(c.aerial_edge, 1e-6)
            win = (jnp.clip((ph - lo) / edge, 0.0, 1.0)
                   * jnp.clip((hi - ph) / edge, 0.0, 1.0))
            r_root = jnp.exp(-c.aerial_s_root * root_rot_err**2)
            dw = data.qvel[3:6] - qvel_ref[3:6]
            r_angvel = jnp.exp(-c.aerial_s_angvel * jnp.sum(dw**2))
            aerial = (c.aerial_w_pose * r_pose + c.aerial_w_root * r_root
                      + c.aerial_w_angvel * r_angvel + c.aerial_w_com * r_com)
            reward = (1.0 - win) * reward + win * aerial
        if c.drift_w > 0:
            # Training-only anti-drift shaping (same blend as
            # MimicVecEnv._reward_batch; see EnvConfig.drift_w).
            dxy = data.qpos[:2] - qpos_ref[:2]
            r_drift = jnp.exp(-c.drift_s * jnp.sum(dxy**2))
            reward = (1.0 - c.drift_w) * reward + c.drift_w * r_drift
        # terminal-step zeroing only when falls terminate (see vec.py)
        if c.early_termination:
            reward = jnp.where(fall, 0.0, reward)
        terms = {
            "reward_pose": r_pose,
            "reward_vel": r_vel,
            "reward_ee": r_ee,
            "reward_com": r_com,
            "pose_error": jnp.mean(joint_err),
            "root_err": root_rot_err,
        }
        return reward, terms

    # -- protocol ---------------------------------------------------------
    def reset(self, rng: jnp.ndarray) -> State:
        rng, key = jax.random.split(rng)
        if self.config.reference_state_init:
            hi = self.clip.cycle_time if self.clip.loop else 0.9 * self.clip.cycle_time
            u = jax.random.uniform(key, ())
            # Same phase curriculum as MimicVecEnv.reset (advisor round 2:
            # the two envs must draw from the same RSI distribution).
            bias = self.config.rsi_phase_bias
            if bias > 0:
                u = u ** (1.0 / (1.0 + bias))
            elif bias < 0:
                u = u ** (1.0 - bias)
            t0 = hi * u
        else:
            t0 = jnp.zeros(())
        qpos, qvel = reference_state(self.clip, t0)
        if self.config.rsi_noise_qpos > 0 or self.config.rsi_noise_qvel > 0:
            kq, kv = jax.random.split(jax.random.fold_in(key, 1))
            qpos = qpos.at[7:].add(
                self.config.rsi_noise_qpos
                * jax.random.normal(kq, (self.model.nq - 7,)))
            qvel = qvel + (self.config.rsi_noise_qvel
                           * jax.random.normal(kv, (self.model.nv,)))
        if self.config.rsi_noise_root_xy > 0:
            kr = jax.random.fold_in(key, 3)
            qpos = qpos.at[:2].add(
                self.config.rsi_noise_root_xy
                * jax.random.uniform(kr, (2,), minval=-1.0, maxval=1.0))
        data = make_data(self.model, qpos=qpos, qvel=qvel).replace(
            time=jnp.asarray(t0, jnp.float32)
        )
        data = run_kinematics(self.model, data)
        reward, terms = self._reward(data, jnp.asarray(False))
        metrics = {
            "step_index": reference_frame_index(self.clip, t0).astype(jnp.float32),
            "fall": jnp.zeros(()),
            **{k: v for k, v in terms.items()},
        }
        return State(
            pipeline=data,
            obs=self._obs(data),
            reward=jnp.zeros(()),
            done=jnp.zeros(()),
            metrics=metrics,
            info={"rng": rng, "episode_start": t0},
        )

    def step(self, state: State, action: jnp.ndarray) -> State:
        data = state.pipeline
        if self.config.action_mode == "torque":
            tau = ctrl.clamp_torque(self.model, action,
                                    self.config.torque_limit_scale)
            if self.actuator_mask is not None:
                tau = ctrl.masked_torque(tau, self.actuator_mask)

            def qfrc_fn(model, d, tau=tau):
                return ctrl.torque_to_qfrc(model, tau)

        else:
            target = self._target(data, action)
            qfrc_fn = self._torque_fn(target)

        n = self.config.n_substeps
        if self.config.action_mode == "torque" or self.config.pd_per_substep:
            data = step_n(self.model, data, n, qfrc_fn=qfrc_fn)
        else:
            # Reference semantics: one torque computed per policy step from
            # the pre-step state, held for all substeps
            # (``agent_mimic.py:220-228``).
            d0 = forward_smooth(self.model, data)
            held = self._torque_fn(target, explicit_only=True)(self.model, d0)
            data = step_n(self.model, data, n, qfrc_fn=lambda m, d: held)
        data = run_kinematics(self.model, data)

        fall = task.detect_fall(self.model, data, self._fall_mask)
        reward, terms = self._reward(data, fall)

        t_in_episode = data.time - state.info["episode_start"]
        done = jnp.zeros(())
        if self.config.early_termination:
            done = jnp.maximum(done, fall.astype(jnp.float32))
        if self.config.pose_termination > 0:
            thr = jnp.asarray(self.config.pose_termination)
            if self.config.pose_termination_after_cycle > 0:
                thr = jnp.where(t_in_episode >= self.clip.cycle_time,
                                self.config.pose_termination_after_cycle, thr)
            off_pose = terms["root_err"] > thr
            reward = jnp.where(off_pose, 0.0, reward)
            done = jnp.maximum(done, off_pose.astype(jnp.float32))
        done = jnp.maximum(
            done, (t_in_episode >= self.config.max_episode_time).astype(jnp.float32)
        )
        if not self.clip.loop:
            done = jnp.maximum(
                done, (data.time >= self.clip.cycle_time).astype(jnp.float32)
            )
        metrics = {
            "step_index": reference_frame_index(self.clip, data.time).astype(jnp.float32),
            "fall": fall.astype(jnp.float32),
            **terms,
        }
        return state.replace(
            pipeline=data, obs=self._obs(data), reward=reward, done=done,
            metrics=metrics,
        )
