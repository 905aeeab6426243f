"""Kinematic motion-replay environment.

Rebuild of the reference's ``HumanoidReplay``/``HumanoidReplay2``
(``agents_env/agent_replay_motion.py:34-83``): ``step`` runs forward
kinematics only — no dynamics — so the reference motion can be played back,
rendered, and validated. Unlike the reference (whose notebook loops mutate
``state.pipeline_state.qpos`` on the host every frame, SURVEY.md §3.3), the
clip lives on device and ``step`` advances a device-side clock, so whole
playbacks run inside one ``lax.scan``.

Partial-body replay (the notebook's right-arm-only experiment) is a
constructor-level dof mask rather than host-side index surgery.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from pbrl_tpu.engine.data import make_data
from pbrl_tpu.engine.kinematics import kinematics as run_kinematics
from pbrl_tpu.envs.base import Env, EnvConfig, State
from pbrl_tpu.mocap.clip import MotionClip, phase, reference_frame_index, reference_state
from pbrl_tpu.model.spec import Model


class ReplayEnv(Env):
    """FK-only playback of a motion clip."""

    def __init__(
        self,
        model: Model,
        clip: MotionClip,
        config: EnvConfig = EnvConfig(),
        qpos_mask: Optional[jnp.ndarray] = None,
    ):
        self.model = model
        self.clip = clip
        self.config = config
        # qpos_mask: 1.0 where the clip drives the dof, 0.0 where the model
        # holds its reference pose (partial-body replay).
        self.qpos_mask = (
            jnp.ones(model.nq) if qpos_mask is None else jnp.asarray(qpos_mask)
        )

    @property
    def observation_size(self) -> int:
        return self.model.nq + self.model.nv

    @property
    def action_size(self) -> int:
        return 0

    def _at_time(self, t) -> State:
        qpos_ref, qvel_ref = reference_state(self.clip, t)
        qpos = jnp.where(self.qpos_mask > 0, qpos_ref, self.model.qpos0)
        qvel = qvel_ref * (self.qpos_mask[: self.model.nv] > 0)
        data = make_data(self.model, qpos=qpos, qvel=qvel)
        data = data.replace(time=jnp.asarray(t, qpos.dtype))
        data = run_kinematics(self.model, data)
        obs = jnp.concatenate([data.qpos, data.qvel])
        metrics = {
            "step_index": reference_frame_index(self.clip, t).astype(jnp.float32),
            "phase": phase(self.clip, t),
        }
        done = jnp.where(
            jnp.logical_or(self.clip.loop, t < self.clip.cycle_time), 0.0, 1.0
        )
        return State(pipeline=data, obs=obs, reward=jnp.zeros(()), done=done,
                     metrics=metrics, info={})

    def reset(self, rng: jnp.ndarray) -> State:
        del rng
        return self._at_time(jnp.zeros(()))

    def step(self, state: State, action: jnp.ndarray = None) -> State:
        del action  # kinematic playback ignores actions (reference :51-83)
        return self._at_time(state.pipeline.time + self.config.policy_dt)

    def at_frame(self, k) -> State:
        """Jump straight to clip frame ``k`` (the notebooks' per-frame qpos
        injection, without the host round trip)."""
        return self._at_time(jnp.asarray(k, jnp.float32) * self.clip.dt)

    def rollout(self, n_steps: int) -> State:
        """Play ``n_steps`` frames in one ``lax.scan``; returns stacked States."""
        s0 = self.reset(jax.random.PRNGKey(0))

        def body(s, _):
            s2 = self.step(s)
            return s2, s2

        _, states = jax.lax.scan(body, s0, None, length=n_steps)
        return states
