"""On-hardware Mosaic kernel CI: humanoid kernel vs the XLA engine.

The humanoid field program is ~66k ops; the Pallas *interpreter* needs >30
min just to trace it on CPU, so interpret mode cannot serve as CI for the
humanoid kernel (round-2 finding, measured again round 3). Mosaic lowering
divergence is only observable on a real TPU anyway — this module IS that
check, as a pytest surface mirroring ``bench.py``'s pre-timing assert:
run ``PBRL_TEST_TPU=1 pytest tests/test_kernel_tpu.py`` on a machine with a
chip (the conftest pins the CPU backend — and the tests self-skip — unless
that variable is set; there is no ``--runtpu`` pytest flag). The sphere-scene interpret test
(test_vec_env.py) still covers the Pallas wrapper mechanics in CPU CI, and
the humanoid kernel *math* is covered transitively by the eager
field-vs-engine differential tests (test_field_physics.py).
"""

import numpy as np
import pytest


@pytest.mark.runtpu
@pytest.mark.parametrize("action_mode", ["absolute", "torque"])
def test_humanoid_kernel_matches_xla_on_tpu(action_mode):
    import jax

    if jax.default_backend() == "cpu":
        pytest.skip("needs a real TPU (Mosaic lowering)")
    import jax.numpy as jnp

    from pbrl_tpu.envs import EnvConfig, MimicVecEnv
    from pbrl_tpu.mocap import load_clip
    from pbrl_tpu.model import humanoid_model

    model = humanoid_model()
    clip = load_clip("walk")
    cfg = EnvConfig(reference_state_init=True, action_mode=action_mode,
                    rsi_noise_qpos=0.05, rsi_noise_qvel=0.5)
    kenv = MimicVecEnv(model, clip, cfg, backend="kernel")
    xenv = MimicVecEnv(model, clip, cfg, backend="xla")
    B = 256
    rngs = jax.random.split(jax.random.PRNGKey(7), B)
    ks = jax.jit(kenv.reset)(rngs)
    xs = jax.jit(xenv.reset)(rngs)
    if action_mode == "torque":
        act = 20.0 * jnp.sin(jnp.arange(B * kenv.action_size)
                             ).reshape(B, kenv.action_size)
    else:
        act = jnp.zeros((B, kenv.action_size))
    kstep = jax.jit(kenv.step)
    xstep = jax.jit(xenv.step)
    for _ in range(2):
        ks = kstep(ks, act)
        xs = xstep(xs, act)
    dq = float(jnp.max(jnp.abs(ks.qpos - xs.qpos)))
    dv_env = np.asarray(jnp.max(jnp.abs(ks.qvel - xs.qvel), axis=1))
    dr = float(jnp.max(jnp.abs(ks.reward - xs.reward)))
    # qvel asserted on the distribution: impact events under the stiff
    # Delassus contacts amplify f32 ordering differences into isolated
    # outliers (see bench.py's identical assert for the measured numbers);
    # a lowering divergence would blow up the median.
    assert np.isfinite(dq) and dq < 5e-3, dq
    assert float(np.median(dv_env)) < 1e-2
    assert float(np.percentile(dv_env, 90)) < 0.15
    assert np.isfinite(dv_env.max()) and float(dv_env.max()) < 1.0
    assert np.isfinite(dr) and dr < 5e-2, dr


@pytest.mark.runtpu
def test_humanoid_kernel_airborne_exact_on_tpu():
    """No-contact tightening (VERDICT r3 weak #5): lift the batch 1 m so no
    contact row is active and require near-exact qvel agreement — the wide
    impact-event tolerance above cannot hide a systematic per-contact
    lowering error here.
    """
    import jax

    if jax.default_backend() == "cpu":
        pytest.skip("needs a real TPU (Mosaic lowering)")
    import jax.numpy as jnp

    from pbrl_tpu.envs import EnvConfig, MimicVecEnv
    from pbrl_tpu.mocap import load_clip
    from pbrl_tpu.model import humanoid_model

    model = humanoid_model()
    clip = load_clip("walk")
    cfg = EnvConfig(reference_state_init=True, rsi_noise_qpos=0.05,
                    rsi_noise_qvel=0.5, early_termination=False)
    kenv = MimicVecEnv(model, clip, cfg, backend="kernel")
    xenv = MimicVecEnv(model, clip, cfg, backend="xla")
    B = 256
    rngs = jax.random.split(jax.random.PRNGKey(11), B)
    ks = jax.jit(kenv.reset)(rngs)
    ks = ks.replace(qpos=ks.qpos.at[:, 2].add(1.0))
    xs = jax.jit(xenv.reset)(rngs)
    xs = xs.replace(qpos=xs.qpos.at[:, 2].add(1.0))
    act = jnp.zeros((B, kenv.action_size))
    kstep = jax.jit(kenv.step)
    xstep = jax.jit(xenv.step)
    for _ in range(2):
        ks = kstep(ks, act)
        xs = xstep(xs, act)
    dq = float(jnp.max(jnp.abs(ks.qpos - xs.qpos)))
    dv = float(jnp.max(jnp.abs(ks.qvel - xs.qvel)))
    # On-chip calibration (logs/bench_r4_step.json): dq=1.04e-4,
    # dv=4.67e-3 — f32 Mosaic-vs-XLA accumulation over 2 implicit-PD
    # policy steps, not contact error. 30x tighter than the impact p90.
    assert np.isfinite(dq) and dq < 5e-4, dq
    assert np.isfinite(dv) and dv < 1.5e-2, dv
