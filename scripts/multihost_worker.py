"""One process of a REAL multi-process (DCN-equivalent) training step.

Launched N times by ``tests/test_distributed.py::test_two_process_ppo_step``
(and usable by hand for bring-up experiments):

  python scripts/multihost_worker.py <process_id> <num_processes> <port>

Each process contributes ``--xla_force_host_platform_device_count`` local
CPU devices to a GLOBAL data-parallel mesh via ``jax.distributed.initialize``
with Gloo cross-process collectives — the same code path a v5e multi-host
pod uses over DCN (SURVEY.md §2.3/§5), with CPU+Gloo standing in for
TPU+ICI/DCN. It then jits ONE full PPO training step (pbrl_tpu/train/ppo.py,
unchanged — the program is identical single- or multi-host) over the global
mesh with the env batch sharded on ``data`` and parameters replicated, runs
it, and prints the resulting reward_mean. The gradient all-reduce this
induces crosses the process boundary, so agreement of the printed metric
across processes certifies real cross-host SPMD, not per-process silos.

The reference has no distributed machinery at all (its implied story is
Brax PPO's pmap+NCCL, never invoked); this is the TPU-native equivalent,
exercised for real.
"""

import os
import sys

LOCAL_DEVICES = 2


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={LOCAL_DEVICES}")
    import jax

    # Force host CPU before backend init (the axon TPU plugin ignores
    # JAX_PLATFORMS) and select Gloo for cross-process CPU collectives.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from pbrl_tpu.parallel import (
        DistributedConfig,
        initialize_distributed,
        is_primary_host,
        make_mesh,
        replicated,
        sharded_batch_spec,
    )

    initialize_distributed(
        DistributedConfig(coordinator_address=f"localhost:{port}",
                          num_processes=nproc, process_id=pid))
    assert jax.process_count() == nproc
    assert jax.device_count() == nproc * LOCAL_DEVICES
    assert is_primary_host() == (pid == 0)

    import numpy as np

    from pbrl_tpu.envs import EnvConfig, MimicVecEnv
    from pbrl_tpu.mocap import load_clip
    from pbrl_tpu.model import humanoid_model
    from pbrl_tpu.train import TrainConfig, make_train_functions

    # Tiny shapes: 2 envs/device, 2 physics substeps, 2-step unroll — the
    # full sharded program with a CPU-tractable compile.
    env = MimicVecEnv(humanoid_model(), load_clip("walk"),
                      EnvConfig(policy_dt=0.004), backend="xla")
    config = TrainConfig(num_envs=2 * jax.device_count(), unroll_length=2,
                         num_minibatches=2, update_epochs=1, hidden=(32, 32))
    init, train_step, _ = make_train_functions(env, config)

    # Every process builds the identical host-side state (same seed), then
    # assembles GLOBAL arrays: each process donates its addressable shards.
    ts = init(jax.random.PRNGKey(0))
    mesh = make_mesh()
    batch_sh = sharded_batch_spec(mesh)
    repl = replicated(mesh)

    def to_global(x, sh):
        arr = np.asarray(x)
        return jax.make_array_from_callback(arr.shape, sh,
                                            lambda idx: arr[idx])

    sh = jax.tree.map(lambda _: repl, ts)
    sh = sh.replace(env_state=jax.tree.map(lambda _: batch_sh, ts.env_state))
    ts = jax.tree.map(to_global, ts, sh)

    step = jax.jit(train_step, in_shardings=(sh,), out_shardings=(sh, repl))
    ts2, metrics = step(ts)
    jax.block_until_ready(metrics)
    assert len(ts2.env_state.obs.sharding.device_set) == nproc * LOCAL_DEVICES
    print(f"proc={pid} reward_mean={float(metrics['reward_mean']):.6f}",
          flush=True)


if __name__ == "__main__":
    main()
