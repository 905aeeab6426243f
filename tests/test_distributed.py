"""Multi-host entry point (parallel/distributed.py).

Real DCN scaling needs 2+ hosts; here the single-process bring-up path is
covered: explicit initialise, idempotent re-entry, primary-host guards, and
the CLI flag wiring. (SURVEY.md §5 "distributed communication backend".)
"""

import os
import subprocess
import sys
import textwrap

import pytest

from pbrl_tpu.parallel import is_primary_host


def test_single_process_initialize_and_guards():
    # Runs in a subprocess: jax.distributed.initialize reconfigures the
    # process-wide runtime (CPU collectives switch to Gloo-over-coordinator),
    # which would poison every later test sharing this interpreter.
    code = textwrap.dedent("""
        import jax
        jax.config.update("jax_platforms", "cpu")
        from pbrl_tpu.parallel import DistributedConfig, initialize_distributed
        from pbrl_tpu.parallel.distributed import (
            is_initialized, process_count, shutdown)
        from pbrl_tpu.parallel import is_primary_host

        cfg = DistributedConfig(coordinator_address="localhost:23459",
                                num_processes=1, process_id=0)
        assert initialize_distributed(cfg) is True
        assert is_initialized()
        assert process_count() == 1
        assert is_primary_host()
        # Idempotent: a second call is a no-op, not an error.
        assert initialize_distributed(cfg) is False
        shutdown()
        assert not is_initialized()
        print("DIST_OK")
    """)
    proc = subprocess.run([sys.executable, "-c", code], capture_output=True,
                          text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "DIST_OK" in proc.stdout


def test_primary_host_without_initialization():
    # Library code calls is_primary_host unconditionally; single-controller
    # (uninitialised) processes are always primary.
    assert is_primary_host()


def test_cli_exposes_distributed_flags():
    from pbrl_tpu.cli import build_parser

    args = build_parser().parse_args([
        "train", "--distributed", "--coordinator", "localhost:1234",
        "--num-processes", "2", "--process-id", "1",
    ])
    assert args.distributed and args.coordinator == "localhost:1234"
    assert args.num_processes == 2 and args.process_id == 1
    # Default: not distributed.
    args = build_parser().parse_args(["train"])
    assert not args.distributed


@pytest.mark.slow
def test_two_process_ppo_step_over_gloo():
    """REAL multi-process SPMD (the DCN-equivalent path, run for real).

    Two OS processes, each contributing 2 virtual CPU devices, join one
    global mesh via ``jax.distributed.initialize`` + Gloo cross-process
    collectives and jit ONE full PPO training step with the env batch
    sharded over all 4 global devices and parameters replicated. The
    gradient all-reduce crosses the process boundary — CPU+Gloo standing in
    for TPU+DCN, same program, same API. Both processes must succeed and
    report bit-identical reward_mean (SPMD determinism across hosts).
    """
    import re
    import socket

    with socket.socket() as s:  # free port for the Gloo coordinator
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    worker = os.path.join(os.path.dirname(__file__), os.pardir, "scripts",
                          "multihost_worker.py")
    procs = [subprocess.Popen([sys.executable, worker, str(i), "2", str(port)],
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                              text=True)
             for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
    rewards = [re.search(r"reward_mean=([-\d.]+)", o).group(1) for o in outs]
    assert rewards[0] == rewards[1], rewards
