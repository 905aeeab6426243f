"""Controllers: standard / inverse-dynamics / Stable PD, cubic trajectories."""

from pbrl_tpu.control.pd import (  # noqa: F401
    Gains,
    clamp_torque,
    implicit_pd,
    inverse_dynamics_pd,
    masked_torque,
    stable_pd,
    standard_pd,
    torque_to_qfrc,
)
from pbrl_tpu.control.trajectory import (  # noqa: F401
    constant_trajectories,
    cubic_coefficients,
    evaluate,
    evaluate_velocity,
    set_trajectories,
)
from pbrl_tpu.mocap.skeleton import generate_kp_kd_gains  # noqa: F401


def default_gains(dtype=None):
    """Reference humanoid PD gains as a :class:`Gains` pair."""
    import jax.numpy as jnp

    kp, kd = generate_kp_kd_gains()
    dtype = dtype or jnp.float32
    return Gains(kp=jnp.asarray(kp, dtype), kd=jnp.asarray(kd, dtype))
