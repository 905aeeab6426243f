"""Math foundation: batched quaternion + 6D spatial algebra (pure jnp)."""

from pbrl_tpu.maths import quaternion, spatial  # noqa: F401
