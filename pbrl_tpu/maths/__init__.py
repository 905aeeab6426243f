"""Math foundation: batched quaternion + 6D spatial algebra (pure jnp)."""

from pbrl_tpu.maths import numeric, quaternion, spatial  # noqa: F401
from pbrl_tpu.maths.numeric import safe_norm  # noqa: F401
