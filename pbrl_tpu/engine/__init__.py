"""TPU-native rigid-body engine: FK, CRBA, RNEA, contacts, solve, integrate."""

from pbrl_tpu.engine.data import Contact, Data, make_data  # noqa: F401
from pbrl_tpu.engine.forward import forward, integrate, step, step_n  # noqa: F401
from pbrl_tpu.engine import collision, dynamics, kinematics, solver  # noqa: F401
