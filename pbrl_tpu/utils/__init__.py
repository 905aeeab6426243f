"""Utilities: profiling scopes, numerical guards, config IO."""

from pbrl_tpu.utils.profiling import profile_scope, trace_annotation, profile_to  # noqa: F401
from pbrl_tpu.utils.guards import (  # noqa: F401
    assert_finite,
    check_finite_tree,
    nan_debug_enabled,
)
from pbrl_tpu.utils.configio import config_to_dict, dict_to_config, load_json_config, save_json_config  # noqa: F401
