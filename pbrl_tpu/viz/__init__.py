"""Visualization: trajectory export + host-side rendering (never on TPU)."""

from pbrl_tpu.viz.render import (  # noqa: F401
    dump_trajectory,
    load_trajectory,
    render_video,
    save_video,
)
