"""Mocap ingestion: DeepMimic clip parsing, frame conversion, device lookup."""

from pbrl_tpu.mocap.convert import (  # noqa: F401
    ParsedClip,
    align_position,
    align_rotation,
    parse_deepmimic,
)
from pbrl_tpu.mocap.clip import (  # noqa: F401
    MotionClip,
    bundled_clip_names,
    from_parsed,
    load_clip,
    phase,
    reference_frame_index,
    reference_state,
)
from pbrl_tpu.mocap import skeleton  # noqa: F401
