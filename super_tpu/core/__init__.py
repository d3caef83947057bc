from super_tpu.core.state import (  # noqa: F401
    GraphState,
    SurfelState,
    TrackState,
    TrackerState,
    FrameData,
)
