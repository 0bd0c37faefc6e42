"""Auxiliary subsystems: checkpointing, profiling, logging helpers.

The reference has none of these beyond ad-hoc timers and warm-start kwargs
(SURVEY.md §6); they are required here for Venice/Final-scale runs.
"""

from bundleadjustment_jl_tpu.utils.checkpoint import (  # noqa: F401
    save_checkpoint, load_checkpoint, latest_checkpoint, CheckpointManager)
from bundleadjustment_jl_tpu.utils.profiling import (  # noqa: F401
    PhaseTimers, trace)
