from bundleadjustment_jl_tpu.models.camera import (  # noqa: F401
    rodrigues_rotate,
    project,
    project_p1,
    distortion_factor,
)
from bundleadjustment_jl_tpu.models.problem import BAProblem  # noqa: F401
