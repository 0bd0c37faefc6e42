"""Levenberg-Marquardt solver layer (the reference's L4, `src/lm.jl`)."""

from bundleadjustment_jl_tpu.solver.lm import (  # noqa: F401
    LMOptions, LMResult, levenberg_marquardt)
