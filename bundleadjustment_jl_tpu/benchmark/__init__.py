"""Benchmark & evaluation layer (the reference's L6: `src/benchmark.jl`,
`src/benchmark_diffprec.jl`, `src/diffprecsions.jl`)."""

from bundleadjustment_jl_tpu.benchmark.runner import (  # noqa: F401
    run_campaign, markdown_table, latex_table, save_stats,
    performance_profile)
from bundleadjustment_jl_tpu.benchmark.problems import (  # noqa: F401
    BAL_SIZES, synthetic_suite)
from bundleadjustment_jl_tpu.benchmark.precision import (  # noqa: F401
    precision_cascade)
