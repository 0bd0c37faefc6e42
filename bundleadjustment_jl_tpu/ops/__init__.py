from bundleadjustment_jl_tpu.ops.residuals import residuals, objective  # noqa: F401
