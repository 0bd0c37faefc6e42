from bundleadjustment_jl_tpu.io.bal import read_bal, write_bal, load_fixture  # noqa: F401
from bundleadjustment_jl_tpu.io.synthetic import synthetic_bal  # noqa: F401
