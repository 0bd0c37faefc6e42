"""AOT-compile the spmd LM program for a MULTI-CHIP TPU topology.

No multi-chip hardware exists in this environment (one v5e chip over a
tunnel), so this probe uses JAX's AOT topology API to compile
`solver/lm_spmd`'s per-device program for a v5e 2x4 slice at
Final-13682 shapes and dumps the compiler's memory analysis — proving
the sharded program COMPILES and its per-device HBM fits, without
executing (VERDICT round 4 directive #8; SURVEY.md §2.3
distributed-backend row).

Usage: python scripts/probe_spmd_topology.py [ncams npnts obs_per_pnt]
       (defaults to Final-13682 from the synth cache header shapes)
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def get_topology(names=("v5e:2x4", "v5litepod-8", "v5e-8")):
    from jax.experimental import topologies
    last = None
    for name in names:
        try:
            topo = topologies.get_topology_desc(
                platform="tpu", topology_name=name)
            print(f"[topo] resolved '{name}': "
                  f"{len(topo.devices)} devices", flush=True)
            return topo
        except Exception as e:  # try the next naming scheme
            last = e
            print(f"[topo] '{name}' failed: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
    raise SystemExit(f"no topology name resolved: {last!r}")


def main(ncams=13682, npnts=4456117, opp=7):
    from jax.sharding import Mesh

    from bundleadjustment_jl_tpu.ops import pallas_schur
    from bundleadjustment_jl_tpu.parallel.spmd import shard_problem_kminor
    from bundleadjustment_jl_tpu.models.problem import BAProblem

    pallas_schur.set_mode(True)
    pallas_schur.CAM_SCATTER = True     # the production Final config
    topo = get_topology()
    ndev = len(topo.devices)
    mesh = Mesh(np.asarray(topo.devices), ("obs",))

    # Abstract problem at the target shapes: build a TINY host problem
    # for the sharder's metadata path, then swap in Final-shaped avals.
    z = np.load(f"Data/synth_cache/Final-{ncams}-{npnts}-{opp}.npz")
    problem = BAProblem.from_arrays(
        z["cams"], z["points"], z["cam_idx"], z["pnt_idx"], z["pt2d"],
        dtype=jnp.float32, pad_obs_to=512, name=f"Final-{ncams}")
    t0 = time.perf_counter()
    sp = shard_problem_kminor(problem, ndev)
    print(f"[topo] sharded {problem.name} over {ndev} devices "
          f"({time.perf_counter() - t0:.0f} s host prep)", flush=True)

    from bundleadjustment_jl_tpu.solver import lm_spmd
    from bundleadjustment_jl_tpu.solver.lm_jit import _resolve_hp

    statics = dict(max_iters=10, pcg_max_iters=100, use_dense=False,
                   use_cgls=False, use_power=False, linesearch=False,
                   ls_max=4, lam0_mode="diag", use_forcing=True,
                   facto_dtype="bfloat16", pcg_warm=False,
                   gather_mode=__import__(
                       "bundleadjustment_jl_tpu.ops.gatherfree",
                       fromlist=["MODE"]).MODE,
                   sorted_mode=True,
                   pallas_mode=pallas_schur.PALLAS_MODE,
                   cam_scatter=(pallas_schur.CAM_SCATTER
                                and ncams
                                <= pallas_schur.CAM_SCATTER_MAX_CAMS),
                   fac=(pallas_schur.FACTOR, pallas_schur.FAC_CAM_L,
                        pallas_schur.FAC_PNT_L))
    hp = _resolve_hp(jnp.float32, None, 1e-5, 0.0, 0.0, 0.0, 0.0, 1e-4,
                     3.0, 3.0, 1e-4, 0.9, 1e-8, None, "ref")

    # The production Final-scale driver: the chunked spmd programs
    # (init + K-iteration segment), exactly what a real multi-chip run
    # dispatches.  XLA enforces the per-device HBM budget (~15.75 GB on
    # v5e) at compile time — a successful compile IS the fit proof (the
    # round-4 single-chip OOMs all surfaced as compile failures).
    init_fn, seg_fn = lm_spmd._get_chunked_fns(mesh, statics, False)
    avals_a = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), sp.arrays)
    hp_a = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype),
        hp)
    lam_a = jax.ShapeDtypeStruct((), jnp.float32)

    def report(name, compiled, dt):
        m = compiled.memory_analysis()
        tot = (m.argument_size_in_bytes + m.output_size_in_bytes
               + m.temp_size_in_bytes) / 1e9
        print(f"[topo] {name}: compiled in {dt:.0f} s — "
              f"code {m.generated_code_size_in_bytes / 1e6:.1f} MB, "
              f"per-device args {m.argument_size_in_bytes / 1e9:.2f} + "
              f"out {m.output_size_in_bytes / 1e9:.2f} + "
              f"temps {m.temp_size_in_bytes / 1e9:.2f} "
              f"= {tot:.2f} GB (v5e budget 15.75 GB/device)", flush=True)

    t0 = time.perf_counter()
    c1 = init_fn.lower(avals_a, hp_a, lam_a).compile()
    report("init segment", c1, time.perf_counter() - t0)
    st_aval = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
        jax.eval_shape(lambda a, h, l: init_fn(a, h, l),
                       avals_a, hp_a, lam_a))
    t0 = time.perf_counter()
    c2 = seg_fn.lower(avals_a, st_aval, hp_a).compile()
    report("LM segment  ", c2, time.perf_counter() - t0)
    print(f"[topo] PASS: both chunked spmd programs compile for the "
          f"{ndev}-device v5e 2x4 slice at {problem.name} shapes "
          f"within the per-device HBM budget.", flush=True)


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
