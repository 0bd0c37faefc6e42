"""Pallas TPU kernel for the BAL linearization chain in k-minor layout.

The XLA/scan formulation of the chunked linearization
(`ops/normal.py:_assemble_kminor`, scan over `ops/jacobian.rj_raw`) was
measured at **1.8 GB/s effective** — 184 ms of a 237 ms assembly at
Dubrovnik-356 scale (logs/asm_profile_r2g.log) — because every
intermediate of the chain is an (m, 2, 9)/(m, 3)-shaped array whose tiny
minor dims tile-pad on TPU, and the scan serializes ~21 dispatches.

This kernel computes the whole closed-form chain (Rodrigues rotation +
its r-derivative, perspective divide, radial distortion — the same math
as `ops/jacobian.rj_gathered`, itself the TPU heir of
`/root/reference/src/JacobianByHand.jl:27-101`) **scalarized per lane**:
every per-observation quantity is a (1, C) lane vector, the 3-vector /
3x3-matrix structure is unrolled in Python, and the only memory traffic
is one (16, C) input block and two (32, C) output blocks per grid step —
no tile-padded intermediates, no scan.

Input (``pack_operands``): one (16, n_pad) f32 array, rows

    0-8    camera params  c[cam_idx]  (lane-gathered k-minor)
    9-11   point coords   X[pnt_idx]
    12-13  observed pixel pt2d
    14     weight w  (0 on padding rows -> all outputs exactly 0)
    15     zero

Outputs:

    JR_t (32, n_pad): rows 0-17 Jc (row 9 i + a), 18-23 Jp (18 + 3 i + b),
        24-25 weighted residual, 26-31 zero — the layout
        `ops/pallas_schur.py`'s reduce kernels stream (`_JC0/_JP0/_R0`).
    W_t  (32, n_pad): rows 0-26 ``W = Jc' Jp`` (row 3 a + b) — the Schur
        off-diagonal blocks, folded here so `w_from_jr` never re-reads JR.

The per-lane math is ~300 VPU flops; at (1, C) shapes only 1/8 of the
sublanes are live, which still lands within ~2x of the streaming bound —
the 26x win comes from deleting the padded intermediates, not from
perfect VPU packing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# Same theta->0 guard as ops/jacobian.py / models/camera.py.
_SMALL_THETA_SQ = 1e-24

# Lanes per grid step. Bigger blocks amortize per-step overhead; the
# whole working set at 1024 is (16+2*32)*1024*4 = 320 KB of VMEM.
BLOCK_COLS = 1024


def _cross(a, b):
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


def project_chain(r, t, k1, k2, f, X, obs, w):
    """Forward-only projection residual on (1, C) lane vectors — the
    same math as :func:`linearize_chain` without the Jacobian stages
    (serves the fused trial-objective kernel).  Returns ``res`` (2-list
    of weighted residual rows; zeroed at z == 0 and w == 0)."""
    th2 = r[0] * r[0] + r[1] * r[1] + r[2] * r[2]
    safe = th2 > _SMALL_THETA_SQ
    th = jnp.sqrt(jnp.where(safe, th2, 1.0))
    inv_th = 1.0 / th
    k = [r[0] * inv_th, r[1] * inv_th, r[2] * inv_th]
    c = jnp.cos(th)
    s = jnp.sin(th)
    one_c = 1.0 - c
    kxX = _cross(k, X)
    kdX = k[0] * X[0] + k[1] * X[1] + k[2] * X[2]
    RX_big = [c * X[a] + s * kxX[a] + one_c * kdX * k[a] for a in range(3)]
    rxX = _cross(r, X)
    rxrxX = _cross(r, rxX)
    RX_small = [X[a] + rxX[a] + 0.5 * rxrxX[a] for a in range(3)]
    RX = [jnp.where(safe, RX_big[a], RX_small[a]) for a in range(3)]
    p1 = [RX[a] + t[a] for a in range(3)]
    z = p1[2]
    z_ok = z != 0.0
    inv_z = 1.0 / jnp.where(z_ok, z, 1.0)
    p2 = [-p1[0] * inv_z, -p1[1] * inv_z]
    n2 = p2[0] * p2[0] + p2[1] * p2[1]
    frho = f * (1.0 + k1 * n2 + k2 * n2 * n2)
    valid = jnp.where(z_ok, w, jnp.zeros_like(w))
    return [(frho * p2[i] - obs[i]) * valid for i in range(2)]


def linearize_chain(r, t, k1, k2, f, X, obs, w):
    """The full analytic linearization chain on (1, C) lane vectors.

    Inputs: camera params ``r`` (Rodrigues 3-list), ``t`` (translation
    3-list), ``k1/k2/f``, point ``X`` (3-list), observed pixel ``obs``
    (2-list), weight ``w``.  Returns ``(Jc, Jp, res)``: Jc 18 rows
    (9 i + a), Jp as ``Jp[i][b]`` nested lists, res 2 rows — all
    weighted, zeroed at z == 0 and on padding rows (w = 0).  Shared by
    the standalone linearize kernel and the fused assembly kernel
    (`ops/pallas_assemble.py`)."""

    one = jnp.ones_like(w)
    eye = lambda a, b: one if a == b else jnp.zeros_like(w)  # noqa: E731

    # --- Stage 1: RX = R(r) X + derivative D = d(RX)/dr ------------------
    th2 = r[0] * r[0] + r[1] * r[1] + r[2] * r[2]
    safe = th2 > _SMALL_THETA_SQ
    th = jnp.sqrt(jnp.where(safe, th2, 1.0))
    inv_th = 1.0 / th
    k = [r[0] * inv_th, r[1] * inv_th, r[2] * inv_th]
    c = jnp.cos(th)
    s = jnp.sin(th)
    one_c = 1.0 - c

    kxX = _cross(k, X)
    kdX = k[0] * X[0] + k[1] * X[1] + k[2] * X[2]

    # hat(v)[a][b] entries as a Python table of closures.
    def hat(v, a, b):
        tbl = {(0, 1): -v[2], (0, 2): v[1], (1, 0): v[2],
               (1, 2): -v[0], (2, 0): -v[1], (2, 1): v[0]}
        return tbl.get((a, b), jnp.zeros_like(v[0]))

    # Large-angle branch (Rodrigues).
    # R[a][b] = c I + s hat(k) + (1-c) k k'
    R_big = [[c * eye(a, b) + s * hat(k, a, b) + one_c * k[a] * k[b]
              for b in range(3)] for a in range(3)]
    RX_big = [c * X[a] + s * kxX[a] + one_c * kdX * k[a] for a in range(3)]
    # D[a][b] = -s X_a k_b + c kxX_a k_b - s/th (hat(X)_ab + kxX_a k_b)
    #           + s kdX k_a k_b + (1-c)/th (k_a X_b + kdX (I_ab - 2 k_a k_b))
    # (algebraic simplification of ops/jacobian._rotation_and_dr's
    #  einsum form: hat(X) P = (hat(X) + kxX k')/th,
    #  (k X' + kdX I) P = (k X' + kdX (I - 2 k k'))/th).
    D_big = [[(-s * X[a] * k[b] + c * kxX[a] * k[b]
               - s * inv_th * (hat(X, a, b) + kxX[a] * k[b])
               + s * kdX * k[a] * k[b]
               + one_c * inv_th * (k[a] * X[b]
                                   + kdX * (eye(a, b) - 2.0 * k[a] * k[b])))
              for b in range(3)] for a in range(3)]

    # theta ~ 0 branch: 2nd-order Taylor (AD-safe at exactly 0).
    rxX = _cross(r, X)
    rxrxX = _cross(r, rxX)
    RX_small = [X[a] + rxX[a] + 0.5 * rxrxX[a] for a in range(3)]
    # R_small = I + hat(r) + 0.5 (r r' - th2 I)
    R_small = [[eye(a, b) + hat(r, a, b) + 0.5 * (r[a] * r[b]
                                                  - th2 * eye(a, b))
                for b in range(3)] for a in range(3)]
    rdX = r[0] * X[0] + r[1] * X[1] + r[2] * X[2]
    # D_small = -hat(X) - 0.5 (hat(rxX) + X r' - (r.X) I)
    D_small = [[(-hat(X, a, b) - 0.5 * (hat(rxX, a, b) + X[a] * r[b]
                                        - rdX * eye(a, b)))
                for b in range(3)] for a in range(3)]

    RX = [jnp.where(safe, RX_big[a], RX_small[a]) for a in range(3)]
    R = [[jnp.where(safe, R_big[a][b], R_small[a][b]) for b in range(3)]
         for a in range(3)]
    D = [[jnp.where(safe, D_big[a][b], D_small[a][b]) for b in range(3)]
         for a in range(3)]

    # --- Stage 2: perspective divide p2 = -p1[:2]/z -----------------------
    p1 = [RX[a] + t[a] for a in range(3)]
    z = p1[2]
    z_ok = z != 0.0
    inv_z = 1.0 / jnp.where(z_ok, z, 1.0)
    p2 = [-p1[0] * inv_z, -p1[1] * inv_z]

    # --- Stage 3: radial distortion + focal -------------------------------
    n2 = p2[0] * p2[0] + p2[1] * p2[1]
    rho = 1.0 + k1 * n2 + k2 * n2 * n2
    frho = f * rho
    proj = [frho * p2[0], frho * p2[1]]
    g = 2.0 * k1 + 4.0 * k2 * n2
    B = [[f * (rho + g * p2[0] * p2[0]), f * g * p2[0] * p2[1]],
         [f * g * p2[0] * p2[1], f * (rho + g * p2[1] * p2[1])]]
    fn2 = f * n2
    J_dist = [[fn2 * p2[i], fn2 * n2 * p2[i], rho * p2[i]]
              for i in range(2)]

    # BA = B @ A with A = dp2/dp1 = [[-1/z, 0, p1x/z^2], [0, -1/z, p1y/z^2]]
    inv_z2 = inv_z * inv_z
    BA = [[-B[i][0] * inv_z, -B[i][1] * inv_z,
           (B[i][0] * p1[0] + B[i][1] * p1[1]) * inv_z2]
          for i in range(2)]

    valid = jnp.where(z_ok, w, jnp.zeros_like(w))
    Jp = [[(BA[i][0] * R[0][b] + BA[i][1] * R[1][b]
            + BA[i][2] * R[2][b]) * valid
           for b in range(3)] for i in range(2)]
    Jr = [[(BA[i][0] * D[0][b] + BA[i][1] * D[1][b]
            + BA[i][2] * D[2][b]) * valid
           for b in range(3)] for i in range(2)]
    res = [(proj[i] - obs[i]) * valid for i in range(2)]

    Jc = []
    for i in range(2):     # Jc rows 9 i + a: [Jr | BA (=d/dt) | J_dist]
        Jc += [Jr[i][b] for b in range(3)]
        Jc += [BA[i][b] * valid for b in range(3)]
        Jc += [J_dist[i][b] * valid for b in range(3)]
    return Jc, Jp, res


def _linearize_kernel(x_ref, jr_ref, w_ref):
    """One (16, C) block -> JR (32, C), W (32, C). All (1, C) lane math."""
    x = x_ref[:].astype(jnp.float32)

    def row(i):
        return x[i:i + 1, :]

    Jc, Jp, res = linearize_chain(
        [row(0), row(1), row(2)], [row(3), row(4), row(5)],
        row(6), row(7), row(8), [row(9), row(10), row(11)],
        [row(12), row(13)], row(14))

    zero = jnp.zeros_like(res[0])
    jr_rows = list(Jc)     # 18 rows, row 9 i + a
    for i in range(2):     # Jp rows 18 + 3 i + b
        jr_rows += [Jp[i][b] for b in range(3)]
    jr_rows += res         # rows 24-25
    jr_rows += [zero] * 6
    jr_ref[:] = jnp.concatenate(jr_rows, axis=0).astype(jr_ref.dtype)

    # W = Jc' Jp per observation: row 3 a + b = sum_i Jc[9i+a] Jp[3i+b].
    w_rows = []
    for a in range(9):
        for b in range(3):
            w_rows.append(Jc[a] * Jp[0][b] + Jc[9 + a] * Jp[1][b])
    w_rows += [zero] * 5
    w_ref[:] = jnp.concatenate(w_rows, axis=0).astype(w_ref.dtype)


def _linearize_w_only_kernel(x_ref, w_ref):
    """One (16, C) block -> W (32, C) only: the per-accept camera-sorted
    W rebuild (`linearize_w_only`) discards JR, so the (32, n) f32 JR
    buffer (4.0 GB at Final-13682) never exists on that pass."""
    x = x_ref[:].astype(jnp.float32)

    def row(i):
        return x[i:i + 1, :]

    Jc, Jp, res = linearize_chain(
        [row(0), row(1), row(2)], [row(3), row(4), row(5)],
        row(6), row(7), row(8), [row(9), row(10), row(11)],
        [row(12), row(13)], row(14))

    zero = jnp.zeros_like(res[0])
    w_rows = []
    for a in range(9):
        for b in range(3):
            w_rows.append(Jc[a] * Jp[0][b] + Jc[9 + a] * Jp[1][b])
    w_rows += [zero] * 5
    w_ref[:] = jnp.concatenate(w_rows, axis=0).astype(w_ref.dtype)


def linearize_w_only(cxw_t: jnp.ndarray, *, w_dtype=None, interpret=None):
    """(16, n_pad) packed operands -> W_t (32, n_pad) ONLY.

    Round-4 Final-13682 profile: building the carried camera-sorted W by
    permuting the point-sorted W_t costs 9.6 s per accepted step (32 flat
    row gathers at ~0.8 GB/s — random 2-byte loads are latency-bound,
    logs/r4/final_profile_r4c.log op fusion.817). Re-running the
    linearization chain on camera-sorted operands streams at the
    bandwidth-saturated kernel rate instead and produces byte-identical
    W values (same per-lane f32 chain, order-independent)."""
    if interpret is None:
        from bundleadjustment_jl_tpu.ops.pallas_schur import INTERPRET
        interpret = INTERPRET
    n = cxw_t.shape[1]
    C = _block_cols(n)
    out_w = jax.ShapeDtypeStruct((32, n), jnp.dtype(w_dtype)
                                 if w_dtype else jnp.float32)
    return pl.pallas_call(
        _linearize_w_only_kernel,
        grid=(n // C,),
        in_specs=[pl.BlockSpec((16, C), lambda i: (0, i))],
        out_specs=[pl.BlockSpec((32, C), lambda i: (0, i))],
        out_shape=[out_w],
        interpret=interpret,
    )(cxw_t)[0]


def _block_cols(n_pad: int) -> int:
    C = min(BLOCK_COLS, n_pad)
    while C > 128 and n_pad % C:
        C //= 2
    if n_pad % C:
        raise ValueError(f"n_pad={n_pad} not a multiple of 128")
    return C


def pack_operands(cams, points, cam_idx, pnt_idx, pt2d, w) -> jnp.ndarray:
    """Build the (16, n_pad) packed operand array (all lane gathers —
    measured ~free on this backend, unlike sublane-dim transposes).

    The gathers route through :func:`pallas_schur.gather_k_minor`: at
    small n it is exactly ``t[:, idx]`` (unchanged Venice/Dubrovnik
    programs), at Final-13682 the direct form's row-major relayout
    tile-pads 9 -> 128 lanes (f32[31.2M, 9] = 14.87 GB, the measured
    _lm_run HBM OOM when the k-minor assembly is enabled at Final,
    /tmp/probe_kminor round 4) while the chunked form bounds the temp."""
    from bundleadjustment_jl_tpu.ops.pallas_schur import gather_k_minor
    c_t = gather_k_minor(cams.T, cam_idx)        # (9, n)
    x_t = gather_k_minor(points.T, pnt_idx)      # (3, n)
    xy_t = pt2d.T                                # (2, n)
    w_t = w.reshape(1, -1)
    z = jnp.zeros_like(w_t)
    return jnp.concatenate(
        [c_t, x_t, xy_t, w_t, z], axis=0).astype(jnp.float32)


def linearize_w_kminor(cxw_t: jnp.ndarray, *, w_dtype=None,
                       interpret=None):
    """(16, n_pad) packed operands -> (JR_t (32, n_pad), W_t (32, n_pad)).

    One streaming pass; Mosaic's grid pipeline double-buffers the block
    DMAs automatically.  ``w_dtype``: storage dtype for the W output —
    the kernel casts on write, so at bf16 facto the full-width f32 W_t
    (4.0 GB at Final-13682) never exists in HBM.
    """
    if interpret is None:
        from bundleadjustment_jl_tpu.ops.pallas_schur import INTERPRET
        interpret = INTERPRET
    n = cxw_t.shape[1]
    C = _block_cols(n)
    grid = (n // C,)
    out = jax.ShapeDtypeStruct((32, n), jnp.float32)
    out_w = jax.ShapeDtypeStruct((32, n), jnp.dtype(w_dtype)
                                 if w_dtype else jnp.float32)
    return pl.pallas_call(
        _linearize_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((16, C), lambda i: (0, i))],
        out_specs=[pl.BlockSpec((32, C), lambda i: (0, i))] * 2,
        out_shape=[out, out_w],
        interpret=interpret,
    )(cxw_t)
