"""Block assembly of the damped Gauss-Newton (normal-equation) system.

The reference factors the sparse augmented system
``K = [[I J];[J' -lambda I]]`` with a custom LDL^T
(`/root/reference/src/ldl_aux.jl`) or SPQR (`src/qr_aux.jl`), relying on
AMD/METIS orderings to contain fill. The TPU-native formulation exploits the
*block* structure of bundle adjustment instead (SURVEY.md §2.2): the
Gauss-Newton matrix of ``J = [Jc | Jp]`` is

    H = [[Hcc, Hcp], [Hcp', Hpp]]

where ``Hcc`` is block-diagonal with 9x9 camera blocks, ``Hpp`` is
block-diagonal with 3x3 point blocks, and ``Hcp`` has one 9x3 block ``W_k``
per observation (each (cam, pnt) pair appears in at most one observation in
BAL data). All blocks are assembled as batched einsums + `segment_sum` —
dense, static-shaped, mesh-shardable along the observation axis.

Damping is the reference's Levenberg ``lambda * I`` (the LDL system
``[[I J];[J' -lambda I]]`` is the augmented form of
``(J'J + lambda I) delta = -J'r``, `src/lm.jl:68-81`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from bundleadjustment_jl_tpu.models.problem import BAProblem
from bundleadjustment_jl_tpu.ops.jacobian import residuals_and_jacobian
from bundleadjustment_jl_tpu.ops.segsum import (
    segment_sum_scatter, sorted_segment_sum)


def seg_by_pnt(problem: BAProblem, values: jnp.ndarray) -> jnp.ndarray:
    """Per-observation values -> per-point sums (scatter-free when the
    problem carries the sorted layout)."""
    if problem.pnt_starts is not None:
        return sorted_segment_sum(values, problem.pnt_starts)
    return segment_sum_scatter(values, problem.pnt_idx, problem.npnts)


def seg_by_cam(problem: BAProblem, values: jnp.ndarray) -> jnp.ndarray:
    """Per-observation values -> per-camera sums (gather through cam_perm
    then a sorted reduction when the layout allows)."""
    if problem.cam_perm is not None:
        return sorted_segment_sum(values[problem.cam_perm],
                                  problem.cam_starts)
    return segment_sum_scatter(values, problem.cam_idx, problem.ncams)


class GNBlocks(NamedTuple):
    """Damped Gauss-Newton system in block form (all batched-dense)."""
    g_c: jnp.ndarray    # (ncams, 9)   J_c' r
    g_p: jnp.ndarray    # (npnts, 3)   J_p' r
    Hcc: jnp.ndarray    # (ncams, 9, 9) camera diagonal blocks (undamped)
    Hpp: jnp.ndarray    # (npnts, 3, 3) point diagonal blocks (undamped)
    W: jnp.ndarray      # (nobs_pad, 9, 3) per-observation Hcp blocks
    r: jnp.ndarray      # (nobs_pad, 2) weighted residuals
    Jc: jnp.ndarray     # (nobs_pad, 2, 9)
    Jp: jnp.ndarray     # (nobs_pad, 2, 3)


def assemble_blocks(problem: BAProblem, cams=None, points=None) -> GNBlocks:
    """Linearize at (cams, points) and assemble all Gauss-Newton blocks.

    One fused pass: residuals, Jacobian blocks, gradients and Hessian blocks.
    Padded observations carry zero Jacobians/residuals so every segment_sum
    is exact. This replaces the reference's sparse-matrix assembly
    (`src/lm.jl:61-81`) and its COO SpMV ``J'r`` (`src/lma_aux.jl:191-212`).
    """
    r, Jc, Jp = residuals_and_jacobian(problem, cams, points)

    g_c = seg_by_cam(problem, jnp.einsum("kia,ki->ka", Jc, r))
    g_p = seg_by_pnt(problem, jnp.einsum("kia,ki->ka", Jp, r))
    Hcc = seg_by_cam(problem, jnp.einsum("kia,kib->kab", Jc, Jc))
    Hpp = seg_by_pnt(problem, jnp.einsum("kia,kib->kab", Jp, Jp))
    W = jnp.einsum("kia,kib->kab", Jc, Jp)
    return GNBlocks(g_c=g_c, g_p=g_p, Hcc=Hcc, Hpp=Hpp, W=W, r=r, Jc=Jc, Jp=Jp)


def gradient_norm(blocks: GNBlocks) -> jnp.ndarray:
    """||J'r|| over the full variable vector (`src/lm.jl:57`, dual_feas)."""
    return jnp.sqrt(jnp.sum(blocks.g_c ** 2) + jnp.sum(blocks.g_p ** 2))


def inv3x3(M: jnp.ndarray) -> jnp.ndarray:
    """Batched closed-form (adjugate) inverse of 3x3 SPD blocks.

    Faster than a general LU on TPU and stable for the damped point blocks
    ``Hpp + lambda I`` (lambda >= 1e-8, `src/lm.jl:337`). Half precisions
    compute in f32 and cast back (determinant products underflow in bf16).
    """
    dt = M.dtype
    if dt in (jnp.bfloat16, jnp.float16):
        return inv3x3(M.astype(jnp.float32)).astype(dt)
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = c * h - b * i
    C = b * f - c * e
    D = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    H = b * g - a * h
    I = a * e - b * d
    det = a * A + b * D + c * G
    inv_det = 1.0 / det
    adj = jnp.stack([
        jnp.stack([A, B, C], axis=-1),
        jnp.stack([D, E, F], axis=-1),
        jnp.stack([G, H, I], axis=-1),
    ], axis=-2)
    return adj * inv_det[..., None, None]


def damp(H: jnp.ndarray, lam) -> jnp.ndarray:
    """Add ``lambda I`` to a batch of square blocks (Levenberg damping)."""
    n = H.shape[-1]
    return H + lam * jnp.eye(n, dtype=H.dtype)
