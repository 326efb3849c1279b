"""Sparse bundle-adjustment: Gauss-Newton with a matrix-free PCG inner loop.

Re-design of the reference GPU solver (``Solver/SolverBundling.cu``,
``CUDASolverBundling.{h,cpp}``, energy in ``SolverBundlingEquationsLie.h``):

- variables: per-frame poses as 6-vectors [omega, t] in Lie space
  (``USE_LIE_SPACE``), first pose fixed (x == 0 skipped everywhere,
  ``SolverBundling.cu:762``).
- sparse energy: r_c = T_i p_i - T_j p_j over the EntryJ correspondence
  store (``evalFDevice``, SolverBundlingEquationsLie.h:42-57).
- GN outer loop x PCG inner loop with Jacobi preconditioning, PCG early-out
  |alpha_num| < 5e-7 (``SolverBundling.cu:1088-1093``) and GN early-out
  max|delta| < 0.005 (``EvalGNConvergence:694-749``).

TPU design: instead of the reference's hand-written J/J^T kernels over a
variables->correspondences table, per-corr 3x12 Jacobian blocks come from
``jax.jacfwd`` of the tiny residual function (exact derivatives), J p is an
einsum over corr blocks, and J^T y is two segment-sum scatters (per-corr ->
per-variable). The Jacobi preconditioner is block-diagonal 6x6 (a strict
upgrade over the reference's diagonal), inverted with a batched solve.
Everything is fixed-shape; invalid corrs/poses carry zero weight.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from bundlefusion_tpu.geometry.lie import so3_exp
from bundlefusion_tpu.solver.residuals import CorrStore


@dataclass(frozen=True)
class SolverParams:
    num_gn: int = 3                  # nonlinear iterations
    num_pcg: int = 150               # linear iterations
    pcg_early_out: float = 5e-7
    gn_early_out_delta: float = 0.005
    sparse_weight: float = 1.0


class SolveStats(NamedTuple):
    initial_cost: jax.Array
    final_cost: jax.Array
    num_gn_done: jax.Array
    max_residual: jax.Array        # max per-axis component (SBA.cpp semantics)
    max_residual_corr: jax.Array   # corr index of the max residual


def _residual_one(pose_i, pose_j, p_i, p_j):
    """r = T_i p_i - T_j p_j for one correspondence (3-vector)."""
    Ri = so3_exp(pose_i[:3])
    Rj = so3_exp(pose_j[:3])
    return (Ri @ p_i + pose_i[3:]) - (Rj @ p_j + pose_j[3:])


_res_batch = jax.vmap(_residual_one)
# exact per-corr Jacobian blocks d r / d pose_i, d r / d pose_j: [3, 6] each
_jac_batch = jax.vmap(jax.jacfwd(_residual_one, argnums=(0, 1)))


def _gather_poses(poses, idx):
    return poses[jnp.clip(idx, 0, poses.shape[0] - 1)]


def compute_residuals(poses, corrs: CorrStore):
    """[C, 3] residuals and [C] validity (invalid corrs -> 0 residual)."""
    v = corrs.valid_mask()
    pi = _gather_poses(poses, corrs.img_i)
    pj = _gather_poses(poses, corrs.img_j)
    r = _res_batch(pi, pj, corrs.p_i, corrs.p_j)
    return jnp.where(v[:, None], r, 0.0), v


def max_residual(poses, corrs: CorrStore):
    """Max |per-axis component| over valid corrs + its corr index
    (reference ``computeMaxResidual``; s_optMaxResThresh is per-axis)."""
    r, v = compute_residuals(poses, corrs)
    m = jnp.max(jnp.abs(r), axis=-1)
    m = jnp.where(v, m, -1.0)
    idx = jnp.argmax(m)
    return m[idx], idx


def count_high_residuals(poses, corrs: CorrStore, thresh: float = 0.02):
    """Fraction-based verification (reference ``useVerification``,
    CUDASolverBundling.cpp:454-476): returns (num_high, num_valid)."""
    r, v = compute_residuals(poses, corrs)
    m = jnp.max(jnp.abs(r), axis=-1)
    high = v & (m > thresh)
    return jnp.sum(high.astype(jnp.int32)), jnp.sum(v.astype(jnp.int32))


def cost(poses, corrs: CorrStore):
    r, _ = compute_residuals(poses, corrs)
    return jnp.sum(r * r)


@partial(jax.jit, static_argnames=("params", "num_frames_static"))
def solve_sparse(
    poses,
    pose_valid,
    corrs: CorrStore,
    params: SolverParams = SolverParams(),
    num_frames_static: int | None = None,
):
    """Run GN/PCG over the sparse 3D-3D energy.

    Args:
      poses: [N, 6] initial pose estimates ([omega, t], frame->world).
      pose_valid: [N] bool; invalid poses are frozen (and their corrs should
        already be invalidated by the caller).
      corrs: correspondence store.

    Returns (poses, SolveStats).
    """
    N = poses.shape[0]
    w_sqrt = jnp.sqrt(jnp.asarray(params.sparse_weight, jnp.float32))

    # frame 0 fixed + invalid poses frozen
    free = pose_valid & (jnp.arange(N) != 0)
    free_f = free.astype(jnp.float32)[:, None]

    v = corrs.valid_mask()
    vf = v.astype(jnp.float32)[:, None]

    # one-hot incidence matrices: segment-sums (J^T) and gathers (J) become
    # MXU matmuls instead of TPU-hostile scatter/gather loops. Invalid corrs
    # get an all-zero row.
    oh_i = jax.nn.one_hot(jnp.where(v, corrs.img_i, N), N, dtype=jnp.float32)
    oh_j = jax.nn.one_hot(jnp.where(v, corrs.img_j, N), N, dtype=jnp.float32)

    c0 = cost(poses, corrs)

    def gn_iter(it, carry):
        poses, done, last_delta = carry

        pi = _gather_poses(poses, corrs.img_i)
        pj = _gather_poses(poses, corrs.img_j)
        r = _res_batch(pi, pj, corrs.p_i, corrs.p_j) * vf * w_sqrt
        Ji, Jj = _jac_batch(pi, pj, corrs.p_i, corrs.p_j)  # [C, 3, 6]
        Ji = Ji * vf[..., None] * w_sqrt
        Jj = Jj * vf[..., None] * w_sqrt

        def JT(y):  # y [C, 3] -> [N, 6]
            gi = jnp.einsum("cij,ci->cj", Ji, y)
            gj = jnp.einsum("cij,ci->cj", Jj, y)
            out = jnp.einsum("cn,cj->nj", oh_i, gi) + jnp.einsum(
                "cn,cj->nj", oh_j, gj
            )
            return out * free_f

        def J(x):  # x [N, 6] -> [C, 3]
            xf = x * free_f
            xi = oh_i @ xf
            xj = oh_j @ xf
            return jnp.einsum("cij,cj->ci", Ji, xi) + jnp.einsum(
                "cij,cj->ci", Jj, xj
            )

        b = -JT(r)  # [N, 6] right-hand side

        # block-Jacobi preconditioner: 6x6 per pose
        Pi = jnp.einsum("cik,cil->ckl", Ji, Ji).reshape(-1, 36)
        Pj = jnp.einsum("cik,cil->ckl", Jj, Jj).reshape(-1, 36)
        P = (
            jnp.einsum("cn,cp->np", oh_i, Pi) + jnp.einsum("cn,cp->np", oh_j, Pj)
        ).reshape(N, 6, 6)
        P = P + jnp.eye(6) * 1e-6
        P_inv = jnp.linalg.inv(P)

        def apply_P(x):
            return jnp.einsum("nij,nj->ni", P_inv, x) * free_f

        def A(x):
            return JT(J(x))

        # PCG
        x0 = jnp.zeros_like(poses)
        r0 = b
        z0 = apply_P(r0)
        p0 = z0
        rz0 = jnp.sum(r0 * z0)

        def pcg_body(state):
            k, x, rr, z, p, rz, _ = state
            Ap = A(p)
            pAp = jnp.sum(p * Ap)
            alpha = jnp.where(jnp.abs(pAp) > 1e-20, rz / pAp, 0.0)
            x = x + alpha * p
            rr = rr - alpha * Ap
            z = apply_P(rr)
            rz_new = jnp.sum(rr * z)
            beta = jnp.where(jnp.abs(rz) > 1e-20, rz_new / rz, 0.0)
            p = z + beta * p
            return k + 1, x, rr, z, p, rz_new, alpha

        def pcg_cond(state):
            k, x, rr, z, p, rz, alpha = state
            return (k < params.num_pcg) & (jnp.abs(rz) > params.pcg_early_out)

        state = (jnp.asarray(0), x0, r0, z0, p0, rz0, jnp.asarray(1.0))
        _, delta, *_ = jax.lax.while_loop(pcg_cond, pcg_body, state)

        max_delta = jnp.max(jnp.abs(delta))
        new_poses = jnp.where(done, poses, poses + delta * free_f)
        new_done = done | (max_delta < params.gn_early_out_delta)
        return new_poses, new_done, max_delta

    poses_out, _, _ = jax.lax.fori_loop(
        0, params.num_gn, gn_iter, (poses, jnp.asarray(False), jnp.asarray(1e9))
    )
    c1 = cost(poses_out, corrs)
    mr, mr_idx = max_residual(poses_out, corrs)
    stats = SolveStats(
        initial_cost=c0,
        final_cost=c1,
        num_gn_done=jnp.asarray(params.num_gn),
        max_residual=mr,
        max_residual_corr=mr_idx,
    )
    return poses_out, stats


@partial(jax.jit, static_argnames=("params", "intr", "dense_params", "w_color"))
def solve_bundle(
    poses,
    pose_valid,
    corrs: CorrStore,
    cache,
    intr,
    params: SolverParams = SolverParams(),
    dense_params=None,
    dense_weights=None,
    w_color: float = 0.0,
):
    """Sparse + dense GN/PCG (the reference's full ``solveBundlingStub``:
    per GN iteration rebuild the dense pair system from current poses, then
    PCG on A = J_s^T J_s + w_d * J_d^T J_d with block-Jacobi preconditioning).

    Args:
      cache: DenseCache over the same frame indexing as ``corrs``/poses.
      dense_weights: [num_gn] per-iteration dense-depth weights (reference
        schedules: local = iter+1, global-at-end = 15; ``SBA.cpp:28-38``).
      w_color: photometric weight (reference default 0).

    Returns (poses, SolveStats).
    """
    from bundlefusion_tpu.solver.dense_term import (
        DenseTermParams,
        build_dense_system,
        dense_matvec,
        dense_precond_blocks,
        dense_rhs,
        find_overlapping_pairs,
    )

    dp = dense_params or DenseTermParams()
    N = poses.shape[0]
    if dense_weights is None:
        dense_weights = jnp.arange(1, params.num_gn + 1, dtype=jnp.float32)
    dense_weights = jnp.asarray(dense_weights, jnp.float32)

    free = pose_valid & (jnp.arange(N) != 0)
    free_f = free.astype(jnp.float32)[:, None]
    v = corrs.valid_mask()
    vf = v.astype(jnp.float32)[:, None]
    oh_i = jax.nn.one_hot(jnp.where(v, corrs.img_i, N), N, dtype=jnp.float32)
    oh_j = jax.nn.one_hot(jnp.where(v, corrs.img_j, N), N, dtype=jnp.float32)
    c0 = cost(poses, corrs)

    def gn_iter(it, carry):
        poses, done = carry
        w_dense = dense_weights[jnp.minimum(it, dense_weights.shape[0] - 1)]

        pi = _gather_poses(poses, corrs.img_i)
        pj = _gather_poses(poses, corrs.img_j)
        r = _res_batch(pi, pj, corrs.p_i, corrs.p_j) * vf
        Ji, Jj = _jac_batch(pi, pj, corrs.p_i, corrs.p_j)
        Ji = Ji * vf[..., None]
        Jj = Jj * vf[..., None]

        pairs, pair_mask = find_overlapping_pairs(poses, pose_valid, cache, intr, dp)
        dsys = build_dense_system(poses, pairs, pair_mask, cache, intr, dp, 1.0, w_color)

        def JT(y):
            gi = jnp.einsum("cij,ci->cj", Ji, y)
            gj = jnp.einsum("cij,ci->cj", Jj, y)
            out = jnp.einsum("cn,cj->nj", oh_i, gi) + jnp.einsum(
                "cn,cj->nj", oh_j, gj
            )
            return out * free_f

        def J(x):
            xf = x * free_f
            xi = oh_i @ xf
            xj = oh_j @ xf
            return jnp.einsum("cij,cj->ci", Ji, xi) + jnp.einsum("cij,cj->ci", Jj, xj)

        b = -JT(r) + w_dense * dense_rhs(dsys, N) * free_f

        Pi = jnp.einsum("cik,cil->ckl", Ji, Ji).reshape(-1, 36)
        Pj = jnp.einsum("cik,cil->ckl", Jj, Jj).reshape(-1, 36)
        P = (
            jnp.einsum("cn,cp->np", oh_i, Pi) + jnp.einsum("cn,cp->np", oh_j, Pj)
        ).reshape(N, 6, 6)
        P = P + w_dense * dense_precond_blocks(dsys, N) + jnp.eye(6) * 1e-6
        P_inv = jnp.linalg.inv(P)

        def apply_P(x):
            return jnp.einsum("nij,nj->ni", P_inv, x) * free_f

        def A(x):
            return JT(J(x)) + w_dense * dense_matvec(dsys, x * free_f, N) * free_f

        x0 = jnp.zeros_like(poses)
        r0 = b
        z0 = apply_P(r0)
        rz0 = jnp.sum(r0 * z0)

        def pcg_body(state):
            k, x, rr, z, p_, rz = state
            Ap = A(p_)
            pAp = jnp.sum(p_ * Ap)
            alpha = jnp.where(jnp.abs(pAp) > 1e-20, rz / pAp, 0.0)
            x = x + alpha * p_
            rr = rr - alpha * Ap
            z = apply_P(rr)
            rz_new = jnp.sum(rr * z)
            beta = jnp.where(jnp.abs(rz) > 1e-20, rz_new / rz, 0.0)
            return k + 1, x, rr, z, z + beta * p_, rz_new

        def pcg_cond(state):
            k, x, rr, z, p_, rz = state
            return (k < params.num_pcg) & (jnp.abs(rz) > params.pcg_early_out)

        _, delta, *_ = jax.lax.while_loop(
            pcg_cond, pcg_body, (jnp.asarray(0), x0, r0, z0, z0, rz0)
        )
        max_delta = jnp.max(jnp.abs(delta))
        poses = jnp.where(done, poses, poses + delta * free_f)
        done = done | (max_delta < params.gn_early_out_delta)
        return poses, done

    poses_out, _ = jax.lax.fori_loop(
        0, params.num_gn, gn_iter, (poses, jnp.asarray(False))
    )
    c1 = cost(poses_out, corrs)
    mr, mr_idx = max_residual(poses_out, corrs)
    return poses_out, SolveStats(
        initial_cost=c0,
        final_cost=c1,
        num_gn_done=jnp.asarray(params.num_gn),
        max_residual=mr,
        max_residual_corr=mr_idx,
    )
