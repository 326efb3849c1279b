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

TPU design — **pair-reduced systems** (the scalable replacement for both
the reference's per-PCG-iteration J/J^T kernels over a variables->corrs
table, CUDASolverBundling.cpp:286, and this module's former [C, N] one-hot
incidence matmuls, which cost O(C*N) memory/FLOPs per PCG step):

1. once per solve: sort correspondences by pair id (img_i * N + img_j);
2. once per GN iteration: per-corr residuals + exact ``jax.jacfwd``
   Jacobian blocks, then a segment reduction over the sorted runs (one
   cumulative sum + two row-gathers at segment boundaries — both fast on
   TPU) into per-pair 12x12 JtJ blocks and 12-vector Jtr, exactly like the
   dense term's ``DensePairSystem``;
3. per PCG iteration: matvecs through tiny [P, N] one-hot matmuls on the
   MXU over the P active PAIRS (P <= max_pairs, orders of magnitude
   smaller than C), plus a [P, 12, 12] block contraction.

At the reference's capacity (N=1200 keyframes, C ~ 10^6 corrs,
zParametersBundlingDefault.txt:30-32) the PCG step touches ~P*N bf16
one-hots (tens of MB) instead of a C*N (multi-GB) incidence matrix.
Block-Jacobi preconditioning (6x6 per pose, a strict upgrade over the
reference's diagonal), fixed shapes throughout, invalid corrs carry zero
weight.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from bundlefusion_tpu.geometry.lie import so3_exp
from bundlefusion_tpu.solver.residuals import CorrStore

_BIG = jnp.int32(2**31 - 1)


@dataclass(frozen=True)
class SolverParams:
    num_gn: int = 3                  # nonlinear iterations
    num_pcg: int = 150               # linear iterations
    pcg_early_out: float = 5e-7
    gn_early_out_delta: float = 0.005
    sparse_weight: float = 1.0
    max_pairs: int = 4096            # active (i, j) pair capacity
    max_working_corrs: int = 131072  # live corrs entering one solve; the
                                     # store capacity can be far larger
                                     # (262144 at reference defaults) and
                                     # the per-solve sort/gather work
                                     # scales with THIS, not capacity;
                                     # overflow surfaces in dropped


class SolveStats(NamedTuple):
    initial_cost: jax.Array
    final_cost: jax.Array
    num_gn_done: jax.Array
    max_residual: jax.Array        # max per-axis component (SBA.cpp semantics)
    max_residual_corr: jax.Array   # corr index of the max residual
    num_pairs_dropped: jax.Array   # pairs beyond max_pairs (0 = exact solve)


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


def _chunked_residual_reduce(poses, corrs: CorrStore, reduce_fn, init):
    """Run ``reduce_fn(acc, r_chunk, v_chunk, start)`` over live-prefix
    chunks of the corr store (appends are a prefix; the capacity tail is
    skipped by a cond). Falls back to one pass for small/ragged stores."""
    C = corrs.capacity
    KB = 16384
    if C <= KB or C % KB != 0:
        r, v = compute_residuals(poses, corrs)
        return reduce_fn(init, r, v, 0)
    n_live = jnp.sum(corrs.valid_mask().astype(jnp.int32))

    def body(cidx, acc):
        start = cidx * KB

        def do(acc):
            sl = lambda a: jax.lax.dynamic_slice_in_dim(a, start, KB, 0)
            v = sl(corrs.img_i) >= 0  # valid_mask semantics
            pi = _gather_poses(poses, sl(corrs.img_i))
            pj = _gather_poses(poses, sl(corrs.img_j))
            r = _res_batch(pi, pj, sl(corrs.p_i), sl(corrs.p_j))
            r = jnp.where(v[:, None], r, 0.0)
            return reduce_fn(acc, r, v, start)

        return jax.lax.cond(start < n_live, do, lambda a: a, acc)

    return jax.lax.fori_loop(0, C // KB, body, init)


def max_residual(poses, corrs: CorrStore):
    """Max |per-axis component| over valid corrs + its corr index
    (reference ``computeMaxResidual``; s_optMaxResThresh is per-axis)."""

    def red(acc, r, v, start):
        best, best_idx = acc
        m = jnp.where(v, jnp.max(jnp.abs(r), axis=-1), -1.0)
        i = jnp.argmax(m)
        better = m[i] > best
        return (
            jnp.where(better, m[i], best),
            jnp.where(better, start + i, best_idx),
        )

    return _chunked_residual_reduce(
        poses, corrs, red, (jnp.asarray(-1.0), jnp.asarray(0))
    )


def count_high_residuals(poses, corrs: CorrStore, thresh: float = 0.02):
    """Fraction-based verification (reference ``useVerification``,
    CUDASolverBundling.cpp:454-476): returns (num_high, num_valid)."""

    def red(acc, r, v, start):
        m = jnp.max(jnp.abs(r), axis=-1)
        high = v & (m > thresh)
        return (
            acc[0] + jnp.sum(high.astype(jnp.int32)),
            acc[1] + jnp.sum(v.astype(jnp.int32)),
        )

    return _chunked_residual_reduce(
        poses, corrs, red, (jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32))
    )


def cost(poses, corrs: CorrStore):
    def red(acc, r, v, start):
        return acc + jnp.sum(r * r)

    return _chunked_residual_reduce(poses, corrs, red, jnp.asarray(0.0))


# ---------------------------------------------------------------------------
# pair-reduced sparse system
# ---------------------------------------------------------------------------


class SortedCorrs(NamedTuple):
    """Correspondences sorted by pair id + the segment structure (fixed per
    solve — the analog of ``buildVariablesToCorrespondencesTableCUDA``)."""

    img_i: jax.Array     # [C] sorted
    img_j: jax.Array     # [C]
    p_i: jax.Array       # [C, 3]
    p_j: jax.Array       # [C, 3]
    valid: jax.Array     # [C] bool
    seg_id: jax.Array    # [C] pair/segment index of each sorted corr
                         #     (== max_pairs for invalid or dropped corrs)
    starts: jax.Array    # [P] segment start index into the sorted arrays
    ends: jax.Array      # [P] segment end index (inclusive)
    pair_i: jax.Array    # [P] pose index i of the pair
    pair_j: jax.Array    # [P]
    pair_valid: jax.Array  # [P] bool
    dropped: jax.Array   # [] int32: segments beyond the P cap


def sort_corrs_by_pair(
    corrs: CorrStore, num_frames: int, max_pairs: int,
    working: int | None = None,
) -> SortedCorrs:
    """Sort the corr store by (img_i, img_j) and find segment boundaries.

    ``working``: optional live-corr working capacity. When smaller than the
    store, live corrs are COMPACTED (one cumsum pass) into a [working]
    array before sorting, so the argsort + order-gathers scale with the
    working set instead of store capacity (262144 at reference defaults —
    the full-capacity sort alone cost ~15 ms per solve). Live corrs beyond
    ``working`` are dropped and surfaced in ``dropped``."""
    C = corrs.capacity
    extra_dropped = jnp.asarray(0, jnp.int32)
    if working is not None and working < C:
        vfull = corrs.valid_mask()
        idx = jnp.nonzero(vfull, size=working, fill_value=C)[0]
        extra_dropped = jnp.maximum(
            jnp.sum(vfull.astype(jnp.int32)) - working, 0
        )
        ci = jnp.clip(idx, 0, C - 1)
        ok = idx < C
        corrs = corrs._replace(
            img_i=jnp.where(ok, corrs.img_i[ci], -1),
            img_j=jnp.where(ok, corrs.img_j[ci], -1),
            p_i=jnp.where(ok[:, None], corrs.p_i[ci], 0.0),
            p_j=jnp.where(ok[:, None], corrs.p_j[ci], 0.0),
            key_i=jnp.where(ok, corrs.key_i[ci], -1),
            key_j=jnp.where(ok, corrs.key_j[ci], -1),
        )
        C = working
    v = corrs.valid_mask()
    pid = jnp.where(v, corrs.img_i * num_frames + corrs.img_j, _BIG)
    order = jnp.argsort(pid)
    pid_s = pid[order]
    v_s = pid_s != _BIG
    is_start = v_s & jnp.concatenate(
        [jnp.ones((1,), bool), pid_s[1:] != pid_s[:-1]]
    )
    is_end = v_s & jnp.concatenate(
        [pid_s[1:] != pid_s[:-1], jnp.ones((1,), bool)]
    )
    n_seg = jnp.sum(is_start.astype(jnp.int32))
    starts = jnp.nonzero(is_start, size=max_pairs, fill_value=C - 1)[0]
    ends = jnp.nonzero(is_end, size=max_pairs, fill_value=C - 1)[0]
    pair_valid = jnp.arange(max_pairs) < n_seg
    # per-corr segment id (sorted, monotone); invalid / beyond-cap -> cap
    seg_id = jnp.cumsum(is_start.astype(jnp.int32)) - 1
    seg_id = jnp.where(v_s & (seg_id < max_pairs), seg_id, max_pairs)
    img_i_s = corrs.img_i[order]
    img_j_s = corrs.img_j[order]
    return SortedCorrs(
        img_i=img_i_s,
        img_j=img_j_s,
        p_i=corrs.p_i[order],
        p_j=corrs.p_j[order],
        valid=v_s,
        seg_id=seg_id,
        starts=starts,
        ends=ends,
        pair_i=jnp.where(pair_valid, img_i_s[starts], 0),
        pair_j=jnp.where(pair_valid, img_j_s[starts], 0),
        pair_valid=pair_valid,
        dropped=jnp.maximum(n_seg - max_pairs, 0) + extra_dropped,
    )


def build_sparse_pair_system(poses, sc: SortedCorrs, w_sqrt, n_live=None):
    """Per-GN-iteration reduction: exact per-corr Jacobians -> per-pair
    H [P, 12, 12] / b [P, 12] via a sorted segment-sum over the runs
    (``segment_sum`` with monotone ids — no global f32 prefix-sum
    differencing, so late segments keep full precision at high corr
    counts). Returns (H, b).

    ``n_live``: optional live-corr count. The sorted arrays hold all live
    corrs as a PREFIX (invalid sort to the end), so when given, the C-sized
    pass runs in chunks with a cond skip past the live prefix — cost scales
    with occupancy, not store capacity (the reference-capacity 262144-corr
    store made every GN iteration pay full price at ~2K live corrs)."""
    P_cap = sc.pair_valid.shape[0]
    C = sc.valid.shape[0]

    def contrib_of(valid, img_i, img_j, p_i, p_j, seg_id):
        vf = valid.astype(jnp.float32)[:, None] * w_sqrt
        pi = _gather_poses(poses, img_i)
        pj = _gather_poses(poses, img_j)
        r = _res_batch(pi, pj, p_i, p_j) * vf             # [c, 3]
        Ji, Jj = _jac_batch(pi, pj, p_i, p_j)             # [c, 3, 6]
        Ji = Ji * vf[..., None]
        Jj = Jj * vf[..., None]
        J = jnp.concatenate([Ji, Jj], axis=-1)            # [c, 3, 12]
        Hc = jnp.einsum("cri,crj->cij", J, J)             # [c, 12, 12]
        bc = jnp.einsum("cri,cr->ci", J, r)               # [c, 12]
        contrib = jnp.concatenate([Hc.reshape(-1, 144), bc], axis=-1)
        return jax.ops.segment_sum(
            contrib, seg_id, num_segments=P_cap + 1, indices_are_sorted=True
        )

    KB = 16384
    if n_live is None or C <= KB or C % KB != 0:
        seg = contrib_of(
            sc.valid, sc.img_i, sc.img_j, sc.p_i, sc.p_j, sc.seg_id
        )[:P_cap]
    else:
        def body(cidx, acc):
            start = cidx * KB

            def do(acc):
                sl = lambda a: jax.lax.dynamic_slice_in_dim(a, start, KB, 0)
                return acc + contrib_of(
                    sl(sc.valid), sl(sc.img_i), sl(sc.img_j),
                    sl(sc.p_i), sl(sc.p_j), sl(sc.seg_id),
                )

            return jax.lax.cond(start < n_live, do, lambda a: a, acc)

        acc = jax.lax.fori_loop(
            0, C // KB, body, jnp.zeros((P_cap + 1, 156), jnp.float32)
        )
        seg = acc[:P_cap]
    seg = jnp.where(sc.pair_valid[:, None], seg, 0.0)
    H = seg[:, :144].reshape(-1, 12, 12)
    b = seg[:, 144:156]
    return H, b


def pair_incidence(pair_i, pair_j, pair_valid, num_frames: int):
    """One-hot pair->pose incidence [P, N] f32 (built once per solve; the
    PCG matvecs ride the MXU through these — one-hot contractions are
    exact, every accumulation has a single nonzero addend)."""
    n = jnp.arange(num_frames)
    oh_i = (pair_i[:, None] == n[None]) & pair_valid[:, None]
    oh_j = (pair_j[:, None] == n[None]) & pair_valid[:, None]
    return oh_i.astype(jnp.float32), oh_j.astype(jnp.float32)


def _pair_matvec_f32(H, oh_i, oh_j, x, n_pairs=None):
    """x [N, 6] -> sum_p S_p^T H_p S_p x.

    ``n_pairs``: optional live-pair count; pairs are a sorted prefix, so
    the [P, N] one-hot matmuls run in P-chunks with a cond skip — the
    per-PCG-iteration cost scales with live pairs, not pair capacity
    (at N=1200/P=4096 the dense one-hots cost ~80 MB of reads per
    iteration; live runs are typically a few hundred pairs)."""
    P = oh_i.shape[0]
    PB = 512
    if n_pairs is None or P <= PB or P % PB != 0:
        xi = jnp.dot(oh_i, x)
        xj = jnp.dot(oh_j, x)
        xij = jnp.concatenate([xi, xj], axis=-1)          # [P, 12]
        y = jnp.einsum("pab,pb->pa", H, xij)              # [P, 12]
        out = jnp.dot(oh_i.T, y[:, :6])
        return out + jnp.dot(oh_j.T, y[:, 6:])

    def body(cidx, acc):
        start = cidx * PB

        def do(acc):
            ohi = jax.lax.dynamic_slice_in_dim(oh_i, start, PB, 0)
            ohj = jax.lax.dynamic_slice_in_dim(oh_j, start, PB, 0)
            Hc = jax.lax.dynamic_slice_in_dim(H, start, PB, 0)
            xi = jnp.dot(ohi, x)
            xj = jnp.dot(ohj, x)
            y = jnp.einsum("pab,pb->pa", Hc, jnp.concatenate([xi, xj], -1))
            return acc + jnp.dot(ohi.T, y[:, :6]) + jnp.dot(ohj.T, y[:, 6:])

        return jax.lax.cond(start < n_pairs, do, lambda a: a, acc)

    return jax.lax.fori_loop(0, P // PB, body, jnp.zeros_like(x))


def _pair_rhs(b, oh_i, oh_j):
    out = jnp.dot(oh_i.T, b[:, :6])
    return out + jnp.dot(oh_j.T, b[:, 6:])


def _pair_precond(H, oh_i, oh_j, num_frames: int):
    """Block-Jacobi 6x6 blocks: sum of each pose's ii/jj diagonal blocks."""
    Hii = H[:, :6, :6].reshape(-1, 36)
    Hjj = H[:, 6:, 6:].reshape(-1, 36)
    P6 = jnp.dot(oh_i.T, Hii) + jnp.dot(oh_j.T, Hjj)
    return P6.reshape(num_frames, 6, 6)


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
    P_cap = min(params.max_pairs, N * (N + 1) // 2 + 1)

    # frame 0 fixed + invalid poses frozen
    free = pose_valid & (jnp.arange(N) != 0)
    free_f = free.astype(jnp.float32)[:, None]

    sc = sort_corrs_by_pair(corrs, N, P_cap, working=params.max_working_corrs)
    oh_i, oh_j = pair_incidence(sc.pair_i, sc.pair_j, sc.pair_valid, N)
    # live prefix sizes: chunked passes skip the dead capacity tail
    n_live = jnp.sum(sc.valid.astype(jnp.int32))
    n_pairs = jnp.sum(sc.pair_valid.astype(jnp.int32))

    c0 = cost(poses, corrs)

    def gn_iter(it, carry):
        poses, done, last_delta = carry
        H, b = build_sparse_pair_system(poses, sc, w_sqrt, n_live=n_live)
        rhs = -_pair_rhs(b, oh_i, oh_j) * free_f

        P = _pair_precond(H, oh_i, oh_j, N) + jnp.eye(6) * 1e-6
        P_inv = jnp.linalg.inv(P)

        def apply_P(x):
            return jnp.einsum("nij,nj->ni", P_inv, x) * free_f

        def A(x):
            return _pair_matvec_f32(
                H, oh_i, oh_j, x * free_f, n_pairs=n_pairs
            ) * free_f

        # PCG
        x0 = jnp.zeros_like(poses)
        r0 = rhs
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
        num_pairs_dropped=sc.dropped,
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
      w_color: photometric weight (reference: 0.1 in the global-at-end solve).

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
    w_sqrt = jnp.sqrt(jnp.asarray(params.sparse_weight, jnp.float32))
    P_cap = min(params.max_pairs, N * (N + 1) // 2 + 1)

    free = pose_valid & (jnp.arange(N) != 0)
    free_f = free.astype(jnp.float32)[:, None]
    sc = sort_corrs_by_pair(corrs, N, P_cap, working=params.max_working_corrs)
    oh_i, oh_j = pair_incidence(sc.pair_i, sc.pair_j, sc.pair_valid, N)
    n_live = jnp.sum(sc.valid.astype(jnp.int32))
    n_pairs = jnp.sum(sc.pair_valid.astype(jnp.int32))
    c0 = cost(poses, corrs)

    def gn_iter(it, carry):
        poses, done = carry
        w_dense = dense_weights[jnp.minimum(it, dense_weights.shape[0] - 1)]

        H, b = build_sparse_pair_system(poses, sc, w_sqrt, n_live=n_live)
        pairs, pair_mask = find_overlapping_pairs(poses, pose_valid, cache, intr, dp)
        dsys = build_dense_system(poses, pairs, pair_mask, cache, intr, dp, 1.0, w_color)

        rhs = (-_pair_rhs(b, oh_i, oh_j) + w_dense * dense_rhs(dsys, N)) * free_f

        P = (
            _pair_precond(H, oh_i, oh_j, N)
            + w_dense * dense_precond_blocks(dsys, N)
            + jnp.eye(6) * 1e-6
        )
        P_inv = jnp.linalg.inv(P)

        def apply_P(x):
            return jnp.einsum("nij,nj->ni", P_inv, x) * free_f

        def A(x):
            xf = x * free_f
            return (
                _pair_matvec_f32(H, oh_i, oh_j, xf, n_pairs=n_pairs)
                + w_dense * dense_matvec(dsys, xf, N)
            ) * free_f

        x0 = jnp.zeros_like(poses)
        r0 = rhs
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
        num_pairs_dropped=sc.dropped,
    )
