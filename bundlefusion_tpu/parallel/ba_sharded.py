"""Multi-chip sharded bundle adjustment + matching.

The reference's only "multi-device" story is two GPUs in one process with
cudaMemcpy (``DualGPU.h``). The TPU design scales the *global* problem over a
device mesh (BASELINE.json north star: keyframe chunks and correspondences
partitioned over devices, per-device reduced-system partials combined with
XLA collectives over ICI):

- **Correspondence sharding (BA)**: the EntryJ store is sharded along the
  corr axis; poses are replicated. Each device builds its local J/JT
  contributions; the [N, 6] gradient, the 6x6 block-Jacobi diagonal and
  every PCG matvec partial are ``psum``-ed over the mesh. Because the
  reference's 3D-3D sparse energy has NO landmark variables
  (``SolverBundlingEquationsLie.h:42-57``), the "distributed Schur
  complement" reduces to summing per-device camera-system contributions —
  one [N, 6] all-reduce per PCG iteration riding ICI.
- **Keyframe sharding (matching)**: previous keyframes' descriptors are
  sharded across devices; the current keyframe is replicated; each device
  runs the MXU matcher against its shard (embarrassingly parallel).

Single-chip ``solver.gn_pcg.solve_sparse`` and this module share the same
math; this module wraps the stages in ``shard_map`` over a 1-D mesh.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bundlefusion_tpu.solver.gn_pcg import SolverParams, _gather_poses, _jac_batch, _res_batch
from bundlefusion_tpu.solver.residuals import CorrStore


def make_mesh(devices=None, axis: str = "shard") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def shard_corrs(corrs: CorrStore, mesh: Mesh, axis: str = "shard") -> CorrStore:
    """Place the corr store sharded along the corr axis (capacity must be
    divisible by the mesh size)."""
    sh = NamedSharding(mesh, P(axis))
    return CorrStore(
        img_i=jax.device_put(corrs.img_i, sh),
        img_j=jax.device_put(corrs.img_j, sh),
        p_i=jax.device_put(corrs.p_i, sh),
        p_j=jax.device_put(corrs.p_j, sh),
        key_i=jax.device_put(corrs.key_i, sh),
        key_j=jax.device_put(corrs.key_j, sh),
        count=jax.device_put(corrs.count, NamedSharding(mesh, P())),
    )


def solve_sparse_sharded(
    poses,
    pose_valid,
    corrs: CorrStore,
    mesh: Mesh,
    params: SolverParams = SolverParams(),
    axis: str = "shard",
):
    """GN/PCG with corr-sharded J/JT and psum-reduced camera system.

    Same semantics as ``solve_sparse`` (minus per-corr max-residual stats);
    returns (poses, final_cost).
    """
    N = poses.shape[0]

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(), P()),
    )
    def run(poses, free_f, img_i, img_j, p_i, p_j):
        v = img_i >= 0
        vf = v.astype(jnp.float32)[:, None]
        ii = jnp.where(v, img_i, N)
        jj = jnp.where(v, img_j, N)

        def psum(x):
            return jax.lax.psum(x, axis)

        def gn_iter(it, carry):
            poses, done = carry
            pi = _gather_poses(poses, img_i)
            pj = _gather_poses(poses, img_j)
            r = _res_batch(pi, pj, p_i, p_j) * vf
            Ji, Jj = _jac_batch(pi, pj, p_i, p_j)
            Ji = Ji * vf[..., None]
            Jj = Jj * vf[..., None]

            def JT(y):
                gi = jnp.einsum("cij,ci->cj", Ji, y)
                gj = jnp.einsum("cij,ci->cj", Jj, y)
                out = jnp.zeros((N + 1, 6), jnp.float32)
                out = out.at[ii].add(gi, mode="drop")
                out = out.at[jj].add(gj, mode="drop")
                return psum(out[:N]) * free_f

            def J(x):
                xi = _gather_poses(x * free_f, img_i)
                xj = _gather_poses(x * free_f, img_j)
                return jnp.einsum("cij,cj->ci", Ji, xi) + jnp.einsum(
                    "cij,cj->ci", Jj, xj
                )

            b = -JT(r)
            Pi = jnp.einsum("cik,cil->ckl", Ji, Ji)
            Pj = jnp.einsum("cik,cil->ckl", Jj, Jj)
            Pd = jnp.zeros((N + 1, 6, 6), jnp.float32)
            Pd = Pd.at[ii].add(Pi, mode="drop")
            Pd = Pd.at[jj].add(Pj, mode="drop")
            P_inv = jnp.linalg.inv(psum(Pd[:N]) + jnp.eye(6) * 1e-6)

            def apply_P(x):
                return jnp.einsum("nij,nj->ni", P_inv, x) * free_f

            def A(x):
                return JT(J(x))

            x0 = jnp.zeros_like(poses)
            r0 = b
            z0 = apply_P(r0)
            rz0 = jnp.sum(r0 * z0)

            def pcg_body(state):
                k, x, rr, z, p, rz = state
                Ap = A(p)
                pAp = jnp.sum(p * Ap)
                alpha = jnp.where(jnp.abs(pAp) > 1e-20, rz / pAp, 0.0)
                x = x + alpha * p
                rr = rr - alpha * Ap
                z = apply_P(rr)
                rz_new = jnp.sum(rr * z)
                beta = jnp.where(jnp.abs(rz) > 1e-20, rz_new / rz, 0.0)
                return k + 1, x, rr, z, z + beta * p, rz_new

            def pcg_cond(state):
                k, x, rr, z, p, rz = state
                return (k < params.num_pcg) & (jnp.abs(rz) > params.pcg_early_out)

            _, delta, *_ = jax.lax.while_loop(
                pcg_cond, pcg_body, (jnp.asarray(0), x0, r0, z0, z0, rz0)
            )
            max_delta = jnp.max(jnp.abs(delta))
            poses = jnp.where(done, poses, poses + delta * free_f)
            done = done | (max_delta < params.gn_early_out_delta)
            return poses, done

        poses, _ = jax.lax.fori_loop(
            0, params.num_gn, gn_iter, (poses, jnp.asarray(False))
        )
        # final cost (global)
        pi = _gather_poses(poses, img_i)
        pj = _gather_poses(poses, img_j)
        r = _res_batch(pi, pj, p_i, p_j) * vf
        cost = psum(jnp.sum(r * r))
        return poses, cost

    free = pose_valid & (jnp.arange(N) != 0)
    free_f = free.astype(jnp.float32)[:, None]
    return run(poses, free_f, corrs.img_i, corrs.img_j, corrs.p_i, corrs.p_j)


def match_descriptors_sharded(
    desc_cur,
    valid_cur,
    desc_prev,
    valid_prev,
    active_prev,
    mesh: Mesh,
    axis: str = "shard",
    dist_max: float = 0.7,
    ratio_max: float = 0.8,
    num_matches: int = 128,
):
    """Current keyframe vs previous-keyframe stack, sharded over keyframes.

    desc_prev [G, K, 128] is sharded along G; the current descriptors are
    replicated. Results come back fully replicated (all_gather along G) —
    tiny ([G, M] index arrays).
    """
    from bundlefusion_tpu.ops.matching import match_descriptors_pair

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(axis)),
        out_specs=P(axis),
    )
    def run(dc, vc, dp, vp, act):
        def one(slot):
            m = match_descriptors_pair(
                dc, vc, dp[slot], vp[slot], dist_max, ratio_max, num_matches
            )
            return m._replace(valid=m.valid & act[slot])

        return jax.vmap(one)(jnp.arange(dp.shape[0]))

    return run(desc_cur, valid_cur, desc_prev, valid_prev, active_prev)
