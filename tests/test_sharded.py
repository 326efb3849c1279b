"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bundlefusion_tpu.geometry import matrix_to_pose, pose_to_matrix
from bundlefusion_tpu.parallel.ba_sharded import (
    make_mesh,
    match_descriptors_sharded,
    shard_corrs,
    solve_sparse_sharded,
)
from bundlefusion_tpu.solver.gn_pcg import SolverParams, solve_sparse
from bundlefusion_tpu.solver.residuals import append_corrs, create_corr_store

from tests.test_solver import build_pose_graph


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_matches_single_device(rng):
    gt, store = build_pose_graph(rng)
    n = len(gt)
    gt_poses = np.stack([np.asarray(matrix_to_pose(jnp.asarray(g))) for g in gt])
    init = gt_poses.copy()
    init[1:] += rng.normal(size=(n - 1, 6)).astype(np.float32) * 0.04

    params = SolverParams(num_gn=3, num_pcg=40)
    ref, _ = solve_sparse(jnp.asarray(init), jnp.ones(n, bool), store, params)

    mesh = make_mesh()
    store_sharded = shard_corrs(store, mesh)
    out, cost = solve_sparse_sharded(
        jnp.asarray(init), jnp.ones(n, bool), store_sharded, mesh, params
    )
    assert float(cost) < 1e-5
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


def test_sharded_matching(rng):
    mesh = make_mesh()
    G, K = 16, 32
    desc = rng.normal(size=(G, K, 128)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P("shard"))
    m = match_descriptors_sharded(
        jnp.asarray(desc[3]),
        jnp.ones(K, bool),
        jax.device_put(jnp.asarray(desc), sh),
        jax.device_put(jnp.ones((G, K), bool), sh),
        jax.device_put(jnp.ones(G, bool), sh),
        mesh,
        num_matches=16,
    )
    v = np.asarray(m.valid)
    # slot 3 matches itself exactly
    assert v[3].sum() == 16
    ii = np.asarray(m.idx_i[3])[v[3]]
    jj = np.asarray(m.idx_j[3])[v[3]]
    np.testing.assert_array_equal(ii, jj)


def test_graft_dryrun_multichip():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)
