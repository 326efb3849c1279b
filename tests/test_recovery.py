"""Failure-recovery loop: residual pruning + frame invalidation.

Mirrors the reference's recovery machinery (SURVEY.md §5): after each
global solve, image pairs whose max residual exceeds s_optMaxResThresh are
invalidated (SBA::removeMaxResidualCUDA, SBA.cpp:169-204) over several
rounds, and keyframes left without correspondences lose their pose
(CheckForInvalidFramesCU, SIFTImageManager.cu:725-764). A sequence with an
injected bad loop closure must recover."""

import numpy as np
import jax.numpy as jnp

from bundlefusion_tpu import AppConfig, BundlingConfig
from bundlefusion_tpu.io.synthetic import default_intrinsics, make_sequence
from bundlefusion_tpu.ops.sift import SiftConfig
from bundlefusion_tpu.pipeline.online import BundleFusion
from bundlefusion_tpu.solver.residuals import append_corrs
from bundlefusion_tpu.utils.metrics import evaluate_ate_rmse


def _small_engine(n):
    intr = default_intrinsics(160, 120)
    app = AppConfig(
        integration_width=80, integration_height=60, sdf_voxel_size=0.03,
        sdf_truncation=0.09, hash_num_sdf_blocks=8192, hash_key_capacity=16384,
        visible_blocks_cap=8192,
    )
    bund = BundlingConfig(
        width_sift=160, height_sift=120, submap_size=4,
        downsampled_width=40, downsampled_height=30,
        max_local_corr=2048, max_global_corr=8192,
        min_num_matches_local=4, min_num_matches_global=4,
        use_guided_remove=True,   # exercise the guided-removal path too
    )
    sift = SiftConfig(num_octaves=3, target_keys=96, max_candidates_per_octave=256,
                      min_scale=1.0, dog_thresh=0.004)
    eng = BundleFusion(intr, app, bund, sift_cfg=sift, max_keyframes=8)
    seq = make_sequence(n, intr=intr)
    return eng, seq


def test_bad_loop_closure_pruned_and_ate_recovers():
    """Inject bogus (kf1, kf0) corrs. The prune rounds must invalidate the
    pair; since that is kf1's only support, comprehensive invalidation drops
    kf1, queues it for retry, and a later boundary revalidates it with fresh
    clean matches — the reference's full recovery loop."""
    n = 21
    eng, seq = _small_engine(n)
    for i in range(9):
        eng.process_frame(seq["depth"][i], seq["color"][i])

    # inject a grossly wrong loop closure between keyframes 1 and 0:
    # residuals ~0.5 m >> opt_max_res_thresh=0.08
    rng = np.random.default_rng(0)
    K = 8
    p_i = rng.uniform(-0.5, 0.5, (K, 3)).astype(np.float32) + [0, 0, 1.5]
    p_j = p_i + np.array([0.5, 0.3, 0.0], np.float32)
    c0 = int(eng.glob.corrs.count)
    eng.glob = eng.glob._replace(
        corrs=append_corrs(
            eng.glob.corrs,
            jnp.full((K,), 1, jnp.int32),
            jnp.full((K,), 0, jnp.int32),
            jnp.asarray(p_i),
            jnp.asarray(p_j),
            jnp.ones((K,), bool),
        )
    )

    for i in range(9, n):
        eng.process_frame(seq["depth"][i], seq["color"][i])
    eng.finish(extra_solves=1)

    # the injected slots must have been invalidated by residual pruning
    img_i = np.asarray(eng.glob.corrs.img_i)
    injected = img_i[c0 : c0 + K]
    assert (injected == -1).all(), injected

    # kf1 was left without support, then revalidated at a later boundary
    assert eng.keyframe_valid[1], (eng.keyframe_valid, eng.retry_list)
    traj = eng.trajectory()
    rmse, n_valid = evaluate_ate_rmse(traj, seq["poses"][: len(traj)])
    assert n_valid >= n - 2, n_valid
    assert rmse < 0.06, rmse


def test_clean_sequence_not_overpruned():
    """Pruning must not fire on a healthy sequence (no false invalidation)."""
    n = 13
    eng, seq = _small_engine(n)
    for i in range(n):
        eng.process_frame(seq["depth"][i], seq["color"][i])
    eng.finish(extra_solves=1)
    traj = eng.trajectory()
    rmse, n_valid = evaluate_ate_rmse(traj, seq["poses"][: len(traj)])
    assert n_valid == n
    assert rmse < 0.06
    # all keyframes still valid
    assert eng.keyframe_valid[: eng.num_keyframes].all()
