"""Past-keyframe-capacity behavior: once ``num_keyframes == G`` the engine
must keep tracking (odometry-only, like the reference once ``s_maxNumImages``
keyframes exist — zParametersBundlingDefault.txt:30-31 caps the global
problem) and keep recording per-frame poses without mis-indexing the local
buffer (the round-2 ``_flush_pending`` tail hazard)."""

import numpy as np
import pytest

from bundlefusion_tpu.config import AppConfig, BundlingConfig
from bundlefusion_tpu.io.synthetic import default_intrinsics, make_sequence
from bundlefusion_tpu.ops.sift import SiftConfig
from bundlefusion_tpu.pipeline.online import BundleFusion
from bundlefusion_tpu.utils.metrics import evaluate_ate_rmse

G = 3          # tiny keyframe capacity
SUBMAP = 4
# enough frames to run 3 full boundaries PAST capacity plus a partial tail
N_FRAMES = (G + 3) * SUBMAP + 2


@pytest.fixture(scope="module")
def overflow_run():
    intr = default_intrinsics(160, 120)
    seq = make_sequence(N_FRAMES, intr=intr)
    app = AppConfig(
        integration_width=80, integration_height=60,
        sdf_voxel_size=0.03, sdf_truncation=0.09,
        hash_num_sdf_blocks=8192, hash_key_capacity=16384,
        visible_blocks_cap=8192, alloc_max_new_blocks_per_frame=8192,
    )
    bundling = BundlingConfig(
        width_sift=160, height_sift=120, submap_size=SUBMAP,
        downsampled_width=40, downsampled_height=30,
        max_local_corr=2048, max_global_corr=8192,
        min_num_matches_local=4, min_num_matches_global=4,
    )
    sift_cfg = SiftConfig(
        num_octaves=3, target_keys=96, max_candidates_per_octave=256,
        min_scale=1.0, dog_thresh=0.004,
    )
    eng = BundleFusion(intr, app, bundling, sift_cfg=sift_cfg, max_keyframes=G)
    for i in range(N_FRAMES):
        eng.process_frame(seq["depth"][i], seq["color"][i])
    eng.finish(extra_solves=1)
    return eng, seq


def test_capacity_reached_and_capped(overflow_run):
    eng, seq = overflow_run
    assert eng.num_keyframes == G  # stopped exactly at capacity


def test_every_frame_recorded(overflow_run):
    eng, seq = overflow_run
    traj = eng.trajectory()
    assert traj.shape[0] == N_FRAMES
    assert len(eng.frame_valid) == N_FRAMES


def test_past_capacity_poses_sane(overflow_run):
    """Frames past capacity still get finite chained (odometry) poses and
    the whole trajectory still evaluates against GT."""
    eng, seq = overflow_run
    traj = eng.trajectory()
    n_finite = np.isfinite(traj).all(axis=(1, 2)).sum()
    assert n_finite >= N_FRAMES - 2, n_finite
    rmse, n = evaluate_ate_rmse(traj, seq["poses"][: len(traj)])
    assert n >= N_FRAMES - 2
    assert rmse < 0.12, rmse
