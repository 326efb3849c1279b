"""Checkpoint/resume: save mid-sequence, reload, continue — identical
result (the unified analog of the reference's TSDF-hash + SIFTImageManager
+ CUDACache save/load paths, DepthSensing.cpp:380-423,
SIFTImageManager.h:277-279, CUDACache.h:54-142)."""

import numpy as np

from bundlefusion_tpu import AppConfig, BundlingConfig
from bundlefusion_tpu.io.synthetic import default_intrinsics, make_sequence
from bundlefusion_tpu.ops.sift import SiftConfig
from bundlefusion_tpu.pipeline.online import BundleFusion
from bundlefusion_tpu.tsdf.table import check_invariants
from bundlefusion_tpu.utils.metrics import evaluate_ate_rmse


def _engine():
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
    )
    sift = SiftConfig(num_octaves=3, target_keys=96, max_candidates_per_octave=256,
                      min_scale=1.0, dog_thresh=0.004)
    return BundleFusion(intr, app, bund, sift_cfg=sift, max_keyframes=8)


def test_save_load_continue_identical(tmp_path):
    n = 13
    intr = default_intrinsics(160, 120)
    seq = make_sequence(n, intr=intr)

    # reference run: straight through
    eng_a = _engine()
    for i in range(n):
        eng_a.process_frame(seq["depth"][i], seq["color"][i])
    eng_a.finish(extra_solves=1)
    traj_a = eng_a.trajectory()

    # checkpoint run: save at frame 7, reload, continue
    eng_b = _engine()
    for i in range(7):
        eng_b.process_frame(seq["depth"][i], seq["color"][i])
    ckpt = str(tmp_path / "engine.npz")
    eng_b.save(ckpt)
    del eng_b

    eng_c = BundleFusion.load(ckpt)
    assert eng_c.frame_idx == 7
    for i in range(7, n):
        eng_c.process_frame(seq["depth"][i], seq["color"][i])
    eng_c.finish(extra_solves=1)
    traj_c = eng_c.trajectory()

    assert traj_a.shape == traj_c.shape
    np.testing.assert_allclose(traj_a, traj_c, atol=1e-5, equal_nan=True)

    # voxel table restored structurally intact; map content equivalent.
    # (Exact key sets may differ ~1%: the checkpoint flush retires the
    # in-flight submap one frame earlier than the straight run, shifting
    # WHEN re-integration ops ran — the fused surface is the same.)
    inv = check_invariants(eng_c.table)
    assert all(v == 0 for v in inv.values()), inv
    ka = set(np.asarray(eng_a.table.keys)[np.asarray(eng_a.table.weight[
        np.clip(np.asarray(eng_a.table.slots), 0, eng_a.table.num_blocks)
    ]).max(-1) > 0].tolist())
    kc = set(np.asarray(eng_c.table.keys)[np.asarray(eng_c.table.weight[
        np.clip(np.asarray(eng_c.table.slots), 0, eng_c.table.num_blocks)
    ]).max(-1) > 0].tolist())
    inter = len(ka & kc)
    assert inter > 0.98 * max(len(ka), len(kc)), (len(ka), len(kc), inter)
    wa = float(np.asarray(eng_a.table.weight).sum())
    wc = float(np.asarray(eng_c.table.weight).sum())
    assert abs(wa - wc) < 0.02 * max(wa, wc), (wa, wc)

    rmse, nv = evaluate_ate_rmse(traj_c, seq["poses"][: len(traj_c)])
    assert nv == n and rmse < 0.06


def test_checkpoint_preserves_host_paged_blocks(tmp_path):
    """Save/load with streaming on must round-trip the host block store
    (the reference saves the full chunked volume incl. CPU-resident chunks,
    CUDASceneRepChunkGrid.h:122-141)."""
    from bundlefusion_tpu.io.checkpoint import load_engine, save_engine
    from tests.test_streaming_engine import (
        _small_engine,
        _table_payload_by_key,
    )

    eng, intr = _small_engine(streaming=True)
    n = 9
    seq = make_sequence(n, intr=intr)
    for i in range(n):
        eng.process_frame(seq["depth"][i], seq["color"][i])
    eng._flush_pending()
    far = np.eye(4, dtype=np.float32)
    far[:3, 3] = [50.0, 0, 0]
    eng.sift_world.append(far)
    eng._stream_update()
    assert len(eng.host_blocks) > 0

    path = str(tmp_path / "ckpt_stream.npz")
    save_engine(eng, path)
    eng_b = load_engine(path)
    assert len(eng_b.host_blocks) == len(eng.host_blocks)
    assert np.array_equal(
        np.asarray(eng_b._blocked_dev), np.asarray(eng._blocked_dev)
    )

    # stream everything back in on both: identical volumes
    eng.sift_world[-1] = np.asarray(seq["poses"][0])
    eng_b.sift_world.append(np.asarray(seq["poses"][0]))
    eng._stream_update()
    eng_b._stream_update()
    assert len(eng.host_blocks) == 0 and len(eng_b.host_blocks) == 0
    pa = _table_payload_by_key(eng.table)
    pb = _table_payload_by_key(eng_b.table)
    assert set(pa.keys()) == set(pb.keys())
    for k in pa:
        np.testing.assert_array_equal(pa[k][0], pb[k][0])
        np.testing.assert_array_equal(pa[k][1], pb[k][1])
