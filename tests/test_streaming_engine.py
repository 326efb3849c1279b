"""Engine-wired streaming: host paging behind ``streaming_enabled`` with the
``isSDFBlockStreamedOut`` alloc check (CUDASceneRepHashSDF.cu:153-163).

The reference ships streaming disabled for BundleFusion (paging conflicts
with de-integration, CUDASceneRepHashSDF.h:89-91); these tests exercise the
wired hook in the same integration-only regime the reference supports it
for (re-integration off via top_n_active=0)."""

import numpy as np
import jax.numpy as jnp
import pytest

from bundlefusion_tpu import AppConfig, BundlingConfig
from bundlefusion_tpu.io.synthetic import default_intrinsics, make_sequence
from bundlefusion_tpu.ops.sift import SiftConfig
from bundlefusion_tpu.pipeline.online import BundleFusion
from bundlefusion_tpu.tsdf.table import EMPTY_KEY, allocate_packed, check_invariants, create_table


def _small_engine(streaming: bool, top_n_active: int = 0):
    intr = default_intrinsics(160, 120)
    app = AppConfig(
        integration_width=80, integration_height=60, sdf_voxel_size=0.03,
        sdf_truncation=0.09, hash_num_sdf_blocks=8192, hash_key_capacity=16384,
        visible_blocks_cap=8192,
        streaming_enabled=streaming, streaming_radius=6.0, streaming_every=4,
        streaming_blocked_cap=8192,
        top_n_active=top_n_active,  # 0 = reference streaming regime
    )
    bundling = BundlingConfig(
        width_sift=160, height_sift=120, submap_size=4,
        downsampled_width=40, downsampled_height=30,
        max_local_corr=2048, max_global_corr=8192,
        min_num_matches_local=4, min_num_matches_global=4,
    )
    sift = SiftConfig(num_octaves=3, target_keys=96,
                      max_candidates_per_octave=256, min_scale=1.0,
                      dog_thresh=0.004)
    intr_seq = default_intrinsics(160, 120)
    return BundleFusion(intr, app, bundling, sift_cfg=sift, max_keyframes=8), intr_seq


def test_alloc_skips_blocked_keys():
    t = create_table(256, 128)
    cand = jnp.asarray([5, 5, 9, 12, 12, 12, 20], jnp.int32)
    blocked = jnp.full((16,), EMPTY_KEY, jnp.int32).at[0].set(9).at[1].set(12)
    blocked = jnp.sort(blocked)
    t2 = allocate_packed(t, cand, blocked=blocked)
    keys = np.asarray(t2.keys)
    present = set(keys[keys != int(EMPTY_KEY)].tolist())
    assert present == {5, 20}, present
    inv = check_invariants(t2)
    assert all(int(v) == 0 for v in inv.values()), inv


def test_streaming_pages_out_and_back():
    eng, intr = _small_engine(streaming=True)
    n = 13
    seq = make_sequence(n, intr=intr)
    for i in range(n):
        eng.process_frame(seq["depth"][i], seq["color"][i])
    eng._flush_pending()
    # force a sweep centered far from the scene: everything pages out
    eng.sift_world.append(np.asarray(
        np.diag([1.0, 1, 1, 1]).astype(np.float32)))
    eng.sift_world[-1][:3, 3] = [50.0, 0.0, 0.0]
    eng._stream_update()
    assert len(eng.host_blocks) > 0
    paged = len(eng.host_blocks)
    live_after_out = int(np.asarray(
        jnp.sum((eng.table.keys != EMPTY_KEY).astype(jnp.int32))))
    inv = check_invariants(eng.table)
    assert all(int(v) == 0 for v in inv.values()), inv

    # the alloc path must NOT resurrect paged-out blocks
    fails0 = int(eng.table.num_alloc_failures)
    hw0 = int(np.asarray(eng.table.high_water))
    eng.sift_world[-1] = np.asarray(seq["poses"][n - 1])
    # (sweep disabled: keys stay paged while a frame re-alloces)
    eng.process_frame(seq["depth"][n - 1], seq["color"][n - 1])
    eng._flush_pending()
    import jax

    jax.block_until_ready(eng.table)
    live_mid = int(np.asarray(
        jnp.sum((eng.table.keys != EMPTY_KEY).astype(jnp.int32))))
    # frame n-1's blocks were all paged out -> none may come back via alloc
    assert live_mid <= live_after_out + 64, (live_mid, live_after_out)

    # stream back in: paged blocks return with their payload
    eng._stream_update()
    assert len(eng.host_blocks) < paged
    live_back = int(np.asarray(
        jnp.sum((eng.table.keys != EMPTY_KEY).astype(jnp.int32))))
    assert live_back > live_mid
    inv = check_invariants(eng.table)
    assert all(int(v) == 0 for v in inv.values()), inv


def _table_payload_by_key(table):
    keys = np.asarray(table.keys)
    slots = np.asarray(table.slots)
    occ = keys != int(EMPTY_KEY)
    sdf = np.asarray(table.sdf)
    w = np.asarray(table.weight)
    return {
        int(k): (sdf[s], w[s])
        for k, s in zip(keys[occ], slots[occ])
    }


def test_reintegration_over_paged_region_streams_in_first():
    """De/re-integration over a paged region must page the blocks back in
    first (``CUDASceneRepChunkGrid.h:142-210`` + ``isSDFBlockStreamedOut``):
    a streaming run that de-integrates frame 0 while its blocks sit in host
    RAM must end with the SAME volume as a never-paged run — without the
    stream-in, the paged blocks keep frame 0's contribution
    (under-subtraction)."""
    eng, intr = _small_engine(streaming=True, top_n_active=4)
    eng2, _ = _small_engine(streaming=False, top_n_active=4)
    n = 9
    seq = make_sequence(n, intr=intr)
    for i in range(n):
        eng.process_frame(seq["depth"][i], seq["color"][i])
        eng2.process_frame(seq["depth"][i], seq["color"][i])
    eng._flush_pending()
    eng2._flush_pending()

    # page out EVERYTHING in the streaming engine
    far = np.eye(4, dtype=np.float32)
    far[:3, 3] = [50.0, 0, 0]
    eng.sift_world.append(far)
    eng._stream_update()
    assert len(eng.host_blocks) > 0
    eng.sift_world[-1] = np.asarray(seq["poses"][0])

    # force de-integration of frame 0 in BOTH engines (invalidate it), then
    # drain one re-integration dispatch each
    for e in (eng, eng2):
        poses = np.stack(e.complete_traj)
        valid = np.isfinite(poses).all(axis=(1, 2))
        valid[0] = False
        e.traj_manager.update_optimized_transforms(poses, valid)
        e._tsdf_dispatch()
    import jax

    jax.block_until_ready(eng.table)

    # pull the remaining cold blocks back so the full volumes are comparable
    eng._stream_update()
    assert len(eng.host_blocks) == 0

    pa = _table_payload_by_key(eng.table)
    pb = _table_payload_by_key(eng2.table)
    assert set(pa.keys()) == set(pb.keys())
    for k in pa:
        np.testing.assert_allclose(pa[k][1], pb[k][1], rtol=0, atol=0,
                                   err_msg=f"weight mismatch block {k}")
        np.testing.assert_allclose(pa[k][0], pb[k][0], rtol=0, atol=1e-6,
                                   err_msg=f"sdf mismatch block {k}")
    inv = check_invariants(eng.table)
    assert all(int(v) == 0 for v in inv.values()), inv


def test_streaming_roundtrip_preserves_mesh():
    eng, intr = _small_engine(streaming=True)
    n = 9
    seq = make_sequence(n, intr=intr)
    for i in range(n):
        eng.process_frame(seq["depth"][i], seq["color"][i])
    eng._flush_pending()
    # page out everything, then back in at the original viewpoint
    far = np.eye(4, dtype=np.float32)
    far[:3, 3] = [50.0, 0, 0]
    eng.sift_world.append(far)
    eng._stream_update()
    assert len(eng.host_blocks) > 0
    eng.sift_world[-1] = np.asarray(seq["poses"][0])
    eng._stream_update()
    assert len(eng.host_blocks) == 0
    verts, _ = eng.extract_mesh()
    assert len(verts) > 1000
