import jax.numpy as jnp
import numpy as np
import pytest

from bundlefusion_tpu.geometry.camera import CameraIntrinsics
from bundlefusion_tpu.io.synthetic import (
    default_intrinsics,
    default_scene,
    render_frame,
)
from bundlefusion_tpu.tsdf.integrate import (
    TsdfParams,
    deintegrate,
    integrate,
)
from bundlefusion_tpu.tsdf.raycast import RaycastParams, raycast
from bundlefusion_tpu.tsdf.table import check_invariants, create_table, num_occupied

W, H = 80, 60
INTR = default_intrinsics(W, H)
PARAMS = TsdfParams(voxel_size=0.04, truncation=0.12, truncation_scale=0.02)
CAP = 8192
NBLOCKS = 4096
VIS_CAP = 4096


def render_pose(pose):
    d, c = render_frame(default_scene(), INTR, jnp.asarray(pose, jnp.float32))
    return d, c


@pytest.fixture(scope="module")
def frame0():
    return render_pose(np.eye(4, dtype=np.float32))


def test_synthetic_render(frame0):
    d, c = frame0
    d = np.asarray(d)
    valid = np.isfinite(d)
    assert valid.mean() > 0.5
    assert np.nanmin(d) > 0.3
    assert np.nanmax(d) < 12.0


def test_integrate_creates_blocks(frame0):
    d, c = frame0
    t = create_table(CAP, NBLOCKS)
    t = integrate(t, d, c, INTR, jnp.eye(4), PARAMS, cap=VIS_CAP)
    n = int(num_occupied(t))
    assert n > 50
    assert int(t.num_alloc_failures) == 0
    assert all(v == 0 for v in check_invariants(t).values())
    # voxels near the surface should carry weight
    assert float(jnp.sum(t.weight)) > 100.0


def test_integrate_deintegrate_inverse(frame0):
    """De-integration must exactly cancel integration (the key BundleFusion
    property enabling re-integration)."""
    d, c = frame0
    t = create_table(CAP, NBLOCKS)
    t = integrate(t, d, c, INTR, jnp.eye(4), PARAMS, cap=VIS_CAP)
    sdf0, w0, c0 = np.asarray(t.sdf).copy(), np.asarray(t.weight).copy(), np.asarray(t.color).copy()
    # integrate a second frame at a slightly different pose, then remove it
    pose2 = np.eye(4, dtype=np.float32)
    pose2[0, 3] = 0.05
    d2, c2 = render_pose(pose2)
    t = integrate(t, d2, c2, INTR, jnp.asarray(pose2), PARAMS, cap=VIS_CAP)
    t = deintegrate(t, d2, c2, INTR, jnp.asarray(pose2), PARAMS, cap=VIS_CAP)
    n = t.num_blocks  # exclude the dummy payload row (garbage by design)
    w1 = np.asarray(t.weight)[:n]
    sdf1 = np.asarray(t.sdf)[:n]
    c1 = np.asarray(t.color)[:n]
    w0, sdf0, c0 = w0[:n], sdf0[:n], c0[:n]
    np.testing.assert_allclose(w1, w0, atol=1e-4)
    # where weight > 0, sdf must match
    m = w0 > 0
    np.testing.assert_allclose(sdf1[m], sdf0[m], atol=1e-3)
    mc = np.tile(m, (1, 3))  # color is [N, 3*V] channel-major
    np.testing.assert_allclose(c1[mc], c0[mc], atol=1e-3)


def test_raycast_roundtrip(frame0):
    """Integrate GT depth from several poses, raycast back from the first
    pose, and compare rendered depth against GT."""
    t = create_table(CAP, NBLOCKS)
    poses = []
    for i in range(3):
        p = np.eye(4, dtype=np.float32)
        p[0, 3] = 0.03 * i
        poses.append(p)
    for p in poses:
        d, c = render_pose(p)
        t = integrate(t, d, c, INTR, jnp.asarray(p), PARAMS, cap=VIS_CAP)
    out = raycast(
        t,
        INTR,
        jnp.asarray(poses[0]),
        PARAMS,
        RaycastParams(grid_dim=64, depth_max=4.0),
    )
    d_gt = np.asarray(render_pose(poses[0])[0])
    d_rc = np.asarray(out["depth"])
    both = np.isfinite(d_gt) & np.isfinite(d_rc) & (d_gt < 3.0)
    # most GT pixels within range should be hit
    gt_near = np.isfinite(d_gt) & (d_gt < 3.0)
    hit_rate = both.sum() / max(gt_near.sum(), 1)
    assert hit_rate > 0.85, hit_rate
    err = np.abs(d_rc[both] - d_gt[both])
    assert np.median(err) < PARAMS.voxel_size, np.median(err)
    # normals and colors exist where depth does
    n = np.asarray(out["normals"])
    assert np.isfinite(n[both]).all() or np.isfinite(n).any()


def test_deintegrate_then_gc_empties(frame0):
    from bundlefusion_tpu.tsdf.table import garbage_collect

    d, c = frame0
    t = create_table(CAP, NBLOCKS)
    t = integrate(t, d, c, INTR, jnp.eye(4), PARAMS, cap=VIS_CAP)
    t = deintegrate(t, d, c, INTR, jnp.eye(4), PARAMS, cap=VIS_CAP)
    assert float(jnp.max(t.weight)) == 0.0
    t = garbage_collect(t)
    assert int(num_occupied(t)) == 0
    assert all(v == 0 for v in check_invariants(t).values())


def test_raycast_reaches_far_geometry():
    """The offline raycaster must render ANY allocated region within the
    depth range, like the reference's interval splatting
    (CUDARayCastSDF.cu:101-190): the local block grid auto-sizes to the
    frustum, so a wall 7 m out (far beyond the old camera-centered 64-96
    block span at this voxel size) is still hit."""
    far_params = TsdfParams(
        voxel_size=0.01, truncation=0.06, truncation_scale=0.02,
        depth_max=10.0, max_integration_distance=10.0,
    )
    # wall patch at 7 m: with 1 cm voxels (8 cm blocks) the OLD fixed
    # 96-block camera-centered grid spanned only +-3.84 m and missed it.
    # 320x240 keeps the 7 m pixel footprint (~2.5 cm) below the block size
    # so the alloc DDA covers the patch densely.
    wf, hf = 320, 240
    intr_f = default_intrinsics(wf, hf)
    d = jnp.full((hf, wf), jnp.nan, jnp.float32)
    d = d.at[hf // 2 - 20 : hf // 2 + 20, wf // 2 - 20 : wf // 2 + 20].set(7.0)
    c = jnp.full((hf, wf, 3), 0.5, jnp.float32)
    t = create_table(CAP, NBLOCKS)
    t = integrate(t, d, c, intr_f, jnp.eye(4), far_params, cap=VIS_CAP)
    assert int(num_occupied(t)) > 100
    out = raycast(
        t, intr_f, jnp.eye(4), far_params,
        RaycastParams(depth_min=0.1, depth_max=9.0),
    )
    d_rc = np.asarray(out["depth"])
    ctr = d_rc[hf // 2 - 15 : hf // 2 + 15, wf // 2 - 15 : wf // 2 + 15]
    assert np.isfinite(ctr).mean() > 0.5, np.isfinite(ctr).mean()
    err = np.abs(ctr[np.isfinite(ctr)] - 7.0)
    assert np.median(err) < 3 * far_params.voxel_size, np.median(err)
