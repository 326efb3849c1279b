"""Surface-splat renderer tests: depth/color accuracy vs the synthetic GT
and contract parity with the gather-based raycaster."""

import jax.numpy as jnp
import numpy as np
import pytest

from bundlefusion_tpu.io.synthetic import (
    default_intrinsics,
    default_scene,
    render_frame,
)
from bundlefusion_tpu.tsdf.integrate import TsdfParams, integrate
from bundlefusion_tpu.tsdf.splat import SplatParams, splat_render
from bundlefusion_tpu.tsdf.table import create_table

W, H = 80, 60
INTR = default_intrinsics(W, H)
PARAMS = TsdfParams(voxel_size=0.04, truncation=0.12, truncation_scale=0.02)
SPLAT = SplatParams(visible_cap=4096)


@pytest.fixture(scope="module")
def fused():
    d, c = render_frame(default_scene(), INTR, jnp.eye(4))
    t = create_table(8192, 4096)
    t = integrate(t, d, c, INTR, jnp.eye(4), PARAMS, cap=4096)
    return t, np.asarray(d), np.asarray(c)


def test_splat_depth_matches_gt(fused):
    t, d_gt, _ = fused
    out = splat_render(t, INTR, jnp.eye(4), PARAMS, SPLAT)
    d = np.asarray(out["depth"])
    hit = np.isfinite(d) & np.isfinite(d_gt)
    # hits cover most of the observed surface
    assert hit.sum() > 0.5 * np.isfinite(d_gt).sum()
    err = np.abs(d[hit] - d_gt[hit])
    # median within ~a voxel, no gross misprojection
    assert np.median(err) < 1.5 * PARAMS.voxel_size
    assert np.percentile(err, 90) < 4 * PARAMS.voxel_size


def test_splat_color_and_normals(fused):
    t, d_gt, c_gt = fused
    out = splat_render(t, INTR, jnp.eye(4), PARAMS, SPLAT)
    d = np.asarray(out["depth"])
    col = np.asarray(out["color"])
    nrm = np.asarray(out["normals"])
    hit = np.isfinite(d)
    assert np.isfinite(col[hit]).all()
    assert (col[hit] >= 0).all() and (col[hit] <= 1).all()
    # color should resemble the integrated frame where both defined
    both = hit & np.isfinite(c_gt).all(-1)
    if both.sum() > 100:
        diff = np.abs(col[both] - c_gt[both]).mean()
        assert diff < 0.2
    # normals unit where finite
    fn = np.isfinite(nrm).all(-1)
    if fn.any():
        norms = np.linalg.norm(nrm[fn], axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-3)


def test_splat_from_offset_pose(fused):
    """Rendering from a shifted pose still lands near the GT render."""
    t, _, _ = fused
    pose = np.eye(4, dtype=np.float32)
    pose[0, 3] = 0.05
    d_gt2, _ = render_frame(default_scene(), INTR, jnp.asarray(pose))
    out = splat_render(t, INTR, jnp.asarray(pose), PARAMS, SPLAT)
    d = np.asarray(out["depth"])
    d_gt2 = np.asarray(d_gt2)
    hit = np.isfinite(d) & np.isfinite(d_gt2)
    assert hit.sum() > 500
    assert np.median(np.abs(d[hit] - d_gt2[hit])) < 2 * PARAMS.voxel_size


def test_splat_empty_table():
    t = create_table(1024, 512)
    out = splat_render(t, INTR, jnp.eye(4), PARAMS, SplatParams(visible_cap=512))
    assert not np.isfinite(np.asarray(out["depth"])).any()
