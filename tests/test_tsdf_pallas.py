"""Pallas integrate kernel vs the pure-XLA twin (interpret mode on CPU).

The Pallas kernel (``tsdf/integrate_pallas.py``) is the TPU hot path for
``integrateDepthMapKernel``-equivalent fusion; the XLA formulation in
``tsdf/integrate.py`` is its behavioral oracle. Any divergence beyond float
noise is a kernel bug.
"""

import jax
import jax.numpy as jnp
import numpy as np

from bundlefusion_tpu.io.synthetic import default_intrinsics, default_scene, render_frame
from bundlefusion_tpu.tsdf.integrate import (
    TsdfParams,
    allocate_for_frame,
    integrate_frame,
    visible_block_indices,
)
from bundlefusion_tpu.tsdf.integrate_pallas import integrate_frame_pallas
from bundlefusion_tpu.tsdf.table import create_table

W, H = 80, 60
INTR = default_intrinsics(W, H)
PARAMS = TsdfParams(voxel_size=0.04, truncation=0.12, truncation_scale=0.02)
VIS_CAP = 1024


def _setup(pose=np.eye(4, dtype=np.float32)):
    d, c = render_frame(default_scene(), INTR, jnp.asarray(pose))
    t = create_table(4096, 2048)
    t = allocate_for_frame(t, d, INTR, jnp.asarray(pose), PARAMS)
    vis, cnt = visible_block_indices(t, INTR, jnp.asarray(pose), PARAMS, VIS_CAP)
    assert int(cnt) > 10
    return t, d, c, vis


def _assert_close(a, b, atol, allow_frac=2e-5):
    """Equal within atol except for a tiny fraction of voxels: projected
    coordinates that land exactly on a pixel-rounding boundary may resolve
    to different pixels in the two implementations' float paths."""
    a = np.asarray(a)
    b = np.asarray(b)
    bad = np.abs(a - b) > atol
    frac = bad.mean()
    assert frac <= allow_frac, f"{bad.sum()} / {bad.size} mismatched ({frac:.2e})"


def _compare(sign):
    pose = jnp.eye(4)
    t, d, c, vis = _setup()
    if sign < 0:
        # integrate first so de-integration has something to remove
        t = integrate_frame(t, d, c, INTR, pose, PARAMS, vis, 1.0)
    t_x = integrate_frame(t, d, c, INTR, pose, PARAMS, vis, sign)
    t_p = integrate_frame_pallas(t, d, c, INTR, pose, PARAMS, vis, sign, interpret=True)
    n = t.num_blocks  # exclude the dummy row (holds garbage by design)
    _assert_close(t_x.sdf[:n], t_p.sdf[:n], atol=1e-5)
    _assert_close(t_x.weight[:n], t_p.weight[:n], atol=1e-6)
    _assert_close(t_x.color[:n], t_p.color[:n], atol=1e-5)
    assert float(jnp.sum(t_p.weight[:n])) > (0.0 if sign < 0 else 10.0)


def test_pallas_integrate_matches_xla():
    _compare(1.0)


def test_pallas_deintegrate_matches_xla():
    _compare(-1.0)


def test_pallas_integrate_offset_pose():
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [0.05, -0.03, -0.1]
    t, d, c, vis = _setup(pose)
    t_x = integrate_frame(t, d, c, INTR, jnp.asarray(pose), PARAMS, vis, 1.0)
    t_p = integrate_frame_pallas(
        t, d, c, INTR, jnp.asarray(pose), PARAMS, vis, 1.0, interpret=True
    )
    n = t.num_blocks
    _assert_close(t_x.sdf[:n], t_p.sdf[:n], atol=1e-5)
    _assert_close(t_x.weight[:n], t_p.weight[:n], atol=1e-6)
