"""Sensor layer + binary dump + depth-to-color calibrator tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from bundlefusion_tpu.geometry.camera import CameraIntrinsics
from bundlefusion_tpu.io.binary_dump import BinaryDump, load_binary_dump, write_binary_dump
from bundlefusion_tpu.io.sensors import (
    BinaryDumpSensor,
    KinectSensor,
    SensFileSensor,
    get_rgbd_sensor,
)
from bundlefusion_tpu.ops.image import reproject_depth_to_color

INTR = CameraIntrinsics(fx=100.0, fy=100.0, cx=40.0, cy=30.0, width=80, height=60)


def _k44(intr):
    K = np.eye(4, dtype=np.float32)
    K[0, 0], K[1, 1], K[0, 2], K[1, 2] = intr.fx, intr.fy, intr.cx, intr.cy
    return K


def test_binary_dump_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    N = 3
    depth = rng.uniform(0.5, 3.0, (N, 60, 80)).astype(np.float32)
    depth[0, 0, 0] = np.nan
    color = rng.integers(0, 255, (N, 60, 80, 4)).astype(np.uint8)
    traj = np.stack([np.eye(4, dtype=np.float32)] * N)
    dump = BinaryDump(
        intrinsic_depth=_k44(INTR), extrinsic_depth=np.eye(4, dtype=np.float32),
        intrinsic_color=_k44(INTR), extrinsic_color=np.eye(4, dtype=np.float32),
        depth=depth, color=color, trajectory=traj,
    )
    p = str(tmp_path / "seq.dump")
    write_binary_dump(p, dump)
    back = load_binary_dump(p)
    assert len(back) == N
    np.testing.assert_allclose(back.depth[1], depth[1], atol=1e-6)
    assert np.isnan(back.depth[0, 0, 0])
    np.testing.assert_array_equal(back.color, color)
    np.testing.assert_allclose(back.trajectory, traj)
    assert back.depth_intrinsics().fx == INTR.fx

    # via the sensor factory (sensor_idx=3, BinaryDumpReader)
    s = get_rgbd_sensor(3, p).create_first_connected()
    d, c, T = next(iter(s.frames()))
    assert d.shape == (60, 80) and c.shape == (60, 80, 3)


def test_sens_sensor_and_live_stubs(tmp_path):
    import os

    fixture = os.path.join(os.path.dirname(__file__), "fixtures", "tiny.sens")
    s = get_rgbd_sensor(8, fixture).create_first_connected()
    assert isinstance(s, SensFileSensor)
    assert len(s) == 12
    d, c, T = next(iter(s.frames()))
    assert d.shape == (120, 160) and T is not None

    with pytest.raises(RuntimeError, match="Kinect"):
        KinectSensor().create_first_connected()
    with pytest.raises(ValueError):
        get_rgbd_sensor(99)


def test_record_to_sens_roundtrip(tmp_path):
    import os

    fixture = os.path.join(os.path.dirname(__file__), "fixtures", "tiny.sens")
    s = get_rgbd_sensor(8, fixture).create_first_connected()
    out = str(tmp_path / "rec.sens")
    s.record_to_sens(out, max_frames=4)
    s2 = get_rgbd_sensor(8, out).create_first_connected()
    assert len(s2) == 4


def test_depth_to_color_reprojection():
    """Shift the color camera 5 cm along +x; a flat wall at z=2 must
    reproject to depth 2 with pixels shifted by fx*0.05/2 = 2.5 px."""
    depth = jnp.full((60, 80), 2.0, jnp.float32)
    T = np.eye(4, dtype=np.float32)
    T[0, 3] = -0.05  # depth cam -> color cam
    out = np.asarray(
        reproject_depth_to_color(depth, INTR, INTR, jnp.asarray(T))
    )
    mid = out[20:40, 20:60]
    assert np.isfinite(mid).all()
    np.testing.assert_allclose(mid, 2.0, atol=1e-3)
    # identity extrinsics must reproduce the depth map where defined
    out_id = np.asarray(
        reproject_depth_to_color(depth, INTR, INTR, jnp.eye(4))
    )
    np.testing.assert_allclose(out_id[5:-5, 5:-5], 2.0, atol=1e-3)
