import os

import numpy as np
import pytest

from bundlefusion_tpu.geometry.camera import CameraIntrinsics
from bundlefusion_tpu.io.sens import (
    encode_frames,
    load_sens,
    save_sens,
    write_trajectory,
)


@pytest.fixture
def tiny_sequence(rng):
    N, H, W = 3, 24, 32
    depth = rng.uniform(0.5, 3.0, (N, H, W)).astype(np.float32)
    depth[0, 0, 0] = np.nan
    # smooth color (JPEG handles random noise poorly; real images are smooth)
    yy, xx = np.meshgrid(np.linspace(0, 1, H), np.linspace(0, 1, W), indexing="ij")
    base = np.stack([xx, yy, 0.5 * (xx + yy)], -1).astype(np.float32)
    color = np.stack([np.clip(base + 0.1 * i, 0, 1) for i in range(N)])
    poses = np.tile(np.eye(4, dtype=np.float32), (N, 1, 1))
    poses[:, 0, 3] = np.arange(N) * 0.1
    intr = CameraIntrinsics(fx=30.0, fy=30.0, cx=15.5, cy=11.5, width=W, height=H)
    return depth, color, poses, intr


def test_sens_roundtrip(tmp_path, tiny_sequence):
    depth, color, poses, intr = tiny_sequence
    data = encode_frames(depth, color, poses, intr)
    p = str(tmp_path / "seq.sens")
    save_sens(p, data)
    back = load_sens(p)
    assert back.sensor_name == "bundlefusion_tpu"
    assert len(back.frames) == 3
    assert back.depth_width == 32 and back.color_height == 24
    ci = back.color_intrinsics()
    assert ci.fx == 30.0 and ci.cy == 11.5
    # depth decode: lossless through zlib uint16 (1mm quantization)
    d0 = back.decode_depth(0)
    valid = np.isfinite(depth[0])
    np.testing.assert_allclose(d0[valid], depth[0][valid], atol=1e-3)
    assert np.isnan(d0[0, 0])
    # color decode: JPEG lossy but close
    c0 = back.decode_color(0)
    assert c0.shape == (24, 32, 3)
    assert np.abs(c0 - color[0]).mean() < 0.1
    # GT trajectory preserved
    np.testing.assert_allclose(back.gt_trajectory(), poses, atol=1e-6)


def test_sens_write_trajectory(tmp_path, tiny_sequence):
    depth, color, poses, intr = tiny_sequence
    data = encode_frames(depth, color, poses, intr)
    p = str(tmp_path / "seq.sens")
    new_traj = poses.copy()
    new_traj[:, 1, 3] = 0.5
    new_traj[2] = np.nan  # invalid frame -> stored as -inf
    write_trajectory(p, data, new_traj)
    back = load_sens(p)
    traj = back.gt_trajectory()
    np.testing.assert_allclose(traj[:2], new_traj[:2], atol=1e-6)
    assert np.isnan(traj[2]).all()


def test_sens_max_frames(tmp_path, tiny_sequence):
    depth, color, poses, intr = tiny_sequence
    data = encode_frames(depth, color, poses, intr)
    p = str(tmp_path / "seq.sens")
    save_sens(p, data)
    back = load_sens(p, max_frames=2)
    assert len(back.frames) == 2


def test_tum_reader(tmp_path, rng):
    import cv2

    root = tmp_path / "tum"
    (root / "depth").mkdir(parents=True)
    (root / "rgb").mkdir()
    dlines, rlines, glines = [], [], []
    for i in range(3):
        t = 100.0 + i * 0.033
        d = (rng.uniform(0.5, 3.0, (24, 32)) * 5000).astype(np.uint16)
        cv2.imwrite(str(root / "depth" / f"{t:.6f}.png"), d)
        c = (rng.uniform(0, 1, (24, 32, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(root / "rgb" / f"{t:.6f}.png"), c)
        dlines.append(f"{t:.6f} depth/{t:.6f}.png")
        rlines.append(f"{t:.6f} rgb/{t:.6f}.png")
        glines.append(f"{t:.6f} {0.1*i:.3f} 0 0 0 0 0 1")
    (root / "depth.txt").write_text("# header\n" + "\n".join(dlines))
    (root / "rgb.txt").write_text("\n".join(rlines))
    (root / "groundtruth.txt").write_text("\n".join(glines))

    from bundlefusion_tpu.io.tum import load_tum

    seq = load_tum(str(root))
    assert len(seq) == 3
    depth, color, pose = seq.frame(1)
    assert depth.shape == (24, 32)
    assert color.shape == (24, 32, 3)
    assert pose is not None
    np.testing.assert_allclose(pose[0, 3], 0.1, atol=1e-6)
