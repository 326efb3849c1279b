"""SiftVisualization-analog smoke tests (utils/visualization.py wired)."""

import numpy as np

from bundlefusion_tpu.utils.visualization import (
    depth_to_color,
    draw_keypoints,
    draw_matches,
    matches_to_pointcloud_ply,
    normals_to_color,
    save_image,
)


def test_overlays_and_images(tmp_path):
    rng = np.random.default_rng(0)
    color = rng.uniform(0, 1, (60, 80, 3)).astype(np.float32)
    pos = rng.uniform(0, 60, (12, 2)).astype(np.float32)
    valid = np.ones(12, bool)
    img = draw_keypoints(color, pos, valid, scale=np.full(12, 3.0))
    assert img.shape == (60, 80, 3) and img.dtype == np.uint8

    canvas = draw_matches(color, color, pos, pos, valid)
    assert canvas.shape == (60, 160, 3)

    d = rng.uniform(0.5, 3.0, (60, 80)).astype(np.float32)
    d[0, 0] = np.nan
    dc = depth_to_color(d)
    assert dc.shape == (60, 80, 3) and (dc[0, 0] == 0).all()

    n = rng.normal(size=(60, 80, 3)).astype(np.float32)
    nc = normals_to_color(n / np.linalg.norm(n, axis=-1, keepdims=True))
    assert nc.shape == (60, 80, 3)

    save_image(str(tmp_path / "x.png"), img)
    assert (tmp_path / "x.png").exists()

    p = rng.uniform(-1, 1, (12, 3)).astype(np.float32)
    matches_to_pointcloud_ply(str(tmp_path / "m.ply"), p, p + 0.01, valid)
    assert (tmp_path / "m.ply").stat().st_size > 100
