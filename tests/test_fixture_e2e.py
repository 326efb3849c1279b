"""Real-data-path e2e: the committed tiny.sens fixture (JPEG color + zlib
depth, GT poses) driven through the full CLI — load, native batch depth
decode, engine run, shutdown sequence (mesh + trajectory writeback +
processed.txt), ATE check. Mirrors the reference's batch-mode contract
(FriedLiver.cpp:230-245 + StopScanningAndExit, DepthSensing.cpp:904-961)."""

import json
import os

import numpy as np
import pytest

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "tiny.sens")


def test_sens_fixture_loads_and_decodes():
    from bundlefusion_tpu.io.sens import load_sens

    data = load_sens(FIXTURE)
    assert len(data.frames) == 12
    assert data.depth_width == 160 and data.depth_height == 120
    d = data.decode_depth_batch(range(4))
    assert d.shape == (4, 120, 160)
    assert np.isfinite(d).mean() > 0.5
    c = data.decode_color(0)
    assert c.shape == (120, 160, 3)
    gt = data.gt_trajectory()
    assert np.isfinite(gt).all()


def test_cli_end_to_end_on_fixture(tmp_path):
    from bundlefusion_tpu.__main__ import main

    out = str(tmp_path)
    rc = main([FIXTURE, "--small", "--out", out])
    assert rc == 0
    verdict = json.loads(open(os.path.join(out, "processed.txt")).read())
    assert verdict["valid"]
    assert verdict["numValidOptTransforms"] >= 10
    assert verdict["ate_rmse_m"] < 0.06
    # shutdown artifacts: mesh + optimized-trajectory .sens
    assert os.path.exists(os.path.join(out, "tiny.ply"))
    out_sens = os.path.join(out, "tiny.sens")
    assert os.path.exists(out_sens)
    from bundlefusion_tpu.io.sens import load_sens

    reread = load_sens(out_sens)
    traj = reread.gt_trajectory()
    assert np.isfinite(traj).all(axis=(1, 2)).sum() >= 10
