"""Benchmark: end-to-end frames/s per chip + ATE RMSE on a synthetic sequence.

Run on the real TPU by the driver. Prints ONE JSON line:
  {"metric": ..., "value": fps, "unit": "frames/s", "vs_baseline": fps/30, ...}

Baseline: the reference BundleFusion targets 30 Hz real-time on two desktop
GPUs (BASELINE.md); vs_baseline is measured fps / 30.

The workload mirrors the reference's default operating point (BASELINE.md):
640x480 input & SIFT, 320x240 integration, submap size 10, ~150 features
per frame, 1 cm voxels — on a synthetic scene rendered with ground-truth
poses so ATE RMSE is measured in the same run.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_cc")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.2")

import numpy as np


def main():
    import jax

    platform = jax.devices()[0].platform
    on_tpu = platform not in ("cpu",)

    from bundlefusion_tpu import AppConfig, BundlingConfig
    from bundlefusion_tpu.io.synthetic import default_intrinsics, make_sequence
    from bundlefusion_tpu.ops.sift import SiftConfig
    from bundlefusion_tpu.pipeline.online import BundleFusion
    from bundlefusion_tpu.utils.metrics import evaluate_ate_rmse

    if on_tpu:
        # reference operating point
        n_frames = 72
        intr = default_intrinsics(640, 480)
        app = AppConfig(
            hash_num_sdf_blocks=131072,
            hash_key_capacity=131072,
            # in-frustum blocks at 1 cm voxels / 4 m range stay well under
            # this; oversizing directly pads the integrate kernel's work
            visible_blocks_cap=8192,
        )
        # right-size the corr-store capacity for the 64-keyframe run: the
        # solver's per-iteration work scales with capacity, not live count
        bundling = BundlingConfig(max_global_corr=16384)
        sift_cfg = SiftConfig(
            target_keys=150, min_scale=bundling.min_key_scale,
            depth_min=app.sensor_depth_min, depth_max=app.sensor_depth_max,
        )
        max_keyframes = 64
        # warmup must reach past the first global solve + re-integration
        # (first triggered around frame 19) so every program is compiled
        # before the timed window
        warmup_frames = 24
    else:
        # CPU smoke config (2-core CI box)
        n_frames = 13
        intr = default_intrinsics(160, 120)
        app = AppConfig(
            integration_width=80, integration_height=60,
            sdf_voxel_size=0.03, sdf_truncation=0.09,
            hash_num_sdf_blocks=8192, hash_key_capacity=16384,
            visible_blocks_cap=8192,
        )
        bundling = BundlingConfig(
            width_sift=160, height_sift=120, submap_size=4,
            downsampled_width=40, downsampled_height=30,
            max_local_corr=2048, max_global_corr=8192,
            min_num_matches_local=4, min_num_matches_global=4,
        )
        sift_cfg = SiftConfig(
            num_octaves=3, target_keys=96, max_candidates_per_octave=256,
            min_scale=1.0, dog_thresh=0.004,
        )
        max_keyframes = 8
        warmup_frames = 5

    seq = make_sequence(n_frames, intr=intr)
    eng = BundleFusion(intr, app, bundling, sift_cfg=sift_cfg, max_keyframes=max_keyframes)

    # warmup: drives all compiles (detection, matching, filters, solves,
    # integrate, re-integrate)
    for i in range(warmup_frames):
        eng.process_frame(seq["depth"][i], seq["color"][i])

    t0 = time.perf_counter()
    for i in range(warmup_frames, n_frames):
        eng.process_frame(seq["depth"][i], seq["color"][i])
    jax.block_until_ready((eng.local, eng.glob, eng.table))  # drain in-flight work
    elapsed = time.perf_counter() - t0
    timed = n_frames - warmup_frames
    fps = timed / elapsed

    eng.finish(extra_solves=2)
    traj = eng.trajectory()
    rmse, n_valid = evaluate_ate_rmse(traj, seq["poses"][: len(traj)])

    out = {
        "metric": "frames_per_second_per_chip",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 4),
        "ate_rmse_cm": round(rmse * 100, 3),
        "valid_frames": int(n_valid),
        "total_frames": n_frames,
        "platform": platform,
        "ms_per_frame": round(1000.0 * elapsed / timed, 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
