"""Capacity-scale drift-correction / relocalization evidence (DRIFT_r05).

VERDICT r3 item 6: the hardest round-3 correctness run was 24 keyframes.
This harness runs >= 600 keyframes (reference capacity regime, submap 10)
over a multi-loop-closure trajectory with depth noise and TWO tracking
blackouts, and reports into DRIFT_r04.json:

  - chained (odometry-only) vs optimized ATE RMSE + improvement factor,
  - re-integration op counts (the on-the-fly surface re-integration
    machinery actually exercising at scale),
  - relocalization outcomes (lost keyframes, recovery after blackouts),
  - voxel-table invariants at the end (debugHash analog).

Input is rendered in SUBPROCESS shards (dev-tunnel h2d degradation: see
bench.py) at 320x240 to bound host/device memory; SIFT/integration run at
the same resolution (resolution is a correctness-neutral knob here — the
filter cascade + solver + re-integration machinery is what is being
stressed).

Usage: python scripts/drift_capacity.py [n_frames] [--fresh]
"""

import json
import os
import subprocess
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_cc")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.2")

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np  # noqa: E402

SHARD = 400


def shard_paths(n_frames, w, h, noise, blackouts, cache_dir):
    os.makedirs(cache_dir, exist_ok=True)
    paths = []
    for s0 in range(0, n_frames, SHARD):
        n = min(SHARD, n_frames - s0)
        paths.append((s0, n, os.path.join(
            cache_dir, f"drift_{n_frames}_{w}x{h}_{noise}_{s0}.npz")))
    return paths


def render_shards(paths, n_frames, w, h, noise, blackouts):
    script = os.path.join(ROOT, "scripts", "render_seq.py")
    for s0, n, p in paths:
        if os.path.exists(p):
            continue
        cmd = [sys.executable, script, p, str(n), str(w), str(h),
               "--traj", "multiloop", "--noise", str(noise),
               "--start", str(s0), "--full-n", str(n_frames)]
        # blackout ranges are global frame indices; render_seq clips to shard
        for b0, b1 in blackouts:
            if b0 < s0 + n and b1 > s0:
                cmd += ["--blackout", str(b0), str(b1)]
                break  # render_seq takes one blackout; shards are 400 frames
        print("render", p, flush=True)
        subprocess.run(cmd, check=True, capture_output=True)


def main():
    import jax

    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 6400

    from bundlefusion_tpu import AppConfig, BundlingConfig
    from bundlefusion_tpu.io.synthetic import default_intrinsics
    from bundlefusion_tpu.ops.sift import SiftConfig
    from bundlefusion_tpu.pipeline.online import BundleFusion
    from bundlefusion_tpu.tsdf.table import check_invariants
    from bundlefusion_tpu.utils.metrics import evaluate_ate_rmse

    platform = jax.devices()[0].platform
    w, h = 320, 240
    sub = 10
    G = n_frames // sub  # 640 keyframes at the default 6400
    noise = 0.005
    b0 = (int(n_frames * 0.35) // sub) * sub + 2
    b1 = (int(n_frames * 0.7) // sub) * sub + 2
    blackouts = [(b0, b0 + sub), (b1, b1 + sub)]

    cache_dir = os.path.expanduser("~/.cache/bfseq/drift")
    paths = shard_paths(n_frames, w, h, noise, blackouts, cache_dir)
    render_shards(paths, n_frames, w, h, noise, blackouts)

    intr = default_intrinsics(w, h)
    app = AppConfig(
        integration_width=w, integration_height=h,
        hash_num_sdf_blocks=131072, hash_key_capacity=131072,
        visible_blocks_cap=8192,
    )
    # Reference worst-case sizing: 25 * G*(G-1)/2 = 5.1M corrs at G=640
    # (SIFTImageManager.cpp:302). Loop-dense trajectories really do grow
    # corrs quadratically (every keyframe overlaps the anchor region):
    # a 131072 store filled at kf ~112, a 1M store at kf ~370 — and
    # comprehensive invalidation then killed every later keyframe (the
    # round-4 early runs' validity cliffs).
    # Round-5 sizing: pair budget >= the loop-dense pair count so the
    # solve drops ~nothing (VERDICT r4 item 2); the dense-LU reduced solve
    # + presort reuse keep the boundary bounded at this scale.
    bundling = BundlingConfig(
        width_sift=w, height_sift=h,
        max_global_corr=1 << 23,
        solver_max_pairs=262144,
        solver_max_working_corrs=1 << 22,
    )
    sift_cfg = SiftConfig(
        target_keys=150, min_scale=1.5,
        depth_min=app.sensor_depth_min, depth_max=app.sensor_depth_max,
    )
    eng = BundleFusion(intr, app, bundling, sift_cfg=sift_cfg, max_keyframes=G)

    # Pre-stage ALL input frames to HBM BEFORE the first engine program
    # runs (the RGBDFrameCacheRead prefetch analog; bench.py documents the
    # dev-tunnel h2d degradation that makes post-warmup uploads ~20-40x
    # slower). Wire format is ~0.4 MB/frame at 320x240 -> 2.4 GB at 6400.
    gt_poses = []
    handles = []
    t_up = time.perf_counter()
    for s0, n, p in paths:
        data = np.load(p)
        gt_poses.append(data["poses"])
        depths, colors = data["depth"], data["color"]
        for i in range(n):
            handles.append(eng.upload_frame(depths[i], colors[i]))
    jax.block_until_ready(handles)
    print(f"prestage_s={time.perf_counter() - t_up:.1f}", flush=True)

    t_compile = eng.warmup()
    print(f"compile_s={t_compile:.1f}", flush=True)

    t0 = time.perf_counter()
    done = 0
    for s0, n, p in paths:
        for i in range(n):
            eng.process_frame(handles[done])
            done += 1
        jax.block_until_ready(eng.table)
        el = time.perf_counter() - t0
        print(f"{done}/{n_frames} frames  {done/el:.1f} fps  "
              f"kf={eng.num_keyframes} lost={eng.lost_count} "
              f"reint_ops={eng.reint_ops_total}", flush=True)
    jax.block_until_ready((eng.local, eng.glob, eng.table))
    fps = done / (time.perf_counter() - t0)
    eng.finish(extra_solves=3)

    gt = np.concatenate(gt_poses)
    chained = np.stack(eng.sift_world)
    optimized = eng.trajectory()
    valid = np.isfinite(optimized).all((1, 2))

    ate_chained, _ = evaluate_ate_rmse(
        np.where(valid[:, None, None], chained[: len(valid)], np.nan), gt
    )
    ate_opt, n_o = evaluate_ate_rmse(optimized, gt)

    after = np.arange(len(valid)) >= blackouts[-1][1] + sub
    recovered = int((valid & after).sum())
    after_total = int(after.sum())
    inv = {k: int(v) for k, v in check_invariants(eng.table).items()}

    corr_count = int(eng.glob.corrs.count)
    corr_capacity = int(eng.glob.corrs.capacity)
    kv = np.asarray(eng.keyframe_valid[: eng.num_keyframes])
    lv = np.asarray(eng.glob.local_valid[: eng.num_keyframes])
    inval_runs = np.where(~valid)[0]
    out = {
        "corr_count": corr_count,
        "corr_capacity": corr_capacity,
        "corr_store_full": corr_count >= corr_capacity,
        "kf_valid": int(kv.sum()),
        "kf_invalid_idx_head": [int(x) for x in np.where(~kv)[0][:20]],
        "local_valid_frac": round(float(lv.mean()), 3),
        "first_invalid_frame": int(inval_runs[0]) if len(inval_runs) else -1,
        "platform": platform,
        "frames": n_frames,
        "keyframes": eng.num_keyframes,
        "keyframe_capacity": G,
        "fps": round(fps, 2),
        "blackouts": [list(b) for b in blackouts],
        "ate_chained_cm": round(float(ate_chained) * 100, 3),
        "ate_optimized_cm": round(float(ate_opt) * 100, 3),
        "improvement_x": round(float(ate_chained / max(ate_opt, 1e-9)), 2),
        "valid_frames": int(valid.sum()),
        "invalid_frames": int((~valid).sum()),
        "lost_keyframes": eng.lost_count,
        "recovered_frames_after_blackouts": [recovered, after_total],
        "reint_frames": eng.reint_frames,
        "reint_ops": eng.reint_ops_total,
        "pairs_dropped": eng.pairs_dropped_total,
        "invariants": inv,
        "compile_s": round(t_compile, 1),
    }
    with open(os.path.join(ROOT, "DRIFT_r05.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))
    assert all(v == 0 for v in inv.values()), inv
    assert out["improvement_x"] >= 5.0 or out["ate_optimized_cm"] <= 1.0, out


if __name__ == "__main__":
    main()
