"""Per-program device timing + roofline report (VERDICT r2 item 5).

The reference instruments per-kernel device time with cudaEvents
(``SiftGPU/CUDATimer.h:1-121``); the TPU analog here times each fused
engine program with ``block_until_ready`` micro-timing on the real chip
and pairs it with XLA's compiled-program cost analysis (FLOPs + bytes
accessed) to report achieved GFLOP/s / GB/s against chip peaks and the
"speed-of-light" time  t_sol = max(flops/peak_flops, bytes/peak_bw).

Writes ROOFLINE.json:
  {program: {ms, flops, bytes, gflops_s, gb_s, sol_ms, frac_of_sol}, ...}
and prints the furthest-from-light program.

Run on the TPU box:  python scripts/roofline.py
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_cc")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.2")

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np  # noqa: E402


# chip peaks by platform (per chip). v5e ("v5 lite"): 197 bf16 TFLOP/s /
# ~98.3 f32-on-MXU; HBM 819 GB/s. CPU numbers are placeholders so the
# script stays runnable off-TPU.
PEAKS = {
    "tpu": {"flops": 98.3e12, "bw": 819e9},
    "cpu": {"flops": 1e11, "bw": 1e10},
}


def cost_of(jfn, *args, **kwargs):
    """(flops, bytes) from XLA cost analysis of the compiled program."""
    try:
        ca = jfn.lower(*args, **kwargs).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        bytes_ = float(ca.get("bytes accessed", 0.0))
        return flops, bytes_
    except Exception as e:  # pragma: no cover
        print(f"  cost_analysis failed: {e}", file=sys.stderr)
        return 0.0, 0.0


def time_it(fn, n=20):
    """Median wall ms of fn() with a full device drain per call."""
    import jax

    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) * 1e3)
    ts.sort()
    return ts[len(ts) // 2], out


def main():
    import jax
    import jax.numpy as jnp

    platform = jax.devices()[0].platform
    peaks = PEAKS.get(platform, PEAKS["cpu"])

    from bundlefusion_tpu import AppConfig, BundlingConfig
    from bundlefusion_tpu.io.synthetic import default_intrinsics, make_sequence
    from bundlefusion_tpu.ops.sift import SiftConfig
    from bundlefusion_tpu.pipeline.online import BundleFusion

    on_tpu = platform != "cpu"
    if on_tpu:
        intr = default_intrinsics(640, 480)
        app = AppConfig(
            hash_num_sdf_blocks=131072, hash_key_capacity=131072,
            visible_blocks_cap=8192,
        )
        bundling = BundlingConfig(max_global_corr=16384)
        sift_cfg = SiftConfig(
            target_keys=150, min_scale=bundling.min_key_scale,
            depth_min=app.sensor_depth_min, depth_max=app.sensor_depth_max,
        )
        G = 64
        n_frames = 46
    else:
        intr = default_intrinsics(160, 120)
        app = AppConfig(
            integration_width=80, integration_height=60, sdf_voxel_size=0.03,
            sdf_truncation=0.09, hash_num_sdf_blocks=8192,
            hash_key_capacity=16384, visible_blocks_cap=8192,
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
        G = 8
        n_frames = 9

    seq = make_sequence(n_frames, intr=intr)
    eng = BundleFusion(intr, app, bundling, sift_cfg=sift_cfg, max_keyframes=G)
    print(f"warmup (compile) ...", flush=True)
    t_compile = eng.warmup()
    print(f"compile_s={t_compile:.1f}")
    # drive to a realistic mid-sequence state (a few submaps retired)
    for i in range(n_frames):
        eng.process_frame(seq["depth"][i], seq["color"][i])
    jax.block_until_ready((eng.local, eng.glob, eng.table))

    # dispatch+sync floor: the TPU is reached through a runtime tunnel, so
    # every block_until_ready round trip pays ~tens of ms of latency that
    # is NOT device-execution time. Measured AFTER the engine drive — the
    # tunnel's dispatch path degrades once engine programs have run
    # (bench.py documents this), and the per-program timings below run in
    # exactly that degraded state, so the same floor must be subtracted
    # (the round-4 ROOFLINE measured 0.076 ms pre-degradation vs the
    # bench's 23.46 ms post — mutually inconsistent attributions).
    import jax.numpy as jnp_

    null_fn = jax.jit(lambda x: x + 1.0)
    x0 = jnp_.zeros((8,), jnp_.float32)
    null_fn(x0).block_until_ready()
    null_ms, _ = time_it(lambda: null_fn(x0), n=30)
    print(f"null (dispatch+sync RTT, post-drive) = {null_ms:.2f} ms", flush=True)

    sub_len = eng.S - 1
    f = n_frames
    cur_slot = f % sub_len
    store_slot = min(f, eng.frame_cap)
    depth_dev, color_dev = eng.upload_frame(seq["depth"][-1], seq["color"][-1])
    g = eng.num_keyframes

    report = {}

    def add(name, fn, cost_fn_args, n=20, amortize=None):
        """Measure fn (median of n) and XLA cost; report EXEC time with the
        dispatch+sync tunnel RTT (null_ms) subtracted — raw wall ms kept as
        raw_ms. All roofline ratios use exec time."""
        ms_raw, out = time_it(fn, n=n)
        ms = max(ms_raw - null_ms, 0.05)
        flops, bytes_ = cost_of(*cost_fn_args)
        sol_s = max(flops / peaks["flops"], bytes_ / peaks["bw"])
        report[name] = {
            "ms": round(ms, 3),
            "raw_ms": round(ms_raw, 3),
            "gflops": round(flops / 1e9, 3),
            "mbytes": round(bytes_ / 1e6, 3),
            "achieved_gflops_s": round(flops / ms / 1e6, 2) if ms else 0,
            "achieved_gb_s": round(bytes_ / ms / 1e6, 2) if ms else 0,
            "sol_ms": round(sol_s * 1e3, 3),
            "frac_of_sol": round(sol_s * 1e3 / ms, 4) if ms else 0,
        }
        if amortize:
            report[name]["amortized_ms_per_frame"] = round(ms / amortize, 3)
        print(f"{name:14s} {ms:8.3f} ms (raw {ms_raw:7.3f})  "
              f"sol={sol_s*1e3:7.3f} ms  "
              f"({100*sol_s*1e3/max(ms,1e-9):5.1f}% of light)  "
              f"{flops/1e9:8.2f} GF  {bytes_/1e6:8.1f} MB", flush=True)
        return out

    # frame_step: returns (local, store, T, valid); feed local/store back
    # (donated). Keep slot fixed — shapes/statics identical across calls.
    def fs():
        out = eng._frame_step(
            depth_dev, color_dev, eng.local, eng.store,
            eng.submap_base, eng._i32(cur_slot), eng._i32(store_slot),
        )
        eng.local, eng.store = out[0], out[1]
        return out

    out = add("frame_step", fs, (
        eng._frame_step, depth_dev, color_dev, eng.local, eng.store,
        eng.submap_base, eng._i32(cur_slot), eng._i32(store_slot),
    ))
    T_dev, valid_dev = out[2], out[3]

    # tsdf_fast (table donated; feed back)
    def tf():
        eng.table = eng._tsdf_fast(
            eng.table, eng.store, eng._i32(store_slot), T_dev, valid_dev
        )
        return eng.table

    add("tsdf_fast", tf, (
        eng._tsdf_fast, eng.table, eng.store, eng._i32(store_slot), T_dev,
        valid_dev,
    ))

    # tsdf_rows (R=5 re-integration rows + current frame)
    R = 5
    eye = np.eye(4, dtype=np.float32)
    packed = np.zeros((R, 34), np.float32)
    packed[:, 2:18] = eye.reshape(-1)
    packed[:, 18:34] = eye.reshape(-1)
    for i in range(R):
        packed[i, 0] = i + 1
        packed[i, 1] = 2
        packed[i, 2:18] = np.asarray(eng.sift_world[i + 1]).reshape(-1)
        packed[i, 18:34] = np.asarray(eng.sift_world[i + 1]).reshape(-1)
    packed_dev = jnp.asarray(packed)

    def tr():
        eng.table = eng._tsdf_rows(
            eng.table, eng.store, packed_dev, eng._i32(store_slot), T_dev,
            valid_dev,
        )
        return eng.table

    add("tsdf_rows", tr, (
        eng._tsdf_rows, eng.table, eng.store, packed_dev,
        eng._i32(store_slot), T_dev, valid_dev,
    ))

    # render (splat)
    add("render", lambda: eng._render(eng.table, T_dev),
        (eng._render, eng.table, T_dev))

    # submap_step (donates local/glob; feed back, g fixed)
    def ss():
        out = eng._submap_step(
            eng.local, eng.glob, eng.kf_valid_dev, eng._i32(g),
            eng.submap_base, T_dev,
        )
        eng.local, eng.glob = out[0], out[1]
        return out

    add("submap_step", ss, (
        eng._submap_step, eng.local, eng.glob, eng.kf_valid_dev,
        eng._i32(g), eng.submap_base, T_dev,
    ), n=8, amortize=sub_len)

    # per-frame accounting (exec times; RTT pipelines away in the frame loop)
    per_frame = (
        report["frame_step"]["ms"] + report["tsdf_fast"]["ms"]
        + report["render"]["ms"] + report["submap_step"]["ms"] / sub_len
    )
    report["_meta"] = {
        "platform": platform,
        "peak_flops": peaks["flops"],
        "peak_bw": peaks["bw"],
        "null_ms": round(null_ms, 3),
        "per_frame_ms_estimate": round(per_frame, 2),
        "note": "per_frame = frame_step + tsdf_fast + render + submap/sub_len"
                " (tsdf_rows replaces tsdf_fast only on re-integration"
                " frames); ms = raw_ms - null_ms (the dispatch+sync tunnel"
                " RTT, which pipelines away in the real frame loop)",
    }
    worst = min(
        (k for k in report if not k.startswith("_")),
        key=lambda k: report[k]["frac_of_sol"],
    )
    report["_meta"]["furthest_from_light"] = worst
    with open(os.path.join(ROOT, "ROOFLINE.json"), "w") as fh:
        json.dump(report, fh, indent=1)
    print(f"\nper-frame estimate: {per_frame:.2f} ms; furthest from light: "
          f"{worst} ({100*report[worst]['frac_of_sol']:.1f}%)")


if __name__ == "__main__":
    main()
