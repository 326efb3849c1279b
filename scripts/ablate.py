"""Steady-state stage attribution by ABLATION.

Serialized per-program timing through the device tunnel is polluted by
per-call dispatch overhead (argument marshalling of large state pytrees),
which overlaps away in the real async frame loop — so the only honest
steady-state attribution is differential: run the same timed loop with one
stage disabled and subtract.

Configs: full | no_render | no_tsdf | no_solve | frontend_only.
Writes ABLATION.json {config: {fps, ms_per_frame}, attribution_ms: {...}}.
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


def run_config(name, seq, n_frames, warmup_frames, make_engine):
    import dataclasses

    import jax

    eng = make_engine()
    # prestage inputs BEFORE warmup (bench.py: dev-tunnel h2d degradation)
    seq = dict(seq)
    seq["handles"] = [
        eng.upload_frame(seq["depth"][i], seq["color"][i])
        for i in range(n_frames)
    ]
    jax.block_until_ready(seq["handles"])
    eng.warmup()
    # post-init toggles only affect the host-side dispatch branches in
    # process_frame — the compiled programs are unchanged
    if name in ("no_tsdf", "frontend_only"):
        eng.app = dataclasses.replace(eng.app, integration_enabled=False)
    if name in ("no_render", "frontend_only"):
        eng.render_every = 0
    if name in ("no_solve", "frontend_only"):
        eng._dispatch_submap = lambda last_world_dev: False

    handles = seq["handles"]
    for i in range(warmup_frames):
        eng.process_frame(handles[i])
    jax.block_until_ready((eng.local, eng.glob, eng.table))
    t0 = time.perf_counter()
    for i in range(warmup_frames, n_frames):
        eng.process_frame(handles[i])
    jax.block_until_ready((eng.local, eng.glob, eng.table))
    dt = time.perf_counter() - t0
    timed = n_frames - warmup_frames
    return {"fps": round(timed / dt, 2), "ms_per_frame": round(1000 * dt / timed, 2),
            "reint_frames": eng.reint_frames, "reint_ops": eng.reint_ops_total}


def main():
    import jax

    platform = jax.devices()[0].platform
    on_tpu = platform != "cpu"

    from bundlefusion_tpu import AppConfig, BundlingConfig
    from bundlefusion_tpu.io.synthetic import default_intrinsics, make_sequence
    from bundlefusion_tpu.ops.sift import SiftConfig
    from bundlefusion_tpu.pipeline.online import BundleFusion

    if on_tpu:
        n_frames, warm = 72, 12
        intr = default_intrinsics(640, 480)
        app = AppConfig(hash_num_sdf_blocks=131072, hash_key_capacity=131072,
                        visible_blocks_cap=8192)
        bundling = BundlingConfig(max_global_corr=16384)
        sift_cfg = SiftConfig(target_keys=150, min_scale=bundling.min_key_scale,
                              depth_min=app.sensor_depth_min,
                              depth_max=app.sensor_depth_max)
        G = 64
    else:
        n_frames, warm = 13, 5
        intr = default_intrinsics(160, 120)
        app = AppConfig(integration_width=80, integration_height=60,
                        sdf_voxel_size=0.03, sdf_truncation=0.09,
                        hash_num_sdf_blocks=8192, hash_key_capacity=16384,
                        visible_blocks_cap=8192)
        bundling = BundlingConfig(width_sift=160, height_sift=120, submap_size=4,
                                  downsampled_width=40, downsampled_height=30,
                                  max_local_corr=2048, max_global_corr=8192,
                                  min_num_matches_local=4, min_num_matches_global=4)
        sift_cfg = SiftConfig(num_octaves=3, target_keys=96,
                              max_candidates_per_octave=256, min_scale=1.0,
                              dog_thresh=0.004)
        G = 8

    if on_tpu:
        from bench import seq_cached

        seq = seq_cached(n_frames, intr.width, intr.height)
    else:
        seq = make_sequence(n_frames, intr=intr)

    def make_engine():
        return BundleFusion(intr, app, bundling, sift_cfg=sift_cfg,
                            max_keyframes=G)

    configs = sys.argv[1:] or [
        "full", "no_render", "no_tsdf", "no_solve", "frontend_only"
    ]
    out = {}
    for name in configs:
        out[name] = run_config(name, seq, n_frames, warm, make_engine)
        print(name, out[name], flush=True)

    if "full" in out:
        full = out["full"]["ms_per_frame"]
        attr = {}
        for k in ("no_render", "no_tsdf", "no_solve"):
            if k in out:
                attr[k.replace("no_", "")] = round(full - out[k]["ms_per_frame"], 2)
        if "frontend_only" in out:
            attr["frontend_floor"] = out["frontend_only"]["ms_per_frame"]
        out["attribution_ms"] = attr
    out["_meta"] = {"platform": platform, "ms_full": out.get("full")}
    with open(os.path.join(ROOT, "ABLATION.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out.get("attribution_ms", {}), indent=1))


if __name__ == "__main__":
    main()
