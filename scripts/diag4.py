"""Differential stage costing: run the engine with stages toggled and
compare steady-state wall ms/frame (aggregate wall time is the only
trustworthy clock through the axon relay)."""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_cc")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.2")
import numpy as np
import jax

from bundlefusion_tpu import AppConfig, BundlingConfig
from bundlefusion_tpu.io.synthetic import default_intrinsics, make_sequence
from bundlefusion_tpu.ops.sift import SiftConfig
from bundlefusion_tpu.pipeline.online import BundleFusion

n_frames = 72
warm = 12
intr = default_intrinsics(640, 480)
bundling = BundlingConfig(max_global_corr=16384)
sift_cfg = SiftConfig(target_keys=150, min_scale=bundling.min_key_scale,
                      depth_min=0.1, depth_max=4.0)
seq = make_sequence(n_frames, intr=intr)


def run(name, app, render_every=None, pipelined=True):
    eng = BundleFusion(intr, app, bundling, sift_cfg=sift_cfg, max_keyframes=64)
    if render_every is not None:
        eng.render_every = render_every
    eng.warmup()
    handle = eng.upload_frame(seq["depth"][0], seq["color"][0])
    for i in range(warm):
        nxt = eng.upload_frame(seq["depth"][i + 1], seq["color"][i + 1])
        eng.process_frame(handle)
        handle = nxt
    jax.block_until_ready((eng.local, eng.glob, eng.table))
    t0 = time.perf_counter()
    for i in range(warm, n_frames):
        if pipelined:
            if i + 1 < n_frames:
                nxt = eng.upload_frame(seq["depth"][i + 1], seq["color"][i + 1])
            eng.process_frame(handle)
            handle = nxt
        else:
            eng.process_frame(seq["depth"][i], seq["color"][i])
    jax.block_until_ready((eng.local, eng.glob, eng.table))
    dt = (time.perf_counter() - t0) / (n_frames - warm) * 1000
    print(f"{name:44s}: {dt:7.2f} ms/frame", flush=True)
    del eng
    return dt


base_app = AppConfig(hash_num_sdf_blocks=131072, hash_key_capacity=131072,
                     visible_blocks_cap=8192)

full = run("full (render+tsdf, pipelined upload)", base_app)
run("no render", base_app, render_every=0)
run("no render, no reintegration", AppConfig(
    hash_num_sdf_blocks=131072, hash_key_capacity=131072,
    visible_blocks_cap=8192, min_pose_dist_sqrt=1e9), render_every=0)
run("no render, no tsdf at all", AppConfig(
    hash_num_sdf_blocks=131072, hash_key_capacity=131072,
    visible_blocks_cap=8192, integration_enabled=False), render_every=0)
run("full, sequential upload", base_app, pipelined=False)
