"""Differential: prune rounds cost + solver/kernel changes."""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_cc")
import numpy as np
import jax
from bundlefusion_tpu import AppConfig, BundlingConfig
from bundlefusion_tpu.io.synthetic import default_intrinsics, make_sequence
from bundlefusion_tpu.ops.sift import SiftConfig
from bundlefusion_tpu.pipeline.online import BundleFusion

n_frames, warm = 72, 12
intr = default_intrinsics(640, 480)
sift_cfg = SiftConfig(target_keys=150, min_scale=3.0, depth_min=0.1, depth_max=4.0)
seq = make_sequence(n_frames, intr=intr)
app = AppConfig(hash_num_sdf_blocks=131072, hash_key_capacity=131072, visible_blocks_cap=8192)

def run(name, bundling, render=1):
    eng = BundleFusion(intr, app, bundling, sift_cfg=sift_cfg, max_keyframes=64)
    eng.render_every = render
    eng.warmup()
    handle = eng.upload_frame(seq["depth"][0], seq["color"][0])
    for i in range(warm):
        nxt = eng.upload_frame(seq["depth"][i+1], seq["color"][i+1])
        eng.process_frame(handle); handle = nxt
    jax.block_until_ready((eng.local, eng.glob, eng.table))
    t0 = time.perf_counter()
    for i in range(warm, n_frames):
        if i+1 < n_frames: nxt = eng.upload_frame(seq["depth"][i+1], seq["color"][i+1])
        eng.process_frame(handle); handle = nxt
    jax.block_until_ready((eng.local, eng.glob, eng.table))
    dt = (time.perf_counter()-t0)/(n_frames-warm)*1000
    print(f"{name:40s}: {dt:7.2f} ms/frame", flush=True)
    del eng

run("full (prune_rounds=3, render)", BundlingConfig(max_global_corr=16384))
run("prune_rounds=1", BundlingConfig(max_global_corr=16384, max_prune_rounds=1))
run("prune_rounds=1, no render", BundlingConfig(max_global_corr=16384, max_prune_rounds=1), render=0)
