"""Diagnose the driver bench: per-frame wall time with blocking sync each frame."""
import os, sys, time
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
intr = default_intrinsics(640, 480)
app = AppConfig(hash_num_sdf_blocks=131072, hash_key_capacity=131072, visible_blocks_cap=8192)
bundling = BundlingConfig(max_global_corr=16384)
sift_cfg = SiftConfig(target_keys=150, min_scale=bundling.min_key_scale,
                      depth_min=app.sensor_depth_min, depth_max=app.sensor_depth_max)

seq = make_sequence(n_frames, intr=intr)
eng = BundleFusion(intr, app, bundling, sift_cfg=sift_cfg, max_keyframes=64)

t_all = time.perf_counter()
for i in range(n_frames):
    t0 = time.perf_counter()
    eng.process_frame(seq["depth"][i], seq["color"][i])
    jax.block_until_ready((eng.local, eng.glob, eng.table))
    dt = (time.perf_counter() - t0) * 1000
    print(f"frame {i:3d}: {dt:9.1f} ms", flush=True)
print(f"total: {time.perf_counter()-t_all:.1f} s", flush=True)
