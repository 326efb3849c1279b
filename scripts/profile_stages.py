"""Profile per-stage wall time of the bench workload on the current device."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_cc")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.2")

import numpy as np
import jax

from bundlefusion_tpu import AppConfig, BundlingConfig
from bundlefusion_tpu.io.synthetic import default_intrinsics, make_sequence
from bundlefusion_tpu.ops.sift import SiftConfig
from bundlefusion_tpu.pipeline.online import BundleFusion

n_frames = 48
intr = default_intrinsics(640, 480)
app = AppConfig(
    hash_num_sdf_blocks=131072,
    hash_key_capacity=131072,
    visible_blocks_cap=8192,
)
bundling = BundlingConfig(max_global_corr=16384)
sift_cfg = SiftConfig(
    target_keys=150, min_scale=bundling.min_key_scale,
    depth_min=app.sensor_depth_min, depth_max=app.sensor_depth_max,
)
seq = make_sequence(n_frames, intr=intr)
eng = BundleFusion(intr, app, bundling, sift_cfg=sift_cfg, max_keyframes=64)

warm = 26
for i in range(warm):
    eng.process_frame(seq["depth"][i], seq["color"][i])
# reset timing after warmup
from bundlefusion_tpu.utils.timing import TimingLog
eng.timing = TimingLog()

t0 = time.perf_counter()
for i in range(warm, n_frames):
    eng.process_frame(seq["depth"][i], seq["color"][i])
elapsed = time.perf_counter() - t0
print(f"total: {1000*elapsed/(n_frames-warm):.1f} ms/frame")
eng.timing.print_all_timings()
