"""Per-frame wall-time trace of the exact bench workload + re-integration row counts."""
import os, sys, time
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

n_frames = 72
intr = default_intrinsics(640, 480)
app = AppConfig(hash_num_sdf_blocks=131072, hash_key_capacity=131072, visible_blocks_cap=8192)
bundling = BundlingConfig(max_global_corr=16384)
sift_cfg = SiftConfig(target_keys=150, min_scale=bundling.min_key_scale,
                      depth_min=app.sensor_depth_min, depth_max=app.sensor_depth_max)
seq = make_sequence(n_frames, intr=intr)
eng = BundleFusion(intr, app, bundling, sift_cfg=sift_cfg, max_keyframes=64)

# instrument reintegrate row scheduling
orig_rows = eng._build_reintegrate_rows
row_count = [0]
def counting_rows(*a, **k):
    rows = orig_rows(*a, **k)
    row_count[0] += len(rows[:5]) if rows else 0
    return rows
eng._build_reintegrate_rows = counting_rows

times = []
rows = []
for i in range(n_frames):
    rc0 = row_count[0]
    t0 = time.perf_counter()
    eng.process_frame(seq["depth"][i], seq["color"][i])
    times.append(time.perf_counter() - t0)
    rows.append(row_count[0] - rc0)
jax.block_until_ready((eng.local, eng.glob, eng.table))

for i, (t, r) in enumerate(zip(times, rows)):
    print(f"frame {i:3d}  {1000*t:9.1f} ms   reint_rows={r}")
w = 24
print(f"\nmean ms/frame [{w}:]: {1000*np.mean(times[w:]):.1f}")
print(f"total reint rows [{w}:]: {sum(rows[w:])} over {n_frames-w} frames")
