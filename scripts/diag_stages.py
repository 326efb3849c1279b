"""Per-stage profiling of the per-frame loop with blocking sync per stage.

Measures real device time per stage (not async dispatch time) by forcing
block_until_ready after each stage. Slower than production (no overlap) but
shows where the budget goes.
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_cc")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.2")
import numpy as np
import jax
import jax.numpy as jnp

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

# wrap the engine's jitted programs with sync-timers
import collections
stage_tot = collections.defaultdict(float)
stage_cnt = collections.defaultdict(int)

def timed(name, fn):
    def wrap(*a, **k):
        t0 = time.perf_counter()
        out = fn(*a, **k)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        stage_tot[name] += dt
        stage_cnt[name] += 1
        return out
    return wrap

eng._frame_step = timed("frame_step", eng._frame_step)
eng._tsdf_fast = timed("tsdf_fast", eng._tsdf_fast)
eng._tsdf_rows = timed("tsdf_rows", eng._tsdf_rows)
eng._submap_step = timed("submap_step", eng._submap_step)
eng._gc = timed("gc", eng._gc)

warm = 24
for i in range(n_frames):
    if i == warm:
        for k in stage_tot: stage_tot[k] = 0.0
        for k in stage_cnt: stage_cnt[k] = 0
        t_timed = time.perf_counter()
    t0 = time.perf_counter()
    eng.process_frame(seq["depth"][i], seq["color"][i])
    jax.block_until_ready((eng.local, eng.glob, eng.table))
    if i >= warm:
        pass
elapsed = time.perf_counter() - t_timed
timed_frames = n_frames - warm
print(f"\n=== timed window: {timed_frames} frames, {elapsed:.2f}s, {1000*elapsed/timed_frames:.1f} ms/frame ===")
for name in sorted(stage_tot):
    tot, cnt = stage_tot[name], stage_cnt[name]
    print(f"{name:14s}: total {tot*1000:8.1f} ms  calls {cnt:3d}  avg {tot*1000/max(cnt,1):7.2f} ms  per-frame {tot*1000/timed_frames:7.2f} ms")
