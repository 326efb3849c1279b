"""Micro-benchmark each jitted sub-stage of the per-frame pipeline on-device."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_cc")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.2")

import numpy as np
import jax
import jax.numpy as jnp

from bundlefusion_tpu import AppConfig, BundlingConfig
from bundlefusion_tpu.io.synthetic import default_intrinsics, make_sequence
from bundlefusion_tpu.ops.sift import SiftConfig, detect_and_describe
from bundlefusion_tpu.ops.image import erode_depth, resample_bilinear, resample_nearest, rgb_to_intensity
from bundlefusion_tpu.pipeline.online import BundleFusion


def timeit(name, fn, n=5):
    jax.block_until_ready(fn())  # warm/compile
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:44s} {1000*dt:9.2f} ms")
    return out


intr = default_intrinsics(640, 480)
app = AppConfig(hash_num_sdf_blocks=131072, hash_key_capacity=131072, visible_blocks_cap=8192)
bundling = BundlingConfig(max_global_corr=16384)
sift_cfg = SiftConfig(target_keys=150, min_scale=bundling.min_key_scale,
                      depth_min=app.sensor_depth_min, depth_max=app.sensor_depth_max)
seq = make_sequence(24, intr=intr)
eng = BundleFusion(intr, app, bundling, sift_cfg=sift_cfg, max_keyframes=64)
for i in range(22):
    eng.process_frame(seq["depth"][i], seq["color"][i])
jax.block_until_ready((eng.local, eng.table, eng.store))

d16, c8 = eng._to_wire(seq["depth"][22], seq["color"][22])
d16, c8 = jnp.asarray(d16), jnp.asarray(c8)

# full frame_step (no donation side effects: pass copies)
import copy
def run_frame():
    return eng._frame_step(d16, c8, jax.tree.map(jnp.copy, eng.local),
                           jax.tree.map(jnp.copy, eng.table), jax.tree.map(jnp.copy, eng.store),
                           eng.submap_base, jnp.asarray(5, jnp.int32), jnp.asarray(22, jnp.int32))
timeit("frame_step (full)", run_frame, n=3)

# decode+preprocess
@jax.jit
def prep(d16, c8):
    depth = jnp.where(d16 > 0, d16.astype(jnp.float32) * 1e-3, jnp.nan)
    color = c8.astype(jnp.float32) / 255.0
    d = erode_depth(erode_depth(depth))
    i = rgb_to_intensity(color)
    return (resample_bilinear(i, eng.intr_sift.height, eng.intr_sift.width),
            resample_nearest(d, eng.intr_sift.height, eng.intr_sift.width),
            resample_nearest(d, eng.intr_int.height, eng.intr_int.width),
            resample_bilinear(color, eng.intr_int.height, eng.intr_int.width))
out = timeit("preprocess (erode+resample)", lambda: prep(d16, c8))
intensity_sift, depth_sift, depth_int, color_int = out

timeit("sift detect_and_describe", lambda: detect_and_describe(intensity_sift, depth_sift, eng.sift_cfg))

from bundlefusion_tpu.pipeline.frames import store_cache_frame, store_keypoints
kp = detect_and_describe(intensity_sift, depth_sift, eng.sift_cfg)
timeit("store cache frame", lambda: store_cache_frame(jax.tree.map(jnp.copy, eng.local.cache), 5, depth_int, color_int, eng.intr_cache))

from bundlefusion_tpu.pipeline.frontend import match_and_filter, add_to_residuals, chained_sift_transform
timeit("local match_and_filter (S=11)", lambda: match_and_filter(
    jnp.asarray(5), eng.local.keys, eng.local.cache, eng.intr_sift, eng.intr_cache, eng.frontend_local))

# TSDF pieces
from bundlefusion_tpu.tsdf.integrate import allocate_for_frame, visible_block_indices, integrate_frame, _use_pallas
T = jnp.eye(4, dtype=jnp.float32)
tp, cap = eng.tsdf_params, eng.vis_cap
tab0 = jax.tree.map(jnp.copy, eng.table)
timeit("tsdf allocate_for_frame", lambda: allocate_for_frame(jax.tree.map(jnp.copy, eng.table), depth_int, eng.intr_int, T, tp))
tab1 = allocate_for_frame(jax.tree.map(jnp.copy, eng.table), depth_int, eng.intr_int, T, tp)
timeit("tsdf visible_block_indices", lambda: visible_block_indices(tab1, eng.intr_int, T, tp, cap))
vis, _ = visible_block_indices(tab1, eng.intr_int, T, tp, cap)
if _use_pallas():
    from bundlefusion_tpu.tsdf.apply_pallas import apply_tsdf_ops  # noqa: F401
    timeit("tsdf integrate_frame_pallas", lambda: integrate_frame_pallas(
        jax.tree.map(jnp.copy, tab1), depth_int, color_int, eng.intr_int, T, tp, vis, 1.0))
timeit("tsdf integrate_frame (XLA)", lambda: integrate_frame(
    jax.tree.map(jnp.copy, tab1), depth_int, color_int, eng.intr_int, T, tp, vis, 1.0))

# one reintegrate op (de+re)
fidx = jnp.zeros((10,), jnp.int32).at[0].set(5)
ops1 = jnp.zeros((10,), jnp.int32).at[0].set(2)
Ts = jnp.tile(jnp.eye(4, dtype=jnp.float32), (10, 1, 1))
timeit("reintegrate_batch 1 row", lambda: eng._reintegrate_batch(
    jax.tree.map(jnp.copy, eng.table), eng.store, fidx, Ts, Ts, ops1), n=3)
ops5 = jnp.where(jnp.arange(10) < 5, 2, 0).astype(jnp.int32)
timeit("reintegrate_batch 5 rows", lambda: eng._reintegrate_batch(
    jax.tree.map(jnp.copy, eng.table), eng.store, fidx, Ts, Ts, ops5), n=3)
timeit("garbage_collect", lambda: eng._gc(jax.tree.map(jnp.copy, eng.table)))
