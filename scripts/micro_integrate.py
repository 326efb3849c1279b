"""Decompose frame_step / integrate-body cost on-device at bench shapes."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_cc")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.2")

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

from bundlefusion_tpu import AppConfig, BundlingConfig
from bundlefusion_tpu.io.synthetic import default_intrinsics, make_sequence
from bundlefusion_tpu.ops.sift import SiftConfig, detect_and_describe
from bundlefusion_tpu.ops.image import erode_depth, resample_bilinear, resample_nearest, rgb_to_intensity
from bundlefusion_tpu.pipeline.online import BundleFusion
from bundlefusion_tpu.tsdf.integrate import allocate_for_frame, visible_block_indices, candidate_blocks
from bundlefusion_tpu.tsdf.apply_pallas import apply_tsdf_ops

n_frames = 46
intr = default_intrinsics(640, 480)
app = AppConfig(hash_num_sdf_blocks=131072, hash_key_capacity=131072, visible_blocks_cap=8192)
bundling = BundlingConfig(max_global_corr=16384)
sift_cfg = SiftConfig(target_keys=150, min_scale=bundling.min_key_scale,
                      depth_min=app.sensor_depth_min, depth_max=app.sensor_depth_max)
seq = make_sequence(n_frames, intr=intr)
eng = BundleFusion(intr, app, bundling, sift_cfg=sift_cfg, max_keyframes=64)
for i in range(n_frames):
    eng.process_frame(seq["depth"][i], seq["color"][i])
jax.block_until_ready((eng.local, eng.glob, eng.table))
eng._flush_pending()


def timeit(name, fn, n=10):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    print(f"{name:44s} {1000*(time.perf_counter()-t0)/n:9.2f} ms")


T_pose = jnp.asarray(np.asarray(seq["poses"][40]))  # realistic in-sequence pose
from bundlefusion_tpu.pipeline.frames import decode_frame
d_int, c_int = decode_frame(eng.store.depth_mm[40], eng.store.color[40])
d_int, c_int = jax.block_until_ready((d_int, c_int))
table = eng.table
intr_int = eng.intr_int
params = eng.tsdf_params
cap = eng.vis_cap

vis, cnt = jax.jit(visible_block_indices, static_argnames=("intr", "params", "cap"))(
    table, intr_int, T_pose, params, cap)
print("visible count:", int(cnt), " occupied:",
      int(jnp.sum((table.keys != 2**31 - 1).astype(jnp.int32))))

# preprocess pieces
depth_in = jnp.asarray(seq["depth"][40])
color_in = jnp.asarray(seq["color"][40])

@jax.jit
def preproc(depth, color):
    d = erode_depth(erode_depth(depth))
    intensity = rgb_to_intensity(color)
    i_s = resample_bilinear(intensity, eng.intr_sift.height, eng.intr_sift.width)
    d_s = resample_nearest(d, eng.intr_sift.height, eng.intr_sift.width)
    d_i = resample_nearest(d, intr_int.height, intr_int.width)
    c_i = resample_bilinear(color, intr_int.height, intr_int.width)
    return i_s, d_s, d_i, c_i

i_s, d_s, _, _ = jax.block_until_ready(preproc(depth_in, color_in))
timeit("preprocess (erode+resample)", lambda: preproc(depth_in, color_in))
dd = jax.jit(detect_and_describe, static_argnames=("cfg",))
timeit("detect_and_describe (SIFT)", lambda: dd(i_s, d_s, sift_cfg))

aff = jax.jit(allocate_for_frame, static_argnames=("intr", "params"))
timeit("allocate_for_frame", lambda: aff(table, d_int, intr_int, T_pose, params))
vbi = jax.jit(visible_block_indices, static_argnames=("intr", "params", "cap"))
timeit("visible_block_indices", lambda: vbi(table, intr_int, T_pose, params, cap))
ap = jax.jit(apply_tsdf_ops, static_argnames=("intr", "params", "interpret"))
timeit("fused apply_tsdf_ops (OPS=1)", lambda: ap(
    table, d_int[None], c_int[None], T_pose[None], jnp.ones(1),
    jnp.zeros(1, jnp.int32), intr_int, params))

# workspace gather/scatter cost alone
slots = jnp.where(vis >= 0, table.slots[jnp.clip(vis, 0, table.capacity - 1)], table.num_blocks)
@jax.jit
def gather_scatter(table, slots):
    ws = table.sdf[slots]
    ww = table.weight[slots]
    wc = table.color[slots]
    return table._replace(
        sdf=table.sdf.at[slots].set(ws),
        weight=table.weight.at[slots].set(ww),
        color=table.color.at[slots].set(wc))
timeit("workspace gather+scatter (cap rows)", lambda: gather_scatter(table, slots))

# store_cache_frame
from bundlefusion_tpu.pipeline.frames import store_cache_frame, store_keypoints
scf = jax.jit(store_cache_frame, static_argnames=("intr_cache",))
timeit("store_cache_frame", lambda: scf(eng.local.cache, jnp.asarray(3), d_int, c_int, intr_cache=eng.intr_cache))
