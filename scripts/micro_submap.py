"""Micro-time each component of submap_step on-device at bench shapes."""
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
from bundlefusion_tpu.ops.sift import SiftConfig
from bundlefusion_tpu.pipeline.online import BundleFusion
from bundlefusion_tpu.pipeline.frontend import match_and_filter, fuse_keyframe
from bundlefusion_tpu.solver.gn_pcg import solve_sparse, solve_bundle
from bundlefusion_tpu.pipeline.online import _verify_local_pairs
from bundlefusion_tpu.geometry.lie import matrix_to_pose
import dataclasses

n_frames = 46
intr = default_intrinsics(640, 480)
app = AppConfig(hash_num_sdf_blocks=131072, hash_key_capacity=131072, visible_blocks_cap=8192)
bundling = BundlingConfig(max_global_corr=16384)
sift_cfg = SiftConfig(target_keys=150, min_scale=bundling.min_key_scale,
                      depth_min=app.sensor_depth_min, depth_max=app.sensor_depth_max)
seq = make_sequence(n_frames, intr=intr)
t0 = time.perf_counter()
eng = BundleFusion(intr, app, bundling, sift_cfg=sift_cfg, max_keyframes=64)
print(f"engine build: {time.perf_counter()-t0:.1f}s")
t0 = time.perf_counter()
cs = eng.warmup()
print(f"warmup/compile: {cs:.1f}s")
for i in range(n_frames):
    eng.process_frame(seq["depth"][i], seq["color"][i])
jax.block_until_ready((eng.local, eng.glob, eng.table))


def timeit(name, fn, n=5):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    print(f"{name:40s} {1000*(time.perf_counter()-t0)/n:9.2f} ms")


local, glob = eng.local, eng.glob
g = jnp.asarray(eng.num_keyframes - 1, jnp.int32)
init = matrix_to_pose(local.rel)
lv = local.valid
kv = jnp.asarray(eng.keyframe_valid)

timeit("local solve_bundle (2GNx100)", lambda: solve_bundle(
    init, lv, local.corrs, local.cache, eng.intr_cache, eng.local_solver, eng.dense_term_params))
timeit("local solve_sparse (2GNx100)", lambda: solve_sparse(
    init, lv, local.corrs, eng.local_solver))
timeit("verify_local_pairs", lambda: jax.jit(_verify_local_pairs, static_argnames=("intr","vp"))(
    jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (eng.S,4,4)), lv, local.cache, eng.intr_cache,
    dataclasses.replace(eng.frontend_local.dense,
                        err_thresh=bundling.verify_opt_err_thresh,
                        corr_thresh=bundling.verify_opt_corr_thresh)))
mfj = jax.jit(match_and_filter, static_argnames=("intr_sift", "intr_cache", "params"))
timeit("global match_and_filter (G=64)", lambda: mfj(
    g, glob.keys, glob.cache, eng.intr_sift, eng.intr_cache, eng.frontend_global))
timeit("local match_and_filter (S=11)", lambda: mfj(
    jnp.asarray(eng.S-1, jnp.int32), local.keys, local.cache, eng.intr_sift, eng.intr_cache, eng.frontend_local))
timeit("global solve_sparse (3GNx150)", lambda: solve_sparse(
    glob.poses, kv, glob.corrs, eng.global_solver))

# full submap_step
timeit("FULL submap_step", lambda: eng._submap_step(
    jax.tree.map(jnp.copy, local), jax.tree.map(jnp.copy, glob), kv, g,
    eng.submap_base, jnp.eye(4, dtype=jnp.float32)), n=3)

# frame_step
d16, c8 = eng._to_wire(seq["depth"][0], seq["color"][0])
timeit("FULL frame_step", lambda: eng._frame_step(
    jnp.asarray(d16), jnp.asarray(c8), jax.tree.map(jnp.copy, eng.local),
    jax.tree.map(jnp.copy, eng.store),
    eng.submap_base, jnp.asarray(3, jnp.int32), jnp.asarray(40, jnp.int32)), n=5)

timeit("tsdf_fast (alloc+kernel, OPS=1)", lambda: eng._tsdf_fast(
    jax.tree.map(jnp.copy, eng.table), eng.store, jnp.asarray(40, jnp.int32),
    jnp.asarray(np.eye(4, dtype=np.float32)), jnp.asarray(True)), n=5)

packed = np.zeros((5, 34), np.float32)
packed[:, 2:18] = np.eye(4, dtype=np.float32).reshape(-1)
packed[:, 18:34] = np.eye(4, dtype=np.float32).reshape(-1)
packed[:, 1] = 2
timed_packed = jnp.asarray(packed)
timeit("tsdf_rows (5 rows + cur)", lambda: eng._tsdf_rows(
    jax.tree.map(jnp.copy, eng.table), eng.store, timed_packed,
    jnp.asarray(40, jnp.int32),
    jnp.asarray(np.eye(4, dtype=np.float32)), jnp.asarray(True)), n=3)

timeit("render (splat)", lambda: eng._render(eng.table, eng._dev_eye), n=5)
