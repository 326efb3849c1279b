"""Micro-benchmark every jitted stage used in _finish_submap on the real chip."""
import os
import sys
import time

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
from bundlefusion_tpu.pipeline.online import BundleFusion, preprocess_frame


def timeit(name, fn, n=5):
    fn()  # warm
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:40s} {1000*dt:9.2f} ms")
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

depth = jnp.asarray(seq["depth"][22])
color = jnp.asarray(seq["color"][22])

out = timeit("preprocess_frame", lambda: preprocess_frame(
    depth, color, (eng.intr_sift.height, eng.intr_sift.width),
    (eng.intr_int.height, eng.intr_int.width)))
intensity_sift, depth_sift, depth_int, color_int = out

timeit("sift detect", lambda: detect_and_describe(intensity_sift, depth_sift, eng.sift_cfg))

from bundlefusion_tpu.pipeline.frontend import match_and_filter, add_to_residuals, chained_sift_transform, fuse_keyframe
timeit("local match_and_filter (S=11)", lambda: match_and_filter(
    jnp.asarray(5), eng.local_keys, eng.local_cache, eng.intr_sift, eng.intr_cache, eng.frontend_local))

mf = match_and_filter(jnp.asarray(5), eng.local_keys, eng.local_cache, eng.intr_sift, eng.intr_cache, eng.frontend_local)
timeit("add_to_residuals local", lambda: add_to_residuals(
    eng.local_corrs, mf, jnp.asarray(5, jnp.int32), jnp.arange(eng.S, dtype=jnp.int32)))
timeit("chained_sift_transform", lambda: chained_sift_transform(mf, jnp.asarray(eng.local_rel)))

timeit("global match_and_filter (G=64)", lambda: match_and_filter(
    jnp.asarray(2), eng.global_keys, eng.global_cache, eng.intr_sift, eng.intr_cache, eng.frontend_global))

from bundlefusion_tpu.solver.gn_pcg import solve_sparse, solve_bundle
from bundlefusion_tpu.geometry.lie import matrix_to_pose
init = jnp.asarray(np.stack([np.asarray(matrix_to_pose(jnp.asarray(t))) for t in eng.local_rel]))
lv = jnp.asarray(eng.local_valid)
timeit("local solve_bundle (S=11)", lambda: solve_bundle(
    init, lv, eng.local_corrs, eng.local_cache, eng.intr_cache, eng.local_solver, eng.dense_term_params), n=3)
timeit("local solve_sparse (S=11)", lambda: solve_sparse(
    init, lv, eng.local_corrs, eng.local_solver), n=3)

kv = jnp.asarray(eng.keyframe_valid)
timeit("global solve_sparse (G=64)", lambda: solve_sparse(
    eng.keyframe_poses, kv, eng.global_corrs, eng.global_solver), n=3)

timeit("fuse_keyframe", lambda: fuse_keyframe(
    eng.local_keys, jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (eng.S, 1, 1))), 0,
    eng.intr_sift, eng.global_keys.keys_per_frame))

from bundlefusion_tpu.tsdf.integrate import integrate
timeit("tsdf integrate", lambda: integrate(
    eng.table, depth_int, color_int, eng.intr_int, jnp.eye(4), eng.tsdf_params, cap=eng.vis_cap), n=3)

# dense term pieces
from bundlefusion_tpu.solver.dense_term import find_overlapping_pairs, build_dense_system
pairs, mask = timeit("find_overlapping_pairs (S=11)", lambda: find_overlapping_pairs(
    init, lv, eng.local_cache, eng.intr_cache, eng.dense_term_params))
timeit("build_dense_system (S=11)", lambda: build_dense_system(
    init, pairs, mask, eng.local_cache, eng.intr_cache, eng.dense_term_params, 1.0, 0.0), n=3)
