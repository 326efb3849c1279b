"""Microbenchmarks of each jitted stage at the bench operating point."""
import os, sys, time

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

intr = default_intrinsics(640, 480)
app = AppConfig(hash_num_sdf_blocks=131072, hash_key_capacity=262144, visible_blocks_cap=32768)
bundling = BundlingConfig()
sift_cfg = SiftConfig(target_keys=150, min_scale=bundling.min_key_scale,
                      depth_min=app.sensor_depth_min, depth_max=app.sensor_depth_max)
seq = make_sequence(14, intr=intr)
eng = BundleFusion(intr, app, bundling, sift_cfg=sift_cfg, max_keyframes=64)
for i in range(12):
    eng.process_frame(seq["depth"][i], seq["color"][i])

def timeit(name, fn, n=5):
    fn()  # warm
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:32s} {1000*dt:9.2f} ms")
    return dt

depth = jnp.asarray(seq["depth"][12]); color = jnp.asarray(seq["color"][12])
pre = lambda: preprocess_frame(depth, color, (480, 640), (240, 320))
timeit("preprocess_frame", pre)
ints, ds, di, ci = pre()

timeit("sift_detect", lambda: detect_and_describe(ints, ds, eng.sift_cfg))
kp = detect_and_describe(ints, ds, eng.sift_cfg)

from bundlefusion_tpu.pipeline.frontend import match_and_filter, add_to_residuals
mf_l = lambda: match_and_filter(jnp.asarray(5), eng.local_keys, eng.local_cache,
                                eng.intr_sift, eng.intr_cache, eng.frontend_local)
timeit("match_and_filter local(S=11)", mf_l)
mf = mf_l()
timeit("add_to_residuals", lambda: add_to_residuals(eng.local_corrs, mf, jnp.asarray(5, jnp.int32), jnp.arange(eng.S, dtype=jnp.int32)))

mf_g = lambda: match_and_filter(jnp.asarray(1), eng.global_keys, eng.global_cache,
                                eng.intr_sift, eng.intr_cache, eng.frontend_global)
timeit("match_and_filter global(G=64)", mf_g)

from bundlefusion_tpu.tsdf.integrate import integrate, allocate_for_frame, visible_block_indices, integrate_frame
T = jnp.eye(4)
timeit("tsdf_integrate full", lambda: integrate(eng.table, di, ci, eng.intr_int, T, eng.tsdf_params, cap=eng.vis_cap))

alloc = jax.jit(lambda t: allocate_for_frame(t, di, eng.intr_int, T, eng.tsdf_params))
timeit("tsdf_alloc only", lambda: alloc(eng.table))
vis_f = jax.jit(lambda t: visible_block_indices(t, eng.intr_int, T, eng.tsdf_params, eng.vis_cap))
timeit("tsdf_visible only", lambda: vis_f(eng.table))
vis, _ = vis_f(eng.table)
intg = jax.jit(lambda t, v: integrate_frame(t, di, ci, eng.intr_int, T, eng.tsdf_params, v, 1.0))
timeit("tsdf_integrate_frame only", lambda: intg(eng.table, vis))

from bundlefusion_tpu.solver.gn_pcg import solve_sparse, solve_bundle
from bundlefusion_tpu.geometry.lie import matrix_to_pose
init = jnp.zeros((eng.S, 6), jnp.float32)
lv = jnp.ones((eng.S,), bool)
timeit("solve_sparse local", lambda: solve_sparse(init, lv, eng.local_corrs, eng.local_solver))
timeit("solve_bundle local(dense)", lambda: solve_bundle(init, lv, eng.local_corrs, eng.local_cache, eng.intr_cache, eng.local_solver, eng.dense_term_params), n=2)
kv = jnp.zeros((eng.G,), bool).at[:2].set(True)
timeit("solve_sparse global(G=64)", lambda: solve_sparse(eng.keyframe_poses, kv, eng.global_corrs, eng.global_solver))

from bundlefusion_tpu.pipeline.frontend import fuse_keyframe
timeit("fuse_keyframe", lambda: fuse_keyframe(eng.local_keys, jnp.asarray(eng.local_rel), 0, eng.intr_sift, eng.global_keys.keys_per_frame))

from bundlefusion_tpu.ops.filters import dense_verify_pair
timeit("dense_verify_pair", lambda: dense_verify_pair(T, eng.local_cache.depth[0], eng.local_cache.campos[0], eng.local_cache.normal[0], eng.local_cache.depth[1], eng.local_cache.campos[1], eng.local_cache.normal[1], eng.intr_cache, eng.frontend_local.dense))
