"""Microbenchmarks of individual hot ops on the real TPU."""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_cc")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.2")
import numpy as np
import jax
import jax.numpy as jnp

from bundlefusion_tpu import AppConfig, BundlingConfig
from bundlefusion_tpu.io.synthetic import default_intrinsics, make_sequence
from bundlefusion_tpu.ops.sift import SiftConfig, detect_and_describe
from bundlefusion_tpu.geometry.camera import CameraIntrinsics

app = AppConfig(hash_num_sdf_blocks=131072, hash_key_capacity=131072, visible_blocks_cap=8192)
bundling = BundlingConfig(max_global_corr=16384)
intr = default_intrinsics(640, 480)
sift_cfg = SiftConfig(target_keys=150, min_scale=bundling.min_key_scale,
                      depth_min=app.sensor_depth_min, depth_max=app.sensor_depth_max)

def bench(name, fn, *args, n=20):
    out = fn(*args); jax.block_until_ready(out)  # compile
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:28s}: {dt:8.3f} ms")
    return out

# tunnel round-trip: trivial op, sync each time
x = jnp.zeros((8, 128), jnp.float32)
f_triv = jax.jit(lambda x: x + 1)
f_triv(x).block_until_ready()
t0 = time.perf_counter()
for _ in range(20):
    f_triv(x).block_until_ready()
print(f"{'tunnel sync roundtrip':28s}: {(time.perf_counter()-t0)/20*1000:8.3f} ms")

# async dispatch cost (no sync until end)
t0 = time.perf_counter()
y = x
for _ in range(100):
    y = f_triv(y)
y.block_until_ready()
print(f"{'async dispatch (chained)':28s}: {(time.perf_counter()-t0)/100*1000:8.3f} ms")

seq = make_sequence(4, intr=intr)
depth = jnp.asarray(np.where(np.isfinite(seq["depth"][0]), seq["depth"][0], 0.0))
color = jnp.asarray(seq["color"][0])

# SIFT detect at 640x480
intensity = jnp.mean(color, axis=-1)
det = jax.jit(lambda i, d: detect_and_describe(i, d, sift_cfg))
bench("detect_and_describe 640x480", det, intensity, depth)

# TSDF pieces
from bundlefusion_tpu.tsdf.table import create_table, allocate_packed, garbage_collect
from bundlefusion_tpu.tsdf.integrate import candidate_keys, TsdfParams
from bundlefusion_tpu.tsdf.apply_pallas import apply_tsdf_ops
from bundlefusion_tpu.ops.image import resample_nearest

intr_int = intr.scaled(320, 240)
tp = TsdfParams(voxel_size=app.sdf_voxel_size, truncation=app.sdf_truncation,
                truncation_scale=app.sdf_truncation_scale,
                max_integration_distance=app.sdf_max_integration_distance,
                integration_weight_sample=app.sdf_integration_weight_sample,
                integration_weight_max=app.sdf_integration_weight_max,
                depth_min=app.sensor_depth_min, depth_max=app.sensor_depth_max)
table = create_table(app.hash_key_capacity, app.hash_num_sdf_blocks)
d_int = resample_nearest(jnp.where(depth > 0, depth, jnp.nan), 240, 320)
c_int = jnp.zeros((240, 320, 3), jnp.float32)
T = jnp.eye(4, dtype=jnp.float32)

ck = jax.jit(lambda d, T: candidate_keys(d, intr_int, T, tp))
packed = bench("candidate_keys", ck, d_int, T)

ap = jax.jit(allocate_packed, donate_argnums=())
table2 = bench("allocate_packed", ap, table, packed)

f_apply = jax.jit(lambda t, d, c, T: apply_tsdf_ops(
    t, d[None], c[None], T[None], jnp.ones((1,), jnp.float32),
    jnp.zeros((1,), jnp.int32), intr_int, tp))
bench("apply_tsdf_ops 1-op", f_apply, table2, d_int, c_int, T)

f_gc = jax.jit(lambda t: garbage_collect(t))
bench("garbage_collect", f_gc, table2)

# matching
from bundlefusion_tpu.pipeline.frames import (create_keyframe_store, create_dense_cache,
                                              store_keypoints, store_cache_frame)
from bundlefusion_tpu.pipeline.frontend import match_and_filter, FrontendParams
from bundlefusion_tpu.ops.filters import DenseVerifyParams

intr_sift = intr.scaled(640, 480)
intr_cache = intr.scaled(80, 60)
dense = DenseVerifyParams(dist_thresh=bundling.proj_corr_dist_thres,
                          normal_thresh=bundling.proj_corr_normal_thres,
                          err_thresh=bundling.verify_sift_err_thresh,
                          corr_thresh=bundling.verify_sift_corr_thresh,
                          depth_min=app.sensor_depth_min, depth_max=app.sensor_depth_max)
fp = FrontendParams(sift_match_thresh=bundling.sift_match_thresh,
                    sift_match_ratio=bundling.sift_match_ratio_max_local,
                    num_raw_matches=bundling.max_matches_per_image_pair_raw,
                    max_filtered=bundling.max_matches_per_image_pair_filtered,
                    min_num_matches=bundling.min_num_matches_local,
                    max_kabsch_res2=bundling.max_kabsch_residual2,
                    surf_area_thresh=bundling.surf_area_pca_thresh,
                    dense=dense)
S = 11
keys = create_keyframe_store(S, sift_cfg.target_keys)
cache = create_dense_cache(S, 60, 80)
kp = det(intensity, depth)
for s in range(S):
    keys = store_keypoints(keys, jnp.asarray(s), kp)
    cache = store_cache_frame(cache, jnp.asarray(s), d_int, c_int, intr_cache)
mfj = jax.jit(lambda c, k, ca: match_and_filter(c, k, ca, intr_sift, intr_cache, fp))
bench("match_and_filter S=11", mfj, jnp.asarray(10), keys, cache)

# global matching G=64
G = 64
gkeys = create_keyframe_store(G, bundling.max_num_keys_per_image)
gcache = create_dense_cache(G, 60, 80)
mfg = jax.jit(lambda c, k, ca: match_and_filter(c, k, ca, intr_sift, intr_cache, fp))
bench("match_and_filter G=64", mfg, jnp.asarray(63), gkeys, gcache)

# solver
from bundlefusion_tpu.solver.gn_pcg import solve_sparse, SolverParams
from bundlefusion_tpu.solver.residuals import create_corr_store
sp = SolverParams(num_gn=3, num_pcg=150, pcg_early_out=bundling.pcg_early_out,
                  gn_early_out_delta=bundling.gn_early_out_delta)
corrs = create_corr_store(16384)
poses = jnp.zeros((G, 6), jnp.float32)
kv = jnp.ones((G,), bool)
ss = jax.jit(lambda p, v, c: solve_sparse(p, v, c, sp))
bench("solve_sparse G=64 C=16384", ss, poses, kv, corrs)
