"""Round-2 microbenchmarks: gather throughput, raycast, alloc sub-pieces."""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_cc")
import numpy as np
import jax
import jax.numpy as jnp

def bench(name, fn, *args, n=20):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:34s}: {dt:8.3f} ms", flush=True)
    return out

# ---- XLA gather throughput ----
key = jax.random.PRNGKey(0)
src = jax.random.normal(key, (131072, 512), jnp.float32)  # 268 MB
idx1 = jax.random.randint(key, (8192,), 0, 131072)
f_rowgather = jax.jit(lambda s, i: s[i])
bench("row gather 8192x512 f32", f_rowgather, src, idx1)

src3 = jax.random.normal(key, (131072, 4, 128), jnp.float32)
f_rowgather3 = jax.jit(lambda s, i: s[i])
bench("row gather [N,4,128] 8192", f_rowgather3, src3, idx1)

img = jax.random.normal(key, (240, 320), jnp.float32)
iu = jax.random.randint(key, (6300000,), 0, 320)
iv = jax.random.randint(key, (6300000,), 0, 240)
f_pix = jax.jit(lambda im, v, u: im[v, u])
bench("pixel gather 6.3M from 240x320", f_pix, img, iv, iu)

iu2 = jax.random.randint(key, (153600,), 0, 320)
iv2 = jax.random.randint(key, (153600,), 0, 240)
bench("pixel gather 153K from 240x320", f_pix, img, iv2, iu2)

flat = jax.random.normal(key, (16 * 1024 * 1024,), jnp.float32)
ifl = jax.random.randint(key, (6300000,), 0, 16 * 1024 * 1024)
f_flat = jax.jit(lambda s, i: s[i])
bench("flat gather 6.3M from 64MB", f_flat, flat, ifl)

# one-hot matmul "gather" of 153K pixels from a 240x320 image
oh_u = jax.nn.one_hot(iu2.reshape(-1, 320) % 320, 320, dtype=jnp.bfloat16)  # fake
f_scatter = jax.jit(lambda s, i, v: s.at[i].add(v))
vals = jnp.ones((153600,), jnp.float32)
big = jnp.zeros((16 * 1024 * 1024,), jnp.float32)
ifs = jax.random.randint(key, (153600,), 0, 16 * 1024 * 1024)
bench("scatter-add 153K into 64MB", f_scatter, big, ifs, vals)

# sort costs
keys262 = jax.random.randint(key, (262144,), 0, 2**30)
bench("sort 262144 int32", jax.jit(jnp.sort), keys262)
bench("argsort 262144 int32", jax.jit(jnp.argsort), keys262)
keys12 = jax.random.randint(key, (12288,), 0, 2**30)
bench("sort 12288 int32", jax.jit(jnp.sort), keys12)
ss_q = jax.random.randint(key, (6144,), 0, 2**30)
ss_tab = jnp.sort(jax.random.randint(key, (131072,), 0, 2**30))
bench("searchsorted 6144 in 131072", jax.jit(jnp.searchsorted), ss_tab, ss_q)
q76 = jax.random.randint(key, (76800,), 0, 2**30)
bench("searchsorted 76800 in 131072", jax.jit(jnp.searchsorted), ss_tab, q76)

# run-dedup compact piece from allocate_packed
def rundedup(packed_all):
    prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), packed_all[:-1]])
    keep = (packed_all != prev) & (packed_all != 2**31 - 1)
    cpos = jnp.cumsum(keep.astype(jnp.int32)) - 1
    M = 6144
    return jnp.full((M,), 2**31 - 1, jnp.int32).at[
        jnp.where(keep & (cpos < M), cpos, M)
    ].set(packed_all, mode="drop")
bench("rundedup+compact 76800", jax.jit(rundedup), q76)

# cumsum alone
bench("cumsum 76800 int32", jax.jit(lambda x: jnp.cumsum(x)), q76)

# ---- raycast current impl ----
from bundlefusion_tpu import AppConfig
from bundlefusion_tpu.io.synthetic import default_intrinsics
from bundlefusion_tpu.tsdf.table import create_table, allocate_packed
from bundlefusion_tpu.tsdf.integrate import candidate_keys, TsdfParams
from bundlefusion_tpu.tsdf.apply_pallas import apply_tsdf_ops
from bundlefusion_tpu.tsdf.raycast import raycast, RaycastParams
from bundlefusion_tpu.io.synthetic import make_sequence

app = AppConfig(hash_num_sdf_blocks=131072, hash_key_capacity=131072)
intr = default_intrinsics(640, 480)
intr_int = intr.scaled(320, 240)
tp = TsdfParams(voxel_size=app.sdf_voxel_size, truncation=app.sdf_truncation,
                truncation_scale=app.sdf_truncation_scale,
                max_integration_distance=app.sdf_max_integration_distance,
                integration_weight_sample=app.sdf_integration_weight_sample,
                integration_weight_max=app.sdf_integration_weight_max,
                depth_min=app.sensor_depth_min, depth_max=app.sensor_depth_max)
seq = make_sequence(2, intr=intr)
from bundlefusion_tpu.ops.image import resample_nearest
d_int = resample_nearest(jnp.asarray(seq["depth"][0]), 240, 320)
c_int = jnp.zeros((240, 320, 3), jnp.float32)
T = jnp.eye(4, dtype=jnp.float32)
table = create_table(app.hash_key_capacity, app.hash_num_sdf_blocks)
table = allocate_packed(table, candidate_keys(d_int, intr_int, T, tp))
table = apply_tsdf_ops(table, d_int[None], c_int[None], T[None],
                       jnp.ones((1,), jnp.float32), jnp.zeros((1,), jnp.int32),
                       intr_int, tp)
rp = RaycastParams()
f_ray = jax.jit(lambda t, T: raycast(t, intr_int, T, tp, rp))
bench("raycast 320x240", f_ray, table, T, n=5)

# ---- match_and_filter ----
from bundlefusion_tpu import BundlingConfig
from bundlefusion_tpu.ops.sift import SiftConfig, detect_and_describe
from bundlefusion_tpu.pipeline.frames import (create_keyframe_store, create_dense_cache,
                                              store_keypoints, store_cache_frame)
from bundlefusion_tpu.pipeline.frontend import match_and_filter, FrontendParams
from bundlefusion_tpu.ops.filters import DenseVerifyParams

bundling = BundlingConfig(max_global_corr=16384)
sift_cfg = SiftConfig(target_keys=150, min_scale=bundling.min_key_scale,
                      depth_min=app.sensor_depth_min, depth_max=app.sensor_depth_max)
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
intensity = jnp.mean(jnp.asarray(seq["color"][0]), axis=-1)
depth640 = jnp.asarray(np.where(np.isfinite(seq["depth"][0]), seq["depth"][0], np.nan))
kp = detect_and_describe(intensity, depth640, sift_cfg)
S = 11
keys = create_keyframe_store(S, sift_cfg.target_keys)
cache = create_dense_cache(S, 60, 80)
for s in range(S):
    keys = store_keypoints(keys, jnp.asarray(s), kp)
    cache = store_cache_frame(cache, jnp.asarray(s), d_int, c_int, intr_cache)
mfj = jax.jit(lambda c, k, ca: match_and_filter(c, k, ca, intr_sift, intr_cache, fp))
bench("match_and_filter S=11", mfj, jnp.asarray(10), keys, cache)

G = 64
gkeys = create_keyframe_store(G, bundling.max_num_keys_per_image)
gcache = create_dense_cache(G, 60, 80)
mfg = jax.jit(lambda c, k, ca: match_and_filter(c, k, ca, intr_sift, intr_cache, fp))
bench("match_and_filter G=64 (empty)", mfg, jnp.asarray(63), gkeys, gcache)

# solver
from bundlefusion_tpu.solver.gn_pcg import solve_sparse, SolverParams
from bundlefusion_tpu.solver.residuals import create_corr_store
sp = SolverParams(num_gn=3, num_pcg=150, pcg_early_out=bundling.pcg_early_out,
                  gn_early_out_delta=bundling.gn_early_out_delta)
corrs = create_corr_store(16384)
poses = jnp.zeros((G, 6), jnp.float32)
kv = jnp.ones((G,), bool)
ss = jax.jit(lambda p, v, c: solve_sparse(p, v, c, sp))
bench("solve_sparse G=64 C=16384 empty", ss, poses, kv, corrs)

# ---- host->device upload bandwidth ----
h_depth = np.zeros((480, 640), np.uint16)
h_color = np.zeros((480, 640, 3), np.uint8)
t0 = time.perf_counter()
for _ in range(20):
    a = jnp.asarray(h_depth); b = jnp.asarray(h_color)
jax.block_until_ready((a, b))
dt = (time.perf_counter() - t0) / 20 * 1000
print(f"{'upload 1.5MB frame':34s}: {dt:8.3f} ms", flush=True)

h_big = np.zeros((16, 1024, 1024), np.float32)  # 64MB
t0 = time.perf_counter()
for _ in range(3):
    a = jnp.asarray(h_big)
jax.block_until_ready(a)
dt = (time.perf_counter() - t0) / 3 * 1000
print(f"{'upload 64MB':34s}: {dt:8.3f} ms ({64/(dt/1000):.0f} MB/s)", flush=True)

# readback
d_big = jnp.zeros((16, 1024, 1024), jnp.float32)
jax.block_until_ready(d_big)
t0 = time.perf_counter()
for _ in range(3):
    x = np.asarray(d_big)
dt = (time.perf_counter() - t0) / 3 * 1000
print(f"{'readback 64MB':34s}: {dt:8.3f} ms ({64/(dt/1000):.0f} MB/s)", flush=True)
