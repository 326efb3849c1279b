"""Probe: why is raycast 764ms? 2D gathers from big arrays, fori_loop, etc."""
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
    print(f"{name:36s}: {dt:8.3f} ms", flush=True)
    return out

key = jax.random.PRNGKey(0)

# sanity: known-FLOP matmul
a = jax.random.normal(key, (4096, 4096), jnp.bfloat16)
f_mm = jax.jit(lambda a: a @ a)
bench("matmul 4096^3 bf16 (137 GFLOP)", f_mm, a)

# 2D-index gather from a big [131073, 512] array (raycast _sample form)
big2 = jax.random.normal(key, (131073, 512), jnp.float32)
ss = jax.random.randint(key, (240, 320), 0, 131072)
lin = jax.random.randint(key, (240, 320), 0, 512)
f_2d = jax.jit(lambda s, i, j: s[i, j])
bench("2D gather 76800 from [131073,512]", f_2d, big2, ss, lin)

f_flat = jax.jit(lambda s, i, j: s.reshape(-1)[i * 512 + j])
bench("flat gather 76800 from 268MB", f_flat, big2, ss, lin)

# gather 76800 from 3D grid [96,96,96] via 3 index arrays
grid = jax.random.randint(key, (96, 96, 96), -1, 100, jnp.int32)
b3 = jax.random.randint(key, (240, 320, 3), 0, 96)
f_3d = jax.jit(lambda g, b: g[b[..., 2], b[..., 1], b[..., 0]])
bench("3D gather 76800 from 96^3", f_3d, grid, b3)
f_3dflat = jax.jit(lambda g, b: g.reshape(-1)[(b[..., 2] * 96 + b[..., 1]) * 96 + b[..., 0]])
bench("3D gather flat 76800 from 96^3", f_3dflat, grid, b3)

# fori_loop of 82 iterations each a cheap elementwise op on [240,320]
x0 = jnp.zeros((240, 320), jnp.float32)
def loop82(x):
    return jax.lax.fori_loop(0, 82, lambda i, x: x * 0.99 + 1.0, x)
bench("fori 82x elementwise 240x320", jax.jit(loop82), x0)

# fori_loop of 82 iterations each a flat gather of 76800 from 268MB
def loopg(x):
    def body(i, x):
        idx = (ss * 512 + lin + i) % (131073 * 512)
        return x + big2.reshape(-1)[idx]
    return jax.lax.fori_loop(0, 82, body, x)
bench("fori 82x flat-gather 76800/268MB", jax.jit(loopg), x0)

# the actual raycast pieces
from bundlefusion_tpu import AppConfig
from bundlefusion_tpu.io.synthetic import default_intrinsics, make_sequence
from bundlefusion_tpu.tsdf.table import create_table, allocate_packed
from bundlefusion_tpu.tsdf.integrate import candidate_keys, TsdfParams
from bundlefusion_tpu.tsdf.apply_pallas import apply_tsdf_ops
from bundlefusion_tpu.tsdf import raycast as rc
from bundlefusion_tpu.ops.image import resample_nearest

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
d_int = resample_nearest(jnp.asarray(seq["depth"][0]), 240, 320)
c_int = jnp.zeros((240, 320, 3), jnp.float32)
T = jnp.eye(4, dtype=jnp.float32)
table = create_table(app.hash_key_capacity, app.hash_num_sdf_blocks)
table = allocate_packed(table, candidate_keys(d_int, intr_int, T, tp))
table = apply_tsdf_ops(table, d_int[None], c_int[None], T[None],
                       jnp.ones((1,), jnp.float32), jnp.zeros((1,), jnp.int32),
                       intr_int, tp)

f_grid = jax.jit(lambda t, c: rc.build_local_grid(t, c, tp.voxel_size, 96))
grid_o = bench("build_local_grid", f_grid, table, jnp.zeros(3))
grid96, origin = grid_o

cam_pos = jnp.zeros(3)
v = jnp.broadcast_to(jnp.arange(240, dtype=jnp.float32)[:, None], (240, 320))
u = jnp.broadcast_to(jnp.arange(320, dtype=jnp.float32)[None, :], (240, 320))
dirs = jnp.stack([(u - intr_int.cx) / intr_int.fx, (v - intr_int.cy) / intr_int.fy, jnp.ones_like(u)], -1)

def one_step(t):
    pts = cam_pos + 1.5 * dirs
    return rc._sample_nearest(grid96, origin, t, pts, tp.voxel_size, 96)
bench("raycast single _sample_nearest", jax.jit(one_step), table)

def march_only(t):
    def body(i, acc):
        pts = cam_pos + (0.1 + i * 0.048) * dirs
        sdf, w = rc._sample_nearest(grid96, origin, t, pts, tp.voxel_size, 96)
        return acc + sdf * w
    return jax.lax.fori_loop(0, 82, body, jnp.zeros((240, 320)))
bench("raycast march-only 82 steps", jax.jit(march_only), table)

def tri_once(t):
    pts = cam_pos + 1.5 * dirs
    return rc._sample_trilinear(grid96, origin, t, pts, tp.voxel_size, 96, True)
bench("single _sample_trilinear+color", jax.jit(tri_once), table)
