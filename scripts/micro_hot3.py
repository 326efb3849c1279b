"""Decompose the three per-frame hot programs (frame_step / tsdf_fast /
render) into their stages on-device at bench shapes. Round-3 attribution:
these three are 76 of the 79.6 ms/frame measured in BENCH_r02."""
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
from bundlefusion_tpu.ops.sift import SiftConfig, detect_and_describe, build_pyramid
from bundlefusion_tpu.ops.image import erode_depth, resample_bilinear, resample_nearest, rgb_to_intensity
from bundlefusion_tpu.pipeline.online import BundleFusion
from bundlefusion_tpu.tsdf.integrate import TsdfParams, candidate_keys
from bundlefusion_tpu.tsdf.table import allocate_packed, EMPTY_KEY, num_occupied
from bundlefusion_tpu.tsdf.apply_pallas import apply_tsdf_ops
from bundlefusion_tpu.tsdf.splat import SplatParams, splat_render
from bundlefusion_tpu.pipeline.frames import decode_frame

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
print("occupied blocks:", int(num_occupied(eng.table)),
      "high_water:", int(eng.table.high_water))


def timeit(name, fn, n=10):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    print(f"{name:44s} {1000*(time.perf_counter()-t0)/n:9.2f} ms")


d16, c8 = eng._to_wire(seq["depth"][20], seq["color"][20])
d16, c8 = jnp.asarray(d16), jnp.asarray(c8)
intr_sift, intr_int = eng.intr_sift, eng.intr_int
tsdf_params = eng.tsdf_params

# ---------------- frame_step stages ----------------
@jax.jit
def preproc(depth_u16, color_u8):
    depth = jnp.where(depth_u16 > 0, depth_u16.astype(jnp.float32) * 1e-3, jnp.nan)
    color = color_u8.astype(jnp.float32) * (1.0 / 255.0)
    d = erode_depth(erode_depth(depth))
    intensity = rgb_to_intensity(color)
    i_s = resample_bilinear(intensity, intr_sift.height, intr_sift.width)
    d_s = resample_nearest(d, intr_sift.height, intr_sift.width)
    d_i = resample_nearest(d, intr_int.height, intr_int.width)
    c_i = resample_bilinear(color, intr_int.height, intr_int.width)
    return i_s, d_s, d_i, c_i

timeit("preproc (decode+erode+resample)", lambda: preproc(d16, c8))
i_s, d_s, d_i, c_i = jax.block_until_ready(preproc(d16, c8))

pyr_j = jax.jit(lambda x: build_pyramid(x, sift_cfg))
timeit("sift build_pyramid", lambda: pyr_j(i_s))
dd_j = jax.jit(lambda i, d: detect_and_describe(i, d, sift_cfg))
timeit("sift detect_and_describe (full)", lambda: dd_j(i_s, d_s))

# ---------------- tsdf_fast stages ----------------
table = eng.table
ck_j = jax.jit(lambda d, T: candidate_keys(d, intr_int, T, tsdf_params))
T20 = jnp.asarray(seq["poses"][20])
timeit("candidate_keys", lambda: ck_j(d_i, T20))
packed = jax.block_until_ready(ck_j(d_i, T20))
print("candidates:", packed.shape)

alloc_j = jax.jit(allocate_packed, donate_argnums=(0,))
timeit("allocate_packed (steady: no new)", lambda: alloc_j(jax.tree.map(jnp.copy, table), packed), n=5)

apply_j = jax.jit(
    lambda t, d, c, T: apply_tsdf_ops(
        t, d[None], c[None], T[None], jnp.ones((1,), jnp.float32),
        jnp.zeros((1,), jnp.int32), intr_int, tsdf_params),
    donate_argnums=(0,))
timeit("apply_tsdf_ops (1 op sweep)", lambda: apply_j(jax.tree.map(jnp.copy, table), d_i, c_i, T20), n=5)

# decode from store
dec_j = jax.jit(lambda s, f: decode_frame(s.depth_mm[f], s.color[f]))
timeit("decode_frame from store", lambda: dec_j(eng.store, jnp.asarray(20)))

# ---------------- render / splat ----------------
sp = SplatParams(depth_min=app.render_depth_min, depth_max=app.render_depth_max,
                 visible_cap=app.visible_blocks_cap)
r_j = jax.jit(lambda t, cam: splat_render(t, intr_int, cam, tsdf_params, sp))
timeit("splat_render full", lambda: r_j(table, T20))

sp_nc = SplatParams(depth_min=app.render_depth_min, depth_max=app.render_depth_max,
                    visible_cap=app.visible_blocks_cap, use_color=False)
r_nc = jax.jit(lambda t, cam: splat_render(t, intr_int, cam, tsdf_params, sp_nc))
timeit("splat_render no color", lambda: r_nc(table, T20))

sp_v4 = SplatParams(depth_min=app.render_depth_min, depth_max=app.render_depth_max,
                    visible_cap=4096)
r_v4 = jax.jit(lambda t, cam: splat_render(t, intr_int, cam, tsdf_params, sp_v4))
timeit("splat_render viscap=4096", lambda: r_v4(table, T20))

sp_f0 = SplatParams(depth_min=app.render_depth_min, depth_max=app.render_depth_max,
                    visible_cap=app.visible_blocks_cap, fill_passes=0)
r_f0 = jax.jit(lambda t, cam: splat_render(t, intr_int, cam, tsdf_params, sp_f0))
timeit("splat_render fill_passes=0", lambda: r_f0(table, T20))
