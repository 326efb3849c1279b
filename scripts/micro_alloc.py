"""Decompose allocate_for_frame + workspace gather/scatter with donation."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_cc")
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

from bundlefusion_tpu import AppConfig
from bundlefusion_tpu.io.synthetic import default_intrinsics, make_sequence
from bundlefusion_tpu.geometry.camera import CameraIntrinsics
from bundlefusion_tpu.tsdf.table import create_table, allocate, lookup_packed, pack_block_coords, EMPTY_KEY
from bundlefusion_tpu.tsdf.integrate import TsdfParams, integrate, candidate_blocks, visible_block_indices

intr_in = default_intrinsics(640, 480)
intr = intr_in.scaled(320, 240)
params = TsdfParams()
seq = make_sequence(48, intr=intr_in)

table = create_table(131072, 131072)
# build a realistic occupancy (integrate all frames at GT poses)
for i in range(0, 48, 4):
    d = jnp.asarray(seq["depth"][i][::2, ::2])
    c = jnp.asarray(seq["color"][i][::2, ::2])
    table = integrate(table, d, c, intr, jnp.asarray(seq["poses"][i]), params, cap=8192)
table = jax.block_until_ready(table)
print("occupied:", int(jnp.sum((table.keys != 2**31-1).astype(jnp.int32))))

T = jnp.asarray(seq["poses"][20])
depth = jnp.asarray(seq["depth"][20][::2, ::2])


def timeit(name, fn, n=10):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    print(f"{name:46s} {1000*(time.perf_counter()-t0)/n:9.2f} ms")


cb = jax.jit(candidate_blocks, static_argnames=("intr", "params", "samples_per_ray", "stride"))
timeit("candidate_blocks", lambda: cb(depth, intr, T, params))
coords, valid = cb(depth, intr, T, params)

@jax.jit
def dedup_lookup(coords, valid, keys):
    packed_all = jnp.where(valid, pack_block_coords(coords), EMPTY_KEY)
    prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), packed_all[:-1]])
    keep = (packed_all != prev) & (packed_all != EMPTY_KEY)
    cpos = jnp.cumsum(keep.astype(jnp.int32)) - 1
    M = 6144
    packed_raw = jnp.full((M,), EMPTY_KEY, jnp.int32).at[
        jnp.where(keep & (cpos < M), cpos, M)].set(packed_all, mode="drop")
    pos = jnp.searchsorted(keys, packed_raw)
    pos = jnp.clip(pos, 0, keys.shape[0] - 1)
    found = (keys[pos] == packed_raw) & (packed_raw != EMPTY_KEY)
    return jnp.sum(found.astype(jnp.int32)), packed_raw

timeit("dedup+searchsorted", lambda: dedup_lookup(coords, valid, table.keys))

al = jax.jit(allocate)
timeit("allocate (steady: nothing missing)", lambda: al(table, coords, valid))

# force the merge branch with one new coord
coords_new = coords.at[0].set(jnp.asarray([400, 400, 400], jnp.int32))
valid_new = valid.at[0].set(True)
timeit("allocate (merge branch, 1 new)", lambda: al(table, coords_new, valid_new))

# plain argsort of 137K int32
arr = jnp.concatenate([table.keys, jnp.full((6144,), EMPTY_KEY, jnp.int32)])
timeit("argsort 137K int32", lambda: jax.jit(jnp.argsort)(arr))
timeit("sort 6144 int32", lambda: jax.jit(jnp.sort)(arr[:6144]))

# gather/scatter with donation
vis, cnt = jax.jit(visible_block_indices, static_argnames=("intr", "params", "cap"))(
    table, intr, T, params, 8192)
print("visible:", int(cnt))
slots = jnp.where(vis >= 0, table.slots[jnp.clip(vis, 0, table.capacity - 1)], table.num_blocks)

@partial(jax.jit, donate_argnums=(0,))
def gs_donated(payload, slots):
    sdf, w, c = payload
    ws, ww, wc = sdf[slots], w[slots], c[slots]
    return (sdf.at[slots].set(ws * 1.0001), w.at[slots].set(ww), c.at[slots].set(wc))

payload = (jnp.copy(table.sdf), jnp.copy(table.weight), jnp.copy(table.color))
def run_donated():
    global payload
    payload = gs_donated(payload, slots)
    return payload
timeit("gather+scatter donated (8192 rows)", run_donated)

@partial(jax.jit, donate_argnums=(0,))
def gs_donated_small(payload, slots):
    sdf, w, c = payload
    s = slots[:2176]
    ws, ww, wc = sdf[s], w[s], c[s]
    return (sdf.at[s].set(ws * 1.0001), w.at[s].set(ww), c.at[s].set(wc))
def run_donated_small():
    global payload
    payload = gs_donated_small(payload, slots)
    return payload
timeit("gather+scatter donated (2176 rows)", run_donated_small)

# gather only
@jax.jit
def g_only(sdf, w, c, slots):
    return sdf[slots], w[slots], c[slots]
timeit("gather only (8192 rows)", lambda: g_only(table.sdf, table.weight, table.color, slots))
