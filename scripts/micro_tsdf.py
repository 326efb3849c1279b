"""Isolate gather vs scatter cost in tsdf integrate_frame."""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_cc")
import numpy as np, jax, jax.numpy as jnp
from functools import partial

from bundlefusion_tpu.geometry.camera import CameraIntrinsics
from bundlefusion_tpu.tsdf.table import create_table, unpack_key
from bundlefusion_tpu.tsdf.integrate import TsdfParams, integrate, allocate_for_frame, visible_block_indices
from bundlefusion_tpu.io.synthetic import default_intrinsics, make_sequence

intr_in = default_intrinsics(640, 480)
intr = intr_in.scaled(320, 240)
params = TsdfParams()
seq = make_sequence(2, intr=intr_in)
depth = jnp.asarray(seq["depth"][0][::2, ::2])
color = jnp.asarray(seq["color"][0][::2, ::2])
T = jnp.eye(4)

table = create_table(262144, 131072)
table = jax.block_until_ready(integrate(table, depth, color, intr, T, params, cap=32768))
print("occupied:", int(jnp.sum((table.keys != 2**31-1).astype(jnp.int32))))

CAP = 32768
vis, cnt = visible_block_indices(table, intr, T, params, CAP)
print("visible count:", int(cnt))

def timeit(name, fn, n=5):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    jax.block_until_ready(r)
    print(f"{name:40s} {1000*(time.perf_counter()-t0)/n:9.2f} ms")

from bundlefusion_tpu.tsdf.table import BLOCK_SIZE, BLOCK_VOLUME
from bundlefusion_tpu.tsdf.integrate import _block_voxel_world_positions
from bundlefusion_tpu.geometry.lie import pose_inverse, transform_points

@partial(jax.jit, static_argnames=("stage",))
def variant(table, vp, stage):
    valid_block = vp >= 0
    safe_vp = jnp.clip(vp, 0, table.capacity - 1)
    slots = jnp.where(valid_block, table.slots[safe_vp], table.num_blocks)
    coords = unpack_key(table.keys[safe_vp])
    pts_world = _block_voxel_world_positions(coords, params)
    pts_cam = transform_points(pose_inverse(T), pts_world)
    z = pts_cam[..., 2]
    u = jnp.round(pts_cam[..., 0] / jnp.maximum(z, 1e-6) * intr.fx + intr.cx).astype(jnp.int32)
    v = jnp.round(pts_cam[..., 1] / jnp.maximum(z, 1e-6) * intr.fy + intr.cy).astype(jnp.int32)
    uc = jnp.clip(u, 0, intr.width - 1)
    vc = jnp.clip(v, 0, intr.height - 1)
    if stage == "proj":
        return z.sum() + uc.sum() + vc.sum()
    d = depth[vc, uc]
    if stage == "gather_d":
        return d.sum()
    rgb = color[vc, uc]
    if stage == "gather_rgb":
        return d.sum() + rgb.sum()
    sdf = d - z
    upd = (sdf > -0.1) & valid_block[:, None]
    old_sdf = table.sdf[slots.clip(0, table.num_blocks - 1)]
    old_w = table.weight[slots.clip(0, table.num_blocks - 1)]
    old_c = table.color[slots.clip(0, table.num_blocks - 1)]
    if stage == "gather_table":
        return old_sdf.sum() + old_w.sum() + old_c.sum() + sdf.sum()
    new_w = old_w + jnp.where(upd, 1.0, 0.0)
    new_sdf = old_sdf + jnp.where(upd, sdf, 0.0)
    new_c = old_c + jnp.where(upd[..., None], rgb, 0.0)
    scatter_slots = jnp.where(valid_block, slots, table.num_blocks)
    if stage == "scatter_sdf":
        return table.sdf.at[scatter_slots].set(new_sdf, mode="drop").sum()
    out = table._replace(
        sdf=table.sdf.at[scatter_slots].set(new_sdf, mode="drop"),
        weight=table.weight.at[scatter_slots].set(new_w, mode="drop"),
        color=table.color.at[scatter_slots].set(new_c, mode="drop"),
    )
    return out

for st in ["proj", "gather_d", "gather_rgb", "gather_table", "scatter_sdf", "full"]:
    timeit(f"stage={st}", lambda st=st: variant(table, vis, st))

# donated full
don = jax.jit(lambda t, v: variant(t, v, "full"), static_argnums=(), donate_argnums=(0,))
t2 = jax.tree.map(lambda a: a.copy(), table)
jax.block_until_ready(don(t2, vis))
t2 = jax.tree.map(lambda a: a.copy(), table)
t0 = time.perf_counter()
for _ in range(5):
    t2 = don(t2, vis)
jax.block_until_ready(t2)
print(f"{'full donated':40s} {1000*(time.perf_counter()-t0)/5:9.2f} ms")

# smaller cap
for cap in (8192, 4096):
    vis2, cnt2 = visible_block_indices(table, intr, T, params, cap)
    timeit(f"full cap={cap}", lambda v=vis2: variant(table, v, "full"))
