"""Probe: does Mosaic support vector gather from a VMEM image?"""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_cc")
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W = 256, 512
V = 512  # voxels per block

img = jnp.asarray(np.random.rand(H, W).astype(np.float32))
vi = jnp.asarray(np.random.randint(0, H, (8, V)).astype(np.int32))
ui = jnp.asarray(np.random.randint(0, W, (8, V)).astype(np.int32))


def k_gather2d(img_ref, v_ref, u_ref, out_ref):
    v = v_ref[0]
    u = u_ref[0]
    out_ref[0] = img_ref[v, u]


def k_gather_flat(img_ref, v_ref, u_ref, out_ref):
    v = v_ref[0]
    u = u_ref[0]
    flat = img_ref[:].reshape(-1)
    out_ref[0] = jnp.take(flat, v * W + u)


def k_onehot(img_ref, v_ref, u_ref, out_ref):
    v = v_ref[0]  # [V]
    u = u_ref[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (V, H), 1)
    oh_v = (rows == v[:, None]).astype(jnp.float32)
    tmp = jnp.dot(oh_v, img_ref[:], preferred_element_type=jnp.float32)  # [V, W]
    cols = jax.lax.broadcasted_iota(jnp.int32, (V, W), 1)
    oh_u = (cols == u[:, None]).astype(jnp.float32)
    out_ref[0] = jnp.sum(tmp * oh_u, axis=1)


def run(kernel, name):
    try:
        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, V), jnp.float32),
            grid=(8,),
            in_specs=[
                pl.BlockSpec((H, W), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, V), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, V), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, V), lambda i: (i, 0), memory_space=pltpu.VMEM),
        )
        out = jax.block_until_ready(f(img, vi, ui))
        ref = img[vi[-1], ui[-1]]
        err = float(jnp.abs(out[0] - ref).max())
        print(f"{name}: OK, max err {err:.2e}")
        t0 = time.perf_counter()
        for _ in range(20):
            out = f(img, vi, ui)
        jax.block_until_ready(out)
        print(f"   {1000*(time.perf_counter()-t0)/20:.3f} ms / 8 blocks")
    except Exception as e:
        print(f"{name}: FAIL — {type(e).__name__}: {str(e)[:300]}")


run(k_gather2d, "vector gather img[v,u]")
run(k_gather_flat, "flat take")
run(k_onehot, "one-hot matmul")
