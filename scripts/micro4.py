"""Trustworthy microbenchmarks: block_until_ready does NOT wait on the axon
relay, so every measurement fetches real output bytes at the end and uses
aggregate wall time over n iterations."""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_cc")
import numpy as np
import jax
import jax.numpy as jnp


def fetch(out):
    leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "shape")]
    for x in leaves[:3]:
        np.asarray(jax.device_get(x.ravel()[:1]))


def bench(name, fn, *args, n=20):
    out = fn(*args)
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    fetch(out)
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:36s}: {dt:8.3f} ms", flush=True)
    return out


key = jax.random.PRNGKey(0)

# sanity: known-FLOP matmul — must report >= ~0.7 ms
a = jax.random.normal(key, (4096, 4096), jnp.bfloat16)
f_mm = jax.jit(lambda a: a @ a)
bench("matmul 4096^3 bf16 (137 GFLOP)", f_mm, a)

# fetch-latency floor
f_triv = jax.jit(lambda x: x + 1)
x8 = jnp.zeros((8, 128), jnp.float32)
bench("trivial op + fetch floor", f_triv, x8)

# gathers
src = jax.random.normal(key, (131073, 512), jnp.float32)
ss = jax.random.randint(key, (240, 320), 0, 131072)
lin = jax.random.randint(key, (240, 320), 0, 512)
bench("2D gather 76800 from 268MB", jax.jit(lambda s, i, j: s[i, j]), src, ss, lin)
img = jax.random.normal(key, (240, 320), jnp.float32)
iu = jax.random.randint(key, (2048, 512), 0, 320)
iv = jax.random.randint(key, (2048, 512), 0, 240)
bench("pixel gather 1M from 240x320", jax.jit(lambda im, v, u: im[v, u]), img, iv, iu)
idxr = jax.random.randint(key, (8192,), 0, 131072)
bench("row gather 8192x512 f32", jax.jit(lambda s, i: s[i]), src, idxr)

# scatter rows
rows = jax.random.normal(key, (8192, 512), jnp.float32)
bench("row scatter 8192x512", jax.jit(lambda s, i, r: s.at[i].set(r)), src, idxr, rows)

# sorts
keys262 = jax.random.randint(key, (262144,), 0, 2**30)
bench("sort 262144 int32", jax.jit(jnp.sort), keys262)
bench("argsort 262144 int32", jax.jit(jnp.argsort), keys262)
q76 = jax.random.randint(key, (76800,), 0, 2**30)
ss_tab = jnp.sort(jax.random.randint(key, (131072,), 0, 2**30))
bench("searchsorted 76800 in 131072", jax.jit(jnp.searchsorted), ss_tab, q76)
ss_q = jax.random.randint(key, (6144,), 0, 2**30)
bench("searchsorted 6144 in 131072", jax.jit(jnp.searchsorted), ss_tab, ss_q)
bench("cumsum 76800 int32", jax.jit(jnp.cumsum), q76)

# upload with verification fetch
h_depth = np.random.randint(0, 4000, (480, 640)).astype(np.uint16)
h_color = np.random.randint(0, 255, (480, 640, 3)).astype(np.uint8)
def up(d, c):
    return jnp.asarray(d), jnp.asarray(c)
t0 = time.perf_counter()
for _ in range(10):
    o = up(h_depth, h_color)
fetch(o)
print(f"{'upload 1.5MB frame':36s}: {(time.perf_counter()-t0)/10*1000:8.3f} ms", flush=True)

# does upload overlap with compute? enqueue a long chain of matmuls, then
# upload while they run: total should be ~= max(compute, upload)
def chain(a, k):
    for _ in range(k):
        a = a @ a * 1e-3
    return a
f_chain = jax.jit(lambda a: chain(a, 30))  # ~30 matmuls
o = f_chain(a); fetch(o)
t0 = time.perf_counter()
o = f_chain(a)
ups = [up(h_depth, h_color) for _ in range(3)]
fetch(ups)
fetch(o)
dt = time.perf_counter() - t0
print(f"{'30 matmuls || 3 uploads':36s}: {dt*1000:8.3f} ms", flush=True)
t0 = time.perf_counter()
o = f_chain(a); fetch(o)
print(f"{'30 matmuls alone':36s}: {(time.perf_counter()-t0)*1000:8.3f} ms", flush=True)
t0 = time.perf_counter()
ups = [up(h_depth, h_color) for _ in range(3)]
fetch(ups)
print(f"{'3 uploads alone':36s}: {(time.perf_counter()-t0)*1000:8.3f} ms", flush=True)
