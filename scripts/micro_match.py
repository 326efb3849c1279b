"""Microbench match_and_filter internals at bench shapes."""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_cc")
import numpy as np, jax, jax.numpy as jnp
from functools import partial

from bundlefusion_tpu.geometry.camera import CameraIntrinsics
from bundlefusion_tpu.ops.matching import match_descriptors_pair
from bundlefusion_tpu.ops.filters import kabsch_filter_pair, surface_area_filter_pair, dense_verify_pair, DenseVerifyParams
from bundlefusion_tpu.pipeline.frames import create_keyframe_store, create_dense_cache, backproject_keys
from bundlefusion_tpu.pipeline.frontend import match_and_filter, FrontendParams

rng = np.random.default_rng(0)

def timeit(name, fn, n=10):
    r = jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    jax.block_until_ready(r)
    print(f"{name:36s} {1000*(time.perf_counter()-t0)/n:8.2f} ms")
    return r

for tag, P, K in (("local", 12, 150), ("global", 64, 1024)):
    intr_sift = CameraIntrinsics(fx=525.0, fy=525.0, cx=319.5, cy=239.5, width=640, height=480)
    intr_cache = CameraIntrinsics(fx=65.6, fy=65.6, cx=39.5, cy=29.5, width=80, height=60)
    keys = create_keyframe_store(P, K)
    desc = rng.normal(size=(P, K, 128)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
    keys = keys._replace(
        pos=jnp.asarray(rng.uniform(0, 480, (P, K, 2)).astype(np.float32)),
        depth=jnp.asarray(rng.uniform(0.5, 3.5, (P, K)).astype(np.float32)),
        valid=jnp.ones((P, K), bool),
        desc=jnp.asarray(desc).astype(jnp.bfloat16),
        frame_valid=jnp.ones((P,), bool),
    )
    cache = create_dense_cache(P, 60, 80)
    cache = cache._replace(
        depth=jnp.asarray(rng.uniform(0.5, 3.5, (P, 60, 80)).astype(np.float32)),
        campos=jnp.asarray(rng.normal(size=(P, 60, 80, 3)).astype(np.float32)),
        normal=jnp.asarray(rng.normal(size=(P, 60, 80, 3)).astype(np.float32)),
    )
    fp = FrontendParams()
    slot = jnp.asarray(P - 1)
    timeit(f"{tag}: match_and_filter P={P} K={K}",
           lambda: match_and_filter(slot, keys, cache, intr_sift, intr_cache, fp))
    fp2 = FrontendParams(use_dense_verify=False)
    timeit(f"{tag}: no dense verify",
           lambda: match_and_filter(slot, keys, cache, intr_sift, intr_cache, fp2))

    # matcher alone
    mm = jax.jit(jax.vmap(lambda dj, vj: match_descriptors_pair(
        keys.desc[P-1].astype(jnp.float32), keys.valid[P-1], dj.astype(jnp.float32), vj, 0.7, 0.8, 128)))
    timeit(f"{tag}: matcher alone", lambda: mm(keys.desc, keys.valid))

    # kabsch alone
    m = mm(keys.desc, keys.valid)
    pc = jax.vmap(lambda idx: backproject_keys(keys.pos[P-1][idx], keys.depth[P-1][idx], intr_sift))(m.idx_i)
    pp = pc + 0.01
    kab = jax.jit(jax.vmap(lambda a, b, xa, xb, v: kabsch_filter_pair(a, b, xa, xb, v, 25, 4, 4e-4)))
    pix = jnp.zeros((P, 128, 2))
    timeit(f"{tag}: kabsch alone", lambda: kab(pc, pp, pix, pix, m.valid))
EOF_MARKER_NOT_USED = 1
