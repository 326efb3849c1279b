"""TSDF-stage sub-attribution by chained-dispatch timing.

Splits the per-frame TSDF cost (the biggest stage in ABLATION.json) into:
  decode+candidates, allocate_packed, active_tile_indices, pack_img5,
  kernel sweep (apply_tsdf_ops), and the fused tsdf_fast total.

Each program is dispatched N times back-to-back with donated/chained state
and ONE block_until_ready at the end, so per-dispatch tunnel overhead
amortizes away and the number is honest steady-state device time
(serialized per-call timing through the dev tunnel is polluted — see
scripts/ablate.py).

Writes MICRO_TSDF.json.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_cc")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.2")

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from bundlefusion_tpu import AppConfig, BundlingConfig
    from bundlefusion_tpu.io.synthetic import default_intrinsics
    from bundlefusion_tpu.ops.sift import SiftConfig
    from bundlefusion_tpu.pipeline.online import BundleFusion
    from bundlefusion_tpu.tsdf.apply_pallas import (
        active_tile_indices,
        apply_tsdf_ops,
        pack_img5,
    )
    from bundlefusion_tpu.tsdf.integrate import candidate_keys
    from bundlefusion_tpu.tsdf.table import EMPTY_KEY, allocate_packed
    from bundlefusion_tpu.pipeline.frames import decode_frame
    from bundlefusion_tpu.geometry.lie import pose_inverse

    sys.path.insert(0, ROOT)
    from bench import seq_cached

    intr = default_intrinsics(640, 480)
    app = AppConfig(
        hash_num_sdf_blocks=131072, hash_key_capacity=131072,
        visible_blocks_cap=8192,
    )
    bundling = BundlingConfig(max_global_corr=16384)
    sift_cfg = SiftConfig(
        target_keys=150, min_scale=bundling.min_key_scale,
        depth_min=app.sensor_depth_min, depth_max=app.sensor_depth_max,
    )
    n_pop = 48  # frames to populate the map before measuring
    seq = seq_cached(n_pop + 1, intr.width, intr.height)
    eng = BundleFusion(intr, app, bundling, sift_cfg=sift_cfg, max_keyframes=64)
    handles = [
        eng.upload_frame(seq["depth"][i], seq["color"][i]) for i in range(n_pop + 1)
    ]
    jax.block_until_ready(handles)
    eng.warmup()
    for i in range(n_pop):
        eng.process_frame(handles[i])
    jax.block_until_ready((eng.local, eng.glob, eng.table))

    table = eng.table
    store = eng.store
    intr_int = eng.intr_int
    params = eng.tsdf_params
    fid = jax.device_put(jnp.asarray(n_pop - 1, jnp.int32))
    T_cur = jax.device_put(jnp.asarray(np.asarray(seq["poses"][n_pop - 1], np.float32)))
    valid = jax.device_put(jnp.asarray(True))
    H, W = intr_int.height, intr_int.width

    hw = int(table.high_water)
    print(f"high_water={hw} free={int(table.free_count)}", file=sys.stderr)

    results = {"high_water": hw}

    def timeit(name, fn, state, n=30):
        # warm
        s = fn(state)
        jax.block_until_ready(s)
        t0 = time.perf_counter()
        s = state
        for _ in range(n):
            s = fn(s)
        jax.block_until_ready(s)
        ms = 1000.0 * (time.perf_counter() - t0) / n
        results[name] = round(ms, 3)
        print(f"{name}: {ms:.3f} ms", file=sys.stderr)
        return ms

    # 1) full fused stage (table chained through; same frame each iter)
    f_fast = jax.jit(lambda t: eng._tsdf_fast(t, store, fid, T_cur, valid))
    timeit("tsdf_fast_total", f_fast, table)

    # 2) decode + candidate_keys
    @jax.jit
    def f_cand(acc):
        d, c = decode_frame(store.depth_mm[fid], store.color[fid])
        packed = candidate_keys(d, intr_int, T_cur, params)
        return acc + packed.sum()

    timeit("decode_candidates", f_cand, jnp.zeros((), jnp.int32))

    # 3) alloc (steady state: all blocks already present -> no_merge branch,
    #    which is the per-frame common case)
    @jax.jit
    def f_alloc(t):
        d, c = decode_frame(store.depth_mm[fid], store.color[fid])
        packed = candidate_keys(d, intr_int, T_cur, params)
        return allocate_packed(t, jnp.where(valid, packed, jnp.int32(EMPTY_KEY)))

    timeit("decode_candidates_alloc", f_alloc, table)

    # 4) active_tile_indices schedule
    w2c = jax.vmap(pose_inverse)(T_cur[None])
    signs1 = jnp.ones((1,), jnp.float32)

    @jax.jit
    def f_sched(acc):
        tidx, nt = active_tile_indices(
            table, w2c, signs1, intr_int, params, H, W
        )
        return acc + nt + tidx[0, 0]

    timeit("active_tiles", f_sched, jnp.zeros((), jnp.int32))

    nt_val = int(
        active_tile_indices(table, w2c, signs1, intr_int, params, H, W)[1]
    )
    results["n_active_tiles"] = nt_val
    print(f"n_active_tiles={nt_val}", file=sys.stderr)

    # 5) pack_img5
    @jax.jit
    def f_pack(acc):
        d, c = decode_frame(store.depth_mm[fid], store.color[fid])
        img5 = pack_img5(d, c)
        return acc + img5.sum().astype(jnp.float32)

    timeit("decode_pack_img5", f_pack, jnp.zeros((), jnp.float32))

    # 6) kernel sweep alone (decode outside the chain? keep decode inside
    #    for comparability with tsdf_fast; schedule+pack+kernel)
    @jax.jit
    def f_sweep(t):
        d, c = decode_frame(store.depth_mm[fid], store.color[fid])
        return apply_tsdf_ops(
            t, d[None], c[None], T_cur[None],
            jnp.ones((1,), jnp.float32), jnp.zeros((1,), jnp.int32),
            intr_int, params,
        )

    timeit("decode_sweep", f_sweep, table)

    results["derived"] = {
        "alloc_only": round(
            results["decode_candidates_alloc"] - results["decode_candidates"], 3
        ),
        "sweep_kernel_only": round(
            results["decode_sweep"]
            - results["active_tiles"]
            - results["decode_pack_img5"],
            3,
        ),
    }
    with open(os.path.join(ROOT, "MICRO_TSDF.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__" and "--ablate" not in sys.argv:
    main()


def ablation():
    """Kernel-floor ablation: time the sweep with sampling disabled and with
    every chunk forced through the shared WIN2 window (timing-only modes)."""
    import jax
    import jax.numpy as jnp

    from bundlefusion_tpu import AppConfig, BundlingConfig
    from bundlefusion_tpu.io.synthetic import default_intrinsics
    from bundlefusion_tpu.ops.sift import SiftConfig
    from bundlefusion_tpu.pipeline.online import BundleFusion
    from bundlefusion_tpu.tsdf.apply_pallas import apply_tsdf_ops
    from bundlefusion_tpu.pipeline.frames import decode_frame

    from bench import seq_cached

    intr = default_intrinsics(640, 480)
    app = AppConfig(
        hash_num_sdf_blocks=131072, hash_key_capacity=131072,
        visible_blocks_cap=8192,
    )
    bundling = BundlingConfig(max_global_corr=16384)
    sift_cfg = SiftConfig(
        target_keys=150, min_scale=bundling.min_key_scale,
        depth_min=app.sensor_depth_min, depth_max=app.sensor_depth_max,
    )
    n_pop = 48
    seq = seq_cached(n_pop + 1, intr.width, intr.height)
    eng = BundleFusion(intr, app, bundling, sift_cfg=sift_cfg, max_keyframes=64)
    handles = [
        eng.upload_frame(seq["depth"][i], seq["color"][i]) for i in range(n_pop + 1)
    ]
    jax.block_until_ready(handles)
    eng.warmup()
    for i in range(n_pop):
        eng.process_frame(handles[i])
    jax.block_until_ready((eng.local, eng.glob, eng.table))

    table, store = eng.table, eng.store
    intr_int, params = eng.intr_int, eng.tsdf_params
    fid = jax.device_put(jnp.asarray(n_pop - 1, jnp.int32))
    T_cur = jax.device_put(jnp.asarray(np.asarray(seq["poses"][n_pop - 1], np.float32)))

    results = {}

    def timeit(name, fn, state, n=30):
        s = fn(state)
        jax.block_until_ready(s)
        t0 = time.perf_counter()
        for _ in range(n):
            s = fn(s)
        jax.block_until_ready(s)
        ms = 1000.0 * (time.perf_counter() - t0) / n
        results[name] = round(ms, 3)
        print(f"{name}: {ms:.3f} ms", flush=True)
        return s

    for mode in (None, "nosamp", "all_win2"):
        def f(t, mode=mode):
            d, c = decode_frame(store.depth_mm[fid], store.color[fid])
            return apply_tsdf_ops(
                t, d[None], c[None], T_cur[None],
                jnp.ones((1,), jnp.float32), jnp.zeros((1,), jnp.int32),
                intr_int, params, ablate=mode,
            )
        table = timeit(f"sweep_{mode}", jax.jit(f, donate_argnums=(0,)), table)
    print(json.dumps(results))


if __name__ == "__main__" and "--ablate" in sys.argv:
    ablation()
