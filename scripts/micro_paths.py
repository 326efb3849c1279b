"""Classify the fused-sweep sampling paths + split the alloc cost.

1. Rebuilds the bench-config engine state (48 frames), then replicates the
   kernel's per-chunk window dispatch in numpy: for each active tile's 16
   chunks of HT=8 slots, compute the voxel u/v spans at the current pose
   and count which sampling path (win64 / win128 / vwin-fullW / full) each
   chunk takes, with the per-path MAC model.
2. Times allocate_packed sub-parts (dedup+scatter, searchsorted presence,
   full call) chained, to find the 5 ms.

Writes MICRO_PATHS.json.
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
        HT, TILE, V, VW, WIN, WIN2, active_tile_indices,
    )
    from bundlefusion_tpu.tsdf.integrate import candidate_keys
    from bundlefusion_tpu.tsdf.table import EMPTY_KEY, allocate_packed
    from bundlefusion_tpu.pipeline.frames import decode_frame
    from bundlefusion_tpu.geometry.lie import pose_inverse

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

    table = eng.table
    store = eng.store
    intr_int = eng.intr_int
    params = eng.tsdf_params
    H, W = intr_int.height, intr_int.width
    HP = ((H + 127) // 128) * 128
    fid = jax.device_put(jnp.asarray(n_pop - 1, jnp.int32))
    T_cur = np.asarray(seq["poses"][n_pop - 1], np.float32)
    T_dev = jax.device_put(jnp.asarray(T_cur))
    valid = jax.device_put(jnp.asarray(True))

    results = {}

    # ---- 1. path classification (numpy replica of chunk_body dispatch) ----
    w2c = jax.vmap(pose_inverse)(T_dev[None])
    tidx, nt = active_tile_indices(
        table, w2c, jnp.ones((1,), jnp.float32), intr_int, params, H, W
    )
    nt = int(nt)
    tidx = np.asarray(tidx[:nt, 0])
    geo = np.asarray(table.slot_geo[: table.num_blocks, :4])
    w2c_np = np.asarray(w2c[0])

    bs = 8 * params.voxel_size
    lin = np.arange(V)
    vx = (lin % 8).astype(np.float32)
    vy = ((lin // 8) % 8).astype(np.float32)
    vz = (lin // 64).astype(np.float32)

    counts = {"win64": 0, "win128": 0, "vwin_fullW": 0, "chunk_fullW": 0,
              "chunk_win64": 0, "chunk_win128": 0, "skipped": 0}
    macs = 0.0
    for t in tidx:
        rows = slice(t * TILE, (t + 1) * TILE)
        g = geo[rows]
        for h in range(TILE // HT):
            gs = g[h * HT : (h + 1) * HT]
            WX = gs[:, 0:1] * bs + (vx[None] + 0.5) * params.voxel_size
            WY = gs[:, 1:2] * bs + (vy[None] + 0.5) * params.voxel_size
            WZ = gs[:, 2:3] * bs + (vz[None] + 0.5) * params.voxel_size
            live = gs[:, 3:4] > 0.5
            R, tr = w2c_np[:3, :3], w2c_np[:3, 3]
            px = R[0, 0] * WX + R[0, 1] * WY + R[0, 2] * WZ + tr[0]
            py = R[1, 0] * WX + R[1, 1] * WY + R[1, 2] * WZ + tr[1]
            pz = R[2, 0] * WX + R[2, 1] * WY + R[2, 2] * WZ + tr[2]
            zs = np.maximum(pz, 1e-6)
            u = np.round(px / zs * intr_int.fx + intr_int.cx).astype(np.int64)
            v = np.round(py / zs * intr_int.fy + intr_int.cy).astype(np.int64)
            inb = (u >= 0) & (u < W) & (v >= 0) & (v < H) & (pz > 0) & live
            if not inb.any():
                counts["skipped"] += 1
                continue
            um = np.where(inb, u, -1)
            vm = np.where(inb, v, -1)
            min_u = np.where(um >= 0, um, W).min()
            max_u = um.max()
            u0w = np.clip(min_u & ~7, 0, (W - WIN) & ~7)
            fits = max_u < u0w + WIN
            u0w2 = np.clip(min_u & ~7, 0, (W - WIN2) & ~7)
            fits2 = max_u < u0w2 + WIN2
            min_v = np.where(vm >= 0, vm, HP).min()
            v0w = np.clip(min_v, 0, HP - VW)
            fits_v = vm.max() < v0w + VW
            n_rows = HT * V
            if fits and fits_v:
                counts["win64"] += 1
                macs += n_rows * WIN * 5 * VW + 5 * WIN * HP * VW
            elif fits and not fits_v:
                counts["chunk_win64"] += 1
                macs += 5 * n_rows * WIN * HP
            elif fits2 and fits_v:
                counts["win128"] += 1
                macs += n_rows * WIN2 * 5 * VW + 5 * WIN2 * HP * VW
            elif fits2 and not fits_v:
                counts["chunk_win128"] += 1
                macs += 5 * n_rows * WIN2 * HP
            elif fits_v:
                counts["vwin_fullW"] += 1
                macs += n_rows * W * 5 * VW + 5 * W * HP * VW
            else:
                counts["chunk_fullW"] += 1
                macs += 5 * n_rows * W * HP
    results["n_active_tiles"] = nt
    results["chunk_paths"] = counts
    results["sampling_gmacs_per_frame"] = round(macs / 1e9, 3)
    results["sampling_ms_at_49T_macs"] = round(macs / 49e12 * 1e3, 3)
    with open(os.path.join(ROOT, "MICRO_PATHS.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results), flush=True)

    # ---- 2. alloc sub-parts ----
    def timeit(name, fn, state, n=30):
        # warm call chains into the timed loop (donation-safe: the input
        # buffer is consumed, we continue from the returned state)
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

    M = 6144

    @jax.jit
    def f_dedup(acc):
        d, _ = decode_frame(store.depth_mm[fid], store.color[fid])
        packed_all = candidate_keys(d, intr_int, T_dev, params)
        prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), packed_all[:-1]])
        keep = (packed_all != prev) & (packed_all != EMPTY_KEY)
        cpos = jnp.cumsum(keep.astype(jnp.int32)) - 1
        packed_raw = jnp.full((M,), EMPTY_KEY, jnp.int32).at[
            jnp.where(keep & (cpos < M), cpos, M)
        ].set(packed_all, mode="drop")
        return acc + packed_raw.sum()

    timeit("cand_dedup_scatter", f_dedup, jnp.zeros((), jnp.int32))

    @jax.jit
    def f_search(acc):
        d, _ = decode_frame(store.depth_mm[fid], store.color[fid])
        packed_all = candidate_keys(d, intr_int, T_dev, params)
        prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), packed_all[:-1]])
        keep = (packed_all != prev) & (packed_all != EMPTY_KEY)
        cpos = jnp.cumsum(keep.astype(jnp.int32)) - 1
        packed_raw = jnp.full((M,), EMPTY_KEY, jnp.int32).at[
            jnp.where(keep & (cpos < M), cpos, M)
        ].set(packed_all, mode="drop")
        qpos = jnp.clip(jnp.searchsorted(table.keys, packed_raw), 0, table.capacity - 1)
        present = (table.keys[qpos] == packed_raw) & (packed_raw != EMPTY_KEY)
        return acc + jnp.sum((~present & (packed_raw != EMPTY_KEY)).astype(jnp.int32))

    timeit("cand_dedup_search", f_search, jnp.zeros((), jnp.int32))

    def f_alloc_full(t):
        d, _ = decode_frame(store.depth_mm[fid], store.color[fid])
        packed = candidate_keys(d, intr_int, T_dev, params)
        return allocate_packed(t, jnp.where(valid, packed, jnp.int32(EMPTY_KEY)))

    # donated steady-state numbers (the engine's real dispatch donates the
    # table, so these are the honest per-frame costs)
    table = timeit(
        "alloc_full_donated", jax.jit(f_alloc_full, donate_argnums=(0,)), table
    )
    table = timeit(
        "tsdf_fast_donated",
        lambda t: eng._tsdf_fast(t, store, fid, T_dev, valid),
        table,
    )

    with open(os.path.join(ROOT, "MICRO_PATHS.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
