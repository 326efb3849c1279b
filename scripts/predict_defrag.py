"""Predict the fused-sweep chunk-path mix if payload rows were key-sorted.

Loads the same engine state as micro_paths (48 bench frames), then
classifies chunks twice: with the CURRENT slot order and with slots
re-sorted by packed key (the proposed defrag). Pure host-side numpy after
the state capture.
"""

import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_cc")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.2")

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np  # noqa: E402


def classify(geo, tidx, TILE, HT, V, WIN, WIN2, VW, W, H, HP, intr, params, w2c_np):
    bs = 8 * params.voxel_size
    lin = np.arange(V)
    vx = (lin % 8).astype(np.float32)
    vy = ((lin // 8) % 8).astype(np.float32)
    vz = (lin // 64).astype(np.float32)
    counts = {"win64": 0, "win128": 0, "vwin_fullW": 0, "chunk_fullW": 0,
              "chunk_win64": 0, "chunk_win128": 0, "skipped": 0}
    macs = 0.0
    R, tr = w2c_np[:3, :3], w2c_np[:3, 3]
    for t in tidx:
        g = geo[t * TILE : (t + 1) * TILE]
        for h in range(TILE // HT):
            gs = g[h * HT : (h + 1) * HT]
            WX = gs[:, 0:1] * bs + (vx[None] + 0.5) * params.voxel_size
            WY = gs[:, 1:2] * bs + (vy[None] + 0.5) * params.voxel_size
            WZ = gs[:, 2:3] * bs + (vz[None] + 0.5) * params.voxel_size
            live = gs[:, 3:4] > 0.5
            px = R[0, 0] * WX + R[0, 1] * WY + R[0, 2] * WZ + tr[0]
            py = R[1, 0] * WX + R[1, 1] * WY + R[1, 2] * WZ + tr[1]
            pz = R[2, 0] * WX + R[2, 1] * WY + R[2, 2] * WZ + tr[2]
            zs = np.maximum(pz, 1e-6)
            u = np.round(px / zs * intr.fx + intr.cx).astype(np.int64)
            v = np.round(py / zs * intr.fy + intr.cy).astype(np.int64)
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
    return counts, macs


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
    from bundlefusion_tpu.tsdf.table import EMPTY_KEY
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
    intr_int = eng.intr_int
    params = eng.tsdf_params
    H, W = intr_int.height, intr_int.width
    HP = ((H + 127) // 128) * 128
    T_cur = np.asarray(seq["poses"][n_pop - 1], np.float32)
    T_dev = jax.device_put(jnp.asarray(T_cur))

    w2c = jax.vmap(pose_inverse)(T_dev[None])
    tidx, nt = active_tile_indices(
        table, w2c, jnp.ones((1,), jnp.float32), intr_int, params, H, W
    )
    nt = int(nt)
    tidx_np = np.asarray(tidx[:nt, 0])
    N = table.num_blocks
    geo = np.asarray(table.slot_geo[:N, :4])
    slot_keys = np.asarray(table.slot_keys[:N])
    w2c_np = np.asarray(w2c[0])

    cur_counts, cur_macs = classify(
        geo, tidx_np, TILE, HT, V, WIN, WIN2, VW, W, H, HP, intr_int, params, w2c_np
    )

    # defrag prediction: sort live slots by packed key; dead rows drop out
    order = np.argsort(slot_keys, kind="stable")
    # Morton-order prediction: interleave x/y/z bits -> chunks become 2x2x2
    # block octants (spatially compact cubes, tiny projected span)
    def morton(k):
        k = k.astype(np.int64)
        live = k != np.int32(2**31 - 1)
        x = k & 1023; y = (k >> 10) & 1023; z = (k >> 20) & 1023
        def spread(a):
            a = a.astype(np.int64)
            a = (a | (a << 16)) & 0x030000FF
            a = (a | (a << 8)) & 0x0300F00F
            a = (a | (a << 4)) & 0x030C30C3
            a = (a | (a << 2)) & 0x09249249
            return a
        m = spread(x) | (spread(y) << 1) | (spread(z) << 2)
        return np.where(live, m, np.int64(1) << 62)
    order_m = np.argsort(morton(slot_keys), kind="stable")
    geo_s = geo[order]
    live_s = slot_keys[order] != np.int32(2**31 - 1)
    geo_s[~live_s, 3] = 0.0
    n_live = int(live_s.sum())
    # active tiles after defrag: recompute from the sorted geometry
    # (reuse the same frustum test as classify by marking all tiles of the
    # live prefix active, then letting per-chunk 'skipped' handle the rest)
    nt_defrag = (n_live + TILE - 1) // TILE
    df_counts, df_macs = classify(
        geo_s, np.arange(nt_defrag), TILE, HT, V, WIN, WIN2, VW, W, H, HP,
        intr_int, params, w2c_np,
    )
    geo_m = geo[order_m]
    live_m = slot_keys[order_m] != np.int32(2**31 - 1)
    geo_m[~live_m, 3] = 0.0
    m_counts, m_macs = classify(
        geo_m, np.arange(nt_defrag), TILE, HT, V, WIN, WIN2, VW, W, H, HP,
        intr_int, params, w2c_np,
    )
    out = {
        "n_live": n_live,
        "morton": {"tiles": nt_defrag, "paths": m_counts,
                   "gmacs": round(m_macs / 1e9, 1)},
        "current": {"tiles": nt, "paths": cur_counts,
                    "gmacs": round(cur_macs / 1e9, 1)},
        "defrag": {"tiles": nt_defrag, "paths": df_counts,
                   "gmacs": round(df_macs / 1e9, 1)},
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
