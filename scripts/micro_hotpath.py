"""Stage-level micro-timing of the per-frame hot path on the real TPU.

Builds a bench-operating-point engine state (640x480, 320x240 integration,
1 cm voxels), then times each stage of the three per-frame programs
separately to rank optimization targets:

  splat_render : cull -> row-gather -> crossings -> project -> scatter-min
                 -> color-gather -> hole-fill   (staged variants)
  tsdf_fast    : candidate_keys | allocate_packed | apply sweep
  frame_step   : decode+preprocess | detect_and_describe | match_and_filter

Each timing is median wall ms over n calls with block_until_ready; the
"null" row is an empty program measuring dispatch+sync tunnel RTT — read
stage cost as ms - null.
"""

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np  # noqa: E402


def t_med(fn, n=15):
    import jax

    out = fn()
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) * 1e3)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial

    from bundlefusion_tpu import AppConfig, BundlingConfig
    from bundlefusion_tpu.io.synthetic import default_intrinsics, make_sequence
    from bundlefusion_tpu.ops.sift import SiftConfig, detect_and_describe
    from bundlefusion_tpu.pipeline.online import BundleFusion
    from bundlefusion_tpu.pipeline.frontend import match_and_filter
    from bundlefusion_tpu.tsdf.integrate import candidate_keys
    from bundlefusion_tpu.tsdf.table import EMPTY_KEY, allocate_packed
    from bundlefusion_tpu.tsdf.splat import SplatParams, splat_render
    from bundlefusion_tpu.pipeline.frames import decode_frame

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
    eng = BundleFusion(intr, app, bundling, sift_cfg=sift_cfg, max_keyframes=64)
    print("warmup...", flush=True)
    eng.warmup()
    n_frames = 36
    seq = make_sequence(n_frames, intr=intr)
    for i in range(n_frames):
        eng.process_frame(seq["depth"][i], seq["color"][i])
    jax.block_until_ready((eng.local, eng.glob, eng.table))
    eng._flush_pending()
    live = int(np.asarray(jnp.sum((eng.table.slot_geo[:, 3] > 0.5))))
    print(f"table live blocks: {live}", flush=True)

    null_fn = jax.jit(lambda x: x + 1.0)
    x0 = jnp.zeros((8,), jnp.float32)
    null = t_med(lambda: null_fn(x0), n=25)
    print(f"null RTT          {null:7.2f} ms", flush=True)

    T = jnp.asarray(eng.sift_world[-1])
    tp, ip, vcap = eng.tsdf_params, eng.intr_int, eng.vis_cap

    # ---- splat stages ----
    for cap in (8192, 4096, 2048):
        sp = SplatParams(depth_min=app.render_depth_min,
                         depth_max=app.render_depth_max, visible_cap=cap)
        fn = jax.jit(partial(splat_render, intr=ip, tsdf_params=tp, params=sp))
        ms = t_med(lambda: fn(eng.table, cam_to_world=T))
        print(f"splat cap={cap:5d}   {ms:7.2f} ms", flush=True)
    sp1 = SplatParams(depth_min=app.render_depth_min,
                      depth_max=app.render_depth_max, visible_cap=8192,
                      fill_passes=0)
    fn = jax.jit(partial(splat_render, intr=ip, tsdf_params=tp, params=sp1))
    ms = t_med(lambda: fn(eng.table, cam_to_world=T))
    print(f"splat no-fill     {ms:7.2f} ms", flush=True)
    spn = SplatParams(depth_min=app.render_depth_min,
                      depth_max=app.render_depth_max, visible_cap=8192,
                      use_color=False)
    fn = jax.jit(partial(splat_render, intr=ip, tsdf_params=tp, params=spn))
    ms = t_med(lambda: fn(eng.table, cam_to_world=T))
    print(f"splat no-color    {ms:7.2f} ms", flush=True)

    # ---- tsdf stages ----
    fid = eng._i32(min(n_frames - 1, eng.frame_cap))
    dec = jax.jit(lambda store, f: decode_frame(store.depth_mm[f], store.color[f]))
    ms = t_med(lambda: dec(eng.store, fid))
    print(f"tsdf decode       {ms:7.2f} ms", flush=True)
    d, c = dec(eng.store, fid)
    ck = jax.jit(partial(candidate_keys, intr=ip, params=tp))
    ms = t_med(lambda: ck(d, cam_to_world=T))
    print(f"candidate_keys    {ms:7.2f} ms", flush=True)
    packed = ck(d, cam_to_world=T)
    alloc = jax.jit(allocate_packed)
    ms = t_med(lambda: alloc(eng.table, packed))
    print(f"allocate_packed   {ms:7.2f} ms", flush=True)
    from bundlefusion_tpu.tsdf.apply_pallas import apply_tsdf_ops
    ap = jax.jit(partial(apply_tsdf_ops, intr=ip, params=tp))
    one = jnp.ones((1,), jnp.float32)
    img0 = jnp.zeros((1,), jnp.int32)
    ms = t_med(lambda: ap(eng.table, d[None], c[None], T[None], one, img0))
    print(f"apply sweep (1op) {ms:7.2f} ms", flush=True)

    # ---- frontend stages ----
    du16 = jnp.asarray((np.nan_to_num(seq["depth"][-1]) * 1000).astype(np.uint16))
    cu8 = jnp.asarray((seq["color"][-1] * 255).astype(np.uint8))

    @jax.jit
    def preprocess(depth_u16, color_u8):
        from bundlefusion_tpu.ops.image import (
            erode_depth, resample_bilinear, resample_nearest, rgb_to_intensity,
        )
        depth = jnp.where(depth_u16 > 0, depth_u16.astype(jnp.float32) * 1e-3, jnp.nan)
        color = color_u8.astype(jnp.float32) / 255.0
        dd = erode_depth(erode_depth(depth))
        intens = rgb_to_intensity(color)
        i_s = resample_bilinear(intens, eng.intr_sift.height, eng.intr_sift.width)
        d_s = resample_nearest(dd, eng.intr_sift.height, eng.intr_sift.width)
        d_i = resample_nearest(dd, ip.height, ip.width)
        c_i = resample_bilinear(color, ip.height, ip.width)
        return i_s, d_s, d_i, c_i

    ms = t_med(lambda: preprocess(du16, cu8))
    print(f"preprocess        {ms:7.2f} ms", flush=True)
    i_s, d_s, _, _ = preprocess(du16, cu8)
    det = jax.jit(partial(detect_and_describe, cfg=sift_cfg))
    ms = t_med(lambda: det(i_s, d_s))
    print(f"detect_describe   {ms:7.2f} ms", flush=True)
    mafn = jax.jit(partial(
        match_and_filter,
        intr_sift=eng.intr_sift, intr_cache=eng.intr_cache,
        params=eng.frontend_local,
    ))
    ms = t_med(lambda: mafn(eng._i32(eng.S - 1), eng.local.keys, eng.local.cache))
    print(f"match_and_filter  {ms:7.2f} ms (S={eng.S})", flush=True)


if __name__ == "__main__":
    main()
