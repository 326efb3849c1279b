"""Fused multi-op TSDF integrate/de-integrate Pallas kernel (in-place).

This replaces the per-op pipeline (allocate -> compactify visible -> XLA
row-gather workspace -> kernel -> row-scatter) that reproduced the
reference's ``integrateDepthMapKernel`` (CUDASceneRepHashSDF.cu:420-521)
one dispatch per (de)integration. Profiling on TPU v5e showed the XLA
row gather/scatter of the workspace running at ~13 GB/s (the (8, 128)
tiled layout makes single-row access read whole tiles) and the per-op
fixed costs (compactify ~3.5 ms, gather+scatter ~13 ms) dominating — a
re-integration frame dispatches up to 11 such ops (reintegrate budget,
``DepthSensing.cpp:854-902``).

Design (one kernel invocation applies ALL of a frame's TSDF ops):

- **slot-major frustum-compacted sweep**: payload rows are processed in
  TILE-row contiguous chunks via manually double-buffered DMA
  (HBM->VMEM->HBM) — but only the tiles holding a live block inside some
  op's view frustum (``active_tile_indices``), so memory traffic is
  sequential at HBM bandwidth and scales with the *visible surface*, not
  occupancy (the round-2 sweep walked all of ``[0, high_water)``:
  ~10 KB/block of DMA for every live block every frame). Block
  coordinates come from the table's slot-major inverse map
  (``slot_keys``); dead rows inside an active tile pass through
  untouched.
- **in-place**: the payload arrays are passed in ``ANY`` (HBM) memory
  space and aliased to the outputs — no XLA workspace, no table copy.
- **multi-op**: each op is (pose, sign, image index). A re-integration
  row is two ops on the same image (sign -1 at the old pose, +1 at the
  new); the current frame's fuse is one op. Ops apply sequentially per
  voxel, exactly like the reference's sequential kernel launches. sign=0
  is an exact bitwise no-op (gates invalid frames without copies).
- **tile-vectorized update, per-block MXU sampling**: geometry,
  projection, and the voxel update run on whole (TILE, 512) chunks (full
  VPU lanes); only image sampling loops per block, selecting the five
  channels (depth split bf16 hi/lo for f32 accuracy + RGB) with one-hot
  contractions on the MXU over a 64-column u-window of the transposed
  image (full-width fallback for blocks very close to the camera).
  One-hot selection is exact. Mosaic constrains vector shape casts, so
  the only reshapes used are leading-dim merges ((1, 512, HP) ->
  (512, HP)) and sublane-vector spreads ((512, 1) -> (1, 512)), both
  verified supported.

The voxel update math (truncation band, weighted running average with
sign, premultiplied channel-major color) is identical to
``integrate.integrate_frame`` and cross-checked in tests.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bundlefusion_tpu.geometry.camera import CameraIntrinsics
from bundlefusion_tpu.geometry.lie import pose_inverse
from bundlefusion_tpu.tsdf.integrate import TsdfParams
from bundlefusion_tpu.tsdf.table import (
    BLOCK_SIZE,
    BLOCK_VOLUME,
    EMPTY_KEY,
    GRID_BITS,
    GRID_DIM,
    GRID_HALF,
    VoxelBlockTable,
)

V = BLOCK_VOLUME                  # 512
TILE = 128                        # payload rows per DMA chunk (fewer, larger
                                  # DMAs: the per-tile issue/loop overhead on
                                  # the scalar core was the measured floor)
HT = 8                            # sampling chunk rows: slots allocate in
                                  # sorted packed-key batches (x fastest), so
                                  # a chunk of HT consecutive slots is an
                                  # ~HT-block x-strip; 8 blocks = 64 cm spans
                                  # ~90 px at 2 m. HT=4 would halve the
                                  # windows but mosaic vector loads need 8
                                  # sublanes. The one-hot contraction costs
                                  # WIN * 5*VW MACs PER VOXEL — window size
                                  # is the whole cost model
WIN = 64                          # u-window columns for MXU sampling
WIN2 = 128                        # wider u-window (near-camera fallback).
                                  # NEGATIVE RESULT (round 5): adding a
                                  # WIN3=256 tier between WIN2 and the
                                  # full-W fallbacks LOST ~3 ms/frame at
                                  # the bench point (26.9 -> 24.8 fps)
                                  # despite the ablation showing all-WIN2
                                  # sampling at 3.9 ms vs the real mix's
                                  # 12.2 ms — the extra pl.when branches
                                  # cost more per chunk than the saved
                                  # MACs. Cutting fallback cost needs a
                                  # restructure (e.g. per-block windows in
                                  # one batched contraction), not more
                                  # dispatch tiers.
VW = 128                          # v-window columns (HP is always >= 128);
                                  # VW=64 measured SLOWER: tilted x-strips
                                  # project diagonally, v-span tracks u-span
                                  # (~90-120 px), so narrower windows push
                                  # chunks onto the full-HP fallback paths


def _apply_kernel(
    # SMEM inputs
    nt_ref,       # (1, 1) int32: number of ACTIVE tiles to sweep
    tidx_ref,     # (NT, 1) int32: tile index per sweep step (frustum-
                  # compacted: only tiles holding a live block inside some
                  # op's frustum are visited; everything else is provably
                  # untouched by the update rule and skipped entirely)
    meta_ref,     # (OPS, 16) f32: R row-major (9) | t (3) | sign | img | 0 | 0
    # VMEM inputs
    img5_ref,     # (IMGS*5*W, HP) bf16: per image d_hi | d_lo | r | g | b
                  # planes, each transposed [W, HP]
    # ANY (HBM): per-slot geometry rows (block coords + live flag)
    geo_any,      # (N + 1, 128) f32
    # ANY (HBM) inputs, aliased to outputs
    sdf_any,      # (N + 1, V) f32
    w_any,        # (N + 1, V) f32
    c_any,        # (N + 1, 3*V) f32 channel-major
    # outputs (aliased: 0 -> sdf_any, 1 -> w_any, 2 -> c_any)
    sdf_out_any,
    w_out_any,
    c_out_any,
    # scratch
    in_sdf,       # VMEM (2, TILE, V)
    in_w,         # VMEM (2, TILE, V)
    in_c,         # VMEM (2, TILE, 3*V)
    out_sdf,      # VMEM (2, TILE, V)
    out_w,
    out_c,
    geobuf,       # VMEM (2, TILE, 128): per-slot block coords + live flag
    uvb,          # VMEM (3, TILE, V) int32: u | v | z_mm (staged: computed
                  # arrays cannot be re-read tile-wide inside nested conds)
    samp,         # VMEM (5, TILE, V): d_hi | d_lo | r | g | b samples
    in_sems,      # DMA (2, 4)
    out_sems,     # DMA (2, 3)
    *,
    OPS: int,
    ablate,
    H: int,
    W: int,
    HP: int,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    voxel_size: float,
    truncation: float,
    truncation_scale: float,
    depth_min: float,
    depth_max: float,
    w_sample: float,
    w_max: float,
):
    nt = nt_ref[0, 0]
    # voxel-local coordinate grids, (1, V) broadcast rows
    lin1 = jax.lax.broadcasted_iota(jnp.int32, (1, V), 1)
    vx1 = (lin1 % BLOCK_SIZE).astype(jnp.float32)
    vy1 = ((lin1 // BLOCK_SIZE) % BLOCK_SIZE).astype(jnp.float32)
    vz1 = (lin1 // (BLOCK_SIZE * BLOCK_SIZE)).astype(jnp.float32)
    # one-hot index grids: tiny (1, 1, X) iotas that broadcast inside the
    # compare (a materialized (TILE, V, X) iota would cost MBs of VMEM);
    # the compare output reshapes by merging leading dims (mosaic-legal)
    v_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, HP), 2)
    u_ids_win = jax.lax.broadcasted_iota(jnp.int32, (1, 1, WIN), 2)
    u_ids_win2 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, WIN2), 2)
    u_ids_full = jax.lax.broadcasted_iota(jnp.int32, (1, 1, W), 2)
    vw_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, VW), 2)
    hp_ids_col = jax.lax.broadcasted_iota(jnp.int32, (HP, VW), 0)
    vw_ids_row = jax.lax.broadcasted_iota(jnp.int32, (HP, VW), 1)

    def in_dmas(t, slot):
        off = pl.multiple_of(tidx_ref[t, 0] * TILE, TILE)
        return [
            pltpu.make_async_copy(
                sdf_any.at[pl.ds(off, TILE), :], in_sdf.at[slot], in_sems.at[slot, 0]
            ),
            pltpu.make_async_copy(
                w_any.at[pl.ds(off, TILE), :], in_w.at[slot], in_sems.at[slot, 1]
            ),
            pltpu.make_async_copy(
                c_any.at[pl.ds(off, TILE), :], in_c.at[slot], in_sems.at[slot, 2]
            ),
            pltpu.make_async_copy(
                geo_any.at[pl.ds(off, TILE), :], geobuf.at[slot], in_sems.at[slot, 3]
            ),
        ]

    def out_dmas(t, slot):
        off = pl.multiple_of(tidx_ref[t, 0] * TILE, TILE)
        return [
            pltpu.make_async_copy(
                out_sdf.at[slot], sdf_out_any.at[pl.ds(off, TILE), :], out_sems.at[slot, 0]
            ),
            pltpu.make_async_copy(
                out_w.at[slot], w_out_any.at[pl.ds(off, TILE), :], out_sems.at[slot, 1]
            ),
            pltpu.make_async_copy(
                out_c.at[slot], c_out_any.at[pl.ds(off, TILE), :], out_sems.at[slot, 2]
            ),
        ]

    @pl.when(nt > 0)
    def _():
        for d in in_dmas(0, 0):
            d.start()

    @pl.when(nt > 1)
    def _():
        for d in in_dmas(1, 1):
            d.start()

    def body(t, _):
        slot = jax.lax.rem(t, 2)
        for d in in_dmas(t, slot):
            d.wait()

        @pl.when(t >= 2)
        def _():
            # this slot's previous out-DMA (tile t-2) must land before the
            # compute below overwrites the out buffers
            for d in out_dmas(t - 2, slot):
                d.wait()

        # ---- vectorized per-tile geometry from the slot_geo rows ----
        bs = BLOCK_SIZE * voxel_size
        WX = geobuf[slot, :, 0:1] * bs + (vx1 + 0.5) * voxel_size  # (TILE, V)
        WY = geobuf[slot, :, 1:2] * bs + (vy1 + 0.5) * voxel_size
        WZ = geobuf[slot, :, 2:3] * bs + (vz1 + 0.5) * voxel_size
        LIVE = geobuf[slot, :, 3:4] > 0.5

        # ---- sequential ops over the whole tile ----
        def op_body(o, cry):
            sdf, w, r_, g_, b_ = cry
            sign = meta_ref[o, 12]

            def apply(cry2):
                sdf, w, r_, g_, b_ = cry2
                img = meta_ref[o, 13].astype(jnp.int32)
                px = meta_ref[o, 0] * WX + meta_ref[o, 1] * WY + meta_ref[o, 2] * WZ + meta_ref[o, 9]
                py = meta_ref[o, 3] * WX + meta_ref[o, 4] * WY + meta_ref[o, 5] * WZ + meta_ref[o, 10]
                pz = meta_ref[o, 6] * WX + meta_ref[o, 7] * WY + meta_ref[o, 8] * WZ + meta_ref[o, 11]
                zs = jnp.maximum(pz, 1e-6)
                u = jnp.round(px / zs * fx + cx).astype(jnp.int32)   # (TILE, V)
                v = jnp.round(py / zs * fy + cy).astype(jnp.int32)
                inb = (u >= 0) & (u < W) & (v >= 0) & (v < H) & (pz > 0) & LIVE
                # stage MASKED coords through scratch (computed arrays
                # cannot be dynamically sliced in mosaic, refs can)
                uvb[0] = jnp.where(inb, u, -1)
                uvb[1] = jnp.where(inb, v, -1)
                # camera-space z in mm for the chunk far-prefilter (voxels
                # beyond the op's zmax can never update: z > dmax + trunc
                # implies sd = d - z < -trunc(d) for every valid d)
                uvb[2] = jnp.where(
                    inb, (pz * 1000.0).astype(jnp.int32), jnp.int32(1 << 30)
                )

                def no_hit(cry3):
                    return cry3

                def tile_hit(cry3):
                    return apply_tile(cry3, inb, pz, img, sign)

                # whole tile outside this op's frustum -> skip the sampling
                # loop and update entirely
                return jax.lax.cond(jnp.any(inb), tile_hit, no_hit, cry2)

            def apply_tile(cry2, inb, pz, img, sign):
                sdf, w, r_, g_, b_ = cry2

                # ---- chunked one-hot sampling ----
                # HT rows (HT*V voxels) sample per MXU contraction set; no
                # per-block loop, no sublane->lane relayouts. One-hot
                # selection keeps everything exact even in bf16: every
                # reduction has exactly one nonzero addend. Each chunk
                # picks its own 64-column u-window (full-width fallback for
                # chunks very close to the camera / spread wide).
                def samp_chunk(off, width, u0, u_ids, um_c, vm_c):
                    oh_v = (
                        (v_ids == vm_c[:, :, None])
                        .astype(jnp.bfloat16)
                        .reshape(HT * V, HP)
                    )
                    oh_u = (
                        (u_ids == (um_c - u0)[:, :, None])
                        .astype(jnp.bfloat16)
                        .reshape(HT * V, width)
                    )
                    for ch in range(5):
                        win = img5_ref[
                            pl.ds((img * 5 + ch) * W + u0, width), :
                        ]  # [width, HP]
                        rows = jnp.dot(
                            oh_u,
                            win,
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.DEFAULT,
                        ).astype(jnp.bfloat16)  # [HT*V, HP]; exact — every
                        # accumulation has ONE nonzero bf16 addend, so the
                        # f32->bf16 downcast reproduces the sampled value
                        val = jnp.sum(
                            rows * oh_v, axis=1, keepdims=True
                        )  # [HT*V, 1] bf16, exact for the same reason
                        samp[ch, pl.ds(off, HT)] = val.astype(jnp.float32).reshape(HT, V)

                def samp_win(off, width, u0, u_ids, v0, um_c, vm_c):
                    # double-windowed path: one channel-stacked contraction
                    # [HT*V, width] @ [width, 5*VW] after shrinking each
                    # channel's u-window to VW v-columns with a one-hot
                    # select matmul (exact — single nonzero addend per sum)
                    oh_u = (
                        (u_ids == (um_c - u0)[:, :, None])
                        .astype(jnp.bfloat16)
                        .reshape(HT * V, width)
                    )
                    vsel = (hp_ids_col == v0 + vw_ids_row).astype(jnp.bfloat16)
                    parts = []
                    for ch in range(5):
                        win = img5_ref[
                            pl.ds((img * 5 + ch) * W + u0, width), :
                        ]  # [width, HP]
                        parts.append(
                            jnp.dot(
                                win, vsel,
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.DEFAULT,
                            ).astype(jnp.bfloat16)
                        )
                    win5 = jnp.concatenate(parts, axis=1)  # [width, 5*VW]
                    rows5 = jnp.dot(
                        oh_u, win5,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.DEFAULT,
                    ).astype(jnp.bfloat16)                 # [HT*V, 5*VW]
                    oh_vw = (
                        (vw_ids == (vm_c - v0)[:, :, None])
                        .astype(jnp.bfloat16)
                        .reshape(HT * V, VW)
                    )
                    for ch in range(5):
                        val = jnp.sum(
                            rows5[:, ch * VW : (ch + 1) * VW] * oh_vw,
                            axis=1,
                            keepdims=True,
                        )
                        samp[ch, pl.ds(off, HT)] = val.astype(jnp.float32).reshape(HT, V)

                def samp_vwin(off, v0, um_c, vm_c):
                    # v-window-only path (u spans too wide for WIN): shrink
                    # each channel's full image to VW v-columns with the
                    # one-hot v-select matmul, then ONE channel-stacked
                    # full-width contraction [HT*V, W] @ [W, 5*VW] — half
                    # the FLOPs of 5 separate [HT*V, W] @ [W, HP] passes.
                    # This is the common case: slots allocate in sorted
                    # packed-key batches (x fastest), so a chunk's blocks
                    # form an x-strip — wide in u, narrow in v.
                    oh_u = (
                        (u_ids_full == um_c[:, :, None])
                        .astype(jnp.bfloat16)
                        .reshape(HT * V, W)
                    )
                    vsel = (hp_ids_col == v0 + vw_ids_row).astype(jnp.bfloat16)
                    parts = []
                    for ch in range(5):
                        full = img5_ref[pl.ds((img * 5 + ch) * W, W), :]  # [W, HP]
                        parts.append(
                            jnp.dot(
                                full, vsel,
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.DEFAULT,
                            ).astype(jnp.bfloat16)
                        )
                    win5 = jnp.concatenate(parts, axis=1)  # [W, 5*VW]
                    rows5 = jnp.dot(
                        oh_u, win5,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.DEFAULT,
                    ).astype(jnp.bfloat16)                 # [HT*V, 5*VW]
                    oh_vw = (
                        (vw_ids == (vm_c - v0)[:, :, None])
                        .astype(jnp.bfloat16)
                        .reshape(HT * V, VW)
                    )
                    for ch in range(5):
                        val = jnp.sum(
                            rows5[:, ch * VW : (ch + 1) * VW] * oh_vw,
                            axis=1,
                            keepdims=True,
                        )
                        samp[ch, pl.ds(off, HT)] = val.astype(jnp.float32).reshape(HT, V)

                def chunk_body(h, _):
                    off = pl.multiple_of(h * HT, HT)
                    um_c = uvb[0, pl.ds(off, HT)]   # (HT, V), -1 = invalid
                    vm_c = uvb[1, pl.ds(off, HT)]
                    zmin_c = jnp.min(uvb[2, pl.ds(off, HT)])
                    zmax_mm = meta_ref[o, 14].astype(jnp.int32)
                    # skip chunks entirely beyond the op's far bound: their
                    # samples could only produce upd == False (see uvb[2])
                    anyv = jnp.any(um_c >= 0) & (zmin_c <= zmax_mm)

                    def go():
                        # trace-time ablation hooks (micro-benchmarks only;
                        # values are WRONG under all_win2 / nosamp)
                        if ablate == "nosamp":
                            for ch in range(5):
                                samp[ch, pl.ds(off, HT)] = jnp.zeros((HT, V))
                            return
                        if ablate == "all_win2":
                            min_u0 = jnp.min(jnp.where(um_c >= 0, um_c, W))
                            u0f = jnp.clip(min_u0 & ~7, 0, (W - WIN2) & ~7)
                            min_v0 = jnp.min(jnp.where(vm_c >= 0, vm_c, HP))
                            v0f = jnp.clip(min_v0, 0, HP - VW)
                            um_cl = jnp.clip(um_c - u0f, 0, WIN2 - 1) + u0f
                            vm_cl = jnp.clip(vm_c - v0f, 0, VW - 1) + v0f
                            samp_win(off, WIN2, pl.multiple_of(u0f, 8),
                                     u_ids_win2, v0f, um_cl, vm_cl)
                            return
                        min_u = jnp.min(jnp.where(um_c >= 0, um_c, W))
                        max_u = jnp.max(um_c)
                        # clamp to a multiple of 8 unconditionally: the
                        # pl.multiple_of(u0w, 8) promise below must hold
                        # even when W - WIN is not 8-aligned
                        u0w = jnp.clip(min_u & ~7, 0, (W - WIN) & ~7)
                        fits = max_u < u0w + WIN
                        # the WIN2 window only exists when the image is at
                        # least WIN2 wide: (W - WIN2) & ~7 goes NEGATIVE for
                        # narrower frames (e.g. the 80x60 streaming configs),
                        # jnp.clip then returns the negative bound and the
                        # branch would slice img5_ref at a negative row
                        # offset into the adjacent channel plane. W is
                        # static, so gate at trace time; fits2 = fits makes
                        # the dispatch below collapse to the 4-way form.
                        if W >= WIN2:
                            u0w2 = jnp.clip(min_u & ~7, 0, (W - WIN2) & ~7)
                            fits2 = max_u < u0w2 + WIN2
                        else:
                            u0w2 = u0w
                            fits2 = fits
                        min_v = jnp.min(jnp.where(vm_c >= 0, vm_c, HP))
                        max_v = jnp.max(vm_c)
                        v0w = jnp.clip(min_v, 0, HP - VW)
                        fits_v = max_v < v0w + VW

                        @pl.when(fits & fits_v)
                        def _():
                            samp_win(off, WIN, pl.multiple_of(u0w, 8),
                                     u_ids_win, v0w, um_c, vm_c)

                        @pl.when(fits & jnp.logical_not(fits_v))
                        def _():
                            samp_chunk(off, WIN, pl.multiple_of(u0w, 8),
                                       u_ids_win, um_c, vm_c)

                        if W >= WIN2:
                            @pl.when(jnp.logical_not(fits) & fits2 & fits_v)
                            def _():
                                samp_win(off, WIN2, pl.multiple_of(u0w2, 8),
                                         u_ids_win2, v0w, um_c, vm_c)

                            @pl.when(jnp.logical_not(fits) & fits2
                                     & jnp.logical_not(fits_v))
                            def _():
                                samp_chunk(off, WIN2, pl.multiple_of(u0w2, 8),
                                           u_ids_win2, um_c, vm_c)

                        @pl.when(jnp.logical_not(fits2) & fits_v)
                        def _():
                            samp_vwin(off, v0w, um_c, vm_c)

                        @pl.when(jnp.logical_not(fits2)
                                 & jnp.logical_not(fits_v))
                        def _():
                            samp_chunk(off, W, jnp.int32(0),
                                       u_ids_full, um_c, vm_c)

                    @pl.when(anyv)
                    def _():
                        go()

                    @pl.when(jnp.logical_not(anyv))
                    def _():
                        for ch in range(5):
                            samp[ch, pl.ds(off, HT)] = jnp.zeros((HT, V))
                    return 0

                jax.lax.fori_loop(0, TILE // HT, chunk_body, 0)

                d = samp[0] + samp[1]   # hi + lo (selection is linear)
                depth_ok = (d >= depth_min) & (d <= depth_max)
                sd = d - pz
                trunc = truncation + truncation_scale * d
                upd = inb & depth_ok & (sd > -trunc)
                sd_cl = jnp.minimum(sd, trunc)
                w_new = (upd.astype(jnp.float32) * w_sample) * sign
                new_w = jnp.clip(w + w_new, 0.0, w_max)
                applied = new_w - w
                sum_sdf = sdf * w + jnp.where(upd, sd_cl, 0.0) * applied
                new_sdf = jnp.where(
                    applied != 0,
                    jnp.where(new_w > 0, sum_sdf / jnp.maximum(new_w, 1e-12), 0.0),
                    sdf,
                )
                appc = jnp.where(upd, applied, 0.0)
                return (
                    new_sdf,
                    new_w,
                    jnp.maximum(r_ + samp[2] * appc, 0.0),
                    jnp.maximum(g_ + samp[3] * appc, 0.0),
                    jnp.maximum(b_ + samp[4] * appc, 0.0),
                )

            return jax.lax.cond(sign != 0.0, apply, lambda c: c, cry)

        init = (
            in_sdf[slot],
            in_w[slot],
            in_c[slot, :, 0:V],
            in_c[slot, :, V : 2 * V],
            in_c[slot, :, 2 * V : 3 * V],
        )
        sdf, w, r_, g_, b_ = jax.lax.fori_loop(0, OPS, op_body, init)
        out_sdf[slot] = sdf
        out_w[slot] = w
        out_c[slot, :, 0:V] = r_
        out_c[slot, :, V : 2 * V] = g_
        out_c[slot, :, 2 * V : 3 * V] = b_

        for d in out_dmas(t, slot):
            d.start()

        @pl.when(t + 2 < nt)
        def _():
            for d in in_dmas(t + 2, slot):
                d.start()

        return 0

    jax.lax.fori_loop(0, nt, body, 0)

    # drain the last out-DMAs
    @pl.when(nt > 0)
    def _():
        for d in out_dmas(nt - 1, jax.lax.rem(nt - 1, 2)):
            d.wait()

    @pl.when(nt > 1)
    def _():
        for d in out_dmas(nt - 2, jax.lax.rem(nt - 2, 2)):
            d.wait()


def active_tile_indices(table, w2c, signs, intr, params, H, W, op_dmax=None):
    """Frustum-compacted sweep schedule: indices of payload TILEs holding at
    least one live block that could be touched by ANY of the ops.

    A voxel update requires its projection in-bounds with pz > 0 and
    camera-space depth within the truncation band of the sampled depth
    (``upd = inb & depth_ok & (sd > -trunc)`` in the kernel). A block whose
    8 corners all project outside the image (or all behind the camera, or
    all beyond depth_max + truncation) can contain no such voxel: for a
    convex box fully in front of the camera, the projection of every
    interior point lies in the convex hull of the projected corners.
    Blocks straddling the camera plane are kept conservatively.

    Returns (tile_idx [NT, 1] int32, n_active [] int32).
    """
    N = table.num_blocks
    NT = N // TILE
    bs = BLOCK_SIZE * params.voxel_size
    geo = table.slot_geo[:N]
    live = geo[:, 3] > 0.5
    corner = geo[:, :3] * bs                                # [N, 3]
    offs = jnp.asarray(
        [[i, j, k] for i in (0, 1) for j in (0, 1) for k in (0, 1)],
        jnp.float32,
    ) * bs                                                  # [8, 3]
    pts = corner[:, None, :] + offs[None]                   # [N, 8, 3]
    dmax = min(params.depth_max, params.max_integration_distance)

    OPS = w2c.shape[0]
    any_op = jnp.zeros((N,), bool)
    for o in range(OPS):
        # per-op far bound: a voxel only updates with z < d + trunc(d) and
        # d <= the op image's max valid depth, so blocks entirely beyond
        # that are provably untouched — on indoor scenes the observed max
        # depth is well under the 4 m sensor bound, pruning far-behind
        # blocks from the sweep
        if op_dmax is not None:
            dm = jnp.minimum(op_dmax[o], dmax)
        else:
            dm = dmax
        zmax = dm + params.truncation + params.truncation_scale * dm
        R, t = w2c[o, :3, :3], w2c[o, :3, 3]
        pc = pts @ R.T + t                                  # [N, 8, 3]
        z = pc[..., 2]
        all_front = jnp.all(z > 1e-3, axis=1)
        zs = jnp.maximum(z, 1e-3)
        u = pc[..., 0] / zs * intr.fx + intr.cx
        v = pc[..., 1] / zs * intr.fy + intr.cy
        inside = (
            (jnp.max(u, 1) >= 0.0) & (jnp.min(u, 1) <= W - 1)
            & (jnp.max(v, 1) >= 0.0) & (jnp.min(v, 1) <= H - 1)
            & (jnp.min(z, 1) <= zmax)
        )
        straddle = jnp.any(z > 0.0, axis=1) & ~all_front    # conservative
        any_op = any_op | ((jnp.where(all_front, inside, straddle)) & (signs[o] != 0.0))

    mask = live & any_op
    nt_cap = (table.high_water + TILE - 1) // TILE
    tile_any = jnp.any(mask.reshape(NT, TILE), axis=1) & (
        jnp.arange(NT) < nt_cap
    )
    idx = jnp.nonzero(tile_any, size=NT, fill_value=0)[0].astype(jnp.int32)
    nt = jnp.sum(tile_any.astype(jnp.int32))
    return idx.reshape(NT, 1), nt


def pack_img5(depth, color):
    """One frame -> the kernel's transposed 5-channel sample image
    [5, W, HP] bf16 (d_hi | d_lo | r | g | b). Non-finite pixels zero.

    One stacked bf16 transpose (per-channel ``ch.T`` + concat cost ~5 ms
    per frame in relayouts on TPU; this form costs well under 1 ms).
    """
    H, W = depth.shape
    HP = ((H + 127) // 128) * 128

    def _fin(x):
        return jnp.where(jnp.isfinite(x) & (jnp.abs(x) < 1e30), x, 0.0)

    d_f = _fin(depth)
    d_hi = d_f.astype(jnp.bfloat16)
    d_lo = (d_f - d_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    c_q = _fin(color).astype(jnp.bfloat16)
    stack = jnp.stack(
        [d_hi, d_lo, c_q[..., 0], c_q[..., 1], c_q[..., 2]]
    )  # [5, H, W]
    t = jnp.transpose(stack, (0, 2, 1))  # [5, W, H], one relayout
    return jnp.pad(t, ((0, 0), (0, 0), (0, HP - H)))


def apply_tsdf_ops(
    table: VoxelBlockTable,
    depths,            # [IMGS, H, W] f32 (non-finite = invalid)
    colors,            # [IMGS, H, W, 3] f32 in [0, 1]
    poses,             # [OPS, 4, 4] cam-to-world per op
    signs,             # [OPS] f32: +1 integrate, -1 de-integrate, 0 no-op
    img_of_op,         # [OPS] int32 index into depths/colors
    intr: CameraIntrinsics,
    params: TsdfParams,
    interpret: bool = False,
    ablate: str | None = None,
) -> VoxelBlockTable:
    """Apply a batch of (de)integration ops in ONE in-place kernel sweep.

    Ops execute sequentially per voxel in array order — callers list
    de-integrations before the re-integrations/integrations that follow
    them, mirroring the reference's dispatch order
    (``DepthSensing.cpp: reintegrate()`` then ``integrate()``).

    ``ablate`` is a TIMING-ONLY hook for kernel micro-benchmarks
    (scripts/ablate.py): 'nosamp' zeroes the image samples and 'all_win2'
    clamps u/v into a fixed window — both produce WRONG voxel data and
    must never be set on a production path.
    """
    assert ablate in (None, "nosamp", "all_win2"), ablate
    if ablate == "all_win2" and depths.shape[2] < WIN2:
        # the WIN2 sampling window does not exist for frames narrower than
        # WIN2 columns ((W - WIN2) & ~7 goes negative and the kernel would
        # slice at a negative row offset); the normal dispatch gates this
        # at trace time — the ablation hook must too
        raise ValueError(
            f"ablate='all_win2' requires width >= {WIN2}, got {depths.shape[2]}"
        )
    OPS = poses.shape[0]
    IMGS = depths.shape[0]
    H, W = depths.shape[1:]
    HP = ((H + 127) // 128) * 128
    N = table.num_blocks
    assert N % TILE == 0, "num_blocks must be a multiple of the DMA tile"
    assert W >= WIN, f"integration width {W} must be >= the {WIN}-col u-window"

    img5 = jax.vmap(pack_img5)(depths, colors).reshape(
        IMGS * 5 * W, HP
    )  # flattened so the kernel's (image, channel, window) select is one
    # dynamic sublane slice

    w2c = jax.vmap(pose_inverse)(poses)
    d_fin = jnp.where(
        jnp.isfinite(depths) & (jnp.abs(depths) < 1e30), depths, 0.0
    )
    op_dmax = jnp.max(d_fin, axis=(1, 2))[img_of_op]        # [OPS]
    dmax_cl = jnp.minimum(
        op_dmax, min(params.depth_max, params.max_integration_distance)
    )
    # +2 mm guard: both sides quantize by flooring, so the skip must only
    # fire strictly beyond the true bound (exactness vs the XLA twin)
    op_zmax_mm = (
        (dmax_cl + params.truncation + params.truncation_scale * dmax_cl)
        * 1000.0
        + 2.0
    )
    meta = jnp.concatenate(
        [
            w2c[:, :3, :3].reshape(OPS, 9),
            w2c[:, :3, 3],
            signs.reshape(OPS, 1).astype(jnp.float32),
            img_of_op.reshape(OPS, 1).astype(jnp.float32),
            op_zmax_mm.reshape(OPS, 1),
            jnp.zeros((OPS, 1), jnp.float32),
        ],
        axis=1,
    )  # [OPS, 16]
    tidx, n_active = active_tile_indices(
        table, w2c, signs, intr, params, H, W, op_dmax=op_dmax
    )
    nt = jnp.reshape(n_active, (1, 1)).astype(jnp.int32)


    kernel = partial(
        _apply_kernel,
        OPS=OPS,
        ablate=ablate,
        H=H,
        W=W,
        HP=HP,
        fx=intr.fx,
        fy=intr.fy,
        cx=intr.cx,
        cy=intr.cy,
        voxel_size=params.voxel_size,
        truncation=params.truncation,
        truncation_scale=params.truncation_scale,
        depth_min=params.depth_min,
        depth_max=min(params.depth_max, params.max_integration_distance),
        w_sample=params.integration_weight_sample,
        w_max=params.integration_weight_max,
    )

    sdf, weight, color = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # nt
            pl.BlockSpec(memory_space=pltpu.SMEM),   # tidx
            pl.BlockSpec(memory_space=pltpu.SMEM),   # meta
            pl.BlockSpec(memory_space=pltpu.VMEM),   # img5
            pl.BlockSpec(memory_space=pl.ANY),       # slot_geo
            pl.BlockSpec(memory_space=pl.ANY),       # sdf
            pl.BlockSpec(memory_space=pl.ANY),       # weight
            pl.BlockSpec(memory_space=pl.ANY),       # color
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(table.sdf.shape, jnp.float32),
            jax.ShapeDtypeStruct(table.weight.shape, jnp.float32),
            jax.ShapeDtypeStruct(table.color.shape, jnp.float32),
        ],
        # inputs: nt(0) tidx(1) meta(2) img5(3) geo(4) sdf(5) w(6) c(7)
        input_output_aliases={5: 0, 6: 1, 7: 2},
        scratch_shapes=[
            pltpu.VMEM((2, TILE, V), jnp.float32),
            pltpu.VMEM((2, TILE, V), jnp.float32),
            pltpu.VMEM((2, TILE, 3 * V), jnp.float32),
            pltpu.VMEM((2, TILE, V), jnp.float32),
            pltpu.VMEM((2, TILE, V), jnp.float32),
            pltpu.VMEM((2, TILE, 3 * V), jnp.float32),
            pltpu.VMEM((2, TILE, 128), jnp.float32),
            pltpu.VMEM((3, TILE, V), jnp.int32),
            pltpu.VMEM((5, TILE, V), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 4)),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # the half-tile sampling's one-hot + rows intermediates exceed
            # the 16 MB default scoped-vmem budget; v5e has headroom
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(nt, tidx, meta, img5, table.slot_geo, table.sdf, table.weight, table.color)
    return table._replace(sdf=sdf, weight=weight, color=color)


def apply_tsdf_ops_rows(
    key,               # int32 [R] packed block coords per payload row
    sdf_rows,          # f32 [R, V]
    weight_rows,       # f32 [R, V]
    color_rows,        # f32 [R, 3V]
    depths,
    colors,
    poses,
    signs,
    img_of_op,
    intr: CameraIntrinsics,
    params: TsdfParams,
):
    """Row-range core of the XLA twin: apply the op batch to an arbitrary
    set of payload rows (each row fully independent given its packed block
    key). This is the unit the MAP-SHARDED integrate distributes over a
    device mesh (``parallel/map_sharded.py``) — block rows shard cleanly
    because integration touches nothing but the row itself plus the
    replicated input images. Returns (sdf, weight, color) rows."""
    live = key != EMPTY_KEY
    kx = ((key & (GRID_DIM - 1)) - GRID_HALF).astype(jnp.float32)
    ky = (((key >> GRID_BITS) & (GRID_DIM - 1)) - GRID_HALF).astype(jnp.float32)
    kz = (((key >> (2 * GRID_BITS)) & (GRID_DIM - 1)) - GRID_HALF).astype(jnp.float32)
    lin = jnp.arange(BLOCK_VOLUME, dtype=jnp.int32)
    lx = (lin % BLOCK_SIZE).astype(jnp.float32)
    ly = ((lin // BLOCK_SIZE) % BLOCK_SIZE).astype(jnp.float32)
    lz = (lin // (BLOCK_SIZE * BLOCK_SIZE)).astype(jnp.float32)
    bs = BLOCK_SIZE * params.voxel_size
    # per-axis [N, V] world coords (a packed [N, V, 3] array would be
    # minor-dim padded 3 -> 128 by the TPU layout: 42x the memory)
    wx = kx[:, None] * bs + (lx[None] + 0.5) * params.voxel_size
    wy = ky[:, None] * bs + (ly[None] + 0.5) * params.voxel_size
    wz = kz[:, None] * bs + (lz[None] + 0.5) * params.voxel_size

    H, W = depths.shape[1:]
    dmax = min(params.depth_max, params.max_integration_distance)

    def _fin(x):
        return jnp.where(jnp.isfinite(x) & (jnp.abs(x) < 1e30), x, 0.0)

    d_f = _fin(depths)
    d_hi = d_f.astype(jnp.bfloat16)
    d_lo = (d_f - d_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    d_q = d_hi.astype(jnp.float32) + d_lo.astype(jnp.float32)
    c_q = _fin(colors).astype(jnp.bfloat16).astype(jnp.float32)

    def op_body(o, state):
        sdf, w, col = state
        T = poses[o]
        sign = signs[o]
        img = img_of_op[o]
        w2c = pose_inverse(T)
        R, tr = w2c[:3, :3], w2c[:3, 3]
        px = R[0, 0] * wx + R[0, 1] * wy + R[0, 2] * wz + tr[0]
        py = R[1, 0] * wx + R[1, 1] * wy + R[1, 2] * wz + tr[1]
        z = R[2, 0] * wx + R[2, 1] * wy + R[2, 2] * wz + tr[2]
        u = jnp.round(px / jnp.maximum(z, 1e-6) * intr.fx + intr.cx).astype(jnp.int32)
        v = jnp.round(py / jnp.maximum(z, 1e-6) * intr.fy + intr.cy).astype(jnp.int32)
        inb = (u >= 0) & (u < W) & (v >= 0) & (v < H) & (z > 0)
        uc = jnp.clip(u, 0, W - 1)
        vc = jnp.clip(v, 0, H - 1)
        lin = vc * W + uc
        # flat per-channel takes: a fused [N, V, 3] gather would be
        # minor-dim padded 3 -> 128 by the TPU layout, and 2-D
        # advanced-index gathers poison the runtime's h2d path
        d = jnp.take(d_q[img].reshape(-1), lin, mode="clip")
        rgb_r = jnp.take(c_q[img, :, :, 0].reshape(-1), lin, mode="clip")
        rgb_g = jnp.take(c_q[img, :, :, 1].reshape(-1), lin, mode="clip")
        rgb_b = jnp.take(c_q[img, :, :, 2].reshape(-1), lin, mode="clip")
        depth_ok = (d >= params.depth_min) & (d <= dmax)
        sd = d - z
        trunc = params.truncation + params.truncation_scale * d
        upd = inb & depth_ok & (sd > -trunc) & live[:, None]
        sd_cl = jnp.minimum(sd, trunc)
        w_new = (upd.astype(jnp.float32) * params.integration_weight_sample) * sign
        new_w = jnp.clip(w + w_new, 0.0, params.integration_weight_max)
        applied = new_w - w
        sum_sdf = sdf * w + jnp.where(upd, sd_cl, 0.0) * applied
        new_sdf = jnp.where(
            applied != 0,
            jnp.where(new_w > 0, sum_sdf / jnp.maximum(new_w, 1e-12), 0.0),
            sdf,
        )
        appc = jnp.where(upd, applied, 0.0)
        rgb_cm = jnp.concatenate([rgb_r, rgb_g, rgb_b], axis=1)
        new_col = jnp.maximum(col + rgb_cm * jnp.tile(appc, (1, 3)), 0.0)
        return new_sdf, new_w, new_col

    return jax.lax.fori_loop(
        0,
        poses.shape[0],
        op_body,
        (sdf_rows, weight_rows, color_rows),
    )


def apply_tsdf_ops_xla(
    table: VoxelBlockTable,
    depths,
    colors,
    poses,
    signs,
    img_of_op,
    intr: CameraIntrinsics,
    params: TsdfParams,
) -> VoxelBlockTable:
    """Pure-XLA twin of :func:`apply_tsdf_ops` (CPU path + test oracle).

    Applies the ops sequentially over the full slot range with the same
    sampling quantization (bf16 hi/lo depth, bf16 color) so results match
    the kernel bit-for-bit.
    """
    N = table.num_blocks
    sdf, w, col = apply_tsdf_ops_rows(
        table.slot_keys[:N], table.sdf[:N], table.weight[:N],
        table.color[:N], depths, colors, poses, signs, img_of_op,
        intr, params,
    )
    return table._replace(
        sdf=table.sdf.at[:N].set(sdf),
        weight=table.weight.at[:N].set(w),
        color=table.color.at[:N].set(col),
    )
