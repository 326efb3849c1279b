"""Pallas TPU kernel for the TSDF integrate/de-integrate voxel update.

This is the hot loop of the reconstruction core — the replacement for the
reference's ``integrateDepthMapKernel`` (``CUDASceneRepHashSDF.cu:420-521``,
one CUDA block per compactified hash entry, one thread per voxel). The pure
XLA formulation (``integrate.py:integrate_frame``) expresses the same update
via per-voxel image gathers, which XLA lowers element-by-element on TPU
(~12 ns/element → ~90 ms/frame). This kernel restores speed-of-light via:

- **dense workspace, tiled grid**: XLA gathers the visible blocks' payload
  rows into a contiguous ``[B, ...]`` workspace first (row gathers run on
  the DMA engine at HBM bandwidth — measured ~0.05 ms for 16 MB — unlike
  element gathers), the kernel processes T=8 blocks per grid program over
  plain contiguous BlockSpecs, and XLA scatters the rows back. This
  amortizes the ~5-7 us per-grid-step pipeline cost that dominated a
  one-block-per-program launch.
- **count-bucketed launch**: the visible count is usually far below the
  worst-case cap, so the wrapper ``lax.switch``es between grids sized for
  B in {cap/8, cap/4, cap/2, cap}.
- **image sampling without gathers**: the five sampled channels (depth as a
  bf16 hi/lo pair for f32 accuracy + RGB) are packed TRANSPOSED into one
  ``[W, 5*HP]`` VMEM image. A block's 512 voxels project into a bounded
  footprint, so the kernel dynamic-slices a 64-column window (the sublane
  dim after the transpose — 8-aligned dynamic slices are free) and selects
  each voxel's pixel with a one-hot matmul over the window columns (MXU)
  followed by a one-hot row-mask reduction (VPU). One-hot selection is
  exact — each output sums exactly one addend. Blocks too close to the
  camera for the 64-column window (z < ~0.37 m at 320x240 intrinsics) take
  a full-width fallback matmul under ``pl.when``, so the kernel is exact at
  every depth (the previous design silently clipped 128-row bands).

The depth camera model, truncation band, weight clamping and premultiplied
color update match ``integrate.py:integrate_frame`` and are cross-checked
against it in tests (interpret mode on CPU).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bundlefusion_tpu.geometry.camera import CameraIntrinsics
from bundlefusion_tpu.geometry.lie import pose_inverse
from bundlefusion_tpu.tsdf.table import (
    BLOCK_SIZE,
    BLOCK_VOLUME,
    GRID_BITS,
    GRID_DIM,
    GRID_HALF,
    VoxelBlockTable,
)
from bundlefusion_tpu.tsdf.integrate import TsdfParams

SUB = BLOCK_VOLUME // BLOCK_SIZE  # 64 (lane dim of a block row)
TILE = 8                          # blocks per grid program
WIN = 64                          # sampling window columns (image x)


def _integrate_kernel(
    # scalar prefetch
    slots_ref,        # int32 [B]  payload row per visible entry (dummy = N)
    keys_ref,         # int32 [B]  packed block coords per entry
    pose_ref,         # f32 [12]  world->cam row-major R (9) + t (3)
    # pipelined inputs
    img5_ref,         # band_dtype [W, 5*HP]: transposed d_hi|d_lo|r|g|b
    sdf_in,           # f32 (TILE, 8, 64) workspace rows
    w_in,             # f32 (TILE, 8, 64)
    c_in,             # f32 (TILE, 3, 8, 64)
    # outputs (aliased to the workspace)
    sdf_out,
    w_out,
    c_out,
    # scratch: sampled channels for one block
    samp,             # f32 (4, 8, 64): d, r, g, b
    *,
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
    dummy_row: int,
    band_dtype,
):
    i = pl.program_id(0)
    row = (BLOCK_SIZE, SUB)
    lin = (
        jax.lax.broadcasted_iota(jnp.int32, row, 0) * SUB
        + jax.lax.broadcasted_iota(jnp.int32, row, 1)
    )
    vx = (lin % BLOCK_SIZE).astype(jnp.float32)
    vy = ((lin // BLOCK_SIZE) % BLOCK_SIZE).astype(jnp.float32)
    vz = (lin // (BLOCK_SIZE * BLOCK_SIZE)).astype(jnp.float32)
    r00, r01, r02 = pose_ref[0], pose_ref[1], pose_ref[2]
    r10, r11, r12 = pose_ref[3], pose_ref[4], pose_ref[5]
    r20, r21, r22 = pose_ref[6], pose_ref[7], pose_ref[8]
    tx, ty, tz = pose_ref[9], pose_ref[10], pose_ref[11]
    sign = pose_ref[12]  # traced: 0 disables the update (exact no-op)

    for k in range(TILE):
        g = i * TILE + k
        slot = slots_ref[g]
        # invalid / padded entries write nothing: their workspace rows
        # scatter back to the dummy payload row, which is never read
        valid = slot < dummy_row

        @pl.when(valid)
        def _(k=k, g=g):
            key = keys_ref[g]
            kx = (key & (GRID_DIM - 1)) - GRID_HALF
            ky = ((key >> GRID_BITS) & (GRID_DIM - 1)) - GRID_HALF
            kz = ((key >> (2 * GRID_BITS)) & (GRID_DIM - 1)) - GRID_HALF
            wx = kx.astype(jnp.float32) * (BLOCK_SIZE * voxel_size) + (vx + 0.5) * voxel_size
            wy = ky.astype(jnp.float32) * (BLOCK_SIZE * voxel_size) + (vy + 0.5) * voxel_size
            wz = kz.astype(jnp.float32) * (BLOCK_SIZE * voxel_size) + (vz + 0.5) * voxel_size
            px = r00 * wx + r01 * wy + r02 * wz + tx
            py = r10 * wx + r11 * wy + r12 * wz + ty
            pz = r20 * wx + r21 * wy + r22 * wz + tz

            zs = jnp.maximum(pz, 1e-6)
            u = jnp.round(px / zs * fx + cx).astype(jnp.int32)   # (8, 64)
            v = jnp.round(py / zs * fy + cy).astype(jnp.int32)
            inb = (u >= 0) & (u < W) & (v >= 0) & (v < H) & (pz > 0)

            # one-hot row mask over the (transposed) image's lane dim = v
            vm = jnp.where(inb, v, -1)
            v_ids = jax.lax.broadcasted_iota(jnp.int32, row + (HP,), 2)
            oh_v = (v_ids == vm[:, :, None]).astype(jnp.float32).reshape(
                BLOCK_VOLUME, HP
            )

            def sample(window: int, u0):
                """One-hot select the 5 channels for this block from a
                ``window``-column slice of img5 starting at column u0."""
                um = jnp.where(inb, u - u0, -1)
                u_ids = jax.lax.broadcasted_iota(jnp.int32, row + (window,), 2)
                oh_u = (u_ids == um[:, :, None]).astype(band_dtype).reshape(
                    BLOCK_VOLUME, window
                )
                if window == W:
                    bands = img5_ref[:, :]
                else:
                    bands = img5_ref[pl.ds(u0, window), :]
                rows = jnp.dot(
                    oh_u,
                    bands,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT,
                ).astype(jnp.float32)  # [512, 5*HP]

                def colsel(r_slice):  # [512, HP] -> (8, 64)
                    return jnp.sum(r_slice * oh_v, axis=1, keepdims=True).reshape(row)

                samp[0] = colsel(rows[:, 0:HP] + rows[:, HP : 2 * HP])
                samp[1] = colsel(rows[:, 2 * HP : 3 * HP])
                samp[2] = colsel(rows[:, 3 * HP : 4 * HP])
                samp[3] = colsel(rows[:, 4 * HP : 5 * HP])

            if W > WIN:
                min_u = jnp.min(jnp.where(inb, u, W))
                max_u = jnp.max(jnp.where(inb, u, 0))
                u0 = jnp.clip(min_u & ~7, 0, W - WIN)
                u0 = pl.multiple_of(u0, 8)
                fits = max_u < u0 + WIN

                @pl.when(fits)
                def _():
                    sample(WIN, u0)

                @pl.when(jnp.logical_not(fits))
                def _():
                    sample(W, jnp.int32(0))
            else:
                sample(W, jnp.int32(0))

            d = samp[0]
            depth_ok = (d >= depth_min) & (d <= depth_max)
            sdf = d - pz
            trunc = truncation + truncation_scale * d
            upd = inb & depth_ok & (sdf > -trunc)
            sdf_cl = jnp.minimum(sdf, trunc)

            w_new = (upd.astype(jnp.float32) * w_sample) * sign
            old_sdf = sdf_in[k]
            old_w = w_in[k]
            new_w = jnp.clip(old_w + w_new, 0.0, w_max)
            applied = new_w - old_w
            # untouched voxels keep their sdf bitwise (see integrate.py)
            sum_sdf = old_sdf * old_w + jnp.where(upd, sdf_cl, 0.0) * applied
            new_sdf = jnp.where(
                applied != 0,
                jnp.where(new_w > 0, sum_sdf / jnp.maximum(new_w, 1e-12), 0.0),
                old_sdf,
            )

            sdf_out[k] = new_sdf
            w_out[k] = new_w
            for ch in range(3):
                c_out[k, ch] = jnp.maximum(
                    c_in[k, ch] + jnp.where(upd, samp[ch + 1], 0.0) * applied, 0.0
                )


def _grid_buckets(cap: int):
    """Workspace-size buckets for the count-dependent dispatch (ascending,
    all multiples of TILE)."""
    bs = sorted({max(cap // 8, 2 * TILE), cap // 4, cap // 2, cap})
    return [b for b in bs if 0 < b <= cap and b % TILE == 0]


def integrate_frame_pallas(
    table: VoxelBlockTable,
    depth,
    color,                 # [H, W, 3]
    intr: CameraIntrinsics,
    cam_to_world,
    params: TsdfParams,
    visible_positions,     # [cap] compacted key-table positions (-1 pad)
    sign=1.0,              # float or traced scalar; 0 = exact no-op
    interpret: bool = False,
    count=None,            # optional [] int32 number of visible blocks
) -> VoxelBlockTable:
    """Fuse (sign=+1) / un-fuse (sign=-1) one frame via the Pallas kernel.

    Semantically identical to ``integrate.integrate_frame``. When ``count``
    is given, the launch picks the smallest workspace bucket >= count via
    ``lax.switch``.
    """
    cap = visible_positions.shape[0]
    N = table.num_blocks
    H, W = depth.shape
    HP = ((H + 127) // 128) * 128
    band_dtype = jnp.float32 if interpret else jnp.bfloat16

    vp = visible_positions
    valid = vp >= 0
    safe_vp = jnp.clip(vp, 0, table.capacity - 1)
    slots = jnp.where(valid, table.slots[safe_vp], N).astype(jnp.int32)
    keys = jnp.where(valid, table.keys[safe_vp], 0).astype(jnp.int32)

    w2c = pose_inverse(cam_to_world)
    pose_flat = jnp.concatenate(
        [
            w2c[:3, :3].reshape(9),
            w2c[:3, 3],
            jnp.asarray(sign, jnp.float32).reshape(1),
        ]
    ).astype(jnp.float32)

    # packed transposed sample image [W, 5*HP]: d_hi | d_lo | r | g | b.
    # Non-finite pixels are zeroed (0 fails the depth_min test; NaN/inf
    # anywhere would poison the one-hot reductions).
    def _fin(x):
        return jnp.where(jnp.isfinite(x) & (jnp.abs(x) < 1e30), x, 0.0)

    d_f = _fin(depth)
    d_hi = d_f.astype(band_dtype)
    d_lo = (d_f - d_hi.astype(jnp.float32)).astype(band_dtype)
    chans = [d_hi, d_lo] + [
        _fin(color[..., ch]).astype(band_dtype) for ch in range(3)
    ]
    img5 = jnp.concatenate(
        [jnp.pad(ch.T, ((0, 0), (0, HP - H))) for ch in chans], axis=1
    )  # [W, 5*HP]

    kernel = partial(
        _integrate_kernel,
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
        dummy_row=N,
        band_dtype=band_dtype,
    )

    # workspace: gather ALL cap visible rows once (row gathers run at HBM
    # bandwidth); only the grid size is bucket-switched. The switch operands
    # are the ~80 MB workspace, never the multi-GB table payload (routing
    # big buffers through lax.switch costs full copies).
    ws_sdf = table.sdf[slots].reshape(cap, BLOCK_SIZE, SUB)
    ws_w = table.weight[slots].reshape(cap, BLOCK_SIZE, SUB)
    ws_c = table.color[slots].reshape(cap, 3, BLOCK_SIZE, SUB)

    def launch(B: int, ws_sdf, ws_w, ws_c):
        """Run the kernel over the first B entries. Rows beyond B are
        invalid by construction (count <= B) and keep their input values
        through the in/out aliasing, scattering back to the dummy row."""
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(B // TILE,),
            in_specs=[
                pl.BlockSpec(img5.shape, lambda i, s, c, p: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE, BLOCK_SIZE, SUB), lambda i, s, c, p: (i, 0, 0)),
                pl.BlockSpec((TILE, BLOCK_SIZE, SUB), lambda i, s, c, p: (i, 0, 0)),
                pl.BlockSpec((TILE, 3, BLOCK_SIZE, SUB), lambda i, s, c, p: (i, 0, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((TILE, BLOCK_SIZE, SUB), lambda i, s, c, p: (i, 0, 0)),
                pl.BlockSpec((TILE, BLOCK_SIZE, SUB), lambda i, s, c, p: (i, 0, 0)),
                pl.BlockSpec((TILE, 3, BLOCK_SIZE, SUB), lambda i, s, c, p: (i, 0, 0, 0)),
            ],
            scratch_shapes=[pltpu.VMEM((4, BLOCK_SIZE, SUB), jnp.float32)],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct(ws_sdf.shape, jnp.float32),
                jax.ShapeDtypeStruct(ws_w.shape, jnp.float32),
                jax.ShapeDtypeStruct(ws_c.shape, jnp.float32),
            ],
            # args: 3 prefetch + img5(3) + sdf(4) + w(5) + c(6)
            input_output_aliases={4: 0, 5: 1, 6: 2},
            interpret=interpret,
        )(slots, keys, pose_flat, img5, ws_sdf, ws_w, ws_c)

    if count is None:
        o_sdf, o_w, o_c = launch(cap, ws_sdf, ws_w, ws_c)
    else:
        buckets = _grid_buckets(cap)
        idx = jnp.sum(
            (count > jnp.asarray(buckets[:-1], jnp.int32)).astype(jnp.int32)
        )
        o_sdf, o_w, o_c = jax.lax.switch(
            idx, [partial(launch, b) for b in buckets], ws_sdf, ws_w, ws_c
        )

    # scatter rows back (invalid/padded rows land on the dummy row)
    return table._replace(
        sdf=table.sdf.at[slots].set(o_sdf.reshape(cap, BLOCK_VOLUME)),
        weight=table.weight.at[slots].set(o_w.reshape(cap, BLOCK_VOLUME)),
        color=table.color.at[slots].set(o_c.reshape(cap, 3, BLOCK_VOLUME)),
    )
