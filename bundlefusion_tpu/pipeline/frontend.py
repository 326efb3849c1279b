"""Per-frame sparse-frontend orchestration: match + filter + residuals.

The jitted core of ``Bundler::matchAndFilter`` (Bundler.cpp:103-249): match
the current image against every previous image in its domain, run the
filter cascade, mark frame validity, emit EntryJ residuals, and produce the
chained per-frame pose estimate (``OnlineBundler::computeCurrentSiftTransform``
-> ``computeSiftTransformCU``, OnlineBundler.cu:6-71). Also keyframe fusion
(``SIFTImageManager::fuseToGlobal``).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from bundlefusion_tpu.geometry.camera import CameraIntrinsics
from bundlefusion_tpu.geometry.lie import pose_inverse, transform_points
from bundlefusion_tpu.ops.filters import (
    DenseVerifyParams,
    dense_verify_pair,
    kabsch_filter_pair,
    surface_area_filter_pair,
)
from bundlefusion_tpu.ops.matching import match_descriptors_pair
from bundlefusion_tpu.pipeline.frames import DenseCache, KeyframeStore, backproject_keys
from bundlefusion_tpu.solver.residuals import CorrStore, append_corrs


@dataclass(frozen=True)
class FrontendParams:
    sift_match_thresh: float = 0.7
    sift_match_ratio: float = 0.8
    num_raw_matches: int = 128
    max_filtered: int = 25
    min_num_matches: int = 4
    max_kabsch_res2: float = 4e-4
    surf_area_thresh: float = 0.032
    use_dense_verify: bool = True
    dense: DenseVerifyParams = DenseVerifyParams()


@partial(jax.jit, static_argnames=("intr_sift", "intr_cache", "params"))
def match_and_filter(
    cur_slot,
    keys: KeyframeStore,
    cache: DenseCache,
    intr_sift: CameraIntrinsics,
    intr_cache: CameraIntrinsics,
    params: FrontendParams = FrontendParams(),
):
    """Match frame ``cur_slot`` against all previous slots in the store.

    Returns per-pair dict over P = store capacity:
      ``pair_valid`` [P], ``transforms`` [P, 4, 4] (cur -> prev),
      ``inlier_mask`` [P, R], ``idx_cur``/``idx_prev`` [P, R],
      ``p_cur``/``p_prev`` [P, R, 3] back-projected matched keypoints.
    """
    P = keys.capacity
    cur_desc = keys.desc[cur_slot].astype(jnp.float32)
    cur_valid = keys.valid[cur_slot]
    cur_pos = keys.pos[cur_slot]
    cur_depth = keys.depth[cur_slot]
    active = (jnp.arange(P) < cur_slot) & keys.frame_valid

    def match_one(slot):
        m = match_descriptors_pair(
            cur_desc,
            cur_valid,
            keys.desc[slot].astype(jnp.float32),
            keys.valid[slot],
            params.sift_match_thresh,
            params.sift_match_ratio,
            params.num_raw_matches,
        )
        # back-project matched keys
        pc = backproject_keys(
            cur_pos[m.idx_i], cur_depth[m.idx_i], intr_sift
        )
        pp = backproject_keys(
            keys.pos[slot][m.idx_j], keys.depth[slot][m.idx_j], intr_sift
        )
        pix_c = cur_pos[m.idx_i]
        pix_p = keys.pos[slot][m.idx_j]
        return m, pc, pp, pix_c, pix_p

    slots = jnp.arange(P)
    matches, p_cur, p_prev, pix_cur, pix_prev = jax.vmap(match_one)(slots)
    match_valid = matches.valid & active[:, None]

    kf = jax.vmap(
        lambda pc, pp, xc, xp, v: kabsch_filter_pair(
            pc, pp, xc, xp, v,
            params.max_filtered, params.min_num_matches, params.max_kabsch_res2,
        )
    )(p_cur, p_prev, pix_cur, pix_prev, match_valid)

    sa_keep, _, _ = jax.vmap(
        lambda pc, pp, m: surface_area_filter_pair(pc, pp, m, params.surf_area_thresh)
    )(p_cur, p_prev, kf["inlier_mask"])

    pair_valid = kf["valid_pair"] & sa_keep

    if params.use_dense_verify:
        cur_d = cache.depth[cur_slot]
        cur_cp = cache.campos[cur_slot]
        cur_n = cache.normal[cur_slot]

        def dv_one(slot, T):
            # T maps cur -> prev; verify with input=cur, model=prev
            return dense_verify_pair(
                T,
                cur_d, cur_cp, cur_n,
                cache.depth[slot], cache.campos[slot], cache.normal[slot],
                intr_cache,
                params.dense,
            )

        dv_keep, dv_err, dv_corr = jax.vmap(dv_one)(slots, kf["transform"])
        pair_valid = pair_valid & dv_keep

    inlier = kf["inlier_mask"] & pair_valid[:, None]
    return {
        "pair_valid": pair_valid,
        "transforms": kf["transform"],
        "num_inliers": jnp.sum(inlier.astype(jnp.int32), -1),
        "inlier_mask": inlier,
        "idx_cur": matches.idx_i,
        "idx_prev": matches.idx_j,
        "p_cur": p_cur,
        "p_prev": p_prev,
    }


@jax.jit
def add_to_residuals(
    store: CorrStore,
    mf,                    # output of match_and_filter
    cur_frame_global,      # int32 global image index of the current frame
    prev_frame_global,     # int32 [P] global image indices of the slots
) -> CorrStore:
    """Append surviving matches as EntryJ residuals
    (``AddCurrToResidualsCU``, SIFTImageManager.cu:610-687)."""
    P, R = mf["inlier_mask"].shape
    v = mf["inlier_mask"].reshape(-1)
    img_i = jnp.broadcast_to(cur_frame_global, (P, R)).reshape(-1)
    img_j = jnp.broadcast_to(prev_frame_global[:, None], (P, R)).reshape(-1)
    return append_corrs(
        store,
        img_i.astype(jnp.int32),
        img_j.astype(jnp.int32),
        mf["p_cur"].reshape(-1, 3),
        mf["p_prev"].reshape(-1, 3),
        v,
    )


@jax.jit
def chained_sift_transform(mf, prev_world_transforms):
    """Pose of the current frame by chaining the best (nearest previous)
    filtered match (``computeSiftTransformCU``): T_world_cur =
    T_world_prev @ T_prev<-cur. mf["transforms"][p] maps cur -> prev.

    Args:
      prev_world_transforms: [P, 4, 4] world poses of the previous slots.

    Returns (T_world_cur [4,4], found bool, best_prev_slot int32).
    """
    P = mf["pair_valid"].shape[0]
    score = jnp.where(mf["pair_valid"], jnp.arange(P), -1)
    best = jnp.argmax(score)
    found = score[best] >= 0
    T = prev_world_transforms[best] @ mf["transforms"][best]
    return jnp.where(found, T, jnp.eye(4)), found, best


@partial(jax.jit, static_argnames=("intr_sift", "max_out_keys", "grid_px"))
def fuse_keyframe(
    keys: KeyframeStore,
    local_world,           # [S, 4, 4] solved submap trajectory (frame->world of submap base)
    frame0_slot,
    intr_sift: CameraIntrinsics,
    max_out_keys: int = 1024,
    grid_px: int = 4,
):
    """Fuse a solved submap's keypoints into one keyframe in frame-0 coords.

    The reference fuses feature *tracks* (matched keys averaged over the
    submap, ``SIFTImageManager::fuseToGlobal`` SIFTImageManager.cpp:414-476)
    capped at 1024 keys sorted by depth. This TPU variant projects every
    valid key of every submap frame into frame 0, dedups on a ``grid_px``
    pixel grid keeping the strongest response, and keeps the top
    ``max_out_keys`` — a superset of the track heads with the same cap and
    coordinate convention.

    Returns a dict of fused key arrays (pos/depth/response/valid/desc).
    """
    S, K = keys.valid.shape
    T0_inv = pose_inverse(local_world[frame0_slot])

    # camera-space -> frame0 space for every key of every frame
    p_cam = backproject_keys(keys.pos, keys.depth, intr_sift)       # [S, K, 3]
    rel = jax.vmap(lambda T: T0_inv @ T)(local_world)               # [S, 4, 4]
    p0 = jax.vmap(transform_points)(rel, p_cam)                     # [S, K, 3]
    z = p0[..., 2]
    u = p0[..., 0] / jnp.maximum(z, 1e-6) * intr_sift.fx + intr_sift.cx
    v = p0[..., 1] / jnp.maximum(z, 1e-6) * intr_sift.fy + intr_sift.cy
    ok = (
        keys.valid
        & keys.frame_valid[:, None]
        & (z > 0.05)
        & (u >= 0) & (u <= intr_sift.width - 1)
        & (v >= 0) & (v <= intr_sift.height - 1)
    )

    N = S * K
    uf = u.reshape(N)
    vf = v.reshape(N)
    zf = z.reshape(N)
    okf = ok.reshape(N)
    resp = keys.response.reshape(N)
    desc = keys.desc.reshape(N, 128)
    scale = keys.scale.reshape(N)

    # dedup on a pixel grid: cell id + keep max response per cell
    cw = (intr_sift.width + grid_px - 1) // grid_px
    cell = (vf / grid_px).astype(jnp.int32) * cw + (uf / grid_px).astype(jnp.int32)
    cell = jnp.where(okf, cell, jnp.int32(2**31 - 1))
    # sort by (cell asc, response desc)
    order = jnp.lexsort((-resp, cell))
    cell_s = cell[order]
    first = jnp.concatenate(
        [jnp.ones((1,), bool), cell_s[1:] != cell_s[:-1]]
    ) & (cell_s != 2**31 - 1)
    resp_s = jnp.where(first, resp[order], -1.0)
    k_eff = min(max_out_keys, N)
    top_resp, top_i = jax.lax.top_k(resp_s, k_eff)
    if k_eff < max_out_keys:
        pad = max_out_keys - k_eff
        top_resp = jnp.concatenate([top_resp, jnp.full((pad,), -1.0)])
        top_i = jnp.concatenate([top_i, jnp.zeros((pad,), top_i.dtype)])
    sel = order[jnp.clip(top_i, 0, N - 1)]
    valid_out = top_resp > 0
    return {
        "pos": jnp.stack([uf[sel], vf[sel]], -1),
        "depth": zf[sel],
        "response": jnp.where(valid_out, resp[sel], 0.0),
        "scale": scale[sel],
        "valid": valid_out,
        "desc": desc[sel],
    }
