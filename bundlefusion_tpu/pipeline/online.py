"""Online BundleFusion pipeline: the full per-frame loop.

Re-design of the reference's orchestration stack — ``FriedLiver.cpp`` main
loop + bundling thread, ``OnlineBundler`` (two-level hierarchy, submap
double-buffering, trajectory chaining), ``Bundler`` (detect / match+filter /
optimize per domain), ``DepthSensing.cpp`` frame loop (integrate, reintegrate,
raycast) — as one host-driven Python class over jitted stage programs.

Hierarchy semantics mirrored from the reference:
- submaps of ``submap_size`` frames with ONE-FRAME OVERLAP: frame k*S is both
  the last frame of submap k-1 and frame 0 (anchor/keyframe) of submap k
  (``OnlineBundler::processInput`` copyFrame at ``isLastLocalFrame``,
  OnlineBundler.cpp:206-215).
- per-frame chaining to the nearest matched previous frame
  (``computeSiftTransformCU``, OnlineBundler.cu:6-71).
- local solve (2 GN x 100 PCG) per submap; keyframe fusion; global
  match+filter of the new keyframe vs all previous keyframes; global solve
  (3 GN x 150 PCG) with max-residual pruning (``SBA::removeMaxResidualCUDA``).
- complete trajectory composition complete[f] = global[k] @ local[k][r]
  (``updateTrajectoryCU``, OnlineBundler.cu:73-110).
- TrajectoryManager-driven de-integration / re-integration with a
  per-frame op budget (``DepthSensing.cpp: reintegrate():854-902``).

The host loop stays off the critical path: every stage is a jitted program
on device arrays; host code only routes pytrees and makes small control-flow
decisions from scalars it must read anyway (pair validity, solve stats) —
the analog of the reference's per-frame host logic, without its
per-kernel syncs.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from bundlefusion_tpu.config import AppConfig, BundlingConfig
from bundlefusion_tpu.geometry.camera import CameraIntrinsics
from bundlefusion_tpu.geometry.lie import matrix_to_pose, pose_inverse, pose_to_matrix
from bundlefusion_tpu.ops.filters import DenseVerifyParams
from bundlefusion_tpu.ops.image import erode_depth, resample_bilinear, resample_nearest, rgb_to_intensity
from bundlefusion_tpu.ops.sift import SiftConfig, detect_and_describe
from bundlefusion_tpu.pipeline.frames import (
    DenseCache,
    KeyframeStore,
    copy_cache_frame,
    create_dense_cache,
    create_keyframe_store,
    store_cache_frame,
    store_keypoints,
)
from bundlefusion_tpu.pipeline.frontend import (
    FrontendParams,
    add_to_residuals,
    chained_sift_transform,
    fuse_keyframe,
    match_and_filter,
)
from bundlefusion_tpu.pipeline.trajectory import TrajectoryManager
from bundlefusion_tpu.solver.dense_term import DenseTermParams
from bundlefusion_tpu.solver.gn_pcg import SolverParams, solve_bundle, solve_sparse
from bundlefusion_tpu.solver.residuals import (
    create_corr_store,
    invalidate_image_pair,
)
from bundlefusion_tpu.tsdf.integrate import TsdfParams, deintegrate, integrate
from bundlefusion_tpu.tsdf.raycast import RaycastParams, raycast
from bundlefusion_tpu.tsdf.table import create_table, garbage_collect
from bundlefusion_tpu.utils.timing import TimingLog


@partial(jax.jit, static_argnames=("sift_hw", "int_hw"))
def preprocess_frame(depth, color, sift_hw, int_hw):
    """Input-res depth/color -> (intensity_sift, depth_sift, depth_int,
    color_int). Mirrors ``CUDAImageManager::process`` (erode x2, resample)
    + ``OnlineBundler::getCurrentFrame`` (resampleToIntensity)."""
    d = erode_depth(erode_depth(depth))
    sh, sw = sift_hw
    ih, iw = int_hw
    intensity = rgb_to_intensity(color)
    intensity_sift = resample_bilinear(intensity, sh, sw)
    depth_sift = resample_nearest(d, sh, sw)
    depth_int = resample_nearest(d, ih, iw)
    color_int = resample_bilinear(color, ih, iw)
    return intensity_sift, depth_sift, depth_int, color_int


@partial(jax.jit, static_argnames=("intr", "vp"))
def _verify_local_pairs(local_world, lv, cache_depth, cache_campos, cache_normal, intr, vp):
    """Dense-verify all adjacent submap frame pairs in one jitted program
    (``VerifyTrajectoryCU``; formerly an eager per-pair host loop).

    Returns (n_checked, n_failed) scalars.
    """
    from bundlefusion_tpu.ops.filters import dense_verify_pair

    T_next_inv = jax.vmap(pose_inverse)(local_world[1:])
    T_rel = jnp.einsum("sij,sjk->sik", T_next_inv, local_world[:-1])
    keep, err, corr = jax.vmap(
        lambda T, d0, c0, n0, d1, c1, n1: dense_verify_pair(
            T, d0, c0, n0, d1, c1, n1, intr, vp
        )
    )(
        T_rel,
        cache_depth[:-1], cache_campos[:-1], cache_normal[:-1],
        cache_depth[1:], cache_campos[1:], cache_normal[1:],
    )
    checked = lv[:-1] & lv[1:]
    n_checked = jnp.sum(checked.astype(jnp.int32))
    n_failed = jnp.sum((checked & ~keep).astype(jnp.int32))
    return n_checked, n_failed


class BundleFusion:
    """The engine. Feed RGB-D frames; read back poses / renders / mesh."""

    def __init__(
        self,
        intr_input: CameraIntrinsics,
        app: AppConfig = AppConfig(),
        bundling: BundlingConfig = BundlingConfig(),
        sift_cfg: Optional[SiftConfig] = None,
        max_keyframes: Optional[int] = None,
    ):
        self.app = app
        self.bundling = bundling
        self.intr_input = intr_input
        self.intr_sift = intr_input.scaled(bundling.width_sift, bundling.height_sift)
        self.intr_int = intr_input.scaled(app.integration_width, app.integration_height)
        self.intr_cache = intr_input.scaled(
            bundling.downsampled_width, bundling.downsampled_height
        )
        self.sift_cfg = sift_cfg or SiftConfig(
            target_keys=bundling.feature_count_threshold,
            min_scale=bundling.min_key_scale,
            depth_min=app.sensor_depth_min,
            depth_max=app.sensor_depth_max,
        )
        self.S = bundling.submap_size + 1  # +1: one-frame overlap
        self.G = max_keyframes or bundling.max_num_images

        self.tsdf_params = TsdfParams(
            voxel_size=app.sdf_voxel_size,
            truncation=app.sdf_truncation,
            truncation_scale=app.sdf_truncation_scale,
            max_integration_distance=app.sdf_max_integration_distance,
            integration_weight_sample=app.sdf_integration_weight_sample,
            integration_weight_max=app.sdf_integration_weight_max,
            depth_min=app.sensor_depth_min,
            depth_max=app.sensor_depth_max,
        )
        self.table = create_table(app.hash_key_capacity, app.hash_num_sdf_blocks)
        self.vis_cap = app.visible_blocks_cap

        dense = DenseVerifyParams(
            dist_thresh=bundling.proj_corr_dist_thres,
            normal_thresh=bundling.proj_corr_normal_thres,
            err_thresh=bundling.verify_sift_err_thresh,
            corr_thresh=bundling.verify_sift_corr_thresh,
            depth_min=app.sensor_depth_min,
            depth_max=app.sensor_depth_max,
        )
        self.frontend_local = FrontendParams(
            sift_match_thresh=bundling.sift_match_thresh,
            sift_match_ratio=bundling.sift_match_ratio_max_local,
            num_raw_matches=bundling.max_matches_per_image_pair_raw,
            max_filtered=bundling.max_matches_per_image_pair_filtered,
            min_num_matches=bundling.min_num_matches_local,
            max_kabsch_res2=bundling.max_kabsch_residual2,
            surf_area_thresh=bundling.surf_area_pca_thresh,
            dense=dense,
        )
        self.frontend_global = dataclasses.replace(
            self.frontend_local,
            sift_match_ratio=bundling.sift_match_ratio_max_global,
            min_num_matches=bundling.min_num_matches_global,
        )
        self.local_solver = SolverParams(
            num_gn=bundling.num_local_non_lin_iterations,
            num_pcg=bundling.num_local_lin_iterations,
            pcg_early_out=bundling.pcg_early_out,
            gn_early_out_delta=bundling.gn_early_out_delta,
        )
        self.global_solver = SolverParams(
            num_gn=bundling.num_global_non_lin_iterations,
            num_pcg=bundling.num_global_lin_iterations,
            pcg_early_out=bundling.pcg_early_out,
            gn_early_out_delta=bundling.gn_early_out_delta,
        )
        self.dense_term_params = DenseTermParams(
            dist_thresh=bundling.dense_dist_thresh,
            normal_thresh=bundling.dense_normal_thresh,
            color_thresh=bundling.dense_color_thresh,
            color_gradient_min=bundling.dense_color_gradient_min,
            depth_min=bundling.dense_depth_min,
            depth_max=bundling.dense_depth_max,
            overlap_subsample=bundling.dense_overlap_check_subsample_factor,
            overlap_min_hits=bundling.dense_overlap_min_hits,
            min_corr_per_pair=bundling.min_dense_corr_for_pair,
            max_pairs=64,
        )

        # ---- mutable state ----
        K_local = self.sift_cfg.target_keys
        self._reset_local()
        self.global_keys = create_keyframe_store(self.G, bundling.max_num_keys_per_image)
        self.global_cache = create_dense_cache(
            self.G, self.intr_cache.height, self.intr_cache.width
        )
        self.global_corrs = create_corr_store(bundling.max_global_corr)
        self.keyframe_poses = jnp.zeros((self.G, 6), jnp.float32)
        self.keyframe_valid = np.zeros(self.G, bool)
        self.num_keyframes = 0

        self.frame_idx = 0
        self.frame_valid: List[bool] = []
        self.sift_world: List[np.ndarray] = []     # per-frame chained estimate
        self.local_trajectories: List[np.ndarray] = []  # per submap [S, 4, 4]
        self.local_frame_valid: List[np.ndarray] = []   # per submap [S]
        self.complete_traj: List[np.ndarray] = []  # per-frame optimized 4x4 (nan invalid)
        self.submap_base_world = np.eye(4, dtype=np.float32)

        self.traj_manager = TrajectoryManager(app.top_n_active, app.min_pose_dist_sqrt)
        # relocalization retry list (reference SIFTImageManager retry list +
        # Bundler::tryRevalidation, Bundler.cpp:306-352)
        self.retry_list: List[int] = []
        self.retry_attempts: dict = {}
        self.max_retry_attempts = 10
        # host copies of integration-res frames for re-integration
        self.stored_depth: List[np.ndarray] = []
        self.stored_color: List[np.ndarray] = []
        self.timing = TimingLog()
        self.lost_count = 0

    # ------------------------------------------------------------------
    def _reset_local(self):
        K_local = self.sift_cfg.target_keys
        self.local_keys = create_keyframe_store(self.S, K_local)
        self.local_cache = create_dense_cache(
            self.S, self.intr_cache.height, self.intr_cache.width
        )
        self.local_corrs = create_corr_store(self.bundling.max_local_corr)
        self.local_rel = np.tile(np.eye(4, dtype=np.float32), (self.S, 1, 1))
        self.local_valid = np.zeros(self.S, bool)

    # ------------------------------------------------------------------
    def process_frame(self, depth, color):
        """Process one input-resolution RGB-D frame.

        Args:
          depth: [H, W] float32 meters (input resolution).
          color: [H, W, 3] float32 in [0, 1].

        Returns dict: ``pose`` (4x4 np, cam-to-world estimate), ``valid``.
        """
        f = self.frame_idx
        ft = self.timing.new_frame(f)
        S = self.S

        with self.timing.stage("time_sensor_process", ft):
            intensity_sift, depth_sift, depth_int, color_int = preprocess_frame(
                jnp.asarray(depth),
                jnp.asarray(color),
                (self.intr_sift.height, self.intr_sift.width),
                (self.intr_int.height, self.intr_int.width),
            )
            self.stored_depth.append(np.asarray(depth_int))
            self.stored_color.append(np.asarray(color_int))

        # submap slot (with one-frame overlap): frame k*(S-1) is slot S-1 of
        # submap k-1 AND slot 0 of submap k
        sub_len = S - 1
        slot = f % sub_len
        is_overlap = f > 0 and slot == 0
        cur_slot = sub_len if is_overlap else slot  # position in current buffer

        with self.timing.stage("time_sift_detection", ft):
            kp = detect_and_describe(intensity_sift, depth_sift, self.sift_cfg)
            self.local_keys = store_keypoints(self.local_keys, cur_slot, kp)
            self.local_cache = store_cache_frame(
                self.local_cache, cur_slot, depth_int, color_int, self.intr_cache
            )

        valid = True
        T_rel = np.eye(4, dtype=np.float32)
        if cur_slot > 0:
            with self.timing.stage("time_sift_matching", ft):
                mf = match_and_filter(
                    jnp.asarray(cur_slot),
                    self.local_keys,
                    self.local_cache,
                    self.intr_sift,
                    self.intr_cache,
                    self.frontend_local,
                )
                self.local_corrs = add_to_residuals(
                    self.local_corrs,
                    mf,
                    jnp.asarray(cur_slot, jnp.int32),
                    jnp.arange(self.S, dtype=jnp.int32),
                )
                T_chain, found, _ = chained_sift_transform(
                    mf, jnp.asarray(self.local_rel)
                )
                valid = bool(found)
                if valid:
                    T_rel = np.asarray(T_chain)
                else:
                    T_rel = self.local_rel[cur_slot - 1].copy()  # hold last
        self.local_rel[cur_slot] = T_rel
        self.local_valid[cur_slot] = valid

        T_world = self.submap_base_world @ T_rel
        self.frame_valid.append(valid)
        self.sift_world.append(T_world.copy())
        self.complete_traj.append(
            T_world.copy() if valid else np.full((4, 4), np.nan, np.float32)
        )

        # ---- reconstruction ----
        with self.timing.stage("time_reconstruct", ft):
            if valid and self.app.integration_enabled:
                self.table = integrate(
                    self.table,
                    depth_int,
                    color_int,
                    self.intr_int,
                    jnp.asarray(T_world),
                    self.tsdf_params,
                    cap=self.vis_cap,
                )
                self.traj_manager.add_frame(f, T_world)
            else:
                self.traj_manager.add_frame(f, None)

        with self.timing.stage("time_re_integrate", ft):
            self._reintegrate()

        # ---- submap boundary ----
        if f > 0 and slot == 0:
            with self.timing.stage("time_solve", ft):
                self._finish_submap()

        self.frame_idx += 1
        return {"pose": T_world, "valid": valid}

    # ------------------------------------------------------------------
    def _finish_submap(self):
        """Local solve -> keyframe fusion -> global match -> global solve ->
        trajectory composition (``OnlineBundler::process``)."""
        S = self.S
        k = self.num_keyframes  # submap index == keyframe index

        # local solve over the S frames, anchored at slot 0
        init = jnp.asarray(
            np.stack([np.asarray(matrix_to_pose(jnp.asarray(t))) for t in self.local_rel])
        )
        lv = self.local_valid.copy()
        if self.bundling.use_local_dense:
            # sparse + dense depth term, dense weight ramp iter+1 (SBA.cpp:28-38)
            poses, stats = solve_bundle(
                init,
                jnp.asarray(lv),
                self.local_corrs,
                self.local_cache,
                self.intr_cache,
                self.local_solver,
                self.dense_term_params,
            )
        else:
            poses, stats = solve_sparse(
                init, jnp.asarray(lv), self.local_corrs, self.local_solver
            )
        local_world = np.asarray(jax.vmap(pose_to_matrix)(poses))
        submap_ok = bool(lv[0]) and lv.sum() >= 2
        if submap_ok and self.bundling.use_local_verify:
            submap_ok = self._verify_local(local_world, lv)
            if not submap_ok:
                # solved submap fails dense verification -> invalidate it
                # (VerifyTrajectoryCU path, Bundler.cpp:259-273)
                lv[:] = False
        self.local_trajectories.append(local_world.copy())
        self.local_frame_valid.append(lv)

        # fuse keyframe from the solved submap (anchor frame 0)
        fused = fuse_keyframe(
            self.local_keys,
            jnp.asarray(local_world),
            0,
            self.intr_sift,
            self.global_keys.keys_per_frame,
        )
        g = k
        self.global_keys = self.global_keys._replace(
            pos=self.global_keys.pos.at[g].set(fused["pos"]),
            scale=self.global_keys.scale.at[g].set(fused["scale"]),
            depth=self.global_keys.depth.at[g].set(fused["depth"]),
            response=self.global_keys.response.at[g].set(fused["response"]),
            valid=self.global_keys.valid.at[g].set(fused["valid"]),
            desc=self.global_keys.desc.at[g].set(fused["desc"].astype(jnp.bfloat16)),
            frame_valid=self.global_keys.frame_valid.at[g].set(bool(submap_ok)),
        )
        self.global_cache = copy_cache_frame(self.global_cache, g, self.local_cache, 0)

        # init keyframe pose from the chained estimate of its frame
        self.keyframe_poses = self.keyframe_poses.at[g].set(
            matrix_to_pose(jnp.asarray(self.submap_base_world))
        )
        self.keyframe_valid[g] = submap_ok

        # global match + solve
        if g > 0:
            mf = match_and_filter(
                jnp.asarray(g),
                self.global_keys,
                self.global_cache,
                self.intr_sift,
                self.intr_cache,
                self.frontend_global,
            )
            pair_valid = np.asarray(mf["pair_valid"])
            if pair_valid.any():
                self.global_corrs = add_to_residuals(
                    self.global_corrs,
                    mf,
                    jnp.asarray(g, jnp.int32),
                    jnp.arange(self.G, dtype=jnp.int32),
                )
            else:
                # keyframe not matched: tracking lost for this submap ->
                # queue for relocalization retries
                self.keyframe_valid[g] = False
                self.lost_count += 1
                self.retry_list.append(g)

            self._try_revalidation()

            kv = self.keyframe_valid.copy()
            kv[g + 1 :] = False
            gposes, gstats = solve_sparse(
                self.keyframe_poses,
                jnp.asarray(kv),
                self.global_corrs,
                self.global_solver,
            )
            # residual pruning (SBA::removeMaxResidualCUDA)
            mr = float(gstats.max_residual)
            if mr > self.bundling.opt_max_res_thresh:
                ci = int(gstats.max_residual_corr)
                fa = int(np.asarray(self.global_corrs.img_i[ci]))
                fb = int(np.asarray(self.global_corrs.img_j[ci]))
                if fa >= 0 and fb >= 0:
                    self.global_corrs = invalidate_image_pair(self.global_corrs, fa, fb)
                    gposes, gstats = solve_sparse(
                        self.keyframe_poses,
                        jnp.asarray(kv),
                        self.global_corrs,
                        self.global_solver,
                    )
            self.keyframe_poses = gposes

        # ---- compose complete trajectory + schedule re-integration ----
        self._update_complete_trajectory()

        # ---- roll over to the next submap (overlap frame becomes slot 0) ----
        kf_world = np.asarray(pose_to_matrix(self.keyframe_poses[g]))
        overlap_world = (
            kf_world @ local_world[S - 1] if submap_ok else self.sift_world[-1]
        )
        overlap_keys = jax.tree.map(lambda a: a[S - 1], self.local_keys)
        overlap_cache_frame = jax.tree.map(lambda a: a[S - 1], self.local_cache)
        overlap_valid = self.local_valid[S - 1]
        self._reset_local()
        # copy the overlap frame into slot 0 of the fresh submap
        self.local_keys = jax.tree.map(
            lambda store, frame: store.at[0].set(frame), self.local_keys, overlap_keys
        )
        self.local_cache = jax.tree.map(
            lambda store, frame: store.at[0].set(frame), self.local_cache, overlap_cache_frame
        )
        self.local_valid[0] = bool(overlap_valid)
        self.local_rel[0] = np.eye(4, dtype=np.float32)
        self.submap_base_world = overlap_world.astype(np.float32)
        self.num_keyframes += 1

    # ------------------------------------------------------------------
    def _verify_local(self, local_world: np.ndarray, lv: np.ndarray) -> bool:
        """Dense-verify the solved submap trajectory over adjacent valid
        frame pairs (``VerifyTrajectoryCU``/``useVerification`` with the
        s_verifyOpt* thresholds). Returns False if the aggregate projective
        error is too high or overlap too low."""
        vp = dataclasses.replace(
            self.frontend_local.dense,
            err_thresh=self.bundling.verify_opt_err_thresh,
            corr_thresh=self.bundling.verify_opt_corr_thresh,
        )
        n_checked, n_failed = _verify_local_pairs(
            jnp.asarray(local_world.astype(np.float32)),
            jnp.asarray(lv),
            self.local_cache.depth,
            self.local_cache.campos,
            self.local_cache.normal,
            self.intr_cache,
            vp,
        )
        n_checked = int(n_checked)
        if n_checked == 0:
            return True
        return int(n_failed) <= n_checked // 3

    # ------------------------------------------------------------------
    def _try_revalidation(self):
        """One relocalization attempt per submap: re-match the oldest lost
        keyframe against all valid keyframes (``tryRevalidation``,
        Bundler.cpp:306-352). Success restores the keyframe and appends its
        correspondences; failure re-queues up to ``max_retry_attempts``."""
        if not self.retry_list:
            return
        k = self.retry_list.pop(0)
        attempts = self.retry_attempts.get(k, 0)
        if attempts >= self.max_retry_attempts:
            return
        self.retry_attempts[k] = attempts + 1
        # temporarily mark the keyframe's stored features active for matching
        self.global_keys = self.global_keys._replace(
            frame_valid=self.global_keys.frame_valid.at[k].set(True)
        )
        mf = match_and_filter(
            jnp.asarray(k),
            self.global_keys,
            self.global_cache,
            self.intr_sift,
            self.intr_cache,
            self.frontend_global,
        )
        pair_valid = np.asarray(mf["pair_valid"])
        # only pairs against currently-valid keyframes count
        pair_valid = pair_valid & self.keyframe_valid[: self.G]
        if pair_valid.any():
            self.global_corrs = add_to_residuals(
                self.global_corrs,
                mf,
                jnp.asarray(k, jnp.int32),
                jnp.arange(self.G, dtype=jnp.int32),
            )
            self.keyframe_valid[k] = True
        else:
            self.global_keys = self.global_keys._replace(
                frame_valid=self.global_keys.frame_valid.at[k].set(False)
            )
            self.retry_list.append(k)

    # ------------------------------------------------------------------
    def _update_complete_trajectory(self):
        """complete[f] = keyframe_world[k] @ local[k][r]
        (``updateTrajectoryCU``: invalid frames -> -inf/nan)."""
        sub_len = self.S - 1
        kf_world = np.asarray(jax.vmap(pose_to_matrix)(self.keyframe_poses))
        n = len(self.complete_traj)
        for k, (local_world, lv) in enumerate(
            zip(self.local_trajectories, self.local_frame_valid)
        ):
            if not self.keyframe_valid[k]:
                for r in range(sub_len):
                    f = k * sub_len + r
                    if f < n:
                        self.complete_traj[f] = np.full((4, 4), np.nan, np.float32)
                continue
            base = kf_world[k]
            for r in range(sub_len):
                f = k * sub_len + r
                if f >= n:
                    break
                if lv[r]:
                    self.complete_traj[f] = (base @ local_world[r]).astype(np.float32)
                else:
                    self.complete_traj[f] = np.full((4, 4), np.nan, np.float32)
        poses = np.stack(self.complete_traj) if self.complete_traj else np.zeros((0, 4, 4))
        valid = np.array([np.isfinite(p).all() for p in self.complete_traj], bool)
        self.traj_manager.update_optimized_transforms(poses, valid)

    # ------------------------------------------------------------------
    def _reintegrate(self):
        """Consume at most ``max_frame_fixes`` de/re-integration ops
        (``DepthSensing.cpp: reintegrate()``)."""
        if not self.app.integration_enabled:
            return
        deint, reint, integ = self.traj_manager.generate_update_lists()
        budget = self.app.max_frame_fixes
        ops = 0
        for f in deint:
            if ops >= budget:
                return
            self._deintegrate_frame(f)
            ops += 1
        for f in reint:
            if ops + 2 > budget and ops > 0:
                break
            rec = self.traj_manager.records[f]
            new_T = rec.optimized_transform
            self._deintegrate_frame(f)
            self._integrate_frame(f, new_T)
            ops += 2
        for f in integ:
            if ops >= budget:
                break
            rec = self.traj_manager.records[f]
            self._integrate_frame(f, rec.optimized_transform)
            ops += 1
        if self.app.garbage_collection_enabled and ops > 0:
            self.table = garbage_collect(self.table)

    def _deintegrate_frame(self, f: int):
        rec = self.traj_manager.records[f]
        T = rec.integrated_transform
        if T is None:
            return
        self.table = deintegrate(
            self.table,
            jnp.asarray(self.stored_depth[f]),
            jnp.asarray(self.stored_color[f]),
            self.intr_int,
            jnp.asarray(T),
            self.tsdf_params,
            cap=self.vis_cap,
        )
        self.traj_manager.mark_deintegrated(f)

    def _integrate_frame(self, f: int, T: np.ndarray):
        if T is None or not np.isfinite(T).all():
            return
        self.table = integrate(
            self.table,
            jnp.asarray(self.stored_depth[f]),
            jnp.asarray(self.stored_color[f]),
            self.intr_int,
            jnp.asarray(T),
            self.tsdf_params,
            cap=self.vis_cap,
        )
        self.traj_manager.mark_integrated(f, T)

    # ------------------------------------------------------------------
    def finish(self, extra_solves: Optional[int] = None):
        """End-of-sequence: solve the trailing partial submap, run extra
        global solves + drain re-integration (``numSolveFramesBeforeExit``)."""
        sub_len = self.S - 1
        if self.frame_idx % sub_len != 1 and self.frame_idx > 0:
            # trailing partial submap: pad state is already sized; solve it
            self._finish_submap()
        n_extra = (
            extra_solves
            if extra_solves is not None
            else max(self.app.num_solve_frames_before_exit // 10, 1)
        )
        for it in range(n_extra):
            if self.num_keyframes > 1:
                kv = self.keyframe_valid.copy()
                kv[self.num_keyframes :] = False
                if self.bundling.use_global_dense_at_end and it == n_extra - 1:
                    # final pass with dense depth weight 15
                    # (USE_GLOBAL_DENSE_AT_END, OnlineBundler.cpp:177-189)
                    self.keyframe_poses, _ = solve_bundle(
                        self.keyframe_poses,
                        jnp.asarray(kv),
                        self.global_corrs,
                        self.global_cache,
                        self.intr_cache,
                        self.global_solver,
                        self.dense_term_params,
                        dense_weights=jnp.full(
                            (self.global_solver.num_gn,), 15.0, jnp.float32
                        ),
                    )
                else:
                    self.keyframe_poses, _ = solve_sparse(
                        self.keyframe_poses,
                        jnp.asarray(kv),
                        self.global_corrs,
                        self.global_solver,
                    )
            self._update_complete_trajectory()
            for _ in range(10):
                before = self.traj_manager.generate_update_lists()
                if not any(before):
                    break
                self._reintegrate()

    # ------------------------------------------------------------------
    def render(self, cam_to_world, raycast_params: Optional[RaycastParams] = None):
        rp = raycast_params or RaycastParams(
            ray_increment_factor=self.app.sdf_ray_increment_factor,
            depth_min=self.app.render_depth_min,
            depth_max=self.app.render_depth_max,
        )
        return raycast(
            self.table, self.intr_int, jnp.asarray(cam_to_world), self.tsdf_params, rp
        )

    def extract_mesh(self):
        from bundlefusion_tpu.tsdf.marching_cubes import extract_mesh

        return extract_mesh(self.table, self.tsdf_params.voxel_size)

    def trajectory(self) -> np.ndarray:
        """Per-frame optimized camera-to-world matrices (nan = invalid)."""
        if not self.complete_traj:
            return np.zeros((0, 4, 4), np.float32)
        return np.stack(self.complete_traj)
