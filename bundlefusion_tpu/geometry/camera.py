"""Pinhole camera model and depth<->camera-space conversions.

Mirrors the reference's ``DepthCameraData`` projection helpers
(``DepthSensing/DepthCameraUtil.h``: ``kinectDepthToSkeleton``,
``cameraToKinectScreen``) as vectorized JAX functions over whole images.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class CameraIntrinsics:
    fx: float
    fy: float
    cx: float
    cy: float
    width: int
    height: int

    def scaled(self, new_width: int, new_height: int) -> "CameraIntrinsics":
        """Rescale intrinsics for a resampled image (reference rescales
        intrinsics when resampling to integration resolution,
        ``CUDAImageManager.h``)."""
        sx = new_width / self.width
        sy = new_height / self.height
        return CameraIntrinsics(
            fx=self.fx * sx,
            fy=self.fy * sy,
            cx=self.cx * sx,
            cy=self.cy * sy,
            width=new_width,
            height=new_height,
        )

    def matrix(self) -> np.ndarray:
        return np.array(
            [[self.fx, 0, self.cx], [0, self.fy, self.cy], [0, 0, 1]], np.float32
        )


def unproject(depth, intr: CameraIntrinsics):
    """Depth image [H, W] -> camera-space points [H, W, 3].

    Invalid depth (<=0 or nan) yields nan points, matching the reference's
    MINF convention (``convertDepthFloatToCameraSpaceFloat4``).
    """
    H, W = depth.shape
    v = jnp.arange(H, dtype=jnp.float32)[:, None]
    u = jnp.arange(W, dtype=jnp.float32)[None, :]
    z = depth
    x = (u - intr.cx) / intr.fx * z
    y = (v - intr.cy) / intr.fy * z
    pts = jnp.stack([x, y, z], -1)
    valid = jnp.isfinite(z) & (z > 0)
    return jnp.where(valid[..., None], pts, jnp.nan)


def project(pts, intr: CameraIntrinsics):
    """Camera-space points [..., 3] -> (uv [..., 2], z [...])."""
    z = pts[..., 2]
    u = pts[..., 0] / z * intr.fx + intr.cx
    v = pts[..., 1] / z * intr.fy + intr.cy
    return jnp.stack([u, v], -1), z


def in_bounds(uv, intr: CameraIntrinsics, margin: float = 0.0):
    u, v = uv[..., 0], uv[..., 1]
    return (
        (u >= margin)
        & (u <= intr.width - 1 - margin)
        & (v >= margin)
        & (v <= intr.height - 1 - margin)
    )


def bilinear_sample(img, uv, valid_min: float = -1e18):
    """Bilinearly sample img [H, W] or [H, W, C] at uv [..., 2] (u=x, v=y).

    Out-of-bounds or non-finite neighborhoods return nan. Matches the
    reference's bilinear samplers that reject invalid depth neighbors
    (``SolverBundlingDenseUtil.h`` bilinear interpolation with validity).
    """
    H, W = img.shape[:2]
    u = uv[..., 0]
    v = uv[..., 1]
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    du = u - u0
    dv = v - v0
    u0i = jnp.clip(u0.astype(jnp.int32), 0, W - 1)
    v0i = jnp.clip(v0.astype(jnp.int32), 0, H - 1)
    u1i = jnp.clip(u0i + 1, 0, W - 1)
    v1i = jnp.clip(v0i + 1, 0, H - 1)

    def gather(vi, ui):
        return img[vi, ui]

    p00 = gather(v0i, u0i)
    p01 = gather(v0i, u1i)
    p10 = gather(v1i, u0i)
    p11 = gather(v1i, u1i)
    w00 = (1 - du) * (1 - dv)
    w01 = du * (1 - dv)
    w10 = (1 - du) * dv
    w11 = du * dv
    if img.ndim == 3:
        w00, w01, w10, w11 = (w[..., None] for w in (w00, w01, w10, w11))
    out = w00 * p00 + w01 * p01 + w10 * p10 + w11 * p11
    inb = (u >= 0) & (u <= W - 1) & (v >= 0) & (v <= H - 1)
    if img.ndim == 3:
        inb = inb[..., None]
    return jnp.where(inb, out, jnp.nan)


def nearest_sample(img, uv):
    """Nearest-neighbor sample with out-of-bounds -> nan."""
    H, W = img.shape[:2]
    ui = jnp.round(uv[..., 0]).astype(jnp.int32)
    vi = jnp.round(uv[..., 1]).astype(jnp.int32)
    inb = (ui >= 0) & (ui < W) & (vi >= 0) & (vi < H)
    uic = jnp.clip(ui, 0, W - 1)
    vic = jnp.clip(vi, 0, H - 1)
    out = img[vic, uic]
    if img.ndim == 3:
        inb = inb[..., None]
    return jnp.where(inb, out, jnp.nan)
