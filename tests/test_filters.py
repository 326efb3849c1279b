import jax
import jax.numpy as jnp
import numpy as np

from bundlefusion_tpu.geometry import pose_to_matrix
from bundlefusion_tpu.geometry.camera import CameraIntrinsics
from bundlefusion_tpu.io.synthetic import default_intrinsics, default_scene, render_frame
from bundlefusion_tpu.ops.filters import (
    DenseVerifyParams,
    dense_verify_pair,
    kabsch_filter_pair,
    surface_area_filter_pair,
)
from bundlefusion_tpu.ops.image import compute_normals
from bundlefusion_tpu.geometry.camera import unproject


def make_rigid(rng, rot=0.5):
    w = rng.normal(size=3)
    w = w / np.linalg.norm(w) * rot
    t = rng.normal(size=3) * 0.3
    return np.asarray(pose_to_matrix(jnp.asarray(np.concatenate([w, t]), jnp.float32)))


def make_matches(rng, n_inliers=20, n_outliers=10, noise=0.002):
    R = 128
    T = make_rigid(rng)
    src = rng.uniform(-1, 1, size=(R, 3)).astype(np.float32)
    src[:, 2] += 2.0
    tgt = src @ T[:3, :3].T + T[:3, 3]
    tgt[:n_inliers] += rng.normal(size=(n_inliers, 3)) * noise
    # outliers: wrong correspondences
    tgt[n_inliers : n_inliers + n_outliers] = rng.uniform(-1, 1, size=(n_outliers, 3)) + [0, 0, 2]
    valid = np.zeros(R, bool)
    valid[: n_inliers + n_outliers] = True
    # shuffle outliers among inliers by distance order: inliers first is fine
    # (sorted-by-distance assumption); pixels spread out to avoid dedup
    pix = rng.uniform(0, 600, size=(R, 2)).astype(np.float32)
    return T, src.astype(np.float32), tgt.astype(np.float32), pix, valid


def test_kabsch_filter_recovers_transform(rng):
    T, src, tgt, pix, valid = make_matches(rng)
    out = kabsch_filter_pair(
        jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(pix), jnp.asarray(pix + 7.0),
        jnp.asarray(valid), 25, 4, 4e-4,
    )
    assert bool(out["valid_pair"])
    assert int(out["count"]) >= 10
    T_est = np.asarray(out["transform"])
    np.testing.assert_allclose(T_est, T, atol=0.02)
    # outliers must be excluded
    inl = np.asarray(out["inlier_mask"])
    assert not inl[20:30].any()


def test_kabsch_filter_rejects_garbage(rng):
    R = 128
    src = rng.uniform(-1, 1, size=(R, 3)).astype(np.float32)
    tgt = rng.uniform(-1, 1, size=(R, 3)).astype(np.float32)
    pix = rng.uniform(0, 600, size=(R, 2)).astype(np.float32)
    valid = np.ones(R, bool)
    out = kabsch_filter_pair(
        jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(pix), jnp.asarray(pix + 9.0),
        jnp.asarray(valid), 25, 4, 4e-4,
    )
    assert int(out["count"]) <= 4  # no consistent rigid subset of size >= min


def test_kabsch_filter_pixel_dedup(rng):
    # all matches at the same pixel -> only one can enter
    T, src, tgt, pix, valid = make_matches(rng)
    pix_same = np.ones_like(pix)
    out = kabsch_filter_pair(
        jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(pix_same), jnp.asarray(pix_same),
        jnp.asarray(valid), 25, 4, 4e-4,
    )
    assert int(out["count"]) <= 1
    assert not bool(out["valid_pair"])


def test_surface_area_accepts_spread_rejects_line(rng):
    w = np.zeros(128, bool)
    w[:25] = True
    spread = rng.uniform(-1, 1, size=(128, 3)).astype(np.float32)
    keep, a0, a1 = surface_area_filter_pair(
        jnp.asarray(spread), jnp.asarray(spread), jnp.asarray(w), 0.032
    )
    assert bool(keep)
    # collinear points span ~zero area
    t = np.linspace(0, 1, 128).astype(np.float32)[:, None]
    line = t @ np.array([[1.0, 0.5, 0.2]], np.float32)
    line += rng.normal(size=line.shape).astype(np.float32) * 1e-4
    keep2, a0, a1 = surface_area_filter_pair(
        jnp.asarray(line), jnp.asarray(line), jnp.asarray(w), 0.032
    )
    assert not bool(keep2)


def _cache_from_pose(pose, intr):
    d, c = render_frame(default_scene(), intr, jnp.asarray(pose, jnp.float32))
    campos = unproject(d, intr)
    normal = compute_normals(campos)
    return d, campos, normal


def test_dense_verify_accepts_true_transform(rng):
    intr = default_intrinsics(80, 60)
    p0 = np.eye(4, dtype=np.float32)
    p1 = np.eye(4, dtype=np.float32)
    p1[0, 3] = 0.04
    d0, cp0, n0 = _cache_from_pose(p0, intr)
    d1, cp1, n1 = _cache_from_pose(p1, intr)
    # transform taking frame-0 camera points into frame-1 camera: inv(p1) @ p0
    T_01 = np.linalg.inv(p1) @ p0
    keep, err, corr = dense_verify_pair(
        jnp.asarray(T_01), d0, cp0, n0, d1, cp1, n1, intr, DenseVerifyParams()
    )
    assert bool(keep), (float(err), float(corr))
    assert float(err) < 0.03


def test_dense_verify_rejects_wrong_transform(rng):
    intr = default_intrinsics(80, 60)
    p0 = np.eye(4, dtype=np.float32)
    p1 = np.eye(4, dtype=np.float32)
    p1[0, 3] = 0.04
    d0, cp0, n0 = _cache_from_pose(p0, intr)
    d1, cp1, n1 = _cache_from_pose(p1, intr)
    T_bad = np.eye(4, dtype=np.float32)
    T_bad[:3, 3] = [0.5, 0.3, -0.4]  # grossly wrong
    keep, err, corr = dense_verify_pair(
        jnp.asarray(T_bad), d0, cp0, n0, d1, cp1, n1, intr, DenseVerifyParams()
    )
    assert not bool(keep), (float(err), float(corr))
