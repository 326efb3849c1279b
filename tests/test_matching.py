import jax.numpy as jnp
import numpy as np

from bundlefusion_tpu.ops.matching import match_descriptors_pair


def unit(v):
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def make_desc(rng, k=64):
    return unit(rng.normal(size=(k, 128)).astype(np.float32))


def test_identical_descriptors_match(rng):
    d = make_desc(rng)
    valid = np.ones(64, bool)
    m = match_descriptors_pair(
        jnp.asarray(d), jnp.asarray(valid), jnp.asarray(d), jnp.asarray(valid),
        0.7, 0.8, 32,
    )
    # every valid match maps a key to itself with ~0 distance
    got = np.asarray(m.valid)
    assert got.sum() == 32  # capped
    np.testing.assert_array_equal(np.asarray(m.idx_i)[got], np.asarray(m.idx_j)[got])
    assert np.asarray(m.dist)[got].max() < 1e-2


def test_perturbed_matches_sorted(rng):
    d1 = make_desc(rng, 40)
    noise = rng.normal(size=(40, 128)).astype(np.float32) * 0.05
    d2 = unit(d1 + noise)
    perm = rng.permutation(40)
    d2p = d2[perm]
    valid = np.ones(40, bool)
    m = match_descriptors_pair(
        jnp.asarray(d1), jnp.asarray(valid), jnp.asarray(d2p), jnp.asarray(valid),
        0.7, 0.8, 32,
    )
    v = np.asarray(m.valid)
    assert v.sum() > 20
    ii = np.asarray(m.idx_i)[v]
    jj = np.asarray(m.idx_j)[v]
    # correct correspondence under permutation
    assert (perm[jj] == ii).mean() > 0.9
    dd = np.asarray(m.dist)[v]
    assert (np.diff(dd) >= -1e-6).all()  # ascending


def test_ratio_test_rejects_ambiguous(rng):
    # two nearly identical descriptors in image j -> ratio test kills the match
    base = unit(rng.normal(size=(1, 128)).astype(np.float32))
    d1 = base
    d2 = np.concatenate([unit(base + 0.001), unit(base + 0.0012)], 0)
    m = match_descriptors_pair(
        jnp.asarray(d1), jnp.asarray(np.ones(1, bool)),
        jnp.asarray(d2), jnp.asarray(np.ones(2, bool)),
        0.7, 0.8, 8,
    )
    assert np.asarray(m.valid).sum() == 0


def test_invalid_masks_respected(rng):
    d = make_desc(rng, 16)
    valid_j = np.ones(16, bool)
    valid_j[8:] = False
    m = match_descriptors_pair(
        jnp.asarray(d), jnp.asarray(np.ones(16, bool)),
        jnp.asarray(d), jnp.asarray(valid_j),
        0.7, 0.8, 16,
    )
    v = np.asarray(m.valid)
    assert (np.asarray(m.idx_j)[v] < 8).all()


def test_match_and_filter_chunked_equals_unchunked():
    """The capacity-chunked early-exit sweep (capacity > 128) must produce
    exactly the unchunked cascade's outputs (explicit ``slots`` forces the
    unchunked path)."""
    import jax.numpy as jnp
    import numpy as np

    from bundlefusion_tpu.io.synthetic import default_intrinsics, make_sequence
    from bundlefusion_tpu.ops.image import resample_nearest, rgb_to_intensity
    from bundlefusion_tpu.ops.sift import SiftConfig, detect_and_describe
    from bundlefusion_tpu.pipeline.frames import (
        create_dense_cache,
        create_keyframe_store,
        store_cache_frame,
        store_keypoints,
    )
    from bundlefusion_tpu.pipeline.frontend import FrontendParams, match_and_filter
    from bundlefusion_tpu.ops.filters import DenseVerifyParams

    intr = default_intrinsics(160, 120)
    cache_intr = intr.scaled(40, 30)
    sift = SiftConfig(num_octaves=3, target_keys=64,
                      max_candidates_per_octave=256, min_scale=1.0,
                      dog_thresh=0.004)
    G = 192  # > the 128-slot chunk size -> chunked path
    n = 6
    seq = make_sequence(n, intr=intr)
    keys = create_keyframe_store(G, sift.target_keys)
    cache = create_dense_cache(G, cache_intr.height, cache_intr.width)
    for i in range(n):
        d = jnp.asarray(seq["depth"][i])
        c = jnp.asarray(seq["color"][i])
        kp = detect_and_describe(rgb_to_intensity(c), d, sift)
        keys = store_keypoints(keys, jnp.asarray(i), kp)
        keys = keys._replace(frame_valid=keys.frame_valid.at[i].set(True))
        cache = store_cache_frame(cache, jnp.asarray(i), d, c, cache_intr)

    fp = FrontendParams(min_num_matches=4, dense=DenseVerifyParams())
    cur = jnp.asarray(n - 1)
    out_chunked = match_and_filter(cur, keys, cache, intr, cache_intr, fp)
    out_ref = match_and_filter(
        cur, keys, cache, intr, cache_intr, fp,
        slots=jnp.arange(G, dtype=jnp.int32),
    )
    assert bool(np.asarray(out_chunked["pair_valid"]).any())
    # decision outputs must agree everywhere; per-match payloads only where
    # inlier_mask holds (invalid lanes are don't-care in both paths and the
    # unchunked path leaves raw matcher garbage there)
    for k in ("pair_valid", "num_inliers", "inlier_mask"):
        np.testing.assert_array_equal(
            np.asarray(out_chunked[k]), np.asarray(out_ref[k]), err_msg=k
        )
    im = np.asarray(out_ref["inlier_mask"])
    for k in ("idx_cur", "idx_prev"):
        np.testing.assert_array_equal(
            np.asarray(out_chunked[k])[im], np.asarray(out_ref[k])[im],
            err_msg=k,
        )
    np.testing.assert_allclose(
        np.asarray(out_chunked["p_cur"])[im],
        np.asarray(out_ref["p_cur"])[im], atol=1e-6,
    )
    pv = np.asarray(out_ref["pair_valid"])
    np.testing.assert_allclose(
        np.asarray(out_chunked["transforms"])[pv],
        np.asarray(out_ref["transforms"])[pv], atol=1e-6,
    )
