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
