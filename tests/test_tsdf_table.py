import jax.numpy as jnp
import numpy as np

from bundlefusion_tpu.tsdf.table import (
    EMPTY_KEY,
    allocate,
    check_invariants,
    create_table,
    free_blocks,
    garbage_collect,
    lookup_blocks,
    num_occupied,
    pack_block_coords,
    unpack_key,
)


def make_table(cap=1024, blocks=256):
    return create_table(cap, blocks)


def test_pack_unpack_roundtrip(rng):
    coords = rng.integers(-500, 500, size=(100, 3)).astype(np.int32)
    packed = pack_block_coords(jnp.asarray(coords))
    back = np.asarray(unpack_key(packed))
    np.testing.assert_array_equal(back, coords)


def test_pack_out_of_range():
    coords = jnp.asarray(np.array([[600, 0, 0], [0, -600, 0]], np.int32))
    packed = pack_block_coords(coords)
    assert np.all(np.asarray(packed) == int(EMPTY_KEY))


def test_alloc_and_lookup(rng):
    t = make_table()
    coords = rng.integers(-10, 10, size=(50, 3)).astype(np.int32)
    valid = np.ones(50, bool)
    t = allocate(t, jnp.asarray(coords), jnp.asarray(valid))
    uniq = np.unique(coords, axis=0)
    assert int(num_occupied(t)) == len(uniq)
    slots = np.asarray(lookup_blocks(t, jnp.asarray(uniq)))
    assert (slots >= 0).all()
    assert len(np.unique(slots)) == len(uniq)
    # absent block
    absent = np.asarray(lookup_blocks(t, jnp.asarray(np.array([[400, 400, 400]], np.int32))))
    assert absent[0] == -1
    assert all(v == 0 for v in check_invariants(t).values())


def test_alloc_idempotent(rng):
    t = make_table()
    coords = rng.integers(-5, 5, size=(30, 3)).astype(np.int32)
    t = allocate(t, jnp.asarray(coords), jnp.ones(30, bool))
    n1 = int(num_occupied(t))
    fc1 = int(t.free_count)
    t = allocate(t, jnp.asarray(coords), jnp.ones(30, bool))
    assert int(num_occupied(t)) == n1
    assert int(t.free_count) == fc1
    assert all(v == 0 for v in check_invariants(t).values())


def test_alloc_respects_valid_mask(rng):
    t = make_table()
    coords = np.array([[1, 1, 1], [2, 2, 2]], np.int32)
    t = allocate(t, jnp.asarray(coords), jnp.asarray(np.array([True, False])))
    assert int(num_occupied(t)) == 1
    assert int(lookup_blocks(t, jnp.asarray(coords[:1]))[0]) >= 0
    assert int(lookup_blocks(t, jnp.asarray(coords[1:]))[0]) == -1


def test_alloc_overflow_accounting():
    # create_table rounds num_blocks up to the kernel's 128-row DMA tile,
    # so the smallest payload is 128 slots; overflow it with 192 blocks
    t = make_table(cap=256, blocks=128)
    assert t.num_blocks == 128
    coords = np.stack(
        np.meshgrid(np.arange(8), np.arange(6), np.arange(4)), -1
    ).reshape(-1, 3).astype(np.int32)
    # 192 distinct blocks into 128 slots -> 64 failures
    t = allocate(t, jnp.asarray(coords), jnp.ones(192, bool))
    assert int(num_occupied(t)) == 128
    assert int(t.free_count) == 0
    assert int(t.num_alloc_failures) == 64
    assert all(v == 0 for v in check_invariants(t).values())


def test_free_blocks_roundtrip(rng):
    t = make_table()
    coords = rng.integers(-8, 8, size=(40, 3)).astype(np.int32)
    uniq = np.unique(coords, axis=0)
    t = allocate(t, jnp.asarray(coords), jnp.ones(40, bool))
    n = int(num_occupied(t))
    # free half the occupied keys
    occ = np.asarray(t.keys) != int(EMPTY_KEY)
    occ_pos = np.nonzero(occ)[0]
    mask = np.zeros(t.capacity, bool)
    mask[occ_pos[: n // 2]] = True
    t = free_blocks(t, jnp.asarray(mask))
    assert int(num_occupied(t)) == n - n // 2
    assert all(v == 0 for v in check_invariants(t).values())
    # freed slots can be reallocated
    t = allocate(t, jnp.asarray(uniq), jnp.ones(len(uniq), bool))
    assert int(num_occupied(t)) == len(uniq)
    assert all(v == 0 for v in check_invariants(t).values())


def test_garbage_collect(rng):
    t = make_table()
    coords = rng.integers(-5, 5, size=(20, 3)).astype(np.int32)
    uniq = np.unique(coords, axis=0)
    t = allocate(t, jnp.asarray(coords), jnp.ones(20, bool))
    # give weight to the first 3 blocks only
    slots = np.asarray(lookup_blocks(t, jnp.asarray(uniq)))
    w = np.asarray(t.weight).copy()
    w[slots[:3]] = 1.0
    t = t._replace(weight=jnp.asarray(w))
    t = garbage_collect(t)
    assert int(num_occupied(t)) == 3
    kept = np.asarray(lookup_blocks(t, jnp.asarray(uniq[:3])))
    assert (kept >= 0).all()
    assert all(v == 0 for v in check_invariants(t).values())


def test_defrag_prefix(rng):
    """defrag_prefix sorts live payload rows by key, compacts occupancy,
    preserves every lookup/payload value, and keeps invariants clean —
    including across a later free + re-alloc cycle."""
    from bundlefusion_tpu.tsdf.table import defrag_prefix

    t = make_table(cap=1024, blocks=256)
    # three allocation batches (interleaved key ranges -> allocation-order
    # slots are NOT key-sorted), plus a free to punch holes
    c1 = rng.integers(-8, 0, size=(40, 3)).astype(np.int32)
    c2 = rng.integers(0, 8, size=(40, 3)).astype(np.int32)
    t = allocate(t, jnp.asarray(c1), jnp.ones(40, bool))
    t = allocate(t, jnp.asarray(c2), jnp.ones(40, bool))
    n_live_before = int(num_occupied(t))
    # give each block a payload fingerprint keyed by its packed coords
    keys_by_slot = np.asarray(t.slot_keys[:256])
    live = keys_by_slot != int(EMPTY_KEY)
    fp = np.where(live, keys_by_slot % 1000, 0).astype(np.float32)
    t = t._replace(
        sdf=t.sdf.at[:256].set(jnp.asarray(fp)[:, None] * jnp.ones((1, 512))),
        weight=t.weight.at[:256].set(
            jnp.asarray(live.astype(np.float32))[:, None] * jnp.ones((1, 512))
        ),
    )
    # free a key-range slice (punches holes in the slot space)
    free_mask = (t.keys != EMPTY_KEY) & (np.asarray(t.keys) % 7 == 0)
    n_freed = int(jnp.sum(free_mask.astype(jnp.int32)))
    t = free_blocks(t, free_mask)

    t2 = defrag_prefix(t, 256)
    assert all(v == 0 for v in check_invariants(t2).values()), check_invariants(t2)
    n_live = n_live_before - n_freed
    assert int(num_occupied(t2)) == n_live
    # compact key-sorted prefix
    sk = np.asarray(t2.slot_keys[:256])
    assert (sk[:n_live] != int(EMPTY_KEY)).all()
    assert (np.diff(sk[:n_live]) > 0).all()
    assert (sk[n_live:] == int(EMPTY_KEY)).all()
    assert int(t2.high_water) == n_live
    # payload rows moved with their keys
    sdf2 = np.asarray(t2.sdf[:256, 0])
    w2 = np.asarray(t2.weight[:256, 0])
    np.testing.assert_array_equal(sdf2[:n_live], sk[:n_live] % 1000)
    assert (w2[:n_live] == 1.0).all()
    assert (w2[n_live:] == 0.0).all()
    # lookups unchanged for every surviving key
    for arr in (c1, c2):
        uniq = np.unique(arr, axis=0)
        packed = np.asarray(pack_block_coords(jnp.asarray(uniq)))
        kept = packed[packed % 7 != 0]
        slots = np.asarray(lookup_blocks(t2, jnp.asarray(unpack_key(jnp.asarray(kept)))))
        assert (slots >= 0).all() and (slots < n_live).all()
    # freed keys stay absent
    # a later allocation reuses the compact tail and stays consistent
    c3 = rng.integers(20, 28, size=(20, 3)).astype(np.int32)
    t3 = allocate(t2, jnp.asarray(c3), jnp.ones(20, bool))
    assert all(v == 0 for v in check_invariants(t3).values()), check_invariants(t3)
    uniq3 = np.unique(c3, axis=0)
    slots3 = np.asarray(lookup_blocks(t3, jnp.asarray(uniq3)))
    assert (slots3 >= 0).all()
    # new slots fill the compact tail first
    assert slots3.min() >= n_live and slots3.max() < n_live + len(uniq3)


def test_defrag_prefix_partial_window(rng):
    """A window smaller than occupancy defrags only the prefix and leaves
    the rest valid."""
    from bundlefusion_tpu.tsdf.table import defrag_prefix

    t = make_table(cap=1024, blocks=256)
    c = rng.integers(-10, 10, size=(200, 3)).astype(np.int32)
    t = allocate(t, jnp.asarray(c), jnp.ones(200, bool))
    n_live = int(num_occupied(t))
    assert n_live > 140  # need occupancy beyond the window
    t2 = defrag_prefix(t, 128)
    assert all(v == 0 for v in check_invariants(t2).values()), check_invariants(t2)
    assert int(num_occupied(t2)) == n_live
    sk = np.asarray(t2.slot_keys[:128])
    lv = sk != int(EMPTY_KEY)
    assert (np.diff(sk[lv]) > 0).all()
    uniq = np.unique(c, axis=0)
    slots = np.asarray(lookup_blocks(t2, jnp.asarray(uniq)))
    assert (slots >= 0).all()
