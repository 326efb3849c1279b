import jax.numpy as jnp
import numpy as np

from bundlefusion_tpu.tsdf.streaming import HostBlockStore, stream_in, stream_out
from bundlefusion_tpu.tsdf.table import (
    allocate,
    check_invariants,
    create_table,
    lookup_blocks,
    num_occupied,
)

VOXEL = 0.05  # block extent = 0.4 m


def setup_table(rng):
    t = create_table(1024, 512)
    # near cluster (within 1 m) + far cluster (around 4 m)
    near = rng.integers(-2, 2, size=(30, 3)).astype(np.int32)
    far = rng.integers(8, 12, size=(30, 3)).astype(np.int32)
    coords = np.concatenate([near, far])
    t = allocate(t, jnp.asarray(coords), jnp.ones(len(coords), bool))
    # give each block a distinctive payload
    slots = np.asarray(lookup_blocks(t, jnp.asarray(coords)))
    sdf = np.asarray(t.sdf).copy()
    w = np.asarray(t.weight).copy()
    for i, s in enumerate(slots):
        sdf[s] = float(i)
        w[s] = 1.0
    t = t._replace(sdf=jnp.asarray(sdf), weight=jnp.asarray(w))
    return t, near, far, slots


def test_stream_out_in_roundtrip(rng):
    t, near, far, slots = setup_table(rng)
    n0 = int(num_occupied(t))
    store = HostBlockStore()
    cam = np.zeros(3)
    t = stream_out(t, store, cam, radius=2.0, voxel_size=VOXEL)
    assert len(store) > 0
    n1 = int(num_occupied(t))
    assert n1 == n0 - len(store)
    assert all(v == 0 for v in check_invariants(t).values())
    # far blocks are gone from the device table
    far_uniq = np.unique(far, axis=0)
    assert (np.asarray(lookup_blocks(t, jnp.asarray(far_uniq))) == -1).all()
    # camera moves to the far cluster: stream back in
    cam2 = (np.array([10, 10, 10]) + 0.5) * 8 * VOXEL
    t = stream_in(t, store, cam2, radius=2.0, voxel_size=VOXEL)
    back = np.asarray(lookup_blocks(t, jnp.asarray(far_uniq)))
    assert (back >= 0).all()
    assert all(v == 0 for v in check_invariants(t).values())
    # payload preserved: weights are 1 on restored blocks
    w = np.asarray(t.weight)
    assert (w[back] == 1.0).all()


def test_stream_out_preserves_near(rng):
    t, near, far, slots = setup_table(rng)
    store = HostBlockStore()
    t = stream_out(t, store, np.zeros(3), radius=2.0, voxel_size=VOXEL)
    near_uniq = np.unique(near, axis=0)
    assert (np.asarray(lookup_blocks(t, jnp.asarray(near_uniq))) >= 0).all()
