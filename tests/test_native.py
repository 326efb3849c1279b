import zlib

import numpy as np
import pytest

from bundlefusion_tpu.io.native import build_native, decode_depth_batch, native_available


def make_buffers(rng, n=4, h=24, w=32, shift=1000.0):
    depths = rng.uniform(0.5, 4.0, (n, h, w)).astype(np.float32)
    depths[:, 0, 0] = 0.0  # invalid pixel
    bufs = []
    for i in range(n):
        u16 = np.clip(depths[i] * shift, 0, 65535).astype(np.uint16)
        u16[0, 0] = 0
        bufs.append(zlib.compress(u16.tobytes()))
    return depths, bufs


def test_python_fallback_matches(rng):
    depths, bufs = make_buffers(rng)
    out = decode_depth_batch(bufs, 24, 32, 1000.0)
    assert out.shape == (4, 24, 32)
    valid = depths > 0
    np.testing.assert_allclose(out[valid], depths[valid], atol=1e-3)
    assert np.isnan(out[:, 0, 0]).all()


def test_native_build_and_decode(rng):
    assert build_native(), "native build failed"
    assert native_available()
    depths, bufs = make_buffers(rng, n=8)
    out = decode_depth_batch(bufs, 24, 32, 1000.0, num_threads=3)
    valid = depths > 0
    np.testing.assert_allclose(out[valid], depths[valid], atol=1e-3)
    assert np.isnan(out[:, 0, 0]).all()


def test_native_corrupt_buffer_falls_back(rng):
    depths, bufs = make_buffers(rng, n=2)
    bufs[1] = b"not a zlib stream"
    with pytest.raises(zlib.error):
        decode_depth_batch(bufs, 24, 32, 1000.0)
