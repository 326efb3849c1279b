"""Per-stage profiling run on the bench operating point (not part of bench; run from repo root: python scripts/profile_run.py)."""
import os, sys, time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_cc")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.2")

import numpy as np
import jax

from bundlefusion_tpu import AppConfig, BundlingConfig
from bundlefusion_tpu.io.synthetic import default_intrinsics, make_sequence
from bundlefusion_tpu.ops.sift import SiftConfig
from bundlefusion_tpu.pipeline.online import BundleFusion

n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 36

# instrument _finish_submap sub-stages
import time as _time
from bundlefusion_tpu.pipeline import online as _online
_sub = {}
def _wrap(name, fn):
    def g(*a, **k):
        t0 = _time.perf_counter()
        r = fn(*a, **k)
        import jax as _jax
        _jax.block_until_ready(_jax.tree.leaves(r) if r is not None else [])
        _sub.setdefault(name, []).append(_time.perf_counter() - t0)
        return r
    return g
_online.solve_bundle = _wrap("solve_bundle", _online.solve_bundle)
_online.preprocess_frame = _wrap("preprocess_frame", _online.preprocess_frame)
_online.detect_and_describe = _wrap("detect", _online.detect_and_describe)
_online.store_cache_frame = _wrap("store_cache", _online.store_cache_frame)
_online.store_keypoints = _wrap("store_keys", _online.store_keypoints)
_online.integrate = _wrap("tsdf_integrate", _online.integrate)
_online.deintegrate = _wrap("tsdf_deintegrate", _online.deintegrate)
_online.chained_sift_transform = _wrap("chain", _online.chained_sift_transform)
_online.garbage_collect = _wrap("gc", _online.garbage_collect)
_online.solve_sparse = _wrap("solve_sparse", _online.solve_sparse)
_online.match_and_filter = _wrap("match_and_filter", _online.match_and_filter)
_online.fuse_keyframe = _wrap("fuse_keyframe", _online.fuse_keyframe)
_online.add_to_residuals = _wrap("add_to_residuals", _online.add_to_residuals)
_online._verify_local_pairs = _wrap("verify_local", _online._verify_local_pairs)
intr = default_intrinsics(640, 480)
app = AppConfig(hash_num_sdf_blocks=131072, hash_key_capacity=262144, visible_blocks_cap=32768)
bundling = BundlingConfig()
sift_cfg = SiftConfig(
    target_keys=150, min_scale=bundling.min_key_scale,
    depth_min=app.sensor_depth_min, depth_max=app.sensor_depth_max,
)
seq = make_sequence(n_frames, intr=intr)
eng = BundleFusion(intr, app, bundling, sift_cfg=sift_cfg, max_keyframes=64)

warm = 12
for i in range(warm):
    eng.process_frame(seq["depth"][i], seq["color"][i])
# reset totals after warmup
eng.timing._totals.clear(); eng.timing._counts.clear()
t0 = time.perf_counter()
for i in range(warm, n_frames):
    eng.process_frame(seq["depth"][i], seq["color"][i])
el = time.perf_counter() - t0
print(f"fps={(n_frames-warm)/el:.3f}  ms/frame={1000*el/(n_frames-warm):.1f}")
eng.timing.print_all_timings()
for k, v in sorted(_sub.items()):
    import numpy as _np
    v = _np.array(v) * 1000
    print(f"{k}: n={len(v)} mean={v.mean():.1f}ms last5={[round(x,1) for x in v[-5:]]}")
