"""Weak-scaling harness: engine frames/s at 1/2/4/8 (virtual) devices.

The global problem scales with the mesh (keyframe count and corr capacity
proportional to devices; keyframe stores + corr store sharded over the
mesh), so per-device global work stays constant — ideal weak scaling keeps
frames/s flat. Writes SCALING.json {n_devices: fps, efficiency}.

Runs each mesh size in a fresh subprocess (the device-count XLA flag must
precede JAX init). On this box only virtual CPU devices are available
(one real TPU chip); the harness validates the sharded path and reports
the numbers the driver can reproduce on real hardware.
"""
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import os, sys, time, json
import numpy as np
import jax
from jax.sharding import Mesh

from bundlefusion_tpu import AppConfig, BundlingConfig
from bundlefusion_tpu.io.synthetic import default_intrinsics, make_sequence
from bundlefusion_tpu.ops.sift import SiftConfig
from bundlefusion_tpu.pipeline.online import BundleFusion

n = int(sys.argv[1])
devices = jax.devices()[:n]
assert len(devices) == n, (len(devices), n)
mesh = Mesh(np.asarray(devices), ("shard",)) if n > 1 else None

intr = default_intrinsics(160, 120)
app = AppConfig(integration_width=80, integration_height=60, sdf_voxel_size=0.03,
                sdf_truncation=0.09, hash_num_sdf_blocks=8192, hash_key_capacity=16384,
                visible_blocks_cap=8192)
G = 4 * n                       # keyframe capacity scales with the mesh
# submap_size 10 = the REFERENCE cadence (zParametersBundlingDefault.txt:31):
# boundaries amortize over 9 frames as in the real system (the round-3
# harness ran submap 4, overweighting the boundary phase 3x)
bundling = BundlingConfig(width_sift=160, height_sift=120, submap_size=10,
                          downsampled_width=40, downsampled_height=30,
                          max_local_corr=2048, max_global_corr=512 * n,
                          min_num_matches_local=4, min_num_matches_global=4)
sift = SiftConfig(num_octaves=3, target_keys=96, max_candidates_per_octave=256,
                  min_scale=1.0, dog_thresh=0.004)
eng = BundleFusion(intr, app, bundling, sift_cfg=sift, max_keyframes=G, mesh=mesh)
# 2 submaps per device (the global problem scales with the mesh), same
# per-device frame count at every n
n_frames = 2 * (bundling.submap_size - 1) * n + 1
seq = make_sequence(n_frames, intr=intr)
warm = bundling.submap_size
for i in range(warm):
    eng.process_frame(seq["depth"][i], seq["color"][i])
jax.block_until_ready((eng.local, eng.glob))
t0 = time.perf_counter()
for i in range(warm, n_frames):
    eng.process_frame(seq["depth"][i], seq["color"][i])
jax.block_until_ready((eng.local, eng.glob, eng.table))
fps = (n_frames - warm) / (time.perf_counter() - t0)
eng._flush_pending()   # retire in-flight submaps so the validity count is real
traj = eng.trajectory()
ok = int(np.isfinite(traj).all((1, 2)).sum())
print(json.dumps({"n": n, "fps": round(fps, 3), "valid": ok, "frames": n_frames}))
"""


def main():
    results = {}
    for n in (1, 2, 4, 8):
        env = dict(os.environ)
        env["PYTHONPATH"] = ROOT
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n}"
        env["JAX_COMPILATION_CACHE_DIR"] = "/root/.cache/jax_cc"
        env["JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES"] = "0"
        env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "0.2"
        out = subprocess.run(
            [sys.executable, "-c", CHILD, str(n)],
            capture_output=True, text=True, env=env, cwd=ROOT, timeout=3000,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if not line:
            print(f"n={n} FAILED:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")
            results[str(n)] = None
            continue
        r = json.loads(line[-1])
        results[str(n)] = r
        print(r, flush=True)
    base = results.get("1")
    report = {"results": results}
    if base:
        report["weak_scaling_efficiency"] = {
            k: round(v["fps"] / base["fps"], 3)
            for k, v in results.items()
            if v
        }
    with open(os.path.join(ROOT, "SCALING.json"), "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(report.get("weak_scaling_efficiency", {})))


if __name__ == "__main__":
    main()
