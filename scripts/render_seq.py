"""Render a synthetic benchmark sequence to an .npz cache (wire format).

Run as a SUBPROCESS by bench/scale/drift harnesses: the dev-tunnel's
host->device transfer path degrades ~50x process-wide after certain
compiled programs execute (measured; see bench.py), so sequence rendering
— which runs jitted sphere-tracing — must not share a process with the
engine's input prestaging. This script renders in its own session and
exits; the parent process loads the npz and uploads at full link speed.

Usage: python scripts/render_seq.py OUT.npz n_frames W H \
          [--traj orbit|loop] [--noise F] [--blackout A B] [--seed N]
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_cc")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.2")

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np  # noqa: E402


def main():
    out = sys.argv[1]
    n_frames = int(sys.argv[2])
    w, h = int(sys.argv[3]), int(sys.argv[4])
    traj = "orbit"
    noise = 0.0
    blackout = None
    seed = 0
    start = 0
    full_n = None  # trajectory length when rendering a [start, start+n) shard
    args = sys.argv[5:]
    i = 0
    while i < len(args):
        if args[i] == "--traj":
            traj = args[i + 1]; i += 2
        elif args[i] == "--noise":
            noise = float(args[i + 1]); i += 2
        elif args[i] == "--blackout":
            blackout = (int(args[i + 1]), int(args[i + 2])); i += 3
        elif args[i] == "--seed":
            seed = int(args[i + 1]); i += 2
        elif args[i] == "--start":
            start = int(args[i + 1]); i += 2
        elif args[i] == "--full-n":
            full_n = int(args[i + 1]); i += 2
        else:
            raise SystemExit(f"unknown arg {args[i]}")

    from bundlefusion_tpu.io.synthetic import (
        default_intrinsics,
        loop_trajectory,
        make_sequence_wire,
        multiloop_trajectory,
        orbit_trajectory,
    )

    intr = default_intrinsics(w, h)
    N = full_n if full_n is not None else start + n_frames
    if traj == "loop":
        poses_full = loop_trajectory(N, odom_noise=0.0)
    elif traj == "multiloop":
        poses_full = multiloop_trajectory(N)
    else:
        poses_full = orbit_trajectory(N)
    poses = poses_full[start : start + n_frames]
    bl_local = None
    if blackout is not None:
        a = max(blackout[0] - start, 0)
        b = min(blackout[1] - start, n_frames)
        if a < b:
            bl_local = (a, b)
    seq = make_sequence_wire(
        n_frames, intr=intr, poses=poses, noise_depth=noise,
        blackout=bl_local, seed=seed + start,
    )
    tmp = out + ".tmp.npz"
    np.savez(tmp, depth=seq["depth"], color=seq["color"], poses=seq["poses"])
    os.replace(tmp, out)
    print(f"wrote {out}: {n_frames} frames {w}x{h}")


if __name__ == "__main__":
    main()
