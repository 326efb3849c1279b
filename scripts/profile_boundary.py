"""Honest device-time profile of ONE submap boundary at capacity scale.

VERDICT r4 item 2: with 640 *live* keyframes the engine ran 2.47 fps and
nobody measured where the boundary time went. This harness constructs a
realistic global problem directly — G keyframes, ~25 corrs/pair over a
loop-dense pair graph (reference per-pair filtered cap,
``GlobalDefines.h:9``) — and times each boundary component in isolation
with block_until_ready walls minus the measured dispatch RTT:

  - presort (working-set selection + pair segmentation)
  - one GN/PCG solve on the presorted problem (3 GN x 150 PCG)
  - max_residual_sorted (the pruning driver)
  - a full prune round (invalidate + re-solve)
  - global match_and_filter of one keyframe vs all G

Writes BOUNDARY_PROFILE.json. Usage:
  python scripts/profile_boundary.py [G] [corrs_per_pair]
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_cc")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.2")

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np  # noqa: E402


def build_problem(G, per_pair, rng):
    """Loop-dense pose graph: sequential pairs + anchor-region loop
    closures (every keyframe overlaps a central region, the quadratic
    regime the drift harness hits)."""
    import jax.numpy as jnp

    from bundlefusion_tpu.geometry.lie import pose_to_matrix
    from bundlefusion_tpu.solver.residuals import append_corrs, create_corr_store

    # ground-truth multiloop-ish trajectory
    t = np.arange(G) * 0.05
    gt = np.zeros((G, 6), np.float32)
    gt[:, 1] = 0.02 * t          # slow yaw
    gt[:, 3] = np.cos(0.2 * t)
    gt[:, 4] = np.sin(0.2 * t)

    pairs = []
    for i in range(1, G):
        for j in range(max(0, i - 4), i):       # local chain
            pairs.append((i, j))
        # loop closures into the anchor region: ~1 in 3 keyframes sees it
        if i % 3 == 0:
            for j in rng.choice(max(1, i - 20), size=min(8, max(1, i - 20)),
                                replace=False):
                pairs.append((i, int(j)))
    pairs = sorted(set(pairs))
    C_needed = len(pairs) * per_pair
    cap = 1 << max(18, int(np.ceil(np.log2(C_needed * 1.3))))

    Tm = np.asarray(pose_to_matrix(jnp.asarray(gt)))  # [G,4,4]
    store = create_corr_store(cap)
    ii, jj, pi, pj = [], [], [], []
    for (a, b) in pairs:
        world = rng.uniform(-1, 1, size=(per_pair, 3)).astype(np.float32)
        world[:, 2] += 2.0
        Ta, Tb = np.linalg.inv(Tm[a]), np.linalg.inv(Tm[b])
        ii.append(np.full(per_pair, a, np.int32))
        jj.append(np.full(per_pair, b, np.int32))
        pi.append(world @ Ta[:3, :3].T + Ta[:3, 3])
        pj.append(world @ Tb[:3, :3].T + Tb[:3, 3])
    ii = np.concatenate(ii)
    jj = np.concatenate(jj)
    pi = np.concatenate(pi).astype(np.float32)
    pj = np.concatenate(pj).astype(np.float32)
    # append in chunks (append_corrs is O(batch))
    B = 1 << 16
    for s in range(0, len(ii), B):
        e = min(s + B, len(ii))
        store = append_corrs(
            store, jnp.asarray(ii[s:e]), jnp.asarray(jj[s:e]),
            jnp.asarray(pi[s:e]), jnp.asarray(pj[s:e]),
            jnp.ones(e - s, bool),
        )
    init = gt + rng.normal(size=gt.shape).astype(np.float32) * 0.01
    init[0] = gt[0]
    return jnp.asarray(init), store, len(pairs), int(C_needed)


def timeit(fn, *args, n=5, rtt=0.0):
    import jax
    outs = jax.block_until_ready(fn(*args))  # compile
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append((time.perf_counter() - t0) * 1e3)
    return max(0.0, float(np.median(ts)) - rtt), outs


def main():
    import jax
    import jax.numpy as jnp

    from bundlefusion_tpu.solver.gn_pcg import (
        SolverParams,
        invalidate_pair_sorted,
        max_residual_sorted,
        presort_corrs,
        solve_sparse_presorted,
    )
    from bundlefusion_tpu.solver.residuals import invalidate_image_pair

    G = int(sys.argv[1]) if len(sys.argv) > 1 else 640
    per_pair = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    rng = np.random.default_rng(0)
    platform = jax.devices()[0].platform

    poses, store, n_pairs, n_corrs = build_problem(G, per_pair, rng)
    kv = jnp.ones((G,), bool)
    params = SolverParams(
        num_gn=3, num_pcg=150,
        max_pairs=1 << 18, max_working_corrs=1 << 22,
    )

    # dispatch RTT: a trivial program round trip
    f_null = jax.jit(lambda x: x + 1)
    rtt, _ = timeit(f_null, jnp.zeros(()), n=21)

    res = {
        "platform": platform, "G": G, "pairs": n_pairs, "corrs": n_corrs,
        "capacity": int(store.capacity),
        "params": {"max_pairs": params.max_pairs,
                   "max_working_corrs": params.max_working_corrs,
                   "num_gn": params.num_gn, "num_pcg": params.num_pcg},
        "rtt_ms": round(rtt, 3),
    }

    f_presort = jax.jit(lambda c: presort_corrs(c, G, params))
    t, prob = timeit(f_presort, store, rtt=rtt)
    res["presort_ms"] = round(t, 2)
    res["dropped"] = int(prob.sc.dropped)

    f_solve = jax.jit(
        lambda p, v, pr: solve_sparse_presorted(p, v, pr, params)
    )
    t, sposes = timeit(f_solve, poses, kv, prob, rtt=rtt)
    res["solve_ms"] = round(t, 2)

    f_mr = jax.jit(max_residual_sorted)
    t, (mr, fa, fb) = timeit(f_mr, sposes, prob, rtt=rtt)
    res["max_residual_ms"] = round(t, 2)
    res["max_residual"] = round(float(mr), 4)

    def full_prune(p, v, pr, fa, fb):
        pr = invalidate_pair_sorted(pr, fa, fb)
        return solve_sparse_presorted(p, v, pr, params)

    f_prune = jax.jit(full_prune)
    t, _ = timeit(f_prune, poses, kv, prob, fa, fb, rtt=rtt)
    res["prune_round_ms"] = round(t, 2)

    f_inval = jax.jit(invalidate_image_pair)
    t, _ = timeit(f_inval, store, fa, fb, rtt=rtt)
    res["invalidate_store_ms"] = round(t, 2)

    # a boundary runs: presort + solve + max_prune_rounds * (mr + prune)
    prune_rounds = 3
    res["boundary_model_ms"] = round(
        res["presort_ms"] + res["solve_ms"]
        + prune_rounds * (res["max_residual_ms"] + res["prune_round_ms"]),
        1,
    )

    with open(os.path.join(ROOT, "BOUNDARY_PROFILE.json"), "w") as fh:
        json.dump(res, fh, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
