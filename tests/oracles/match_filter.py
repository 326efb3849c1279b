"""NumPy oracle of the reference CPU greedy-Kabsch match filter.

Clean-room port of the algorithm in
``/root/reference/FriedLiver/Source/SiftGPU/cuda_kabschReference.h:429-506``
(``filterKeyPointMatchesReference``; helpers ``addMatchReference:325-340``,
``ComputeReprojectionReference:404-427``), the CPU twin the reference uses
as its own debugging ground truth (``SIFTMatchFilter::filterKeyPointMatches``,
SIFTMatchFilter.cpp:41-100).

Semantics reproduced:
- greedy scan over matches sorted ascending by descriptor distance;
- pixel-distance dedup at 5 px against the accepted set (either image);
- from 3 accepted matches on: Kabsch rigid fit, squared residuals, sorted;
- if the max residual exceeds ``max_res2``: strip worst until ok, with the
  reference's "revert if stripping to 3 made it worse" rule;
- condition-number checks (largest/second eigenvalue of the Kabsch
  cross-covariance and of each point set's covariance, |ratio| < 100);
- final validity: >= min_num_matches, max residual < thresh, valid fit.
"""

from __future__ import annotations

import numpy as np

PIXEL_DIST_THRESH = 5.0
CONDITION_THRESH = 100.0
MAX_FILTERED = 25


def kabsch_np(src, tgt):
    """Rigid T (4x4) minimizing ||T src - tgt||; also returns the singular
    values of the cross-covariance (descending)."""
    mu_s = src.mean(0)
    mu_t = tgt.mean(0)
    H = (src - mu_s).T @ (tgt - mu_t)
    U, S, Vt = np.linalg.svd(H)
    d = np.sign(np.linalg.det(Vt.T @ U.T))
    D = np.diag([1.0, 1.0, d])
    R = Vt.T @ D @ U.T
    T = np.eye(4, dtype=np.float64)
    T[:3, :3] = R
    T[:3, 3] = mu_t - R @ mu_s
    return T, np.sort(S)[::-1]


def _cov_ratio(pts):
    """largest/second eigenvalue ratio of the point covariance (the
    reference's ``covarianceSVDReference`` + descending sort)."""
    c = pts - pts.mean(0)
    cov = c.T @ c / pts.shape[0]
    ev = np.sort(np.linalg.eigvalsh(cov))[::-1]
    with np.errstate(divide="ignore", invalid="ignore"):
        return ev[0] / ev[1]


def _reprojection(src, tgt):
    """(transform, residuals_sq, order, valid_condition) — the oracle's
    ``ComputeReprojectionReference``. Residuals come back SORTED ascending
    together with the sort order over the input points."""
    T, svals = kabsch_np(src, tgt)
    r = np.sum((src @ T[:3, :3].T + T[:3, 3] - tgt) ** 2, axis=1)
    order = np.argsort(r, kind="stable")
    with np.errstate(divide="ignore", invalid="ignore"):
        c1 = svals[0] / svals[1]
    cp = _cov_ratio(src)
    cq = _cov_ratio(tgt)
    bad = (
        not np.isfinite(c1)
        or not np.isfinite(cp)
        or not np.isfinite(cq)
        or abs(c1) > CONDITION_THRESH
        or abs(cp) > CONDITION_THRESH
        or abs(cq) > CONDITION_THRESH
    )
    return T, r[order], order, not bad


def filter_matches_oracle(
    src_pts,
    tgt_pts,
    pix_src,
    pix_tgt,
    valid,
    min_num_matches: int = 4,
    max_res2: float = 4e-4,
    max_filtered: int = MAX_FILTERED,
):
    """Run the reference CPU greedy filter on one image pair.

    Args mirror ``bundlefusion_tpu.ops.filters.kabsch_filter_pair``.

    Returns dict: ``inlier_idx`` (raw-match indices of survivors),
    ``transform`` (4x4 src->tgt), ``valid_pair``.
    """
    src_pts = np.asarray(src_pts, np.float64)
    tgt_pts = np.asarray(tgt_pts, np.float64)
    pix_src = np.asarray(pix_src, np.float64)
    pix_tgt = np.asarray(pix_tgt, np.float64)
    n_raw = len(src_pts)

    cur: list[int] = []          # accepted raw-match indices, residual-sorted
    T_est = np.eye(4)
    cur_max_res = 100.0
    valid_T = False

    idx = 0
    while True:
        if idx >= n_raw or not valid[idx] or len(cur) >= max_filtered:
            break
        i = idx
        idx += 1
        # pixel dedup against accepted set (either image)
        dup = any(
            np.linalg.norm(pix_src[i] - pix_src[j]) <= PIXEL_DIST_THRESH
            or np.linalg.norm(pix_tgt[i] - pix_tgt[j]) <= PIXEL_DIST_THRESH
            for j in cur
        )
        if dup:
            continue
        cur.append(i)
        if len(cur) < 3:
            continue

        sel = np.array(cur)
        T_est, res_sorted, order, valid_T = _reprojection(
            src_pts[sel], tgt_pts[sel]
        )
        cur = [cur[k] for k in order]
        # the reference snapshots the post-add fit (validity + transform)
        # as the state to restore if stripping to 3 makes things worse
        b = valid_T
        prev_T = T_est.copy()
        cur_max_res = res_sorted[-1]
        if cur_max_res > max_res2:
            # strip worst until ok (reference's inner removal loop)
            last_res = -1.0
            while len(cur) > 3:
                last_res = cur_max_res
                removed = cur.pop()  # worst (sorted ascending)
                sel = np.array(cur)
                T_est, res_sorted, order, valid_T = _reprojection(
                    src_pts[sel], tgt_pts[sel]
                )
                cur = [cur[k] for k in order]
                cur_max_res = res_sorted[-1]
                if len(cur) == 3 and (
                    cur_max_res > max_res2 or (b and not valid_T)
                ):
                    # removing made it worse: the reference re-counts the
                    # removed match and restores the previous state
                    cur.append(removed)
                    cur_max_res = last_res
                    valid_T = b
                    T_est = prev_T
                    break
                if cur_max_res < max_res2:
                    break

    ok = (
        len(cur) >= min_num_matches
        and cur_max_res < max_res2
        and valid_T
    )
    return {
        "inlier_idx": np.array(sorted(cur), np.int64) if ok else np.zeros((0,), np.int64),
        "transform": T_est if ok else np.eye(4),
        "valid_pair": bool(ok),
    }
