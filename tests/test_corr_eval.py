"""Correspondence-evaluator (fidelity) tests — the CorrespondenceEvaluator
methodology (CorrespondenceEvaluator.h:10-50) actually wired and run."""

import numpy as np

from bundlefusion_tpu import BundlingConfig
from bundlefusion_tpu.io.synthetic import default_intrinsics, make_sequence
from bundlefusion_tpu.ops.filters import DenseVerifyParams
from bundlefusion_tpu.ops.sift import SiftConfig
from bundlefusion_tpu.pipeline.frontend import FrontendParams
from bundlefusion_tpu.utils.corr_eval import (
    CorrespondenceEvaluator,
    evaluate_frontend_fidelity,
)


def test_stage_stats_math():
    gt = np.stack([np.eye(4, dtype=np.float32)] * 2)
    ev = CorrespondenceEvaluator(gt, dist_thresh=0.05)
    p = np.array([[0, 0, 1.0], [0, 0, 1.0], [0, 0, 1.0]], np.float32)
    q = p.copy()
    q[1] += 0.5  # wrong match
    cand = np.array([True, True, True])
    kept = np.array([True, True, False])
    ev.record_stage("s", 1, 0, p, q, cand, kept)
    s = ev.summary()["s"]
    assert s["tp"] == 1 and s["fp"] == 1 and s["fn"] == 1
    assert abs(s["precision"] - 0.5) < 1e-9


def test_cascade_fidelity_on_synthetic():
    intr = default_intrinsics(160, 120)
    sift = SiftConfig(num_octaves=3, target_keys=96,
                      max_candidates_per_octave=256, min_scale=1.0,
                      dog_thresh=0.004)
    b = BundlingConfig()
    fp = FrontendParams(
        sift_match_thresh=b.sift_match_thresh,
        sift_match_ratio=b.sift_match_ratio_max_local,
        num_raw_matches=b.max_matches_per_image_pair_raw,
        max_filtered=b.max_matches_per_image_pair_filtered,
        min_num_matches=4,
        max_kabsch_res2=b.max_kabsch_residual2,
        surf_area_thresh=b.surf_area_pca_thresh,
        dense=DenseVerifyParams(),
    )
    seq = make_sequence(6, intr=intr)
    ev, summary = evaluate_frontend_fidelity(
        {k: np.asarray(v) for k, v in seq.items() if k in ("depth", "color", "poses")},
        intr, sift, fp, pair_stride=(1,),
    )
    assert summary["0_raw_match"]["tp"] > 50
    # the Kabsch filter must not DEGRADE precision, and should keep most
    # correct matches (the cascade's whole point)
    assert summary["1_kabsch"]["precision"] >= summary["0_raw_match"]["precision"]
    assert summary["1_kabsch"]["precision"] > 0.95
    assert summary["1_kabsch"]["recall"] > 0.6
