"""Frontend fidelity report: per-filter-stage precision/recall vs GT on a
synthetic sequence (CorrespondenceEvaluator methodology). Writes
FIDELITY.json + CSV at the repo root — the per-round fidelity artifact."""
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_cc")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bundlefusion_tpu import AppConfig, BundlingConfig
from bundlefusion_tpu.io.synthetic import default_intrinsics, make_sequence
from bundlefusion_tpu.ops.filters import DenseVerifyParams
from bundlefusion_tpu.ops.sift import SiftConfig
from bundlefusion_tpu.pipeline.frontend import FrontendParams
from bundlefusion_tpu.utils.corr_eval import evaluate_frontend_fidelity


def main(small: bool = True):
    if small:
        intr = default_intrinsics(160, 120)
        sift = SiftConfig(num_octaves=3, target_keys=96,
                          max_candidates_per_octave=256, min_scale=1.0,
                          dog_thresh=0.004)
        n = 10
        cache_intr = intr.scaled(40, 30)
    else:
        intr = default_intrinsics(640, 480)
        sift = SiftConfig(target_keys=150, min_scale=3.0)
        n = 24
        cache_intr = intr.scaled(80, 60)
    bundling = BundlingConfig()
    fp = FrontendParams(
        sift_match_thresh=bundling.sift_match_thresh,
        sift_match_ratio=bundling.sift_match_ratio_max_local,
        num_raw_matches=bundling.max_matches_per_image_pair_raw,
        max_filtered=bundling.max_matches_per_image_pair_filtered,
        min_num_matches=4,
        max_kabsch_res2=bundling.max_kabsch_residual2,
        surf_area_thresh=bundling.surf_area_pca_thresh,
        dense=DenseVerifyParams(),
    )
    seq = make_sequence(n, intr=intr)
    ev, summary = evaluate_frontend_fidelity(
        {k: np.asarray(v) for k, v in seq.items() if k in ("depth", "color", "poses")},
        intr, sift, fp, intr_cache=cache_intr,
    )
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ev.to_csv(os.path.join(root, "FIDELITY.csv"))
    with open(os.path.join(root, "FIDELITY.json"), "w") as fh:
        json.dump(summary, fh, indent=1)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main(small="--full" not in sys.argv)
