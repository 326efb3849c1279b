"""Correspondence-filter evaluation vs ground-truth trajectory.

Analog of the reference's compile-gated ``CorrespondenceEvaluator``
(``CorrespondenceEvaluator.{h,cpp}``: per-filter-stage precision/recall of
matches against GT poses, CSV logs). A match (i, j, p_i, p_j) is deemed
ground-truth-correct when || T_i p_i - T_j p_j || falls below a threshold
under the GT poses.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List

import numpy as np


@dataclass
class StageStats:
    tp: int = 0
    fp: int = 0
    fn: int = 0

    @property
    def precision(self) -> float:
        d = self.tp + self.fp
        return self.tp / d if d else float("nan")

    @property
    def recall(self) -> float:
        d = self.tp + self.fn
        return self.tp / d if d else float("nan")


class CorrespondenceEvaluator:
    def __init__(self, gt_poses: np.ndarray, dist_thresh: float = 0.05):
        """gt_poses: [N, 4, 4] camera-to-world ground truth."""
        self.gt = np.asarray(gt_poses, np.float64)
        self.thresh = dist_thresh
        self.stages: Dict[str, StageStats] = {}
        self.rows: List[dict] = []

    def _is_correct(self, fi: int, fj: int, p_i: np.ndarray, p_j: np.ndarray) -> np.ndarray:
        Ti, Tj = self.gt[fi], self.gt[fj]
        wi = p_i @ Ti[:3, :3].T + Ti[:3, 3]
        wj = p_j @ Tj[:3, :3].T + Tj[:3, 3]
        return np.linalg.norm(wi - wj, axis=-1) < self.thresh

    def record_stage(self, stage: str, fi: int, fj: int,
                     p_i: np.ndarray, p_j: np.ndarray,
                     candidate_mask: np.ndarray, kept_mask: np.ndarray):
        """Evaluate one filter stage for one image pair.

        candidate_mask: matches entering the stage; kept_mask: survivors.
        """
        correct = self._is_correct(fi, fj, p_i, p_j)
        st = self.stages.setdefault(stage, StageStats())
        kept = kept_mask & candidate_mask
        dropped = candidate_mask & ~kept_mask
        st.tp += int((kept & correct).sum())
        st.fp += int((kept & ~correct).sum())
        st.fn += int((dropped & correct).sum())
        self.rows.append(
            {
                "stage": stage, "i": fi, "j": fj,
                "n_in": int(candidate_mask.sum()), "n_out": int(kept.sum()),
                "n_correct_in": int((candidate_mask & correct).sum()),
                "n_correct_out": int((kept & correct).sum()),
            }
        )

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {"precision": v.precision, "recall": v.recall, "tp": v.tp,
                "fp": v.fp, "fn": v.fn}
            for k, v in self.stages.items()
        }

    def to_csv(self, path: str):
        import csv

        with open(path, "w", newline="") as fh:
            if not self.rows:
                return
            w = csv.DictWriter(fh, fieldnames=list(self.rows[0].keys()))
            w.writeheader()
            w.writerows(self.rows)
