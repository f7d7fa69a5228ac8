"""IoU-threshold matching (reference ``detectron2/modeling/matcher.py:8``).

Assigns each predicted element (anchor/proposal) the best ground-truth by
match-quality matrix, bucketed by thresholds into labels, with the
``allow_low_quality_matches`` rescue that keeps, for every gt, its
highest-IoU anchor(s).  Pure jnp over fixed shapes: gt slots are masked by
``gt_valid`` instead of varying in number.
"""

from typing import List, Sequence, Tuple

import jax.numpy as jnp

__all__ = ["Matcher"]


class Matcher:
    def __init__(
        self,
        thresholds: Sequence[float],
        labels: Sequence[int],
        allow_low_quality_matches: bool = False,
    ) -> None:
        thresholds = list(thresholds)
        assert thresholds[0] > 0
        thresholds.insert(0, -float("inf"))
        thresholds.append(float("inf"))
        assert all(low <= high for low, high in zip(thresholds[:-1], thresholds[1:]))
        assert all(l in [-1, 0, 1] for l in labels)
        assert len(labels) == len(thresholds) - 1
        self.thresholds = thresholds
        self.labels = list(labels)
        self.allow_low_quality_matches = allow_low_quality_matches

    def __call__(
        self, match_quality_matrix: jnp.ndarray, gt_valid: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """matrix (M_gt, N_pred) IoUs, gt_valid (M_gt,) bool.

        Returns (matches (N,) int32 gt index, match_labels (N,) int8 in
        {-1, 0, 1}).  Invalid gt slots never match (their rows are -inf).
        """
        q = jnp.where(gt_valid[:, None], match_quality_matrix, -jnp.inf)
        matched_vals = jnp.max(q, axis=0)
        matches = jnp.argmax(q, axis=0).astype(jnp.int32)
        # no valid gt at all -> label 0 everywhere (reference :85-87 special
        # case of an empty gt set)
        any_gt = jnp.any(gt_valid)

        match_labels = jnp.full(matches.shape, self.labels[0], jnp.int8)
        for label, low, high in zip(self.labels, self.thresholds[:-1], self.thresholds[1:]):
            in_band = (matched_vals >= low) & (matched_vals < high)
            match_labels = jnp.where(in_band, jnp.int8(label), match_labels)

        if self.allow_low_quality_matches:
            # for each gt, anchors achieving its best IoU become positives
            # (reference set_low_quality_matches_, :105-127)
            highest_per_gt = jnp.max(q, axis=1, keepdims=True)  # (M, 1)
            is_best = (q == highest_per_gt) & gt_valid[:, None] & (highest_per_gt > 0)
            rescue = jnp.any(is_best, axis=0)
            match_labels = jnp.where(rescue, jnp.int8(1), match_labels)

        match_labels = jnp.where(any_gt, match_labels, jnp.zeros_like(match_labels))
        return matches, match_labels
