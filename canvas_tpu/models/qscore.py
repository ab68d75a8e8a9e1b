"""Segment quality-score models (CanvasCommon.net45/SegmentScoringModel.cs).

Four methods with logistic coefficients from QualityScoreParameters.json.
The predictors (SegmentScoringModel.cs:114-171) are plain functions of a
Segment's statistics; scoring is vectorizable but runs host-side over the
final (small) segment list.
"""

from __future__ import annotations

import math

import numpy as np

from canvas_tpu.config import DEFAULT_QSCORE_PARAMS
from canvas_tpu.models.segment_model import Segment
from canvas_tpu.ops import stats


def _round_away_from_zero(x: float) -> int:
    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


def predictor(seg: Segment, name: str) -> float:
    """QScorePredictor values (SegmentScoringModel.cs:114-171)."""
    if name == "BinCount":
        return float(seg.bin_count)
    if name == "LogBinCount":
        return math.log10(1 + seg.bin_count)
    if name == "BinCountAmpDistance":
        return math.log10(1 + seg.bin_count) if seg.copy_number >= 15 else 0.0
    if name == "BinMean":
        return seg.mean_count if seg.bin_count else 0.0
    if name == "BinCv":
        if seg.bin_count == 0 or seg.mean_count == 0:
            return 0.0
        return stats.coefficient_of_variation(seg.bin_counts)
    if name == "MafCount":
        return float(len(seg.baf_frequencies))
    if name == "MafMean":
        if len(seg.baf_frequencies) == 0:
            return 0.0
        return float(np.mean(seg.baf_frequencies))
    if name == "MafCv":
        f = seg.baf_frequencies
        if len(f) == 0 or np.mean(f) == 0:
            return 0.0
        return stats.coefficient_of_variation(f)
    if name == "LogMafCv":
        return math.log10(1 + predictor(seg, "MafCv"))
    if name == "ModelDistance":
        # high-CN attenuation (SegmentScoringModel.cs:151-153)
        return seg.model_distance / max(1.0, seg.copy_number - 4.0)
    if name == "RunnerUpModelDistance":
        return seg.runner_up_model_distance
    if name == "DistanceRatio":
        if seg.runner_up_model_distance == 0:
            return 0.0
        return seg.model_distance / seg.runner_up_model_distance
    if name == "CopyNumber":
        return float(seg.copy_number)
    if name == "MajorChromosomeCount":
        if seg.major_chromosome_count is None:
            return math.ceil(seg.copy_number / 2.0)
        return float(seg.major_chromosome_count)
    raise KeyError(name)


def compute_qscore(seg: Segment, method: str,
                   params: dict | None = None) -> int:
    """ComputeQScore (SegmentScoringModel.cs:20-91)."""
    p = params or DEFAULT_QSCORE_PARAMS
    if method == "LogisticGermline":
        score = p["logistic_germline_intercept"]
        score += predictor(seg, "LogBinCount") * p["logistic_germline_log_bin_count"]
        score += predictor(seg, "ModelDistance") * p["logistic_germline_model_distance"]
        score += predictor(seg, "DistanceRatio") * p["logistic_germline_distance_ratio"]
        score = math.exp(score)
        score = score / (score + 1)
        q = round(-10 * math.log10(1 - score))  # banker's rounding as C# Math.Round
        return max(2, min(40, int(q)))
    if method == "Logistic":
        score = p["logistic_intercept"]
        score += predictor(seg, "LogBinCount") * p["logistic_log_bin_count"]
        score += predictor(seg, "ModelDistance") * p["logistic_model_distance"]
        score += predictor(seg, "DistanceRatio") * p["logistic_distance_ratio"]
        score += predictor(seg, "BinCountAmpDistance")
        score = math.exp(score)
        score = score / (score + 1)
        q = round(-10 * math.log10(1 - score)) if score < 1 else 60
        return max(2, min(60, int(q)))
    if method == "BinCountLinearFit":
        if seg.bin_count >= 100:
            return 61
        v = -10 * math.log10(1 - 1 / (1 + math.exp(0.5532 - seg.bin_count * 0.147)))
        return _round_away_from_zero(v)
    if method == "GeneralizedLinearFit":
        fit = p["generalized_linear_fit_intercept"]
        fit += p["generalized_linear_fit_log_bin_count"] * predictor(seg, "LogBinCount")
        fit += p["generalized_linear_fit_model_distance"] * predictor(seg, "ModelDistance")
        fit += p["generalized_linear_fit_major_chromosome_count"] * predictor(
            seg, "MajorChromosomeCount")
        fit += p["generalized_linear_fit_maf_mean"] * predictor(seg, "MafMean")
        fit += p["generalized_linear_fit_log_maf_cv"] * predictor(seg, "LogMafCv")
        fit += predictor(seg, "BinCountAmpDistance")
        score = -11.9 - 11.4 * fit
        score = max(2.0, min(61.0, score))
        return _round_away_from_zero(score)
    raise ValueError(f"Unhandled qscore method {method}")


def assign_quality_scores(segments: list[Segment], method: str,
                          params: dict | None = None) -> None:
    """AssignQualityScores (CanvasSegment.cs:515)."""
    for seg in segments:
        seg.qscore = compute_qscore(seg, method, params)
