from .scoring import (
    compute_vqacp_scores,
    compute_vqavs_scores,
    score_prediction_file,
    VQAVS_SPLITS,
)

__all__ = [
    "compute_vqacp_scores", "compute_vqavs_scores",
    "score_prediction_file", "VQAVS_SPLITS",
]
