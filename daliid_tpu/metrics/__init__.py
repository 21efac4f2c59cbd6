from daliid_tpu.metrics.ranking import (
    evaluate_rank,
    evaluate_rank_jax,
    evaluate_rank_numpy,
    evaluate_rank_sharded,
    cosine_distance_matrix,
)

__all__ = [
    "evaluate_rank",
    "evaluate_rank_jax",
    "evaluate_rank_numpy",
    "evaluate_rank_sharded",
    "cosine_distance_matrix",
]
