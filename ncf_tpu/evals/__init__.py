from ncf_tpu.evals.evaluate import EvalSet, evaluate, make_score_fn
from ncf_tpu.evals.metrics import (
    accuracy_stats,
    auc,
    calculate_metrics,
    hit_rate_at_k,
    map_at_k,
    mrr_at_k,
    ndcg_at_k,
    positive_ranks,
    rank_metrics,
)

__all__ = [
    "EvalSet",
    "evaluate",
    "make_score_fn",
    "rank_metrics",
    "calculate_metrics",
    "positive_ranks",
    "hit_rate_at_k",
    "ndcg_at_k",
    "mrr_at_k",
    "map_at_k",
    "auc",
    "accuracy_stats",
]
