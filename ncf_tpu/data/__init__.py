from ncf_tpu.data.interactions import Interactions, SECONDS_PER_DAY
from ncf_tpu.data.pipeline import (BatchIterator, group_batches,
                                   prefetch_to_device)
from ncf_tpu.data.sampler import (
    padded_histories,
    sample_eval_negatives,
    sample_negatives,
)
from ncf_tpu.data.synthetic import generate_interactions, temporal_features

__all__ = [
    "Interactions",
    "SECONDS_PER_DAY",
    "BatchIterator",
    "prefetch_to_device",
    "group_batches",
    "sample_negatives",
    "sample_eval_negatives",
    "padded_histories",
    "generate_interactions",
    "temporal_features",
]
