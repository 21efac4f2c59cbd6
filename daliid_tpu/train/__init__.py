from daliid_tpu.train.sampler import PKBatchSampler, PKBatch
from daliid_tpu.train.proxies import select_proxies_farthest_point, mine_proxies_and_centers
from daliid_tpu.train.trainer import Trainer, TrainState, make_optimizer, lr_schedule_values

__all__ = [
    "PKBatchSampler",
    "PKBatch",
    "select_proxies_farthest_point",
    "mine_proxies_and_centers",
    "Trainer",
    "TrainState",
    "make_optimizer",
    "lr_schedule_values",
]
