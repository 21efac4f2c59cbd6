from daliid_tpu.augment.preprocess import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    normalize_images,
    decode_resize,
)
from daliid_tpu.augment.train_augment import train_augment_batch

__all__ = [
    "IMAGENET_MEAN",
    "IMAGENET_STD",
    "normalize_images",
    "decode_resize",
    "train_augment_batch",
]
