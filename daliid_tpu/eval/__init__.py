from daliid_tpu.eval.features import extract_features, FeatureExtractor
from daliid_tpu.eval.validate import (
    Validator,
    BriarValidator,
    get_validator,
    msmt17_balanced_accuracy,
)
from daliid_tpu.eval.fusion import (
    concat_features_distmat,
    average_distmats,
    magnitude_weights,
    magnitude_weighted_distmat,
)

__all__ = [
    "extract_features",
    "FeatureExtractor",
    "Validator",
    "BriarValidator",
    "get_validator",
    "msmt17_balanced_accuracy",
    "concat_features_distmat",
    "average_distmats",
    "magnitude_weights",
    "magnitude_weighted_distmat",
]
