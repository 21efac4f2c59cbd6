from daliid_tpu.models.factory import (
    MODEL_REGISTRY,
    build_ensembles,
    build_model_pair,
    get_model,
)

__all__ = ["get_model", "build_model_pair", "build_ensembles", "MODEL_REGISTRY"]
