from daliid_tpu.models.factory import get_model, build_model_pair, MODEL_REGISTRY

__all__ = ["get_model", "build_model_pair", "MODEL_REGISTRY"]
