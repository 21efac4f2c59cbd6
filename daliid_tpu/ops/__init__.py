from daliid_tpu.ops.flash_attention import flash_attention
from daliid_tpu.ops.quantize import calibrate, quantized_apply

__all__ = ["flash_attention", "calibrate", "quantized_apply"]
