from daliid_tpu.utils.profiling import PhaseTimer, phase, trace_annotation, profile_to

__all__ = ["PhaseTimer", "phase", "trace_annotation", "profile_to"]
