from workoutdetector_tpu.ops.pallas.shift import temporal_shift_pallas

__all__ = ["temporal_shift_pallas"]
