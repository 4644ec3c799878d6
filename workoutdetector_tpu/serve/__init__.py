from workoutdetector_tpu.serve.batcher import AsyncBatcher

__all__ = ["AsyncBatcher"]
