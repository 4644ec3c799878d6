from workoutdetector_tpu.train.optim import (build_schedule, build_optimizer,
                                             label_params)
from workoutdetector_tpu.train.trainer import Trainer, TrainState, train, test

__all__ = [
    "build_schedule", "build_optimizer", "label_params", "Trainer", "TrainState",
    "train", "test"
]
