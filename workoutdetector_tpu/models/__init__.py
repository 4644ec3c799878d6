from workoutdetector_tpu.models.resnet import ResNet, resnet18, resnet50, resnet101
from workoutdetector_tpu.models.tsm import TSM
from workoutdetector_tpu.models.tdn import TDN
from workoutdetector_tpu.models.timesformer import TimeSformer
from workoutdetector_tpu.models.tpn import TPN
from workoutdetector_tpu.models.repnet import RepNet
from workoutdetector_tpu.models.factory import build_model, create_model_state

__all__ = [
    "ResNet", "resnet18", "resnet50", "resnet101", "TSM", "TDN",
    "TimeSformer", "TPN", "RepNet", "build_model", "create_model_state"
]
