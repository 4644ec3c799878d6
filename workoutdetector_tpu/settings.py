"""Global settings, env-overridable.

Mirrors the reference's settings layer
(reference: workoutdetector/settings/global_settings.py:1-10) but adds
TPU-specific knobs.
"""

import os

PROJ_ROOT = os.environ.get("PROJ_ROOT", os.path.abspath(os.path.dirname(os.path.dirname(__file__))))
DATA_ROOT = os.environ.get("DATA_ROOT", os.path.join(PROJ_ROOT, "data"))
REPCOUNT_ANNO_PATH = os.environ.get(
    "REPCOUNT_ANNO_PATH", os.path.join(DATA_ROOT, "RepCount", "annotation.csv"))

# RepCount 6-action subset used by the binary state classifier
# (reference: workoutdetector/datasets/repcount_dataset.py:165-167).
REPCOUNT_ACTIONS = ["situp", "push_up", "pull_up", "jump_jack", "squat", "front_raise"]

# 11-class Workouts label set served by the demo app
# (reference: app/inference.py label list).
WORKOUT_LABELS = [
    "front_raise", "pull_up", "squat", "bench_pressing", "jumping_jack", "situp",
    "push_up", "battle_rope", "exercising_arm", "lunge", "mountain_climber"
]

# Path of the built native video decoder (see native/).
NATIVE_DECODER_LIB = os.environ.get(
    "WD_TPU_DECODER_LIB", os.path.join(PROJ_ROOT, "native", "libwdvideo.so"))

# Path of the built native rawframe JPEG decoder (see native/jpeg.cc);
# set WD_TPU_JPEG_LIB= (empty) to force the cv2 path.
NATIVE_JPEG_LIB = os.environ.get(
    "WD_TPU_JPEG_LIB", os.path.join(PROJ_ROOT, "native", "libwdjpeg.so"))
