"""End-to-end trainer integration for the non-flagship model paths:
TDNDataset→TDN and ImageDataset→ImageClassifier, over synthetic files
(the full stack: list parsing → decode → transform → loader → sharded
step)."""

import os.path as osp

import numpy as np
import pytest

from workoutdetector_tpu.config import Config
from workoutdetector_tpu.train.trainer import Trainer, train

SMALL = 32


@pytest.fixture(scope="module")
def media_root(tmp_path_factory):
    import cv2
    root = tmp_path_factory.mktemp("media")
    # rawframes for TDN
    frames = root / "rawframes"
    for vi in range(8):
        d = frames / f"v{vi}"
        d.mkdir(parents=True)
        for i in range(1, 31):
            cv2.imwrite(str(d / f"img_{i:05}.jpg"),
                        np.full((40, 48, 3), (vi * 60 + i) % 255, np.uint8))
    for split in ("train", "val"):
        with open(root / f"{split}.txt", "w") as f:
            f.writelines(f"v{k} 1 30 {k % 2}\n" for k in range(8))
    # images for the image path
    imgs = root / "imgs"
    imgs.mkdir()
    lines = []
    for i in range(8):
        import cv2 as _cv2
        _cv2.imwrite(str(imgs / f"im{i}.jpg"),
                     np.full((40, 48, 3), 40 + 20 * (i % 2), np.uint8))
        lines.append(f"im{i}.jpg {i % 2}\n")
    for split in ("train_img", "val_img"):
        with open(root / f"{split}.txt", "w") as f:
            f.writelines(lines)
    return str(root)


def test_tdn_training_path(media_root):
    cfg = Config()
    cfg.model.model_type = "tdn"
    cfg.model.num_class = 2
    cfg.model.num_segments = 2
    cfg.model.num_frames = 5
    cfg.model.dropout = 0.0
    cfg.model.dtype = "float32"
    cfg.data.dataset_type = "TDNDataset"
    cfg.data.data_root = media_root
    cfg.data.train.data_prefix = "rawframes"
    cfg.data.val.data_prefix = "rawframes"
    cfg.data.num_segments = 2
    cfg.data.num_frames = 5
    cfg.data.batch_size = 8
    cfg.data.num_workers = 2
    cfg.data.image_size = SMALL
    cfg.data.train.anno = osp.join(media_root, "train.txt")
    cfg.data.val.anno = osp.join(media_root, "val.txt")
    cfg.trainer.default_root_dir = osp.join(media_root, "exp_tdn")
    cfg.trainer.fast_dev_run = True
    cfg.log.tensorboard_enable = False
    history = train(cfg)
    assert "best_val_acc" in history


def test_image_training_path(media_root):
    cfg = Config()
    cfg.model.model_type = "image"
    cfg.model.base_model = "resnet18"
    cfg.model.num_class = 2
    cfg.model.dropout = 0.0
    cfg.model.dtype = "float32"
    cfg.model.partial_bn = False
    cfg.optimizer.use_tsn_policies = False
    cfg.optimizer.method = "adamw"
    cfg.data.dataset_type = "ImageDataset"
    cfg.data.data_root = media_root
    cfg.data.batch_size = 8
    cfg.data.num_workers = 2
    cfg.data.image_size = SMALL
    cfg.data.train.anno = osp.join(media_root, "train_img.txt")
    cfg.data.train.data_prefix = "imgs"
    cfg.data.val.anno = osp.join(media_root, "val_img.txt")
    cfg.data.val.data_prefix = "imgs"
    cfg.trainer.default_root_dir = osp.join(media_root, "exp_img")
    cfg.trainer.fast_dev_run = True
    cfg.log.tensorboard_enable = False
    history = train(cfg)
    assert "best_val_acc" in history
