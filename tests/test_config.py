"""Typed config system tests (replaces reference's fvcore CfgNode +
mmcv Config dual system; reference trainer.py:333-367)."""

import pytest

from workoutdetector_tpu.config import Config, load_config


def test_defaults():
    cfg = Config()
    assert cfg.model.num_segments == 8
    assert cfg.model.shift_div == 8
    assert cfg.optimizer.lr == 0.005
    assert cfg.lr_scheduler.policy == "steplr"
    assert cfg.seed == 0


def test_yaml_merge(tmp_path):
    p = tmp_path / "exp.yaml"
    p.write_text("""
model:
  num_class: 11
  base_model: resnet18
data:
  batch_size: 16
  train:
    anno: /tmp/train.txt
seed: 7
""")
    cfg = load_config(str(p))
    assert cfg.model.num_class == 11
    assert cfg.model.base_model == "resnet18"
    assert cfg.data.batch_size == 16
    assert cfg.data.train.anno == "/tmp/train.txt"
    assert cfg.seed == 7
    # untouched defaults survive
    assert cfg.model.num_segments == 8


def test_unknown_key_raises(tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text("model:\n  nonexistent_key: 5\n")
    with pytest.raises(KeyError):
        load_config(str(p))


def test_cli_opts():
    cfg = load_config(None, ["model.num_class=6", "optimizer.lr=0.1"])
    assert cfg.model.num_class == 6
    assert cfg.optimizer.lr == 0.1
    # fvcore-style alternating tokens also accepted
    cfg2 = load_config(None, ["model.num_class", "3"])
    assert cfg2.model.num_class == 3


def test_dump_roundtrip(tmp_path):
    cfg = Config()
    cfg.model.num_class = 5
    p = tmp_path / "dump.yaml"
    p.write_text(cfg.dump())
    cfg2 = load_config(str(p))
    assert cfg2.model.num_class == 5
    assert cfg2.to_dict() == cfg.to_dict()


def test_clone_independent():
    cfg = Config()
    c2 = cfg.clone()
    c2.model.num_class = 99
    assert cfg.model.num_class != 99


def test_all_shipped_configs_load_and_dispatch():
    """Every YAML under workoutdetector_tpu/configs/ must load through the
    typed schema and name a model type the factory knows (covers the
    reference's full experiment-config family, incl. the per-action
    pull_up.yaml / situp_mid.yaml ConvNeXt configs)."""
    import glob
    import os

    from workoutdetector_tpu import settings
    from workoutdetector_tpu.models.factory import build_model

    cfg_dir = os.path.join(os.path.dirname(settings.__file__), "configs")
    paths = sorted(glob.glob(os.path.join(cfg_dir, "*.yaml")))
    assert len(paths) >= 12
    for p in paths:
        cfg = load_config(p)
        model = build_model(cfg.model)  # raises on unknown type/backbone
        assert model is not None, p
