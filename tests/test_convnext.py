"""ConvNeXt image path (VERDICT r1 item #7): flax model, timm-layout
checkpoint port, torch logits parity, factory dispatch, and DebugDataset
convergence through the trainer (reference train_img.py equivalent)."""

import numpy as np
import pytest

from workoutdetector_tpu.config import Config
from workoutdetector_tpu.models.convnext import (CONVNEXT_VARIANTS, ConvNeXt,
                                                 make_convnext)
from workoutdetector_tpu.models.convert import port_convnext_checkpoint

SIZE = 32
TINY = dict(depths=(1, 1, 2, 1), dims=(16, 32, 64, 128))


def test_convnext_forward_shape():
    import jax
    import jax.numpy as jnp
    model = ConvNeXt(num_classes=5, **TINY)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, SIZE, SIZE, 3)))
    out = model.apply(v, jnp.zeros((2, SIZE, SIZE, 3)))
    assert out.shape == (2, 5)
    feat = model.apply(v, jnp.zeros((2, SIZE, SIZE, 3)), spatial=True)
    assert feat.shape == (2, SIZE // 32, SIZE // 32, 128)


def test_convnext_torch_parity():
    """timm-layout torch checkpoint → port → flax logits ≤ 1e-4."""
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp

    from workoutdetector_tpu.scripts.torch_convnext import TorchConvNeXt

    torch.manual_seed(0)
    tmodel = TorchConvNeXt(num_classes=7, **TINY).eval()
    # non-trivial gammas so the layer-scale mapping is exercised
    with torch.no_grad():
        for m in tmodel.modules():
            if hasattr(m, "gamma") and isinstance(m.gamma, torch.nn.Parameter):
                m.gamma.uniform_(0.5, 1.5)

    fmodel = ConvNeXt(num_classes=7, **TINY)
    init = fmodel.init(jax.random.PRNGKey(0), jnp.zeros((1, SIZE, SIZE, 3)))
    tree = port_convnext_checkpoint(tmodel.state_dict(), num_class=7,
                                    target_params=init["params"])
    x = np.random.default_rng(1).standard_normal(
        (2, SIZE, SIZE, 3)).astype(np.float32)
    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(
            np.transpose(x, (0, 3, 1, 2)).copy())).numpy()
    f_out = np.asarray(fmodel.apply({"params": tree["params"]}, x))
    np.testing.assert_allclose(f_out, t_out, atol=1e-4, rtol=1e-4)


def test_port_complete_coverage():
    """Every flax param leaf must be overwritten by the port (no silently
    initialized leaf surviving)."""
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp
    from flax import traverse_util

    from workoutdetector_tpu.scripts.torch_convnext import TorchConvNeXt

    tmodel = TorchConvNeXt(num_classes=7, **TINY)
    fmodel = ConvNeXt(num_classes=7, **TINY)
    init = fmodel.init(jax.random.PRNGKey(0), jnp.zeros((1, SIZE, SIZE, 3)))
    tree = port_convnext_checkpoint(tmodel.state_dict(), num_class=7)
    want = set(traverse_util.flatten_dict(init["params"]).keys())
    got = set(traverse_util.flatten_dict(tree["params"]).keys())
    assert want == got, f"missing: {want - got}, extra: {got - want}"


def test_port_drops_mismatched_head():
    torch = pytest.importorskip("torch")
    from workoutdetector_tpu.scripts.torch_convnext import TorchConvNeXt
    tmodel = TorchConvNeXt(num_classes=1000, **TINY)
    tree = port_convnext_checkpoint(tmodel.state_dict(), num_class=7)
    assert "head" not in tree["params"]
    assert "head_norm" in tree["params"]


def test_factory_dispatches_convnext():
    import jax
    import jax.numpy as jnp

    from workoutdetector_tpu.models.factory import build_model

    cfg = Config().model
    cfg.model_type = "image"
    cfg.base_model = "convnext_atto"
    cfg.num_class = 3
    model = build_model(cfg)
    v = model.init({"params": jax.random.PRNGKey(0)},
                   jnp.zeros((1, SIZE, SIZE, 3)), train=False)
    out = model.apply(v, jnp.zeros((2, 1, SIZE, SIZE, 3)), train=False)
    assert out.shape == (2, 3)
    assert "backbone_img" in v["params"]
    assert "convnext_base" in CONVNEXT_VARIANTS  # the reference default


def test_convnext_converges_on_debug_dataset(tmp_path):
    """train_img-equivalent: image model trains end-to-end through the
    trainer on DebugDataset (reference tests/test_models.py convergence
    gate analog)."""
    from workoutdetector_tpu.train.trainer import train

    cfg = Config()
    cfg.model.model_type = "image"
    cfg.model.base_model = "convnext_atto"
    cfg.model.num_class = 2
    cfg.model.dtype = "float32"
    cfg.model.dropout = 0.0
    cfg.data.dataset_type = "DebugDataset"
    cfg.data.debug_num_class = 2
    cfg.data.debug_size = 16
    cfg.data.image_size = SIZE
    cfg.data.num_segments = 1
    cfg.data.batch_size = 8
    cfg.data.num_workers = 0
    cfg.optimizer.optimizer = "adamw"
    cfg.optimizer.lr = 2e-3
    cfg.trainer.max_epochs = 6
    cfg.trainer.default_root_dir = str(tmp_path)
    cfg.trainer.enable_checkpointing = False
    cfg.trainer.log_every_n_steps = 100
    cfg.callbacks.early_stopping.enable = False
    history = train(cfg)
    assert history["test/acc"] > 0.5, history


def test_convnext_export_roundtrip(tmp_path):
    """The .jaxm export path (ONNX replacement) covers the new image
    family too: export → load → identical logits."""
    import jax
    import jax.numpy as jnp

    from workoutdetector_tpu.utils.export import export_model, load_exported

    model = ConvNeXt(num_classes=4, **TINY)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, SIZE, SIZE, 3)))
    path = export_model(model, v, str(tmp_path / "cx"),
                        input_shape=(2, SIZE, SIZE, 3))
    loaded = load_exported(path)
    x = np.random.default_rng(0).integers(0, 256, (2, SIZE, SIZE, 3),
                                          dtype=np.uint8)
    from workoutdetector_tpu.ops.preprocess import normalize_clip
    want = model.apply(v, normalize_clip(jnp.asarray(x)))
    got = loaded(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
