"""ViT image-backbone path (VERDICT r3 #7): factory dispatch of timm
vit_* names onto the TimeSformer space_only encoder at T=1, timm-layout
checkpoint port, torch logits parity, and DebugDataset convergence —
the reference train_img.py:28-45 accepts any timm model name; this
makes the image path a three-family zoo (ResNet/ConvNeXt/ViT)."""

import numpy as np
import pytest

from workoutdetector_tpu.config import Config
from workoutdetector_tpu.models.convert import port_vit_checkpoint
from workoutdetector_tpu.models.timesformer import (VIT_VARIANTS,
                                                    vit_patch_size)

SIZE = 32
MICRO = "vit_micro_patch8_224"  # injected test variant (64, 2, 2)


@pytest.fixture()
def micro_variant(monkeypatch):
    monkeypatch.setitem(VIT_VARIANTS, MICRO, (64, 2, 2))


def _build(num_class, micro=True):
    from workoutdetector_tpu.models.factory import build_model
    cfg = Config().model
    cfg.model_type = "image"
    cfg.base_model = MICRO if micro else "vit_tiny_patch16_224"
    cfg.num_class = num_class
    cfg.dtype = "float32"  # parity gates compare at full precision
    return build_model(cfg)


def test_vit_patch_size_parse():
    assert vit_patch_size("vit_base_patch16_224") == 16
    assert vit_patch_size("vit_base_patch32_224") == 32
    assert vit_patch_size("vit_unknown") == 16


def test_factory_dispatches_vit(micro_variant):
    import jax
    import jax.numpy as jnp
    model = _build(3)
    v = model.init({"params": jax.random.PRNGKey(0)},
                   jnp.zeros((1, SIZE, SIZE, 3)), train=False)
    out = model.apply(v, jnp.zeros((2, SIZE, SIZE, 3)), train=False)
    assert out.shape == (2, 3)
    # the dataset-pipeline single-frame clip shape squeezes through too
    out5 = model.apply(v, jnp.zeros((2, 1, SIZE, SIZE, 3)), train=False)
    assert out5.shape == (2, 3)
    assert "backbone_img" in v["params"]
    # the reference's full-size names resolve (no init — just dispatch)
    for name in ("vit_tiny_patch16_224", "vit_base_patch16_224",
                 "vit_large_patch16_224"):
        cfg = Config().model
        cfg.model_type = "image"
        cfg.base_model = name
        from workoutdetector_tpu.models.factory import build_model
        build_model(cfg)


def test_vit_torch_parity(micro_variant):
    """timm-layout torch ViT checkpoint → port_vit_checkpoint → flax
    logits ≤ 1e-4 (eval mode, same math: pre-LN, packed qkv, exact
    GELU)."""
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp

    from workoutdetector_tpu.scripts.torch_vit import TorchViT

    torch.manual_seed(0)
    tmodel = TorchViT(image_size=SIZE, patch=8, dim=64, depth=2, heads=2,
                      num_classes=7).eval()
    fmodel = _build(7)
    init = fmodel.init({"params": jax.random.PRNGKey(0)},
                       jnp.zeros((1, SIZE, SIZE, 3)), train=False)
    tree = port_vit_checkpoint(tmodel.state_dict(), num_class=7,
                               target_params=init["params"])
    x = np.random.default_rng(1).standard_normal(
        (2, SIZE, SIZE, 3)).astype(np.float32)
    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(
            np.transpose(x, (0, 3, 1, 2)).copy())).numpy()
    f_out = np.asarray(fmodel.apply({"params": tree["params"]}, x,
                                    train=False))
    np.testing.assert_allclose(f_out, t_out, atol=1e-4, rtol=1e-4)


def test_vit_port_complete_coverage(micro_variant):
    """Every flax param leaf is overwritten by the port (no silently
    initialized leaf surviving), and a 1000-class head is dropped."""
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp
    from flax import traverse_util

    from workoutdetector_tpu.scripts.torch_vit import TorchViT

    tmodel = TorchViT(image_size=SIZE, patch=8, dim=64, depth=2, heads=2,
                      num_classes=7)
    fmodel = _build(7)
    init = fmodel.init({"params": jax.random.PRNGKey(0)},
                       jnp.zeros((1, SIZE, SIZE, 3)), train=False)
    tree = port_vit_checkpoint(tmodel.state_dict(), num_class=7)
    want = set(traverse_util.flatten_dict(init["params"]).keys())
    got = set(traverse_util.flatten_dict(tree["params"]).keys())
    assert want == got, f"missing: {want - got}, extra: {got - want}"

    tmodel_1k = TorchViT(image_size=SIZE, patch=8, dim=64, depth=2,
                         heads=2, num_classes=1000)
    tree = port_vit_checkpoint(tmodel_1k.state_dict(), num_class=7)
    assert "fc" not in tree["params"]["backbone_img"]


def test_vit_converges_on_debug_dataset(tmp_path, micro_variant):
    """train_img-equivalent for the ViT branch: trains end-to-end
    through the canonical trainer on DebugDataset."""
    from workoutdetector_tpu.train.trainer import train

    cfg = Config()
    cfg.model.model_type = "image"
    cfg.model.base_model = MICRO
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
    cfg.optimizer.use_tsn_policies = False
    cfg.trainer.max_epochs = 6
    cfg.trainer.default_root_dir = str(tmp_path)
    cfg.trainer.enable_checkpointing = False
    cfg.trainer.log_every_n_steps = 100
    cfg.callbacks.early_stopping.enable = False
    history = train(cfg)
    assert history["test/acc"] > 0.5, history
