"""TimeSformer: shapes, torch parity, checkpoint port, trainer integration.

The reference trains TimeSformer through its mmaction config
(workoutdetector/configs/timesformer_div_8x4x1_k400.py). The parity oracle
here is HuggingFace ``TimesformerForVideoClassification`` — a faithful
torch port of the same facebookresearch implementation mmaction wraps —
so logits agreement gates the whole divided space-time math (temporal
attention + zero-init projection, per-frame spatial attention with cls
replication/averaging, pre-LN MLP). The mmaction checkpoint layout is
exercised by renaming the HF state dict into mmaction keys and porting
through the same tool.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from workoutdetector_tpu.config import Config
from workoutdetector_tpu.models.timesformer import TimeSformer
from workoutdetector_tpu.models.convert import port_timesformer_checkpoint

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
from transformers import TimesformerConfig, TimesformerForVideoClassification

B, T, SIZE, PATCH, DIM, LAYERS, HEADS, NCLS = 2, 4, 32, 8, 64, 2, 4, 5


def _hf_model(attention_type: str, seed: int = 0):
    cfg = TimesformerConfig(image_size=SIZE, patch_size=PATCH, num_frames=T,
                            hidden_size=DIM, num_hidden_layers=LAYERS,
                            num_attention_heads=HEADS, intermediate_size=4 * DIM,
                            num_labels=NCLS, attention_type=attention_type,
                            hidden_dropout_prob=0.0,
                            attention_probs_dropout_prob=0.0)
    torch.manual_seed(seed)
    return TimesformerForVideoClassification(cfg).eval()


def _flax_model(attention_type: str) -> TimeSformer:
    return TimeSformer(num_class=NCLS, num_segments=T, image_size=SIZE,
                       patch_size=PATCH, embed_dims=DIM, num_layers=LAYERS,
                       num_heads=HEADS, attention_type=attention_type,
                       dtype=jnp.float32)


def _ported_pair(attention_type: str, seed: int = 0):
    tmodel = _hf_model(attention_type, seed)
    fmodel = _flax_model(attention_type)
    x0 = jnp.zeros((1, T, SIZE, SIZE, 3), jnp.float32)
    init = fmodel.init({"params": jax.random.PRNGKey(0)}, x0, train=False)
    tree = port_timesformer_checkpoint(tmodel.state_dict(), num_class=NCLS,
                                       target_params=init["params"])
    return tmodel, fmodel, {"params": tree["params"]}


def _inputs(seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.normal(size=(B, T, SIZE, SIZE, 3)).astype(np.float32)


def _torch_logits(tmodel, x: np.ndarray) -> np.ndarray:
    with torch.no_grad():
        return tmodel(torch.from_numpy(
            np.transpose(x, (0, 1, 4, 2, 3)).copy())).logits.numpy()


def test_forward_shape_fp32_logits():
    model = TimeSformer(num_class=NCLS, num_segments=T, image_size=SIZE,
                        patch_size=PATCH, embed_dims=DIM, num_layers=1,
                        num_heads=HEADS, dtype=jnp.bfloat16)
    x = jnp.ones((B, T, SIZE, SIZE, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (B, NCLS)
    assert out.dtype == jnp.float32


@pytest.mark.parametrize("attention_type", ["joint_space_time", "space_only"])
def test_alt_attention_shapes(attention_type):
    model = _flax_model(attention_type)
    x = jnp.ones((B, T, SIZE, SIZE, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    assert model.apply(variables, x, train=False).shape == (B, NCLS)
    if attention_type == "space_only":
        assert "time_embed" not in variables["params"]


@pytest.mark.parametrize("attention_type",
                         ["divided_space_time", "joint_space_time"])
def test_logits_parity_vs_hf(attention_type):
    tmodel, fmodel, variables = _ported_pair(attention_type)
    x = _inputs()
    t_out = _torch_logits(tmodel, x)
    f_out = np.asarray(fmodel.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(f_out, t_out, atol=1e-4, rtol=1e-4)


def _to_mmaction_layout(hf_sd):
    """Rename an HF TimeSformer state dict into the mmaction key layout the
    reference's pretrained checkpoint uses."""
    out = {}
    for k, v in hf_sd.items():
        k = k.replace("timesformer.embeddings.cls_token", "backbone.cls_token")
        k = k.replace("timesformer.embeddings.position_embeddings",
                      "backbone.pos_embed")
        k = k.replace("timesformer.embeddings.time_embeddings",
                      "backbone.time_embed")
        k = k.replace("timesformer.embeddings.patch_embeddings.projection",
                      "backbone.patch_embed.projection")
        k = k.replace("timesformer.layernorm.", "backbone.norm.")
        k = k.replace("classifier.", "cls_head.fc_cls.")
        if k.startswith("timesformer.encoder.layer."):
            i, rest = k[len("timesformer.encoder.layer."):].split(".", 1)
            rest = rest.replace("temporal_layernorm", "attentions.0.norm")
            rest = rest.replace("temporal_attention.attention.qkv.weight",
                                "attentions.0.attn.in_proj_weight")
            rest = rest.replace("temporal_attention.attention.qkv.bias",
                                "attentions.0.attn.in_proj_bias")
            rest = rest.replace("temporal_attention.output.dense",
                                "attentions.0.attn.out_proj")
            rest = rest.replace("temporal_dense", "attentions.0.temporal_fc")
            rest = rest.replace("layernorm_before", "attentions.1.norm")
            rest = rest.replace("attention.attention.qkv.weight",
                                "attentions.1.attn.in_proj_weight")
            rest = rest.replace("attention.attention.qkv.bias",
                                "attentions.1.attn.in_proj_bias")
            rest = rest.replace("attention.output.dense",
                                "attentions.1.attn.out_proj")
            rest = rest.replace("layernorm_after", "ffns.0.norm")
            rest = rest.replace("intermediate.dense", "ffns.0.layers.0.0")
            rest = rest.replace("output.dense", "ffns.0.layers.1")
            k = f"backbone.transformer_layers.layers.{i}.{rest}"
        out[k] = v
    return out


def test_mmaction_layout_port_matches():
    tmodel, fmodel, _ = _ported_pair("divided_space_time")
    x0 = jnp.zeros((1, T, SIZE, SIZE, 3), jnp.float32)
    init = fmodel.init({"params": jax.random.PRNGKey(0)}, x0, train=False)
    mm_sd = _to_mmaction_layout(tmodel.state_dict())
    assert any(k.startswith("backbone.transformer_layers") for k in mm_sd)
    tree = port_timesformer_checkpoint(mm_sd, num_class=NCLS,
                                       target_params=init["params"])
    x = _inputs(1)
    t_out = _torch_logits(tmodel, x)
    f_out = np.asarray(fmodel.apply({"params": tree["params"]},
                                    jnp.asarray(x), train=False))
    np.testing.assert_allclose(f_out, t_out, atol=1e-4, rtol=1e-4)


def test_port_drops_mismatched_head():
    tmodel = _hf_model("divided_space_time")
    fmodel = TimeSformer(num_class=NCLS + 3, num_segments=T, image_size=SIZE,
                         patch_size=PATCH, embed_dims=DIM, num_layers=LAYERS,
                         num_heads=HEADS, dtype=jnp.float32)
    x0 = jnp.zeros((1, T, SIZE, SIZE, 3), jnp.float32)
    init = fmodel.init({"params": jax.random.PRNGKey(3)}, x0, train=False)
    tree = port_timesformer_checkpoint(tmodel.state_dict(),
                                       num_class=NCLS + 3,
                                       target_params=init["params"])
    # head keeps its fresh init (strict=False analog)
    np.testing.assert_array_equal(np.asarray(tree["params"]["fc"]["kernel"]),
                                  np.asarray(init["params"]["fc"]["kernel"]))
    # backbone was ported
    np.testing.assert_allclose(
        np.asarray(tree["params"]["cls_token"]),
        tmodel.state_dict()["timesformer.embeddings.cls_token"].numpy())


def test_gradient_parity():
    """Full-backward agreement on a CE loss — catches transposed-kernel
    gradients and wrong residual wiring that forward parity can mask."""
    tmodel, fmodel, variables = _ported_pair("divided_space_time")
    x = _inputs(2)
    y = np.array([1, 3])

    tx = torch.from_numpy(np.transpose(x, (0, 1, 4, 2, 3)).copy())
    tmodel.zero_grad()
    out = tmodel(tx, labels=torch.from_numpy(y))
    out.loss.backward()
    t_grads = {k: p.grad.numpy() for k, p in tmodel.named_parameters()
               if p.grad is not None}

    def loss_fn(params):
        logits = fmodel.apply({"params": params}, jnp.asarray(x), train=False)
        logp = jax.nn.log_softmax(logits)
        return -jnp.mean(logp[jnp.arange(len(y)), jnp.asarray(y)])

    grads = jax.grad(loss_fn)(variables["params"])
    pairs = [
        (t_grads["timesformer.embeddings.cls_token"],
         np.asarray(grads["cls_token"])),
        (np.transpose(
            t_grads["timesformer.embeddings.patch_embeddings.projection.weight"],
            (2, 3, 1, 0)),
         np.asarray(grads["patch_embed"]["kernel"])),
        (t_grads["timesformer.encoder.layer.0.temporal_attention.attention.qkv.weight"].T,
         np.asarray(grads["block_0"]["t_attn"]["qkv"]["kernel"])),
        (t_grads["timesformer.encoder.layer.1.intermediate.dense.weight"].T,
         np.asarray(grads["block_1"]["mlp"]["fc1"]["kernel"])),
        (t_grads["classifier.weight"].T, np.asarray(grads["fc"]["kernel"])),
    ]
    for t_g, f_g in pairs:
        np.testing.assert_allclose(f_g, t_g, atol=1e-5, rtol=1e-4)


def test_no_decay_embeds_and_grad_clip():
    """The reference exempts cls/pos/time embeds from weight decay and
    clips grads at global-norm 40 (timesformer config :96-102). With zero
    grads + weight decay, decayed params move and embeds don't."""
    from workoutdetector_tpu.train.optim import build_optimizer

    cfg = Config()
    cfg.optimizer.use_tsn_policies = False
    cfg.optimizer.weight_decay = 0.1
    cfg.optimizer.momentum = 0.0
    cfg.optimizer.nesterov = True
    cfg.optimizer.grad_clip = 40.0
    params = {"cls_token": jnp.ones((1, 1, 4)),
              "pos_embed": jnp.ones((1, 5, 4)),
              "time_embed": jnp.ones((1, 2, 4)),
              "fc": {"kernel": jnp.ones((4, 2))}}
    tx, _ = build_optimizer(cfg.optimizer, cfg.lr_scheduler, params,
                            steps_per_epoch=1, max_epochs=1)
    grads = jax.tree_util.tree_map(jnp.zeros_like, params)
    updates, _ = tx.update(grads, tx.init(params), params)
    assert float(jnp.abs(updates["cls_token"]).max()) == 0.0
    assert float(jnp.abs(updates["time_embed"]).max()) == 0.0
    assert float(jnp.abs(updates["fc"]["kernel"]).max()) > 0.0


def test_factory_dispatch_and_trainer_step(tmp_path):
    """model_type=timesformer flows through the factory and the sharded
    trainer on the 8-device mesh (DebugDataset-style uint8 clips)."""
    from workoutdetector_tpu.parallel.mesh import shard_batch
    from workoutdetector_tpu.train.trainer import Trainer

    cfg = Config()
    cfg.model.model_type = "timesformer"
    cfg.model.base_model = "tiny"  # not a ViT variant → explicit dims
    cfg.model.num_class = 2
    cfg.model.num_segments = 4
    cfg.model.image_size = 16
    cfg.model.patch_size = 8
    cfg.model.embed_dims = 32
    cfg.model.num_layers = 1
    cfg.model.num_heads = 2
    cfg.model.dropout = 0.0
    cfg.model.dtype = "float32"
    cfg.optimizer.use_tsn_policies = False
    cfg.optimizer.nesterov = True
    cfg.optimizer.grad_clip = 40.0
    cfg.optimizer.lr = 0.02
    cfg.data.batch_size = 8
    cfg.trainer.default_root_dir = str(tmp_path / "exp")

    trainer = Trainer(cfg)
    state = trainer.init_state(steps_per_epoch=2, image_size=16)
    step = trainer.train_step_fn()
    rng = np.random.default_rng(0)
    x = rng.integers(0, 256, size=(8, 4, 16, 16, 3), dtype=np.uint8)
    y = (x.reshape(8, -1).mean(1) > 127).astype(np.int32)
    bx, by = shard_batch((x, y), trainer.mesh)
    losses = []
    for _ in range(6):
        state, m = step(state, bx, by)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_fold_temporal_fc_exact_and_barrier_neutral():
    """fold_timesformer_tfc merges t_fc into t_attn.proj exactly (fp32),
    and the block_barrier fusion-break knob never changes values."""
    from workoutdetector_tpu.models.timesformer import fold_for_inference

    fmodel = _flax_model("divided_space_time")
    x = jnp.asarray(_inputs(3))
    v = fmodel.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    # t_fc kernels are zero-init — randomize them so the fold is load-bearing
    params = {k: (dict(b) if isinstance(b, dict) else b)
              for k, b in v["params"].items()}
    for k, blk in params.items():
        if k.startswith("block_"):
            rng = jax.random.PRNGKey(abs(hash(k)) % (2 ** 31))
            blk["t_fc"] = {
                "kernel": 0.1 * jax.random.normal(
                    rng, blk["t_fc"]["kernel"].shape),
                "bias": jnp.full_like(blk["t_fc"]["bias"], 0.05)}
    v = {"params": params}
    base = fmodel.apply(v, x, train=False)

    folded_model, folded_v = fold_for_inference(fmodel, v)
    assert folded_model.fold_temporal_fc
    assert "t_fc" not in folded_v["params"]["block_0"]
    np.testing.assert_allclose(folded_model.apply(folded_v, x, train=False),
                               base, atol=1e-5, rtol=1e-5)
    # folding twice is a no-op
    again_model, again_v = fold_for_inference(folded_model, folded_v)
    assert again_model is folded_model and again_v is folded_v

    bar = fmodel.clone(block_barrier=True).apply(v, x, train=False)
    np.testing.assert_allclose(bar, base, atol=0, rtol=0)


def test_flash_attention_flag_gating():
    """cfg.model.flash_attention: 'auto' resolves OFF (measured exactly
    neutral on v5e — the 197→256 block pad offsets the saved attention
    materialization, docs/PERF.md; and the kernel doesn't lower on CPU),
    explicit values win; the flag adds no parameters so checkpoints stay
    interchangeable."""
    from workoutdetector_tpu.models.factory import build_model

    cfg = Config().model
    cfg.model_type = "timesformer"
    cfg.base_model = "vit_base_patch16_224"
    assert not build_model(cfg).flash_attention  # auto == off
    cfg.flash_attention = "false"
    assert not build_model(cfg).flash_attention
    cfg.flash_attention = "true"
    assert build_model(cfg).flash_attention


def test_engine_autofolds_timesformer():
    """InferenceEngine applies fold_for_inference automatically: the
    engine's model has fold_temporal_fc set, its param tree has no t_fc,
    and window scores match an optimize=False engine (fp32-exact fold;
    only bf16 rounding downstream)."""
    from workoutdetector_tpu.infer.engine import InferenceEngine

    fmodel = _flax_model("divided_space_time")
    v = fmodel.init({"params": jax.random.PRNGKey(0)},
                    jnp.asarray(_inputs(3)), train=False)
    # randomize t_fc so the fold is load-bearing (zero-init otherwise)
    params = {k: (dict(b) if isinstance(b, dict) else b)
              for k, b in v["params"].items()}
    for k, blk in params.items():
        if k.startswith("block_"):
            rng = jax.random.PRNGKey(abs(hash(k)) % (2 ** 31))
            blk["t_fc"] = {
                "kernel": 0.1 * jax.random.normal(
                    rng, blk["t_fc"]["kernel"].shape),
                "bias": jnp.full_like(blk["t_fc"]["bias"], 0.05)}
    v = {"params": params}

    kw = dict(num_segments=fmodel.num_segments, window_batch=2,
              image_size=fmodel.image_size)
    eng = InferenceEngine(fmodel, v, **kw)
    ref = InferenceEngine(fmodel, v, optimize=False, **kw)
    assert eng.model.fold_temporal_fc and not ref.model.fold_temporal_fc
    assert "t_fc" not in eng.variables["params"]["block_0"]
    wins = np.random.default_rng(0).integers(
        0, 256, (2, fmodel.num_segments, fmodel.image_size,
                 fmodel.image_size, 3), dtype=np.uint8)
    np.testing.assert_allclose(eng.score_windows(wins),
                               ref.score_windows(wins), atol=1e-4, rtol=1e-4)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="Pallas flash kernel lowers on TPU only")
def test_flash_attention_parity_tpu():
    """flash path ≈ XLA path on real hardware (fp32 params, 197-token
    rows exercise the 128-block padding + segment-id masking).

    Both paths run the TPU's default matmul precision (bf16-based), so
    fp32 logits agree to accumulated-rounding level, not exactly:
    measured max|diff| 2.8e-3 on ViT-B-depth stacks (v5e, 2026-08-17).
    The assert bounds that and requires argmax agreement."""
    fmodel = _flax_model("divided_space_time")
    x = jnp.asarray(_inputs(5))
    v = fmodel.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    base = np.asarray(fmodel.apply(v, x, train=False))
    fl = np.asarray(fmodel.clone(flash_attention=True).apply(
        v, x, train=False))
    np.testing.assert_allclose(fl, base, atol=8e-3, rtol=0)
    assert (fl.argmax(-1) == base.argmax(-1)).all()
