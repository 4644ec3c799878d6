"""ResNet backbone in flax — NHWC, bf16-compute, TPU-native.

From-scratch implementation shaped for XLA:TPU (not a torchvision port):
  * NHWC layout end-to-end — channels ride the 128-lane dimension; convs
    lower straight onto the MXU without layout transposes.
  * compute dtype is configurable (bf16 default), params/BN stats stay fp32.
  * a ``block_input_hook`` lets TSM inject its temporal shift in front of
    each residual branch (semantics of reference models/tsm.py:104-139
    make_temporal_shift, re-expressed as a functional hook instead of
    module monkey-patching).
  * partial-BN (reference models/tsm.py:285-299): every BatchNorm except
    the stem's runs on running stats and never updates when
    ``partial_bn`` — expressed per-module via ``use_running_average``.

Naming matches torchvision's state-dict layout (conv1, bn1, layer{i}_{j},
fc) so the torch→JAX checkpoint port (models/convert.py) is a pure
key-mapping.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

ModuleDef = Any

STAGE_SIZES = {
    "resnet18": [2, 2, 2, 2],
    "resnet34": [3, 4, 6, 3],
    "resnet50": [3, 4, 6, 3],
    "resnet101": [3, 4, 23, 3],
}
BOTTLENECK = {"resnet18": False, "resnet34": False, "resnet50": True, "resnet101": True}


class ShiftConv(nn.Module):
    """conv1 fused with the TSM temporal shift (ops.temporal_shift.
    shift_conv). Param-compatible with nn.Conv (one 'kernel', no bias) so
    checkpoints are interchangeable with the unfused path.

    impl='pallas' routes 1×1/stride-1 sites through the single-pass Pallas
    shift-matmul kernel (ops/pallas/shift_matmul.py, custom-VJP so it
    trains); other shapes fall back to the XLA split-conv."""
    features: int
    kernel_size: Any = (1, 1)
    strides: Any = (1, 1)
    padding: Any = "SAME"
    n_segment: int = 8
    fold_div: int = 8
    dtype: Any = jnp.float32
    impl: str = "xla"  # xla | xla-edge | pallas
    # 'pallas': keep the fused XLA forward but compute the backward with
    # the Pallas matmul kernels (ops/pallas/conv1x1.make_shift_conv1x1)
    # — the shifted conv1 sites own the pathological bwd-input matmul
    # (36x measured at stage 1, docs/PERF.md)
    bwd: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        from workoutdetector_tpu.ops.temporal_shift import (shift_conv,
                                                            shift_conv_edge)
        kh, kw = self.kernel_size
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (kh, kw, x.shape[-1], self.features))
        x = x.astype(self.dtype)
        kernel = kernel.astype(self.dtype)
        if self.impl == "pallas" and (kh, kw) == (1, 1) and \
                tuple(self.strides) == (1, 1):
            from workoutdetector_tpu.ops.pallas.shift_matmul import \
                make_shift_matmul
            op = make_shift_matmul(self.n_segment, self.fold_div)
            return op(x, kernel[0, 0])
        if self.bwd == "pallas" and self.impl == "xla" and \
                (kh, kw) == (1, 1) and tuple(self.strides) == (1, 1):
            from workoutdetector_tpu.ops.pallas.conv1x1 import \
                make_shift_conv1x1
            return make_shift_conv1x1(self.n_segment, self.fold_div)(
                x, kernel)
        fn = shift_conv_edge if self.impl == "xla-edge" else shift_conv
        return fn(x, kernel, self.n_segment, self.fold_div,
                  tuple(self.strides), self.padding)


class PallasBwdConv1x1(nn.Module):
    """Stride-1 1×1 conv whose BACKWARD runs the Pallas matmul kernels
    (ops/pallas/conv1x1.py): forward is the identical XLA convolution,
    so inference graphs, BN/ReLU fusions and numerics are untouched —
    only the train-step cotangents change producer. Param-compatible
    with ``nn.Conv(features, (1, 1), use_bias=False)``."""
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from workoutdetector_tpu.ops.pallas.conv1x1 import conv1x1
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (1, 1, x.shape[-1], self.features))
        return conv1x1(x.astype(self.dtype), kernel.astype(self.dtype))


class _ConvKernel(nn.Module):
    """Parameter holder producing exactly nn.Conv's tree ({name}/kernel,
    lecun_normal, HWIO shape) without running the convolution — the fused
    block path (ops/pallas/fused_block.py) reads weights through these so
    its param tree is bit-identical to the unfused modules' (checkpoints
    and train/eval variables interchange freely)."""
    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(), self.shape)


class _BNStats(nn.Module):
    """Parameter holder matching flax BatchNorm's tree: params scale/bias,
    batch_stats mean/var (fp32, ones/zeros inits)."""
    features: int

    @nn.compact
    def __call__(self):
        f = (self.features,)
        scale = self.param("scale", nn.initializers.ones, f)
        bias = self.param("bias", nn.initializers.zeros, f)
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros(f, jnp.float32))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones(f, jnp.float32))
        return scale, bias, mean.value, var.value


class BasicBlock(nn.Module):
    """3x3-3x3 residual block (resnet18/34)."""
    filters: int
    strides: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32
    norm: ModuleDef = nn.BatchNorm
    input_hook: Optional[Callable] = None
    shift: Optional[Tuple] = None  # (n_segment, fold_div[, impl]) → fused
    train_attr: Optional[bool] = None  # train mode baked as an attribute so
    # nn.remat only traces x (the flag is a Python bool at trace time)

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.train_attr is not None:
            train = self.train_attr
        residual = x
        y = x if self.input_hook is None else self.input_hook(x)
        if self.shift is not None:
            impl = self.shift[2] if len(self.shift) > 2 else "xla"
            y = ShiftConv(self.filters, (3, 3), (self.strides, self.strides),
                          padding=[(1, 1), (1, 1)], n_segment=self.shift[0],
                          fold_div=self.shift[1], dtype=self.dtype,
                          impl=impl, name="conv1")(y)
        else:
            y = nn.Conv(self.filters, (3, 3), (self.strides, self.strides),
                        padding=[(1, 1), (1, 1)], use_bias=False,
                        dtype=self.dtype, name="conv1")(y)
        y = self.norm(name="bn1")(y, use_running_average=not train)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = self.norm(name="bn2")(y, use_running_average=not train)
        if self.downsample:
            residual = nn.Conv(self.filters, (1, 1), (self.strides, self.strides),
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(residual)
            residual = self.norm(name="downsample_bn")(residual,
                                                       use_running_average=not train)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    """1x1-3x3-1x1 bottleneck block (resnet50/101), stride on the 3x3
    (torchvision v1.5 placement, what the reference's base model uses)."""
    filters: int
    strides: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32
    norm: ModuleDef = nn.BatchNorm
    input_hook: Optional[Callable] = None
    shift: Optional[Tuple] = None  # (n_segment, fold_div[, impl]) → fused
    expansion: int = 4
    train_attr: Optional[bool] = None  # see BasicBlock.train_attr
    # whole-block Pallas fusion (inference only): 'pallas' runs the entire
    # bottleneck — shift, three convs, folded BN, relu, residual — as one
    # VMEM-resident kernel (ops/pallas/fused_block.py). Applies at
    # stride 1 with no input_hook; otherwise (and whenever train=True,
    # where BN uses batch stats) the unfused path below runs. The param
    # tree is identical either way.
    fuse_impl: Optional[str] = None
    # 'pallas': stride-1 1×1 convs (conv1 when unshifted, conv3, and a
    # stride-1 downsample) keep their XLA forward but compute backward
    # through the Pallas matmul kernels (ops/pallas/conv1x1.py) — the
    # train-MFU probe lever, param tree unchanged
    conv1x1_bwd: Optional[str] = None

    def _fused(self, x, train: bool) -> Optional[jnp.ndarray]:
        if (self.fuse_impl != "pallas" or train or self.strides != 1
                or self.input_hook is not None):
            return None
        from workoutdetector_tpu.ops.pallas.fused_block import (
            FusedBlockParams, fold_bn, fused_bottleneck)
        c_in = x.shape[-1]
        f = self.filters
        o = f * self.expansion
        eps = getattr(self.norm, "keywords", {}).get("epsilon", 1e-5)
        dt = self.dtype
        w1 = _ConvKernel((1, 1, c_in, f), name="conv1")()
        bn1 = _BNStats(f, name="bn1")()
        w2 = _ConvKernel((3, 3, f, f), name="conv2")()
        bn2 = _BNStats(f, name="bn2")()
        w3 = _ConvKernel((1, 1, f, o), name="conv3")()
        bn3 = _BNStats(o, name="bn3")()
        wd = sbd = None
        if self.downsample:
            wd = _ConvKernel((1, 1, c_in, o), name="downsample_conv")()[0, 0]
            wd = wd.astype(dt)
            sbd = fold_bn(*_BNStats(o, name="downsample_bn")(), eps)
        params = FusedBlockParams(
            w1=w1[0, 0].astype(dt), sb1=fold_bn(*bn1, eps),
            w2=w2.astype(dt), sb2=fold_bn(*bn2, eps),
            w3=w3[0, 0].astype(dt), sb3=fold_bn(*bn3, eps),
            wd=wd, sbd=sbd)
        if self.shift is not None:
            n_seg, fold = self.shift[0], c_in // self.shift[1]
        else:
            n_seg, fold = 1, 0
        return fused_bottleneck(x.astype(dt), params,
                                n_segment=n_seg, fold=fold)

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.train_attr is not None:
            train = self.train_attr
        fused = self._fused(x, train)
        if fused is not None:
            return fused
        residual = x

        def conv1x1(features, name):
            if self.conv1x1_bwd == "pallas":
                return PallasBwdConv1x1(features, dtype=self.dtype,
                                        name=name)
            return nn.Conv(features, (1, 1), use_bias=False,
                           dtype=self.dtype, name=name)

        y = x if self.input_hook is None else self.input_hook(x)
        if self.shift is not None:
            impl = self.shift[2] if len(self.shift) > 2 else "xla"
            y = ShiftConv(self.filters, (1, 1), n_segment=self.shift[0],
                          fold_div=self.shift[1], dtype=self.dtype,
                          impl=impl, bwd=self.conv1x1_bwd,
                          name="conv1")(y)
        else:
            y = conv1x1(self.filters, "conv1")(y)
        y = self.norm(name="bn1")(y, use_running_average=not train)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), (self.strides, self.strides),
                    padding=[(1, 1), (1, 1)], use_bias=False, dtype=self.dtype,
                    name="conv2")(y)
        y = self.norm(name="bn2")(y, use_running_average=not train)
        y = nn.relu(y)
        y = conv1x1(self.filters * self.expansion, "conv3")(y)
        y = self.norm(name="bn3")(y, use_running_average=not train)
        if self.downsample:
            if self.strides == 1 and self.conv1x1_bwd == "pallas":
                residual = PallasBwdConv1x1(
                    self.filters * self.expansion, dtype=self.dtype,
                    name="downsample_conv")(residual)
            else:
                residual = nn.Conv(self.filters * self.expansion, (1, 1),
                                   (self.strides, self.strides),
                                   use_bias=False, dtype=self.dtype,
                                   name="downsample_conv")(residual)
            residual = self.norm(name="downsample_bn")(residual,
                                                       use_running_average=not train)
        return nn.relu(y + residual)


class FrozenAwareBatchNorm(nn.BatchNorm):
    """BatchNorm whose ``use_running_average`` can be forced True by a
    ``frozen`` attribute — the partial-BN mechanism. Frozen modules never
    update running stats (they are simply not marked mutable-dirty because
    use_running_average short-circuits the update)."""
    frozen: bool = False

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None):
        if self.frozen:
            use_running_average = True
        return super().__call__(x, use_running_average=use_running_average)


class ResNet(nn.Module):
    """ResNet-18/34/50/101.

    Args:
        stage_sizes: blocks per stage.
        bottleneck: use Bottleneck (True) or BasicBlock.
        num_classes: 0 ⇒ return pooled features, else logits.
        block_input_hook: fn(x, stage_idx, block_idx) → x applied at each
            residual-branch input (TSM shift injection point).
        partial_bn: freeze all BN except the stem's (reference partial-BN).
        dtype: compute dtype (params remain fp32 by flax default).
    """
    stage_sizes: Sequence[int]
    bottleneck: bool = True
    num_classes: int = 1000
    width: int = 64
    dtype: Any = jnp.float32
    partial_bn: bool = False
    block_input_hook: Optional[Callable] = None
    # fn(x, stage_idx, block_idx) → x applied to the WHOLE block input —
    # residual path included (reference 'block' shift place wraps the whole
    # block module, tsm.py:114-123, so the identity path is shifted too)
    block_pre_hook: Optional[Callable] = None
    stage_input_hook: Optional[Callable] = None  # fn(x, stage_idx) → x
    # fn(stage_idx, block_idx) → Optional[(n_segment, fold_div)]: fuse the
    # TSM shift into that block's conv1 (ShiftConv) instead of hooking
    block_shift_spec: Optional[Callable] = None
    # fn(stage_idx, block_idx) → Optional[str]: whole-block Pallas fusion
    # policy for inference (Bottleneck.fuse_impl; bottleneck archs only)
    block_fuse_spec: Optional[Callable] = None
    # 'pallas': Bottleneck 1×1 convs backward through the Pallas matmul
    # kernels (Bottleneck.conv1x1_bwd; bottleneck archs only)
    conv1x1_bwd: Optional[str] = None
    bn_momentum: float = 0.9
    bn_eps: float = 1e-5
    # rematerialize residual blocks on backward: trades ~30% more FLOPs for
    # O(stages) activation memory — the jax.checkpoint lever for big batches
    remat: bool = False

    # return these stages' spatial maps as a tuple instead of the head
    # (mmaction ResNetTSM out_indices, the TPN neck's taps —
    # reference configs/tpn.py:7-11)
    out_indices: Optional[Sequence[int]] = None

    @nn.compact
    def __call__(self, x, train: bool = False, features_only: bool = False,
                 spatial: bool = False, seg_lo: int = 0, seg_hi: int = 6):
        """spatial=True returns the pre-pool (N, H/32, W/32, C) feature map
        — the detection/pose heads' input (models/detector.py, pose).

        seg_lo/seg_hi select a static SEGMENT RANGE [seg_lo, seg_hi) for
        pipeline-parallel stage functions (parallel/pipeline.py
        pipeline_apply_het): segment 0 = stem (conv1/bn1/pool), segments
        1..4 = the residual stages, segment 5 = head (pool [+fc]). With
        seg_lo > 0, ``x`` is the activation at that boundary; with
        seg_hi < 6 the raw boundary activation is returned. Param names
        are position-independent (layer{i}_{j}), so a partial apply
        reads the same tree as the full one."""
        assert 0 <= seg_lo < seg_hi <= 6, (seg_lo, seg_hi)
        if (seg_lo, seg_hi) != (0, 6):
            assert self.out_indices is None, \
                "segment-ranged apply doesn't support out_indices taps"
        norm_stem = partial(FrozenAwareBatchNorm, momentum=self.bn_momentum,
                            epsilon=self.bn_eps, dtype=self.dtype, frozen=False)
        norm_body = partial(FrozenAwareBatchNorm, momentum=self.bn_momentum,
                            epsilon=self.bn_eps, dtype=self.dtype,
                            frozen=self.partial_bn)
        block_cls = Bottleneck if self.bottleneck else BasicBlock
        if self.remat:
            block_cls = nn.remat(block_cls)

        if seg_lo == 0:
            x = nn.Conv(self.width, (7, 7), (2, 2), padding=[(3, 3), (3, 3)],
                        use_bias=False, dtype=self.dtype, name="conv1")(x)
            x = norm_stem(name="bn1")(x, use_running_average=not train)
            x = nn.relu(x)
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        taps = []
        for i, n_blocks in enumerate(self.stage_sizes):
            if not (seg_lo <= i + 1 < seg_hi):
                continue
            filters = self.width * 2 ** i
            if self.stage_input_hook is not None:
                x = self.stage_input_hook(x, stage_idx=i)
            for j in range(n_blocks):
                strides = 2 if i > 0 and j == 0 else 1
                expansion = 4 if self.bottleneck else 1
                downsample = j == 0 and (strides != 1 or
                                         x.shape[-1] != filters * expansion)
                hook = None
                if self.block_input_hook is not None:
                    hook = partial(self.block_input_hook, stage_idx=i, block_idx=j)
                shift = None
                if self.block_shift_spec is not None:
                    shift = self.block_shift_spec(i, j)
                if self.block_pre_hook is not None:
                    x = self.block_pre_hook(x, stage_idx=i, block_idx=j)
                kw = {}
                if self.bottleneck and self.block_fuse_spec is not None:
                    kw["fuse_impl"] = self.block_fuse_spec(i, j)
                if self.bottleneck and self.conv1x1_bwd is not None:
                    kw["conv1x1_bwd"] = self.conv1x1_bwd
                x = block_cls(filters=filters,
                              strides=strides,
                              downsample=downsample,
                              dtype=self.dtype,
                              norm=norm_body,
                              input_hook=hook,
                              shift=shift,
                              train_attr=train,
                              name=f"layer{i + 1}_{j}",
                              **kw)(x)
            if self.out_indices is not None and i in self.out_indices:
                taps.append(x)

        if self.out_indices is not None:
            return tuple(taps)
        if seg_hi < 6:
            return x  # boundary activation for the next pipeline stage
        if spatial:
            return x
        x = jnp.mean(x, axis=(1, 2))  # global average pool → (N, C)
        if features_only or self.num_classes == 0:
            return x
        x = nn.Dense(self.num_classes, dtype=self.dtype, name="fc")(x)
        return x


def _make(arch: str, **kw) -> ResNet:
    return ResNet(stage_sizes=STAGE_SIZES[arch], bottleneck=BOTTLENECK[arch], **kw)


def resnet18(**kw) -> ResNet:
    return _make("resnet18", **kw)


def resnet34(**kw) -> ResNet:
    return _make("resnet34", **kw)


def resnet50(**kw) -> ResNet:
    return _make("resnet50", **kw)


def resnet101(**kw) -> ResNet:
    return _make("resnet101", **kw)
