"""torch → JAX checkpoint port tool.

Faithfully reproduces the reference's checkpoint key surgery
(models/tsm.py:451-473: strip DDP 'module.' prefixes, remap fc keys,
tolerate fc-shape mismatch; models/tdn.py:46-72: add/remove '.net'
wrappers, drop mismatched fc) and converts torchvision-layout state dicts
into this framework's flax param/batch_stats trees:

  torch OIHW conv weights  → flax HWIO kernels
  torch (out,in) fc weight → flax (in,out) kernel
  bn weight/bias           → params.scale/.bias
  bn running_mean/var      → batch_stats.mean/.var
  layer{i}.{j}.*           → layer{i}_{j}.* module names

Works without torchvision: any torch-format ``state_dict`` (or a raw
{key: ndarray} mapping) is accepted.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np
from flax import traverse_util


def _to_numpy(v: Any) -> np.ndarray:
    if hasattr(v, "detach"):  # torch tensor
        return v.detach().cpu().numpy()
    return np.asarray(v)


def strip_ddp_prefix(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Remove the leading 'module.' that DDP training adds
    (reference tsm.py:463-464 strips the first dotted component)."""
    out = {}
    for k, v in state_dict.items():
        out[k[len("module."):] if k.startswith("module.") else k] = v
    return out


def strip_shift_wrappers(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Remove '.net' segments introduced by the torch TemporalShift module
    wrapping convs (reference tsm.py:134-136; tdn.py:53-61 handles the
    same rename in reverse)."""
    return {k.replace(".net.", "."): v for k, v in state_dict.items()}


def _torch_key_to_flax(key: str) -> Optional[Tuple[Tuple[str, ...], str]]:
    """Map one torchvision-resnet-style key to (flax_path, collection).

    collection ∈ {'params', 'batch_stats', None(skip)}.
    """
    if key.endswith("num_batches_tracked"):
        return None
    parts = key.split(".")
    # layer{i}.{j}.rest → layer{i}_{j}.rest ; downsample.0→downsample_conv,
    # downsample.1→downsample_bn
    mapped = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if re.fullmatch(r"layer\d+", p) and i + 1 < len(parts) and \
                parts[i + 1].isdigit():
            mapped.append(f"{p}_{parts[i + 1]}")
            i += 2
            continue
        if p == "downsample" and i + 1 < len(parts) and parts[i + 1] in ("0", "1"):
            mapped.append("downsample_conv" if parts[i + 1] == "0" else
                          "downsample_bn")
            i += 2
            continue
        mapped.append(p)
        i += 1

    leaf = mapped[-1]
    module = mapped[-2] if len(mapped) >= 2 else ""
    is_bn = module.startswith("bn") or module.endswith("bn")
    if leaf == "running_mean":
        return tuple(mapped[:-1] + ["mean"]), "batch_stats"
    if leaf == "running_var":
        return tuple(mapped[:-1] + ["var"]), "batch_stats"
    if is_bn and leaf == "weight":
        return tuple(mapped[:-1] + ["scale"]), "params"
    if is_bn and leaf == "bias":
        return tuple(mapped[:-1] + ["bias"]), "params"
    if leaf == "weight":
        return tuple(mapped[:-1] + ["kernel"]), "params"
    if leaf == "bias":
        return tuple(mapped[:-1] + ["bias"]), "params"
    return tuple(mapped), "params"


def _convert_value(path: Tuple[str, ...], v: np.ndarray) -> np.ndarray:
    if path[-1] == "kernel":
        if v.ndim == 4:  # conv OIHW → HWIO
            return np.transpose(v, (2, 3, 1, 0))
        if v.ndim == 2:  # linear (out,in) → (in,out)
            return np.transpose(v, (1, 0))
        if v.ndim == 3:  # conv1d (out, in/groups, k) — temporal shift conv
            return np.transpose(v, (2, 1, 0))
    return v


def torch_resnet_to_flax(state_dict: Mapping[str, Any],
                         prefix: Tuple[str, ...] = ()) -> Dict[str, Any]:
    """Convert a torchvision-style resnet state dict → {'params',
    'batch_stats'} nested dicts, module names matching models.resnet."""
    params: Dict[Tuple[str, ...], np.ndarray] = {}
    stats: Dict[Tuple[str, ...], np.ndarray] = {}
    for k, v in state_dict.items():
        m = _torch_key_to_flax(k)
        if m is None:
            continue
        path, coll = m
        arr = _convert_value(path, _to_numpy(v))
        (params if coll == "params" else stats)[prefix + path] = arr
    return {
        "params": traverse_util.unflatten_dict(params),
        "batch_stats": traverse_util.unflatten_dict(stats),
    }


def port_tsm_checkpoint(state_dict: Mapping[str, Any],
                        num_class: int,
                        target_params: Optional[Any] = None) -> Dict[str, Any]:
    """Port a torch TSM checkpoint into the flax TSM layout.

    Applies the reference's full surgery chain (tsm.py:451-473): strip
    'module.' → remap fc if shape matches num_class → drop '.net' shift
    wrappers → 'base_model.*' → 'backbone.*'. fc weights whose output dim
    mismatches ``num_class`` are dropped (strict=False analog) and the
    caller keeps its initialized head.
    """
    sd = strip_shift_wrappers(strip_ddp_prefix(dict(state_dict)))
    remapped: Dict[str, Any] = {}
    for k, v in sd.items():
        if k.startswith("base_model."):
            remapped["backbone." + k[len("base_model."):]] = v
        elif k.startswith("new_fc."):
            remapped["fc." + k[len("new_fc."):]] = v
        else:
            remapped[k] = v
    # fc shape check
    fc_w = remapped.get("fc.weight")
    if fc_w is not None and _to_numpy(fc_w).shape[0] != num_class:
        remapped = {k: v for k, v in remapped.items() if not k.startswith("fc.")}
    tree = torch_resnet_to_flax(remapped)
    if target_params is not None:
        tree["params"] = merge_into(target_params, tree["params"])
    return tree


def merge_into(target: Any, source: Any) -> Any:
    """Overlay ``source`` leaves onto ``target`` where paths+shapes match
    (the strict=False load of reference tsm.py:473)."""
    tgt = dict(traverse_util.flatten_dict(target))
    src = traverse_util.flatten_dict(source)
    for k, v in src.items():
        if k in tgt and tuple(np.shape(tgt[k])) == tuple(np.shape(v)):
            tgt[k] = np.asarray(v, dtype=np.asarray(tgt[k]).dtype)
    return traverse_util.unflatten_dict(tgt)


def flax_to_torch_dict(variables: Mapping[str, Any],
                       backbone_key: str = "backbone") -> Dict[str, np.ndarray]:
    """Inverse export: flax TSM variables → torchvision-style state dict
    (numpy values). Round-trip oracle for the port tool and the escape
    hatch for users moving back to torch tooling."""
    out: Dict[str, np.ndarray] = {}

    def emit(path: Tuple[str, ...], v: np.ndarray, collection: str) -> None:
        parts = list(path)
        if parts and parts[0] == backbone_key:
            parts = ["base_model"] + parts[1:]
        parts = [re.sub(r"^layer(\d+)_(\d+)$", r"layer\1.\2", p) for p in parts]
        parts = [p.replace("downsample_conv", "downsample.0").replace(
            "downsample_bn", "downsample.1") for p in parts]
        leaf = parts[-1]
        v = np.asarray(v)
        if leaf == "kernel":
            if v.ndim == 4:
                v = np.transpose(v, (3, 2, 0, 1))
            elif v.ndim == 2:
                v = np.transpose(v, (1, 0))
            leaf = "weight"
        elif leaf == "scale":
            leaf = "weight"
        elif leaf == "mean":
            leaf = "running_mean"
        elif leaf == "var":
            leaf = "running_var"
        out[".".join(parts[:-1] + [leaf])] = v

    for coll in ("params", "batch_stats"):
        flat = traverse_util.flatten_dict(variables.get(coll, {}))
        for path, v in flat.items():
            emit(path, v, coll)
    return out


def _tdn_torch_key_rename(key: str) -> str:
    """Torch TDN (TSN wrapper over TDN_Net, reference tdn.py:92-137 +
    tsn.py:140-147) key → this framework's dotted module path."""
    k = key
    if k.startswith("base_model."):
        k = k[len("base_model."):]
    # stem diff conv: Sequential(conv, bn, relu) → conv1_5 + bn1_5
    k = re.sub(r"^conv1_5\.0\.", "conv1_5.", k)
    k = re.sub(r"^conv1_5\.1\.", "bn1_5.", k)
    # stage renames: layer{i}_bak.{j} → layer{i}.{j}; resnext_layer1.{j}
    k = re.sub(r"^layer(\d+)_bak\.", r"layer\1.", k)
    k = re.sub(r"^resnext_layer1\.(\d+)\.", r"resnext_layer1_\1.", k)
    return k


def port_tdn_checkpoint(state_dict: Mapping[str, Any],
                        num_class: int,
                        target_params: Optional[Any] = None) -> Dict[str, Any]:
    """Port a torch TDN checkpoint (reference create_model surgery,
    tdn.py:43-73: '.net' add/remove, fc-shape drop) into the flax TDN
    layout, including the ShiftModule Conv1d → 3-tap kernel squeeze."""
    sd = strip_shift_wrappers(strip_ddp_prefix(dict(state_dict)))
    params: Dict[Tuple[str, ...], np.ndarray] = {}
    stats: Dict[Tuple[str, ...], np.ndarray] = {}
    fc_w = sd.get("new_fc.weight")
    drop_fc = fc_w is not None and _to_numpy(fc_w).shape[0] != num_class
    for key, v in sd.items():
        k = _tdn_torch_key_rename(key)
        if drop_fc and k.startswith("new_fc."):
            continue
        # learnable temporal shift: conv1d weight (C, 1, 3) → (C, 3)
        if k.endswith(".shift.conv.weight"):
            parts = k.split(".")[:-3]  # module path up to the block
            merged = []
            i = 0
            while i < len(parts):
                if re.fullmatch(r"layer\d+", parts[i]) and \
                        i + 1 < len(parts) and parts[i + 1].isdigit():
                    merged.append(f"{parts[i]}_{parts[i + 1]}")
                    i += 2
                else:
                    merged.append(parts[i])
                    i += 1
            params[tuple(merged) + ("shift", "kernel")] = _to_numpy(v)[:, 0, :]
            continue
        m = _torch_key_to_flax(k)
        if m is None:
            continue
        path, coll = m
        arr = _convert_value(path, _to_numpy(v))
        (params if coll == "params" else stats)[path] = arr
    tree = {
        "params": traverse_util.unflatten_dict(params),
        "batch_stats": traverse_util.unflatten_dict(stats),
    }
    if target_params is not None:
        tree["params"] = merge_into(target_params, tree["params"])
    return tree


def flax_tdn_to_torch_dict(variables: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """Inverse export for TDN: flax variables → torch-style state dict
    (round-trip oracle for port_tdn_checkpoint)."""
    out: Dict[str, np.ndarray] = {}
    for coll in ("params", "batch_stats"):
        flat = traverse_util.flatten_dict(variables.get(coll, {}))
        for path, v in flat.items():
            parts = list(path)
            leaf = parts[-1]
            v = np.asarray(v)
            if parts[-2] == "shift" and leaf == "kernel":
                key = "base_model." + ".".join(
                    _unlayer(parts[:-2])) + ".shift.conv.weight"
                out[key] = v[:, None, :]
                continue
            if leaf == "kernel":
                if v.ndim == 4:
                    v = np.transpose(v, (3, 2, 0, 1))
                elif v.ndim == 2:
                    v = np.transpose(v, (1, 0))
                leaf = "weight"
            elif leaf == "scale":
                leaf = "weight"
            elif leaf == "mean":
                leaf = "running_mean"
            elif leaf == "var":
                leaf = "running_var"
            mods = _unlayer(parts[:-1])
            # undo the framework-side renames
            if mods[0] == "conv1_5":
                key = "base_model.conv1_5.0." + leaf
            elif mods[0] == "bn1_5":
                key = "base_model.conv1_5.1." + leaf
            elif mods[0] == "new_fc":
                key = "new_fc." + leaf
            else:
                key = "base_model." + ".".join(mods) + "." + leaf
            out[key] = v
    return out


def _unlayer(parts):
    """our module names → torch dotted: layer{i}_{j} → layer{i}_bak.{j},
    resnext_layer1_{j} → resnext_layer1.{j}, downsample_conv/bn →
    downsample.0/1."""
    res = []
    for p in parts:
        m = re.fullmatch(r"layer(\d+)_(\d+)", p)
        if m:
            res.extend([f"layer{m.group(1)}_bak", m.group(2)])
            continue
        m = re.fullmatch(r"resnext_layer1_(\d+)", p)
        if m:
            res.extend(["resnext_layer1", m.group(1)])
            continue
        if p == "downsample_conv":
            res.extend(["downsample", "0"])
            continue
        if p == "downsample_bn":
            res.extend(["downsample", "1"])
            continue
        res.append(p)
    return res


def _convnext_key_to_flax(key: str) -> Optional[Tuple[Tuple[str, ...], str]]:
    """Map one timm-ConvNeXt state-dict key to (flax_path, leaf_kind).

    Accepts both timm-modern (conv_dw / mlp.fc1) and facebook-original
    (dwconv / pwconv1) block naming. Returns None for keys to skip.
    """
    k = key
    k = k.replace(".dwconv.", ".conv_dw.")
    k = k.replace(".pwconv1.", ".mlp.fc1.")
    k = k.replace(".pwconv2.", ".mlp.fc2.")
    parts = k.split(".")
    if parts[-1] == "num_batches_tracked":
        return None
    if parts[0] == "stem":
        mod = "stem_conv" if parts[1] == "0" else "stem_norm"
        return (mod, parts[-1]), ("conv" if mod == "stem_conv" else "norm")
    if parts[0] == "stages":
        i = parts[1]
        if parts[2] == "downsample":
            mod = f"down{i}_norm" if parts[3] == "0" else f"down{i}_conv"
            kind = "norm" if parts[3] == "0" else "conv"
            return (mod, parts[-1]), kind
        if parts[2] == "blocks":
            j = parts[3]
            block = f"stage{i}_block{j}"
            rest = parts[4:]
            if rest == ["gamma"]:
                return (block, "gamma"), "gamma"
            if rest[0] == "conv_dw":
                return (block, "conv_dw", rest[-1]), "conv"
            if rest[0] == "norm":
                return (block, "norm", rest[-1]), "norm"
            if rest[:2] == ["mlp", "fc1"]:
                return (block, "fc1", rest[-1]), "dense"
            if rest[:2] == ["mlp", "fc2"]:
                return (block, "fc2", rest[-1]), "dense"
    if parts[0] == "head":
        if parts[1] == "norm":
            return ("head_norm", parts[-1]), "norm"
        if parts[1] in ("fc", "head"):
            return ("head", parts[-1]), "dense"
    return None


def port_convnext_checkpoint(state_dict: Mapping[str, Any],
                             num_class: int,
                             target_params: Optional[Any] = None,
                             prefix: Tuple[str, ...] = ()
                             ) -> Dict[str, Any]:
    """Port a timm/facebook ConvNeXt checkpoint into the flax
    models/convnext.ConvNeXt layout (the reference's image-path backbone,
    train_img.py:44). Head weights whose output dim mismatches
    ``num_class`` are dropped (strict=False analog)."""
    sd = strip_ddp_prefix(dict(state_dict))
    # timm lightning-style nesting: 'model.stem.0.weight'
    sd = {(k[len("model."):] if k.startswith("model.") else k): v
          for k, v in sd.items()}
    head_w = sd.get("head.fc.weight", sd.get("head.weight"))
    drop_head = head_w is not None and \
        _to_numpy(head_w).shape[0] != num_class
    params: Dict[Tuple[str, ...], np.ndarray] = {}
    for k, v in sd.items():
        m = _convnext_key_to_flax(k)
        if m is None:
            continue
        path, kind = m
        if drop_head and path[0] == "head":
            continue
        arr = _to_numpy(v)
        leaf = path[-1]
        if leaf == "weight":
            if kind == "conv":  # OIHW → HWIO (depthwise: (C,1,7,7)→(7,7,1,C))
                arr = np.transpose(arr, (2, 3, 1, 0))
                leaf = "kernel"
            elif kind == "dense":
                arr = np.transpose(arr, (1, 0))
                leaf = "kernel"
            else:  # layernorm
                leaf = "scale"
        params[prefix + path[:-1] + (leaf,)] = arr
    tree = {"params": traverse_util.unflatten_dict(params),
            "batch_stats": {}}
    if target_params is not None:
        tree["params"] = merge_into(target_params, tree["params"])
    return tree


# --------------------------------------------------------------------- #
# TimeSformer (reference configs/timesformer_div_8x4x1_k400.py)
# --------------------------------------------------------------------- #

def _timesformer_normalize_key(key: str) -> Optional[str]:
    """Rewrite an mmaction-TimeSformer key (the layout of the checkpoint the
    reference config loads, configs/timesformer_div_8x4x1_k400.py:10-11)
    into the HuggingFace layout, which :func:`_timesformer_key_to_flax`
    consumes. HF keys pass through unchanged."""
    k = key
    if k.startswith("backbone.") or k.startswith("cls_head."):
        # mmaction layout → HF layout
        k = k.replace("backbone.cls_token", "timesformer.embeddings.cls_token")
        k = k.replace("backbone.pos_embed",
                      "timesformer.embeddings.position_embeddings")
        k = k.replace("backbone.time_embed",
                      "timesformer.embeddings.time_embeddings")
        k = k.replace("backbone.patch_embed.projection",
                      "timesformer.embeddings.patch_embeddings.projection")
        k = k.replace("backbone.norm.", "timesformer.layernorm.")
        k = k.replace("cls_head.fc_cls", "classifier")
        m = re.match(r"backbone\.transformer_layers\.layers\.(\d+)\.(.*)", k)
        if m:
            i, rest = m.group(1), m.group(2)
            rest = rest.replace("attentions.0.norm", "temporal_layernorm")
            rest = rest.replace("attentions.0.attn.in_proj_weight",
                                "temporal_attention.attention.qkv.weight")
            rest = rest.replace("attentions.0.attn.in_proj_bias",
                                "temporal_attention.attention.qkv.bias")
            rest = rest.replace("attentions.0.attn.out_proj",
                                "temporal_attention.output.dense")
            rest = rest.replace("attentions.0.temporal_fc", "temporal_dense")
            rest = rest.replace("attentions.1.norm", "layernorm_before")
            rest = rest.replace("attentions.1.attn.in_proj_weight",
                                "attention.attention.qkv.weight")
            rest = rest.replace("attentions.1.attn.in_proj_bias",
                                "attention.attention.qkv.bias")
            rest = rest.replace("attentions.1.attn.out_proj",
                                "attention.output.dense")
            rest = rest.replace("ffns.0.norm", "layernorm_after")
            rest = rest.replace("ffns.0.layers.0.0", "intermediate.dense")
            rest = rest.replace("ffns.0.layers.1", "output.dense")
            k = f"timesformer.encoder.layer.{i}.{rest}"
    return k


def _timesformer_key_to_flax(key: str) -> Optional[Tuple[Tuple[str, ...], str]]:
    """Map one HF-layout TimeSformer key to (flax_path, leaf_kind)."""
    parts = key.split(".")
    if parts[0] == "classifier":
        return ("fc", parts[-1]), "dense"
    if parts[0] != "timesformer":
        return None
    if parts[1] == "layernorm":
        return ("norm", parts[-1]), "norm"
    if parts[1] == "embeddings":
        if parts[2] == "cls_token":
            return ("cls_token",), "embed"
        if parts[2] == "position_embeddings":
            return ("pos_embed",), "embed"
        if parts[2] == "time_embeddings":
            return ("time_embed",), "embed"
        if parts[2] == "patch_embeddings":
            return ("patch_embed", parts[-1]), "conv"
        return None
    if parts[1] == "encoder" and parts[2] == "layer":
        block = f"block_{parts[3]}"
        rest = parts[4:]
        table = {
            ("temporal_layernorm",): (("t_norm",), "norm"),
            ("temporal_attention", "attention", "qkv"):
                (("t_attn", "qkv"), "dense"),
            ("temporal_attention", "output", "dense"):
                (("t_attn", "proj"), "dense"),
            ("temporal_dense",): (("t_fc",), "dense"),
            ("layernorm_before",): (("s_norm",), "norm"),
            ("attention", "attention", "qkv"): (("s_attn", "qkv"), "dense"),
            ("attention", "output", "dense"): (("s_attn", "proj"), "dense"),
            ("layernorm_after",): (("mlp_norm",), "norm"),
            ("intermediate", "dense"): (("mlp", "fc1"), "dense"),
            ("output", "dense"): (("mlp", "fc2"), "dense"),
        }
        hit = table.get(tuple(rest[:-1]))
        if hit is None:
            return None
        path, kind = hit
        return (block,) + path + (rest[-1],), kind
    return None


def port_timesformer_checkpoint(state_dict: Mapping[str, Any],
                                num_class: int,
                                target_params: Optional[Any] = None
                                ) -> Dict[str, Any]:
    """Port a TimeSformer checkpoint into the flax models/timesformer
    layout. Accepts both the mmaction key layout (what the reference
    config's pretrained URL ships, configs/timesformer_div_8x4x1_k400.py)
    and the HuggingFace ``TimesformerForVideoClassification`` layout.
    Head weights whose output dim mismatches ``num_class`` are dropped
    (the reference's strict=False analog)."""
    sd = strip_ddp_prefix(dict(state_dict))
    sd = {_timesformer_normalize_key(k): v for k, v in sd.items()}
    head_w = sd.get("classifier.weight")
    drop_head = head_w is not None and \
        _to_numpy(head_w).shape[0] != num_class
    params: Dict[Tuple[str, ...], np.ndarray] = {}
    for k, v in sd.items():
        m = _timesformer_key_to_flax(k)
        if m is None:
            continue
        path, kind = m
        if drop_head and path[0] == "fc":
            continue
        arr = _to_numpy(v)
        leaf = path[-1]
        if leaf == "weight":
            if kind == "conv":  # OIHW → HWIO
                arr = np.transpose(arr, (2, 3, 1, 0))
                leaf = "kernel"
            elif kind == "dense":  # (out,in) → (in,out)
                arr = np.transpose(arr, (1, 0))
                leaf = "kernel"
            else:  # layernorm
                leaf = "scale"
        if kind == "embed":
            params[path] = arr
        else:
            params[path[:-1] + (leaf,)] = arr
    tree = {"params": traverse_util.unflatten_dict(params),
            "batch_stats": {}}
    if target_params is not None:
        tree["params"] = merge_into(target_params, tree["params"])
    return tree


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Load a .pth/.ckpt file → raw state dict (handles the 'state_dict'
    nesting both torch-lightning and mmcv use)."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        return ckpt["state_dict"]
    return ckpt


def port_vit_checkpoint(state_dict: Mapping[str, Any],
                        num_class: int,
                        target_params: Optional[Any] = None,
                        prefix: Tuple[str, ...] = ("backbone_img",)
                        ) -> Dict[str, Any]:
    """Port a timm-layout ViT image checkpoint (vit_*_patch*_224:
    cls_token / pos_embed / patch_embed.proj / blocks.N.{norm1, attn.qkv,
    attn.proj, norm2, mlp.fc1, mlp.fc2} / norm / head) into the
    models/factory.ImageClassifier vit branch — a TimeSformer
    space_only encoder at T=1 under ``prefix``. The reference's
    train_img.py:28 loads the same names through timm(pretrained=True).
    Head weights whose output dim mismatches ``num_class`` are dropped
    (timm's own num_classes re-head behavior)."""
    sd = strip_ddp_prefix(dict(state_dict))
    head_w = sd.get("head.weight")
    drop_head = head_w is not None and \
        _to_numpy(head_w).shape[0] != num_class
    blk = re.compile(r"blocks\.(\d+)\.(.*)")
    table = {
        "norm1": ("s_norm",), "attn.qkv": ("s_attn", "qkv"),
        "attn.proj": ("s_attn", "proj"), "norm2": ("mlp_norm",),
        "mlp.fc1": ("mlp", "fc1"), "mlp.fc2": ("mlp", "fc2"),
    }
    params: Dict[Tuple[str, ...], np.ndarray] = {}
    for k, v in sd.items():
        arr = _to_numpy(v)
        path: Optional[Tuple[str, ...]] = None
        kind = "dense"
        if k in ("cls_token", "pos_embed"):
            path, kind = (k,), "embed"
        elif k.startswith("patch_embed.proj."):
            path, kind = ("patch_embed", k.rsplit(".", 1)[1]), "conv"
        elif k.startswith("norm."):
            path, kind = ("norm", k.rsplit(".", 1)[1]), "norm"
        elif k.startswith("head."):
            if drop_head:
                continue
            path = ("fc", k.rsplit(".", 1)[1])
        else:
            m = blk.match(k)
            if m:
                stem, leaf = m.group(2).rsplit(".", 1)
                hit = table.get(stem)
                if hit is None:
                    continue
                path = (f"block_{m.group(1)}",) + hit + (leaf,)
                kind = "norm" if stem.startswith("norm") else "dense"
        if path is None:
            continue
        leaf = path[-1]
        if leaf == "weight":
            if kind == "conv":  # OIHW → HWIO
                arr = np.transpose(arr, (2, 3, 1, 0))
                leaf = "kernel"
            elif kind == "dense":  # (out, in) → (in, out)
                arr = np.transpose(arr, (1, 0))
                leaf = "kernel"
            else:
                leaf = "scale"
        if kind == "embed":
            params[prefix + path] = arr
        else:
            params[prefix + path[:-1] + (leaf,)] = arr
    tree = {"params": traverse_util.unflatten_dict(params),
            "batch_stats": {}}
    if target_params is not None:
        tree["params"] = merge_into(target_params, tree["params"])
    return tree
