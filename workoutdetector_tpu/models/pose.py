"""Top-down 2D pose estimation — heatmap head, TPU-native.

The in-framework replacement for the reference's mmpose HRNet top-down
stage (workoutdetector/scripts/pose.py:35-162: mmdet person det + HRNet →
(P, T, 17, 3) keypoints). SimpleBaseline-style: a conv backbone (shared
TinyFCN / models/resnet spatial features) + transposed-conv upsampling +
a 17-channel heatmap conv; decode = per-channel argmax (+ peak score).
Static shapes throughout; one jitted batch forward per clip.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

NUM_KEYPOINTS = 17  # COCO-17 layout (utils/visualize.COCO_PAIRS)


class TopDownPose(nn.Module):
    """(B, S, S, 3) normalized float → (B, S/4, S/4, 17) heatmaps."""
    backbone: str = "tiny"  # tiny | resnet18 | ...
    head_width: int = 64
    dtype: Any = jnp.float32

    @property
    def stride(self) -> int:
        return 4  # after upsampling

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.backbone == "tiny":
            from workoutdetector_tpu.models.detector import TinyFCN
            feat = TinyFCN(dtype=self.dtype, name="backbone")(x, train=train)
            n_up = 1  # stride 8 → 4
        else:
            from workoutdetector_tpu.models.resnet import _make
            net = _make(self.backbone, num_classes=0, dtype=self.dtype,
                        name="backbone")
            feat = net(x, train=train, spatial=True)
            n_up = 3  # stride 32 → 4
        y = feat
        for i in range(n_up):
            y = nn.ConvTranspose(self.head_width, (4, 4), (2, 2),
                                 padding="SAME", dtype=self.dtype,
                                 name=f"deconv{i + 1}")(y)
            y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                             name=f"debn{i + 1}")(y)
            y = nn.relu(y)
        hm = nn.Conv(NUM_KEYPOINTS, (1, 1), dtype=self.dtype, name="hm")(y)
        return hm.astype(jnp.float32)


def keypoint_targets(kps: np.ndarray, input_size: int, stride: int = 4,
                     sigma: float = 1.5) -> np.ndarray:
    """(17, 2) pixel keypoints → (s, s, 17) gaussian heatmaps
    (s = input_size // stride). NaN/out-of-frame keypoints → zero map."""
    s = input_size // stride
    yy, xx = np.mgrid[0:s, 0:s].astype(np.float32)
    maps = np.zeros((s, s, NUM_KEYPOINTS), np.float32)
    for k, (x, y) in enumerate(np.asarray(kps, np.float32)):
        if not np.isfinite(x) or not np.isfinite(y):
            continue
        cx, cy = x / stride, y / stride
        if not (0 <= cx < s and 0 <= cy < s):
            continue
        maps[..., k] = np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) /
                              (2 * sigma ** 2))
    return maps


def decode_keypoints(heatmaps: np.ndarray, stride: int = 4
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """(B, s, s, 17) heatmaps → ((B, 17, 2) xy pixels, (B, 17) scores)."""
    hm = np.asarray(heatmaps)
    b, h, w, k = hm.shape
    flat = hm.reshape(b, h * w, k)
    idx = flat.argmax(axis=1)  # (B, 17)
    scores = np.take_along_axis(flat, idx[:, None, :], axis=1)[:, 0, :]
    ys, xs = np.divmod(idx, w)
    xy = np.stack([xs, ys], axis=-1).astype(np.float32) * stride + stride / 2
    return xy, scores


class PoseEstimator:
    """Batched clip → (T, 17, 3) keypoints, with save/load like the
    detector backend."""

    def __init__(self, model: TopDownPose, variables: Dict[str, Any],
                 input_size: int = 128, batch: int = 16):
        self.model = model
        self.variables = variables
        self.input_size = input_size
        self.batch = batch

        from workoutdetector_tpu.ops.preprocess import normalize_clip

        @jax.jit
        def run(x_u8):
            return model.apply(variables, normalize_clip(x_u8), train=False)

        self._fn = run

    def estimate_clip(self, clip: np.ndarray) -> np.ndarray:
        """clip (T, H, W, 3) uint8 → (T, 17, 3) [x, y, score] in original
        pixel coordinates."""
        import cv2
        t, h, w = clip.shape[:3]
        s = self.input_size
        resized = np.stack([cv2.resize(f, (s, s)) for f in clip])
        hms = []
        for i in range(0, t, self.batch):
            chunk = resized[i:i + self.batch]
            pad = self.batch - len(chunk)
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)])
            out = np.asarray(self._fn(jnp.asarray(chunk)))
            hms.append(out[:self.batch - pad if pad else self.batch])
        hm = np.concatenate(hms)
        xy, scores = decode_keypoints(hm, self.model.stride)
        xy *= np.asarray([w / s, h / s], np.float32)
        return np.concatenate([xy, scores[..., None]], axis=-1)

    def save(self, path: str) -> None:
        from flax import serialization
        with open(path, "wb") as f:
            f.write(serialization.to_bytes(self.variables))

    @classmethod
    def load(cls, path: str, backbone: str = "tiny",
             input_size: int = 128) -> "PoseEstimator":
        from flax import serialization
        model = TopDownPose(backbone=backbone)
        init = model.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, input_size, input_size, 3)))
        with open(path, "rb") as f:
            variables = serialization.from_bytes(init, f.read())
        return cls(model, variables, input_size=input_size)


def train_pose(images: np.ndarray, keypoints: List[np.ndarray],
               steps: int = 200, lr: float = 2e-3, batch: int = 8,
               backbone: str = "tiny", seed: int = 0,
               log_every: int = 0) -> PoseEstimator:
    """Fit TopDownPose on (images (N,S,S,3) uint8, per-image (17,2) kps)
    with MSE heatmap regression (the SimpleBaseline objective)."""
    import optax

    from workoutdetector_tpu.ops.preprocess import normalize_clip

    model = TopDownPose(backbone=backbone)
    size = images.shape[1]
    variables = model.init({"params": jax.random.PRNGKey(seed)},
                           jnp.zeros((1, size, size, 3)), train=True)
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = optax.adam(lr)
    opt_state = tx.init(params)
    tgts = np.stack([keypoint_targets(k, size, model.stride)
                     for k in keypoints])

    @jax.jit
    def step(params, batch_stats, opt_state, x_u8, tgt):
        def loss_fn(p):
            out, upd = model.apply(
                {"params": p, "batch_stats": batch_stats},
                normalize_clip(x_u8), train=True, mutable=["batch_stats"])
            return jnp.mean((out - tgt) ** 2) * 100.0, upd["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, opt_state, loss

    n = images.shape[0]
    rng = np.random.default_rng(seed)
    for s in range(steps):
        idx = rng.integers(0, n, (batch,))
        params, batch_stats, opt_state, loss = step(
            params, batch_stats, opt_state, jnp.asarray(images[idx]),
            jnp.asarray(tgts[idx]))
        if log_every and (s + 1) % log_every == 0:
            print(f"pose step {s + 1}: loss {float(loss):.4f}")
    return PoseEstimator(model,
                         {"params": params, "batch_stats": batch_stats},
                         input_size=size)
