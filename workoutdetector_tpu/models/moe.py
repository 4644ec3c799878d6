"""Mixture-of-Experts MLP with expert parallelism (ep) over the mesh.

The reference has no MoE anywhere (SURVEY §2.8: "EP — NO"), so this is a
beyond-reference capability that completes the framework's parallelism
families: dp, tensor, fsdp, sp, pp and now ep all run over the same
(data, model) mesh. The design is the canonical TPU MoE (GShard/Switch
lineage — everything is dense einsums over static shapes, no
data-dependent control flow, so it jits cleanly):

  * router: one Dense(E) per token, softmax gate, top-1 expert choice.
  * capacity: each expert processes at most C = ceil(tokens/E · factor)
    tokens per group; a token's slot comes from a cumsum over the
    routing one-hots, tokens beyond capacity are dropped (their MoE
    output is 0 — the surrounding residual connection carries them).
  * dispatch/combine are one-hot einsum contractions: x (g,t,d) with
    dispatch (g,t,e,c) → expert inputs (g,e,c,d); expert outputs combine
    back weighted by the gate probability, which is the straight-through
    path the router's gradient flows through.
  * expert parallelism: the stacked expert kernels (E, d, h)/(E, h, d)
    are 3-D leaves — parallel.mesh.param_spec shards their leading
    (expert) dim over the 'model' axis, so each device holds and
    computes only E/model experts; GSPMD turns the combine contraction
    into the cross-expert reduce over ICI.
  * load-balance auxiliary loss (Switch eq. 4): E · Σ_e f_e · p_e, sown
    as 'moe_loss' and added to the objective by the trainer with weight
    cfg.model.moe_aux_weight.

Static shapes, bf16-friendly (router math in fp32 for a stable softmax),
differentiable end to end.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


class MoEMlp(nn.Module):
    """Drop-in replacement for a transformer MLP (tokens (..., d) →
    (..., d)) routing each token to one of ``num_experts`` expert FFNs."""
    dim: int
    hidden: int
    num_experts: int
    capacity_factor: float = 1.25
    dtype: Any = jnp.float32
    drop: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        orig_shape = x.shape
        d = orig_shape[-1]
        e = self.num_experts
        tokens = x.reshape(1, -1, d)  # one routing group
        g, t, _ = tokens.shape
        cap = max(1, int(-(-t // e) * self.capacity_factor))

        # router (fp32: a bf16 softmax over logits is needlessly lossy)
        gate_logits = nn.Dense(e, dtype=jnp.float32, name="router")(
            tokens.astype(jnp.float32))
        gates = jax.nn.softmax(gate_logits, axis=-1)  # (g, t, e)
        expert_idx = jnp.argmax(gates, axis=-1)  # (g, t)
        onehot = jax.nn.one_hot(expert_idx, e, dtype=jnp.float32)  # (g,t,e)
        gate_p = jnp.sum(gates * onehot, axis=-1)  # (g, t) chosen-gate prob

        # position of each token within its expert's capacity buffer
        pos = jnp.cumsum(onehot, axis=1) * onehot  # 1-based where routed
        keep = (pos <= cap).astype(jnp.float32) * onehot  # (g, t, e)
        pos_oh = jax.nn.one_hot((pos - 1.0).astype(jnp.int32), cap,
                                dtype=jnp.float32)  # (g, t, e, cap)
        dispatch = keep[..., None] * pos_oh  # (g, t, e, cap) 0/1
        combine = dispatch * gate_p[:, :, None, None]  # gradient path

        # load-balance aux loss (Switch): fraction routed × mean gate prob
        frac = jnp.mean(onehot, axis=1)  # (g, e)
        prob = jnp.mean(gates, axis=1)  # (g, e)
        self.sow("intermediates", "moe_loss",
                 e * jnp.mean(jnp.sum(frac * prob, axis=-1)))

        # dispatch → per-expert FFN (stacked params, ep-sharded) → combine
        xe = jnp.einsum("gtd,gtec->gecd", tokens.astype(self.dtype),
                        dispatch.astype(self.dtype))
        w1 = self.param("w1", nn.initializers.lecun_normal(),
                        (e, d, self.hidden)).astype(self.dtype)
        b1 = self.param("b1", nn.initializers.zeros,
                        (e, 1, self.hidden)).astype(self.dtype)
        w2 = self.param("w2", nn.initializers.lecun_normal(),
                        (e, self.hidden, d)).astype(self.dtype)
        b2 = self.param("b2", nn.initializers.zeros, (e, 1, d)).astype(
            self.dtype)
        h = jnp.einsum("gecd,edh->gech", xe, w1) + b1[None]
        h = nn.gelu(h, approximate=False)
        h = nn.Dropout(self.drop, deterministic=not train)(h)
        out = jnp.einsum("gech,ehd->gecd", h, w2) + b2[None]
        y = jnp.einsum("gecd,gtec->gtd", out, combine.astype(self.dtype))
        y = nn.Dropout(self.drop, deterministic=not train)(y)
        return y.reshape(orig_shape)
