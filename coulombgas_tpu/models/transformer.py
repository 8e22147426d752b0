"""Causal-transformer variational autoregressive network (VAN), TPU-first.

Models the classical distribution p(k_1 < k_2 < ... < k_n) over ordered
momentum-occupation indices.  Capability parity with reference
src/autoregressive.py:15-96 (embedding -> [causal attention + tanh MLP]
residual blocks -> output head, with a learned first-row parameter ``x1hat``
and the outputs shifted down one row so row i depends only on tokens < i).

Built TPU-first rather than ported:
  * no haiku — parameters are explicit pytrees (nested dicts), applied by
    pure functions; jit/vmap/shard_map compose without framework state;
  * a single-token *decode step* with per-layer K/V caches is provided so the
    autoregressive sampler runs O(n) transformer evaluations per sample
    instead of the reference's O(n^2) (src/sampler.py:30-38);
  * dtype follows the input (f32 on TPU, f64 on CPU tests).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp

__all__ = [
    "TransformerConfig",
    "init_transformer_params",
    "transformer_apply",
    "init_kv_cache",
    "transformer_decode_step",
]

_NEG_INF = -1e30  # large finite negative; safe in f32 softmax


@dataclass(frozen=True)
class TransformerConfig:
    """Static hyperparameters of the VAN."""

    output_size: int  # number of single-particle states M
    num_layers: int
    model_size: int
    num_heads: int
    hidden_size: int

    def __post_init__(self):
        if self.model_size % self.num_heads != 0:
            raise ValueError(
                "model_size must be divisible by num_heads, got "
                f"{self.model_size} / {self.num_heads}"
            )

    @property
    def key_size(self) -> int:
        return self.model_size // self.num_heads


def _variance_scaling(key, shape, scale, mode="fan_in", dtype=jnp.float32):
    """Truncated-normal variance-scaling init (fan_in/fan_out on 2D weights)."""
    fan_in, fan_out = shape[0], shape[-1]
    fan = fan_in if mode == "fan_in" else fan_out
    stddev = math.sqrt(scale / max(1.0, fan))
    # correct for the variance reduction of truncation to +-2 sigma
    stddev /= 0.87962566103423978
    return stddev * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)


def _linear_init(key, d_in, d_out, scale, mode="fan_in", dtype=jnp.float32):
    return {
        "w": _variance_scaling(key, (d_in, d_out), scale, mode, dtype),
        "b": jnp.zeros((d_out,), dtype),
    }


def init_transformer_params(key, cfg: TransformerConfig, input_size: int, dtype=jnp.float32):
    """Initialize the VAN parameter pytree.

    Init scales follow the reference (init_scale = 0.02 / num_layers,
    variance-scaling truncated normals; x1hat ~ TruncatedNormal with
    stddev sqrt(init_scale / output_size)) so training dynamics match.
    """
    D, H, M = cfg.model_size, cfg.hidden_size, cfg.output_size
    scale = 0.02 / cfg.num_layers
    n_keys = 2 + 6 * cfg.num_layers
    keys = jax.random.split(key, n_keys)
    it = iter(keys)

    params = {
        "embed": _linear_init(next(it), input_size, D, scale, mode="fan_out", dtype=dtype),
        "layers": [],
        "out": _linear_init(jax.random.split(keys[-1])[0], D, M, scale, dtype=dtype),
        "x1hat": math.sqrt(scale / M)
        * jax.random.truncated_normal(jax.random.split(keys[-1])[1], -2.0, 2.0, (M,), dtype),
    }
    for _ in range(cfg.num_layers):
        layer = {
            "attn": {
                "q": _linear_init(next(it), D, D, scale, dtype=dtype),
                "k": _linear_init(next(it), D, D, scale, dtype=dtype),
                "v": _linear_init(next(it), D, D, scale, dtype=dtype),
                "o": _linear_init(next(it), D, D, scale, dtype=dtype),
            },
            "mlp": {
                "fc1": _linear_init(next(it), D, H, scale, dtype=dtype),
                "fc2": _linear_init(next(it), H, D, scale, dtype=dtype),
            },
        }
        params["layers"].append(layer)
    return params


def _linear(p, x):
    return x @ p["w"] + p["b"]


def _causal_attention(p, h, cfg: TransformerConfig):
    """Multi-head self-attention with a causal mask; h: (n, D) -> (n, D)."""
    n, D = h.shape
    nh, hd = cfg.num_heads, cfg.key_size
    q = _linear(p["q"], h).reshape(n, nh, hd)
    k = _linear(p["k"], h).reshape(n, nh, hd)
    v = _linear(p["v"], h).reshape(n, nh, hd)
    logits = jnp.einsum("thd,Thd->htT", q, k) / math.sqrt(hd)
    causal = jnp.tril(jnp.ones((n, n), dtype=bool))
    logits = jnp.where(causal[None], logits, _NEG_INF)
    w = jax.nn.softmax(logits, axis=-1)
    o = jnp.einsum("htT,Thd->thd", w, v).reshape(n, D)
    return _linear(p["o"], o)


def _mlp(p, h):
    return _linear(p["fc2"], jnp.tanh(_linear(p["fc1"], h)))


def transformer_apply(params, cfg: TransformerConfig, x):
    """Full forward pass on one token sequence.

    INPUT:  x (n, input_size) — the (twisted) momentum vectors of the
            occupied orbitals, as floats.
    OUTPUT: (n, M) logits, where row i depends only on tokens < i: the raw
            head outputs are shifted down one row and row 0 is the learned
            ``x1hat`` (reference: src/autoregressive.py:92-95).
    """
    h = jnp.tanh(_linear(params["embed"], x))
    for layer in params["layers"]:
        h = h + _causal_attention(layer["attn"], h, cfg)
        h = h + _mlp(layer["mlp"], h)
    h = jnp.tanh(h)
    logits = _linear(params["out"], h)
    return jnp.concatenate([params["x1hat"][None, :], logits[:-1]], axis=0)


# ---------------------------------------------------------------------------
# Incremental (KV-cached) decoding for the autoregressive sampler.
# ---------------------------------------------------------------------------


def init_kv_cache(cfg: TransformerConfig, n: int, dtype=jnp.float32):
    """Per-layer K/V caches of static length n: (layers, n, heads, key_size)."""
    shape = (cfg.num_layers, n, cfg.num_heads, cfg.key_size)
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


def transformer_decode_step(params, cfg: TransformerConfig, token, pos, kcache, vcache):
    """Process one token at position ``pos``; return next-row logits.

    Equivalent to ``transformer_apply(...)[pos + 1]`` when the cache holds the
    K/V of all tokens < pos, but costs one token of work.  ``pos`` may be a
    traced int32 (used under lax.scan in the sampler).

    INPUT:  token (input_size,); caches as from init_kv_cache.
    OUTPUT: logits (M,), updated caches.
    """
    nh, hd = cfg.num_heads, cfg.key_size
    n = kcache.shape[1]
    h = jnp.tanh(_linear(params["embed"], token))
    for li, layer in enumerate(params["layers"]):
        p = layer["attn"]
        q = _linear(p["q"], h).reshape(nh, hd)
        k_t = _linear(p["k"], h).reshape(nh, hd)
        v_t = _linear(p["v"], h).reshape(nh, hd)
        kcache = kcache.at[li, pos].set(k_t)
        vcache = vcache.at[li, pos].set(v_t)
        logits = jnp.einsum("hd,Thd->hT", q, kcache[li]) / math.sqrt(hd)
        valid = jnp.arange(n) <= pos
        logits = jnp.where(valid[None, :], logits, _NEG_INF)
        w = jax.nn.softmax(logits, axis=-1)
        o = jnp.einsum("hT,Thd->hd", w, vcache[li]).reshape(-1)
        h = h + _linear(p["o"], o)
        h = h + _mlp(layer["mlp"], h)
    h = jnp.tanh(h)
    return _linear(params["out"], h), kcache, vcache
