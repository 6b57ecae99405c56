"""Functional NN primitives: param-pytree init fns + pure apply fns.

The reference composes torch.nn modules (reference:
src/model/architecture.py:18-57 MultiHeadAttention, :222-242 MLP tower).
The TPU-native design is stateless: parameters are plain nested-dict
pytrees so they can be sharded with ``NamedSharding``, donated to jitted
steps, and checkpointed as arrays — no module system in the way of
``pjit``/``shard_map``.

Matmul-heavy paths accept a ``dtype`` (bfloat16 by default from the model
config) so activations ride the MXU in bf16 while parameters stay fp32;
accumulation is forced to fp32 via ``preferred_element_type``.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


# ----------------------------------------------------------------- dense

def dense_init(key: jax.Array, in_dim: int, out_dim: int) -> Params:
    """Kaiming-uniform fan-in init (the torch.nn.Linear default the
    reference relies on)."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_dim)
    return {
        "w": jax.random.uniform(kw, (in_dim, out_dim), jnp.float32, -bound, bound),
        "b": jax.random.uniform(kb, (out_dim,), jnp.float32, -bound, bound),
    }


def dense(p: Params, x: jax.Array, dtype=None) -> jax.Array:
    w, b = p["w"], p["b"]
    if dtype is not None:
        x, w = x.astype(dtype), w.astype(dtype)
    y = jax.lax.dot_general(
        x, w,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return y + b.astype(y.dtype)


# ------------------------------------------------------------- layer norm

def layer_norm_init(dim: int) -> Params:
    return {"scale": jnp.ones((dim,), jnp.float32),
            "bias": jnp.zeros((dim,), jnp.float32)}


def layer_norm(p: Params, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """LayerNorm in fp32 for numerical stability, cast back to input dtype."""
    orig_dtype = x.dtype
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(orig_dtype)


# --------------------------------------------------------------- dropout

def dropout(
    rng: Optional[jax.Array], x: jax.Array, rate: float, deterministic: bool
) -> jax.Array:
    if deterministic or rate <= 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


# ------------------------------------------------------ multi-head attention

def mha_init(key: jax.Array, embed_dim: int) -> Params:
    """Q/K/V/out projection params (architecture.py:27-30)."""
    kq, kk, kv, ko = jax.random.split(key, 4)
    return {
        "q": dense_init(kq, embed_dim, embed_dim),
        "k": dense_init(kk, embed_dim, embed_dim),
        "v": dense_init(kv, embed_dim, embed_dim),
        "o": dense_init(ko, embed_dim, embed_dim),
    }


def mha(
    p: Params,
    query: jax.Array,   # [B, Sq, D]
    key: jax.Array,     # [B, Sk, D]
    value: jax.Array,   # [B, Sk, D]
    num_heads: int,
    mask: Optional[jax.Array] = None,
    dropout_rate: float = 0.0,
    rng: Optional[jax.Array] = None,
    deterministic: bool = True,
    dtype=None,
) -> jax.Array:
    """Scaled-dot-product MHA, semantics of architecture.py:35-57 (dropout
    applied to the attention weights, optional additive mask of zeros)."""
    B, Sq, D = query.shape
    Sk = key.shape[1]
    H = num_heads
    hd = D // H

    q = dense(p["q"], query, dtype).reshape(B, Sq, H, hd).transpose(0, 2, 1, 3)
    k = dense(p["k"], key, dtype).reshape(B, Sk, H, hd).transpose(0, 2, 1, 3)
    v = dense(p["v"], value, dtype).reshape(B, Sk, H, hd).transpose(0, 2, 1, 3)

    scores = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((3,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32,
    ) / math.sqrt(hd)                                   # [B, H, Sq, Sk] fp32
    if mask is not None:
        scores = jnp.where(mask == 0, -jnp.inf, scores)
    weights = jax.nn.softmax(scores, axis=-1)
    weights = dropout(rng, weights, dropout_rate, deterministic)

    out = jax.lax.dot_general(
        weights.astype(v.dtype), v,
        dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32,
    )                                                   # [B, H, Sq, hd]
    out = out.transpose(0, 2, 1, 3).reshape(B, Sq, D).astype(query.dtype)
    return dense(p["o"], out, dtype)


# ------------------------------------------------------------- MLP tower

def mlp_tower_init(key: jax.Array, in_dim: int, hidden_dims: List[int]) -> List[Params]:
    """[Linear -> ReLU -> LayerNorm -> Dropout] per hidden dim
    (architecture.py:230-242)."""
    layers = []
    cur = in_dim
    for h in hidden_dims:
        key, sub = jax.random.split(key)
        layers.append({"dense": dense_init(sub, cur, h), "norm": layer_norm_init(h)})
        cur = h
    return layers


def mlp_tower(
    layers: List[Params],
    x: jax.Array,
    dropout_rate: float = 0.0,
    rng: Optional[jax.Array] = None,
    deterministic: bool = True,
    dtype=None,
) -> jax.Array:
    for i, layer in enumerate(layers):
        x = dense(layer["dense"], x, dtype)
        x = jax.nn.relu(x)
        x = layer_norm(layer["norm"], x)
        if rng is not None:
            rng = jax.random.fold_in(rng, i)
        x = dropout(rng, x, dropout_rate, deterministic)
    return x


# ------------------------------------------------------------- embeddings

def embedding_init(key: jax.Array, num: int, dim: int, scale: float = 0.1) -> jax.Array:
    """N(0, scale) embedding table (NCF-standard init; the post-lookup
    LayerNorm in AdvancedNCF makes the scale non-critical)."""
    return jax.random.normal(key, (num, dim), jnp.float32) * scale
