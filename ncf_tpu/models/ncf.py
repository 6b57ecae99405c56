"""Vanilla NCF / NeuMF — GMF (+) MLP fusion.

The PR1/PR2 baseline models of BASELINE.json ("Vanilla NCF (GMF+MLP
fusion, 32-dim)" and "NeuMF ... 64-dim"): classic He et al. 2017 NeuMF
shape, sharing the batch contract of AdvancedNCF (``user_ids [B]``,
``item_ids [B, S]`` -> logits [B, S]).  The reference repo has no plain
NCF; this is the sanity-corridor model the benchmark targets are defined
against (BASELINE.md).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ncf_tpu.models.layers import (
    dense,
    dense_init,
    embedding_init,
    mlp_tower,
    mlp_tower_init,
)
from ncf_tpu.ops.embedding import embedding_lookup
from ncf_tpu.utils.config import ModelConfig

Params = Dict[str, Any]


def init(key: jax.Array, cfg: ModelConfig) -> Params:
    keys = jax.random.split(key, 6)
    mlp_in = 2 * cfg.mlp_dim
    return {
        "gmf_user": embedding_init(keys[0], cfg.num_users, cfg.mf_dim, 0.01),
        "gmf_item": embedding_init(keys[1], cfg.num_items, cfg.mf_dim, 0.01),
        "mlp_user": embedding_init(keys[2], cfg.num_users, cfg.mlp_dim, 0.01),
        "mlp_item": embedding_init(keys[3], cfg.num_items, cfg.mlp_dim, 0.01),
        "mlp": mlp_tower_init(keys[4], mlp_in, list(cfg.mlp_hidden_dims)),
        # NeuMF head over [gmf_vector ; mlp_tower_out]
        "out": dense_init(keys[5], cfg.mf_dim + cfg.mlp_hidden_dims[-1], 1),
    }


def apply(
    params: Params,
    cfg: ModelConfig,
    user_ids: jax.Array,   # [B]
    item_ids: jax.Array,   # [B, S]
    temporal: Optional[Dict[str, jax.Array]] = None,  # unused; API parity
    item_dept: Optional[jax.Array] = None,
    item_cat: Optional[jax.Array] = None,
    candidate_attention: bool = True,  # unused; API parity
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
    history: Optional[jax.Array] = None,  # unused; API parity
) -> jax.Array:
    del temporal, item_dept, item_cat, candidate_attention, history
    dtype = jnp.dtype(cfg.compute_dtype)
    B, S = item_ids.shape

    u_gmf = embedding_lookup(params["gmf_user"], user_ids)[:, None, :]
    i_gmf = embedding_lookup(params["gmf_item"], item_ids)
    gmf_vec = u_gmf * i_gmf                                          # [B, S, dmf]

    u_mlp = jnp.broadcast_to(
        embedding_lookup(params["mlp_user"], user_ids)[:, None, :],
        (B, S, cfg.mlp_dim))
    i_mlp = embedding_lookup(params["mlp_item"], item_ids)
    mlp_in = jnp.concatenate([u_mlp, i_mlp], axis=-1).astype(dtype)
    mlp_vec = mlp_tower(params["mlp"], mlp_in, cfg.dropout, rng,
                        deterministic, dtype)

    fused = jnp.concatenate(
        [gmf_vec.astype(jnp.float32), mlp_vec.astype(jnp.float32)], axis=-1)
    return dense(params["out"], fused)[..., 0]


def get_user_embeddings(params: Params, user_ids: jax.Array):
    """Embedding export surface (API parity with AdvancedNCF): the GMF
    half doubles as the 'mf' vector, the MLP half as 'mlp'."""
    return {
        "mf": embedding_lookup(params["gmf_user"], user_ids),
        "mlp": embedding_lookup(params["mlp_user"], user_ids),
    }


def get_product_embeddings(params: Params, cfg: ModelConfig,
                           item_ids: jax.Array,
                           item_dept=None, item_cat=None):
    return {
        "mf": embedding_lookup(params["gmf_item"], item_ids),
        "mlp": embedding_lookup(params["mlp_item"], item_ids),
    }


def score_candidates(
    params: Params,
    cfg: ModelConfig,
    user_ids: jax.Array,
    cand_items: jax.Array,
    temporal: Optional[Dict[str, jax.Array]] = None,
    item_dept: Optional[jax.Array] = None,
    item_cat: Optional[jax.Array] = None,
    history: Optional[jax.Array] = None,
) -> jax.Array:
    return apply(params, cfg, user_ids, cand_items, temporal,
                 item_dept, item_cat, deterministic=True)
