"""Optimizer construction: Adam + L2 weight decay + grad clipping + schedules.

Matches the reference's torch ``Adam(lr, weight_decay)`` semantics
(reference: src/model/trainer.py:71-75) — torch's ``weight_decay`` adds
``wd * param`` to the *gradient before* the Adam moments (classic L2, not
decoupled AdamW), reproduced here by ordering ``add_decayed_weights``
before ``scale_by_adam``.  Optional global-norm clipping reproduces
``clip_grad_norm_`` (trainer.py:279-283, config gradient_clip 5.0) and the
LR schedule slot reproduces the optional scheduler (trainer.py:516-523).

Memory-efficient embedding optimizers (``cfg.train.embedding_optimizer``):
the reference's scale story relies on torchrec/fbgemm *fused* table
optimizers (reference Dockerfile:24-28 installs torchrec==0.8.0 /
fbgemm-gpu==0.8.0; DistributedModelParallel, trainer.py:85-88), whose
default for large tables is ROWWISE_ADAGRAD — one fp32 accumulator
*per row* instead of two fp32 moments *per element*.  Full Adam costs
8 bytes/param of state on top of the 4-byte param (3x table memory);
rowwise Adagrad costs 4/d bytes/param (~1.03x at d=128), which is what
makes 10M+-entity vocabularies trainable on one chip.  ``bf16_adam``
is the halfway point: Adam semantics with both moments stored bf16
(2x state memory instead of 3x).  Dense (non-table) params always use
full Adam — they are tiny.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ncf_tpu.parallel.mesh import EMBEDDING_TABLE_KEYS
from ncf_tpu.utils.config import TrainConfig

EMBEDDING_OPTIMIZERS = ("adam", "rowwise_adagrad", "bf16_adam",
                        "partial_rowwise_adam")


def _path_name(path) -> str:
    return ".".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def embedding_labels(tree: Any):
    """Label every leaf 'embedding' (row-shardable table) or 'dense'.

    Uses the same path rules as the mesh sharding specs
    (parallel/mesh.py::param_spec) so the set of params the optimizer
    treats as tables is exactly the set the mesh row-shards."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: (
            "embedding"
            if any(k in _path_name(path) for k in EMBEDDING_TABLE_KEYS)
            else "dense"),
        tree)


class ScaleByRowwiseAdagradState(NamedTuple):
    sum_sq: Any  # per-table fp32 [rows] accumulators


def scale_by_rowwise_adagrad(
    eps: float = 1e-8, initial_accumulator: float = 0.0
) -> optax.GradientTransformation:
    """Rowwise Adagrad (fbgemm/torchrec ROWWISE_ADAGRAD semantics): the
    accumulator is the running sum of the *row-mean* squared gradient,
    one fp32 scalar per embedding row; update = g / (sqrt(G_row) + eps).

    State is d-times smaller than elementwise Adagrad and 2d-times
    smaller than Adam moments.  The accumulator leaf keeps the row axis,
    so under a row-sharded mesh it shards with its table (P('ici',))."""

    def init_fn(params):
        return ScaleByRowwiseAdagradState(
            sum_sq=jax.tree.map(
                lambda p: jnp.full(p.shape[:1], initial_accumulator,
                                   jnp.float32),
                params))

    def update_fn(updates, state, params=None):
        del params

        def new_sum(s, g):
            g32 = g.astype(jnp.float32)
            axes = tuple(range(1, g32.ndim))
            return s + jnp.mean(jnp.square(g32), axis=axes)

        sum_sq = jax.tree.map(new_sum, state.sum_sq, updates)

        def scale(g, s):
            denom = jnp.sqrt(s) + eps
            denom = denom.reshape(denom.shape + (1,) * (g.ndim - 1))
            # keep the incoming grad dtype: with the bf16 scatter path the
            # whole [V, d] grad -> update -> apply chain then stays bf16
            # (one 2-byte transient per table instead of two 4-byte ones —
            # what lets ~16M fused-table rows fit one 16 GB chip)
            return (g.astype(jnp.float32) / denom).astype(g.dtype)

        return (jax.tree.map(scale, updates, sum_sq),
                ScaleByRowwiseAdagradState(sum_sq=sum_sq))

    return optax.GradientTransformation(init_fn, update_fn)


class ScaleByPartialRowwiseAdamState(NamedTuple):
    count: jax.Array
    mu: Any       # per-element f32 first moment
    nu_row: Any   # per-ROW f32 second moment


def scale_by_partial_rowwise_adam(
    b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
) -> optax.GradientTransformation:
    """fbgemm PARTIAL_ROWWISE_ADAM semantics: full per-element first
    moment (momentum matters for quality) but a per-ROW second moment
    (the adaptive scale varies little across a row's dimensions).  State
    = 4 + 4/d bytes/param — half of full Adam — while keeping Adam's
    momentum + bias correction."""

    def init_fn(params):
        return ScaleByPartialRowwiseAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32),
                            params),
            nu_row=jax.tree.map(
                lambda p: jnp.zeros(p.shape[:1], jnp.float32), params))

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        mu = jax.tree.map(
            lambda m, g: b1 * m + (1 - b1) * g.astype(jnp.float32),
            state.mu, updates)

        def new_nu(v, g):
            g32 = g.astype(jnp.float32)
            axes = tuple(range(1, g32.ndim))
            return b2 * v + (1 - b2) * jnp.mean(jnp.square(g32), axis=axes)

        nu_row = jax.tree.map(new_nu, state.nu_row, updates)
        c1 = 1 - b1 ** count.astype(jnp.float32)
        c2 = 1 - b2 ** count.astype(jnp.float32)

        def scale(m, v, g):
            denom = jnp.sqrt(v / c2) + eps
            denom = denom.reshape(denom.shape + (1,) * (m.ndim - 1))
            return ((m / c1) / denom).astype(g.dtype)

        out = jax.tree.map(scale, mu, nu_row, updates)
        return out, ScaleByPartialRowwiseAdamState(
            count=count, mu=mu, nu_row=nu_row)

    return optax.GradientTransformation(init_fn, update_fn)


class ScaleByAdamCompactState(NamedTuple):
    count: jax.Array
    mu: Any
    nu: Any


def scale_by_adam_compact(
    b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
    state_dtype=jnp.bfloat16,
) -> optax.GradientTransformation:
    """Adam with BOTH moments stored in ``state_dtype`` (bf16): all
    arithmetic runs in fp32, only the carried state is rounded — the
    same trick fbgemm's partial-precision optimizer states use.  Halves
    embedding-state HBM vs optax ``scale_by_adam`` (whose ``mu_dtype``
    only covers the first moment)."""

    def init_fn(params):
        z = lambda p: jnp.zeros(p.shape, state_dtype)
        return ScaleByAdamCompactState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(z, params),
            nu=jax.tree.map(z, params))

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        mu32 = jax.tree.map(
            lambda m, g: b1 * m.astype(jnp.float32)
            + (1 - b1) * g.astype(jnp.float32),
            state.mu, updates)
        nu32 = jax.tree.map(
            lambda v, g: b2 * v.astype(jnp.float32)
            + (1 - b2) * jnp.square(g.astype(jnp.float32)),
            state.nu, updates)
        c1 = 1 - b1 ** count.astype(jnp.float32)
        c2 = 1 - b2 ** count.astype(jnp.float32)
        out = jax.tree.map(
            lambda m, v: (m / c1) / (jnp.sqrt(v / c2) + eps), mu32, nu32)
        cast = lambda t: jax.tree.map(
            lambda x: x.astype(state_dtype), t)
        return out, ScaleByAdamCompactState(
            count=count, mu=cast(mu32), nu=cast(nu32))

    return optax.GradientTransformation(init_fn, update_fn)


def make_schedule(cfg: TrainConfig, steps_per_epoch: int) -> optax.Schedule:
    total = max(1, cfg.num_epochs * steps_per_epoch)
    if cfg.lr_schedule == "cosine":
        warmup = cfg.warmup_steps
        if warmup > 0:
            return optax.warmup_cosine_decay_schedule(
                0.0, cfg.learning_rate, warmup, total)
        return optax.cosine_decay_schedule(cfg.learning_rate, total)
    if cfg.lr_schedule == "constant":
        return optax.constant_schedule(cfg.learning_rate)
    raise ValueError(f"unknown lr_schedule {cfg.lr_schedule!r}")


def make_optimizer(
    cfg: TrainConfig, steps_per_epoch: int = 1000
) -> optax.GradientTransformation:
    schedule = make_schedule(cfg, steps_per_epoch)
    emb_opt = getattr(cfg, "embedding_optimizer", "adam")
    if emb_opt not in EMBEDDING_OPTIMIZERS:
        raise ValueError(
            f"unknown embedding_optimizer {emb_opt!r}; "
            f"use one of {EMBEDDING_OPTIMIZERS}")
    emb_lr = getattr(cfg, "embedding_learning_rate", 0.0) or 0.0
    chain = []
    if cfg.gradient_clip_norm and cfg.gradient_clip_norm > 0:
        chain.append(optax.clip_by_global_norm(cfg.gradient_clip_norm))
    if cfg.weight_decay and cfg.weight_decay > 0:
        # L2-into-Adam (torch Adam weight_decay), not decoupled AdamW
        wd = optax.add_decayed_weights(cfg.weight_decay)
        if emb_opt != "adam":
            # memory-efficient table modes decay DENSE params only
            # (fbgemm fused-optimizer default: table weight_decay off) —
            # also keeps the table grad transient in the scatter dtype
            # instead of promoting the whole [V, d] buffer to f32
            wd = optax.masked(
                wd,
                lambda params: jax.tree.map(
                    lambda l: l == "dense", embedding_labels(params)))
        chain.append(wd)
    if emb_opt == "adam" and not emb_lr:
        chain.append(optax.scale_by_adam())
    else:
        if emb_opt == "rowwise_adagrad":
            emb_tx = scale_by_rowwise_adagrad(
                eps=getattr(cfg, "embedding_adagrad_eps", 1e-8),
                initial_accumulator=getattr(
                    cfg, "embedding_adagrad_init", 0.0))
        else:
            emb_tx = {"adam": optax.scale_by_adam,
                      "bf16_adam": scale_by_adam_compact,
                      "partial_rowwise_adam":
                          scale_by_partial_rowwise_adam}[emb_opt]()
        ewd = getattr(cfg, "embedding_weight_decay", 0.0) or 0.0
        if ewd > 0:
            # explicit table L2 (matches the full-Adam baseline's
            # regularization; fbgemm's default is none)
            emb_tx = optax.chain(optax.add_decayed_weights(ewd), emb_tx)
        if emb_lr:
            # relative factor on top of the shared schedule below, so the
            # schedule's shape (warmup/cosine) still applies to tables
            emb_tx = optax.chain(
                emb_tx, optax.scale(emb_lr / cfg.learning_rate))
        chain.append(optax.multi_transform(
            {"dense": optax.scale_by_adam(), "embedding": emb_tx},
            embedding_labels))
    chain.append(optax.scale_by_learning_rate(schedule))
    return optax.chain(*chain)
