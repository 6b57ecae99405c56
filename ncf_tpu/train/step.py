"""Jitted training and validation steps.

The reference's hot loop is spread across DataLoader workers, a Python
collate, host->device copies, forward, backward and the optimizer step
(reference: src/model/trainer.py:216-337; SURVEY.md §3.1).  Here the
entire per-batch computation — device-side negative sampling, forward,
BCE-with-logits loss, backward, gradient clip, Adam update, batch stats —
is ONE jitted function with donated params/optimizer state, so XLA fuses
it into a single executable and the host only feeds int32 id batches.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from ncf_tpu.data.sampler import sample_negatives, sample_negatives_stratified
from ncf_tpu.evals.metrics import accuracy_stats
from ncf_tpu.utils.config import Config


def bce_loss(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Sigmoid BCE with logits (the stable form of the reference's
    Sigmoid + nn.BCELoss, trainer.py:78)."""
    return optax.sigmoid_binary_cross_entropy(logits, targets).mean()


def bpr_loss(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Bayesian Personalized Ranking: -log sigmoid(pos - neg) averaged
    over each interaction's (positive, negative) pairs.  Column 0 is the
    positive (the framework's slot layout); the BPR half of the
    'BPR/BCE training loop' in BASELINE.json's north star."""
    del targets  # layout-implied: positive at column 0
    pos = logits[:, :1]
    neg = logits[:, 1:]
    return jax.nn.softplus(-(pos - neg)).mean()


def make_loss(name: str):
    if name == "bce":
        return bce_loss
    if name == "bpr":
        return bpr_loss
    raise ValueError(f"unknown loss {name!r}; use 'bce' or 'bpr'")


def _const_args(neg_cdf, item_dept, item_cat, user_history):
    """Bundle the step's read-only device arrays into a pytree that is
    passed as a CALL-TIME jit argument rather than captured by closure.

    Closure-captured arrays become XLA graph constants, and on TPU every
    kernel consuming a graph constant re-stages it per scan iteration
    (profiled: ~0.2-0.45 ms per constant operand per step on v5e under
    this runtime — the f32[3706] copy-start storms in the step profile).
    Passing the same arrays as jit parameters makes them ordinary HBM
    buffers: measured 1.91 -> 0.13 ms/step at batch 16384, bit-identical
    outputs."""
    return {k: v for k, v in (("neg_cdf", neg_cdf),
                              ("item_dept", item_dept),
                              ("item_cat", item_cat),
                              ("user_history", user_history))
            if v is not None}


def _make_loss_fn(model, cfg: Config):
    mcfg = cfg.model
    S = 1 + mcfg.negative_samples
    loss_impl = make_loss(cfg.train.loss)
    joint = mcfg.candidate_mode == "joint"

    stratified = cfg.train.negative_sampling == "stratified"

    def loss_fn(params, batch, rng, consts):
        rng_neg, rng_drop = jax.random.split(rng)
        pos = batch["item_ids"]
        neg_cdf = consts.get("neg_cdf")
        if stratified:
            negs = sample_negatives_stratified(
                rng_neg, pos, mcfg.num_items, mcfg.negative_samples,
                cdf=neg_cdf)
        else:
            negs = sample_negatives(
                rng_neg, pos, mcfg.num_items, mcfg.negative_samples,
                cdf=neg_cdf)
        items = jnp.concatenate([pos[:, None], negs], axis=1)       # [B, S]
        temporal = {k: batch[k] for k in ("hour", "day", "month", "day_of_year")
                    if k in batch} or None
        history = None
        if "history" in batch:
            # strictly-causal per-example prefix contexts shipped in the
            # batch (Interactions.causal_history; cfg.model.causal_history)
            # — the positive is never in its own prefix by construction
            history = batch["history"]
        elif "user_history" in consts:
            # static per-user context table (train split); the current
            # positive is masked out of its own context, but items the
            # user bought AFTER this example remain visible — the same
            # approximation the reference's last-50 feature pipeline
            # makes (features.py:74).  cfg.model.causal_history=True
            # switches to exact per-example prefixes.
            history = jnp.take(consts["user_history"], batch["user_ids"],
                               axis=0)
            history = jnp.where(history == pos[:, None], -1, history)
        logits = model.apply(
            params, mcfg, batch["user_ids"], items, temporal,
            consts.get("item_dept"), consts.get("item_cat"),
            candidate_attention=joint, deterministic=False, rng=rng_drop,
            history=history)
        targets = jnp.zeros((pos.shape[0], S), jnp.float32).at[:, 0].set(1.0)
        return loss_impl(logits, targets), (logits, targets)

    return loss_fn


def make_train_step(
    model,
    cfg: Config,
    optimizer: optax.GradientTransformation,
    neg_cdf: Optional[jax.Array] = None,  # [num_items] sampling CDF (make_sampling_cdf)
    item_dept: Optional[jax.Array] = None,
    item_cat: Optional[jax.Array] = None,
    user_history: Optional[jax.Array] = None,  # int32 [U, H] padded -1
) -> Callable:
    """Returns jitted ``train_step(params, opt_state, rng, batch) ->
    (params, opt_state, rng, metrics)``.

    ``batch``: {user_ids[B], item_ids[B] (positives), hour, day, month,
    day_of_year — each int32 [B]}.  Negatives are sampled on device from
    the inverse-popularity distribution (data_prep.py:94-161 equivalents).
    Params and optimizer state are donated: the update happens in place.
    """
    loss_fn = _make_loss_fn(model, cfg)
    consts = _const_args(neg_cdf, item_dept, item_cat, user_history)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def _step(params, opt_state, rng, batch, consts):
        rng, step_rng = jax.random.split(rng)
        (loss, (logits, targets)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch, step_rng, consts)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = {"loss": loss, **accuracy_stats(logits, targets)}
        return params, opt_state, rng, metrics

    def train_step(params, opt_state, rng, batch):
        return _step(params, opt_state, rng, batch, consts)

    return train_step


def make_multi_train_step(
    model,
    cfg: Config,
    optimizer: optax.GradientTransformation,
    neg_cdf: Optional[jax.Array] = None,
    item_dept: Optional[jax.Array] = None,
    item_cat: Optional[jax.Array] = None,
    user_history: Optional[jax.Array] = None,
) -> Callable:
    """K optimizer steps per dispatch: ``multi_step(params, opt_state,
    rng, batches)`` where every array in ``batches`` is stacked [K, B].

    A ``lax.scan`` over the single-step body amortizes per-dispatch host
    latency (measured ~0.5-0.7 ms/call under remote-tunnel setups; still
    ~50-100 us locally) across K steps — the TPU-native replacement for
    the reference's per-batch Python loop (trainer.py:234).  Returned
    metrics are means over the K steps.
    """
    loss_fn = _make_loss_fn(model, cfg)
    consts = _const_args(neg_cdf, item_dept, item_cat, user_history)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def _multi_step(params, opt_state, rng, batches, consts):
        def body(carry, batch):
            params, opt_state, rng = carry
            rng, step_rng = jax.random.split(rng)
            (loss, (logits, targets)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, batch, step_rng, consts)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            metrics = {"loss": loss, **accuracy_stats(logits, targets)}
            return (params, opt_state, rng), metrics

        (params, opt_state, rng), ms = jax.lax.scan(
            body, (params, opt_state, rng), batches)
        metrics = jax.tree_util.tree_map(lambda x: x.mean(), ms)
        return params, opt_state, rng, metrics

    def multi_train_step(params, opt_state, rng, batches):
        return _multi_step(params, opt_state, rng, batches, consts)

    return multi_train_step


TABLE_KEYS = ("user_emb", "item_emb")


def sparse_mode_available(cfg: Config, mesh=None) -> bool:
    """Whether the sparse-table-update path applies (train/sparse.py +
    train/sparse_sharded.py — the fbgemm fused-sparse-optimizer
    equivalent, single-device or composed with row-sharded tables under
    a mesh the way torchrec runs fused optimizers under
    DistributedModelParallel, reference trainer.py:85-88):
    rowwise-Adagrad tables, AdvancedNCF in the big-vocab
    (precompute-OFF) regime; the sequence path composes (history rows
    inject like candidate rows) except strictly-causal per-example
    contexts (whose [N, H] host table is infeasible at this scale
    anyway).  Under a mesh, both tables must
    divide the 'ici' axis and the batch must divide the device count
    (the static-shape requirements of the all-to-all grad routing)."""
    m, t = cfg.model, cfg.train
    entities = m.num_users + m.num_items
    base = (
        t.embedding_optimizer == "rowwise_adagrad"
        and m.name == "advanced_ncf"
        and not (m.use_sequence and m.causal_history)
        and entities > 4 * t.batch_size * (1 + m.negative_samples))
    if not base or mesh is None:
        return base
    from ncf_tpu.parallel.mesh import DCN_AXIS, ICI_AXIS

    E = int(mesh.shape[ICI_AXIS])
    G = int(mesh.shape.get(DCN_AXIS, 1))
    return (
        getattr(cfg.mesh, "shard_embeddings", True)
        and m.num_users % E == 0
        and m.num_items % E == 0
        and t.batch_size % (E * G) == 0)


def init_sparse_opt_state(dense_optimizer, params):
    """Opt state for the sparse path: dense optax state + per-table
    rowwise accumulators + the schedule step count."""
    dense = {k: v for k, v in params.items() if k not in TABLE_KEYS}
    return {
        "dense": dense_optimizer.init(dense),
        "user_acc": jnp.zeros(params["user_emb"].shape[0], jnp.float32),
        "item_acc": jnp.zeros(params["item_emb"].shape[0], jnp.float32),
        "count": jnp.zeros([], jnp.int32),
    }


def _make_sparse_body(model, cfg: Config, dense_optimizer, schedule,
                      mesh=None):
    """Shared single-step body for the sparse-table-update path.

    ``mesh=None``: tables are single-device; duplicates combine locally.
    With a mesh, tables are row-sharded P('ici', None) and grads route
    to owner shards via the all-to-all schedule
    (train/sparse_sharded.py) — the fused-sparse-under-DMP composition.
    """
    from ncf_tpu.train.sparse import (combine_duplicate_rows,
                                      sparse_rowwise_adagrad_apply)

    mcfg, tcfg = cfg.model, cfg.train
    S = 1 + mcfg.negative_samples
    loss_impl = make_loss(tcfg.loss)
    joint = mcfg.candidate_mode == "joint"
    stratified = tcfg.negative_sampling == "stratified"
    clip = tcfg.gradient_clip_norm or 0.0
    emb_scale = ((tcfg.embedding_learning_rate / tcfg.learning_rate)
                 if tcfg.embedding_learning_rate else 1.0)
    ewd = getattr(tcfg, "embedding_weight_decay", 0.0) or 0.0
    eps = getattr(tcfg, "embedding_adagrad_eps", 1e-8)
    sharded = False
    if mesh is not None:
        from ncf_tpu.parallel.mesh import ICI_AXIS

        sharded = int(mesh.shape[ICI_AXIS]) > 1

    def _gather(table, ids):
        if sharded:
            # explicit all-to-all lookup (no autodiff needed: the rows
            # re-enter the loss as arguments); jnp.take on a 16M-row
            # sharded table would all-gather the whole table
            from ncf_tpu.parallel.embedding_sharding import exchange_lookup

            return exchange_lookup(mesh, table, ids)
        return jnp.take(table, ids, axis=0)

    def body(params, opt_state, rng, batch, consts):
        tables = {k: params[k] for k in TABLE_KEYS}
        dense = {k: v for k, v in params.items() if k not in TABLE_KEYS}
        rng, step_rng = jax.random.split(rng)
        # mirror _make_loss_fn's rng structure exactly so the sparse and
        # dense paths draw identical negatives + dropout masks
        rng_neg, rng_drop = jax.random.split(step_rng)
        pos = batch["item_ids"]
        sample = (sample_negatives_stratified if stratified
                  else sample_negatives)
        negs = sample(rng_neg, pos, mcfg.num_items, mcfg.negative_samples,
                      cdf=consts.get("neg_cdf"))
        items = jnp.concatenate([pos[:, None], negs], axis=1)     # [B, S]
        temporal = {k: batch[k] for k in ("hour", "day", "month",
                                          "day_of_year") if k in batch} or None

        user_rows = _gather(tables["user_emb"], batch["user_ids"])
        item_rows = _gather(tables["item_emb"], items.reshape(-1)).reshape(
            items.shape + (-1,))

        # sequence path composed with sparse updates: history item rows
        # are gathered OUTSIDE the loss like the candidate rows, their
        # [B, H, 2d] grads concat onto the item-occurrence grads, and
        # the duplicate-combine + scatter treats them as more touched
        # rows of the same table (same mechanism the reference gets
        # from fbgemm for every lookup of a table)
        history = None
        h_ids = None
        history_rows = None
        if mcfg.use_sequence and "user_history" in consts:
            history = jnp.take(consts["user_history"], batch["user_ids"],
                               axis=0)
            # exclude each positive from its own context (mirrors the
            # dense step's _make_loss_fn history handling exactly)
            history = jnp.where(history == pos[:, None], -1, history)
            hmask = history >= 0
            # padded slots alias the batch's POSITIVE row (already
            # touched) with exactly-zero grads, so padding never adds
            # spurious touched rows (row-0 would otherwise receive
            # touched-row weight decay it never earned)
            h_ids = jnp.where(hmask, history, pos[:, None]).reshape(-1)
            history_rows = _gather(tables["item_emb"], h_ids).reshape(
                history.shape + (-1,))

        def loss_fn(dense_p, u_rows, i_rows, h_rows):
            logits = model.apply(
                dense_p, mcfg, batch["user_ids"], items, temporal,
                consts.get("item_dept"), consts.get("item_cat"),
                candidate_attention=joint, deterministic=False,
                rng=rng_drop, history=history,
                user_rows=u_rows, item_rows=i_rows, history_rows=h_rows)
            targets = jnp.zeros((pos.shape[0], S),
                                jnp.float32).at[:, 0].set(1.0)
            return loss_impl(logits, targets), (logits, targets)

        (loss, (logits, targets)), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2, 3), has_aux=True)(
            dense, user_rows, item_rows, history_rows)
        g_dense, g_u, g_i, g_h = grads
        g_i = g_i.reshape(-1, g_i.shape[-1])
        item_upd_ids = items.reshape(-1)
        if history_rows is not None:
            # masked slots carry exactly-zero cotangents (the attention
            # masks them out of scores and values)
            g_i = jnp.concatenate(
                [g_i, g_h.reshape(-1, g_h.shape[-1])], axis=0)
            item_upd_ids = jnp.concatenate([item_upd_ids, h_ids])
        # optax.scale_by_schedule evaluates at the PRE-increment count
        lr_t = schedule(opt_state["count"]) * emb_scale

        if sharded:
            from ncf_tpu.train.sparse_sharded import (
                sharded_sparse_rowwise_adagrad_update)

            dense_sq = (optax.global_norm(g_dense) ** 2 if clip > 0
                        else None)
            (u_tab, i_tab), (u_acc, i_acc), gscale = (
                sharded_sparse_rowwise_adagrad_update(
                    mesh,
                    [tables["user_emb"], tables["item_emb"]],
                    [opt_state["user_acc"], opt_state["item_acc"]],
                    [batch["user_ids"], item_upd_ids],
                    [g_u, g_i], lr_t, eps, ewd,
                    clip=clip, dense_sq=dense_sq))
            if clip > 0:
                g_dense = jax.tree.map(
                    lambda x: x * gscale.astype(x.dtype), g_dense)
        else:
            # combine duplicate occurrences FIRST so the clip norm is
            # taken over per-unique-row totals — exactly the dense
            # path's table-gradient norm (sum|g|^2 over occurrences
            # would over-count duplicates)
            u_rep, u_tot = combine_duplicate_rows(
                batch["user_ids"], g_u, tables["user_emb"].shape[0])
            i_rep, i_tot = combine_duplicate_rows(
                item_upd_ids, g_i, tables["item_emb"].shape[0])
            if clip > 0:
                gnorm = optax.global_norm((g_dense, u_tot, i_tot))
                trigger = jnp.minimum(clip / gnorm, 1.0)
                g_dense = jax.tree.map(
                    lambda x: x * trigger.astype(x.dtype), g_dense)
                u_tot = u_tot * trigger
                i_tot = i_tot * trigger
            u_tab, u_acc = sparse_rowwise_adagrad_apply(
                tables["user_emb"], opt_state["user_acc"], u_rep, u_tot,
                lr_t, eps, ewd)
            i_tab, i_acc = sparse_rowwise_adagrad_apply(
                tables["item_emb"], opt_state["item_acc"], i_rep, i_tot,
                lr_t, eps, ewd)

        updates, dense_state = dense_optimizer.update(
            g_dense, opt_state["dense"], dense)
        dense = optax.apply_updates(dense, updates)
        params = {**dense, "user_emb": u_tab, "item_emb": i_tab}
        opt_state = {"dense": dense_state, "user_acc": u_acc,
                     "item_acc": i_acc, "count": opt_state["count"] + 1}
        metrics = {"loss": loss, **accuracy_stats(logits, targets)}
        return params, opt_state, rng, metrics

    return body


def make_sparse_train_step(
    model, cfg: Config, dense_optimizer, schedule,
    neg_cdf=None, item_dept=None, item_cat=None, mesh=None,
    user_history=None,
) -> Callable:
    """Sparse-table-update train step (same call contract as
    ``make_train_step``): table grads stay [N, 2d] row grads, tables and
    accumulators update by scatter on the donated buffers — per-step HBM
    traffic is O(batch), not O(vocab).  With a mesh, tables/accumulators
    are row-sharded and updates route via all-to-all
    (train/sparse_sharded.py)."""
    body = _make_sparse_body(model, cfg, dense_optimizer, schedule, mesh)
    consts = _const_args(neg_cdf, item_dept, item_cat, user_history)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def _step(params, opt_state, rng, batch, consts):
        return body(params, opt_state, rng, batch, consts)

    def train_step(params, opt_state, rng, batch):
        return _step(params, opt_state, rng, batch, consts)

    return train_step


def make_sparse_multi_train_step(
    model, cfg: Config, dense_optimizer, schedule,
    neg_cdf=None, item_dept=None, item_cat=None, mesh=None,
    user_history=None,
) -> Callable:
    """K sparse steps per dispatch via lax.scan (multi-step contract of
    ``make_multi_train_step``)."""
    body = _make_sparse_body(model, cfg, dense_optimizer, schedule, mesh)
    consts = _const_args(neg_cdf, item_dept, item_cat, user_history)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def _multi(params, opt_state, rng, batches, consts):
        def scan_body(carry, batch):
            params, opt_state, rng = carry
            params, opt_state, rng, metrics = body(
                params, opt_state, rng, batch, consts)
            return (params, opt_state, rng), metrics

        (params, opt_state, rng), ms = jax.lax.scan(
            scan_body, (params, opt_state, rng), batches)
        metrics = jax.tree_util.tree_map(lambda x: x.mean(), ms)
        return params, opt_state, rng, metrics

    def multi_train_step(params, opt_state, rng, batches):
        return _multi(params, opt_state, rng, batches, consts)

    return multi_train_step


def make_eval_step(
    model,
    cfg: Config,
    neg_cdf: Optional[jax.Array] = None,
    item_dept: Optional[jax.Array] = None,
    item_cat: Optional[jax.Array] = None,
    user_history: Optional[jax.Array] = None,
) -> Callable:
    """Validation loss on held-out interactions with freshly sampled
    negatives (reference ``validate``, trainer.py:350-410, minus its
    all-positive degeneracy): returns per-batch loss + accuracy stats."""
    mcfg = cfg.model
    S = 1 + mcfg.negative_samples
    loss_impl = make_loss(cfg.train.loss)
    joint = mcfg.candidate_mode == "joint"
    consts = _const_args(neg_cdf, item_dept, item_cat, user_history)

    @jax.jit
    def _eval(params, rng, batch, consts):
        rng, step_rng = jax.random.split(rng)
        pos = batch["item_ids"]
        negs = sample_negatives(
            step_rng, pos, mcfg.num_items, mcfg.negative_samples,
            cdf=consts.get("neg_cdf"))
        items = jnp.concatenate([pos[:, None], negs], axis=1)
        temporal = {k: batch[k] for k in ("hour", "day", "month", "day_of_year")
                    if k in batch} or None
        history = None
        if "user_history" in consts:
            history = jnp.take(consts["user_history"], batch["user_ids"],
                               axis=0)
            history = jnp.where(history == pos[:, None], -1, history)
        logits = model.apply(
            params, mcfg, batch["user_ids"], items, temporal,
            consts.get("item_dept"), consts.get("item_cat"),
            candidate_attention=joint, deterministic=True, history=history)
        targets = jnp.zeros((pos.shape[0], S), jnp.float32).at[:, 0].set(1.0)
        metrics = {"loss": loss_impl(logits, targets),
                   **accuracy_stats(logits, targets)}
        return rng, metrics

    def eval_step(params, rng, batch):
        return _eval(params, rng, batch, consts)

    return eval_step
