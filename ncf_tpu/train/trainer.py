"""Trainer: epoch loop, validation, early stopping, checkpoint/resume.

TPU-native re-design of the reference ``ModelTrainer``
(reference: src/model/trainer.py:27-622) and the ``src/train.py`` /
``src/model/task.py`` entrypoints.  Same capability surface —
``train`` / ``train_epoch`` / ``validate``, best-checkpoint tracking,
early stopping (patience 5), periodic + emergency checkpoints, resume —
but the per-batch work is one jitted step (ncf_tpu.train.step), validation
uses the corrected leave-one-out ranking protocol (SURVEY.md §2.9.9), and
resume discovery actually exists (fixes §2.9.2).
"""

from __future__ import annotations

import itertools
import logging
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ncf_tpu.data.interactions import Interactions
from ncf_tpu.data.pipeline import BatchIterator, prefetch_to_device
from ncf_tpu.data.sampler import make_sampling_cdf
from ncf_tpu.evals.evaluate import (
    DeviceEvaluator, EvalSet, sample_eval_users)
from ncf_tpu.models import get_model
from ncf_tpu.train import checkpoint as ckpt_lib
from ncf_tpu.train.optim import make_optimizer
from ncf_tpu.train.step import (make_eval_step, make_multi_train_step,
                                make_train_step)
from ncf_tpu.utils.config import Config
from ncf_tpu.utils.logging import MetricsLogger

log = logging.getLogger(__name__)


class Trainer:
    """End-to-end training driver for one model + dataset.

    Usage::

        trainer = Trainer(cfg, interactions)
        result = trainer.train()            # dict of best metrics
    """

    def __init__(
        self,
        cfg: Config,
        interactions: Interactions,
        mesh=None,
    ):
        cfg.validate()
        self.cfg = cfg
        self.model = get_model(cfg.model.name)
        self.mesh = mesh
        if mesh is not None and np.prod(list(mesh.shape.values())) > 1:
            # a bare pallas_call does not partition under pjit; the
            # fused tower runs inside shard_map over the batch axes
            # (param grads psum'd) when the model sees the mesh
            if cfg.model.fused_tower in ("auto", "on", "interpret"):
                cfg.model._tower_mesh = mesh

        # ---- data: time-split for val loss + leave-one-out for ranking
        self.full = interactions
        cfg.model.num_users = interactions.num_users
        cfg.model.num_items = interactions.num_items
        if interactions.item_dept is not None:
            cfg.model.num_departments = interactions.num_departments
            cfg.model.num_categories = interactions.num_categories

        train_inter, val_inter = interactions.time_split(cfg.data.validation_days)
        if len(val_inter) == 0 or len(train_inter) == 0:
            log.warning("degenerate time split; falling back to 90/10 by time order")
            n = len(interactions)
            mask = np.arange(n) < int(n * 0.9)
            train_inter, val_inter = interactions.select(mask), interactions.select(~mask)
        loo_train, eval_users, eval_items = interactions.leave_one_out()
        self.train_inter = train_inter
        self.val_inter = val_inter
        eval_users, eval_items = sample_eval_users(
            eval_users, eval_items, cfg.data.eval_user_sample,
            seed=cfg.train.seed + 777)
        self.eval_set = EvalSet.build(
            interactions, eval_users, eval_items,
            num_negatives=cfg.data.num_eval_negatives, seed=cfg.train.seed)
        self._device_eval = None  # DeviceEvaluator, built on first validate

        train_extra = None
        if cfg.model.use_sequence and cfg.model.causal_history:
            # strictly-causal per-example contexts (roadmap #5)
            train_extra = {"history": train_inter.causal_history(
                cfg.model.history_len)}
        self.train_iter = BatchIterator(
            train_inter, cfg.train.batch_size, seed=cfg.train.seed,
            extra_cols=train_extra)
        self.val_iter = BatchIterator(
            val_inter, cfg.train.batch_size, seed=cfg.train.seed, shuffle=False)

        # device-resident epoch pipeline (data/pipeline.py): per-epoch
        # host<->device traffic is one PRNG key instead of ~40 ms/dispatch
        # of NumPy batch assembly + tunnel transfer.  Mesh training keeps
        # the host path (per-process feeding + explicit batch sharding).
        self.device_pipeline = None
        if mesh is None and cfg.train.input_pipeline in ("auto", "device"):
            from ncf_tpu.data.pipeline import DeviceEpochPipeline

            pipe = DeviceEpochPipeline(
                train_inter, cfg.train.batch_size, seed=cfg.train.seed,
                extra_cols=train_extra)
            if (cfg.train.input_pipeline == "device"
                    or pipe.epoch_bytes() <= cfg.train.device_epoch_max_bytes):
                self.device_pipeline = pipe
            else:
                log.info(
                    "input_pipeline=auto: epoch (%d MB) exceeds "
                    "device_epoch_max_bytes; using the host pipeline",
                    pipe.epoch_bytes() >> 20)

        # ---- device constants
        w = train_inter.inverse_popularity_weights()
        self.neg_cdf = make_sampling_cdf(w)
        self.item_dept = (jnp.asarray(interactions.item_dept)
                          if interactions.item_dept is not None else None)
        self.item_cat = (jnp.asarray(interactions.item_cat)
                         if interactions.item_cat is not None else None)
        # optional sequence path: per-user recent-item context tables
        # (train split for training; leave-one-out split for ranking eval
        # so the held-out positive never appears in its own context)
        self.user_history = None
        self.eval_history = None
        if cfg.model.use_sequence:
            H = cfg.model.history_len
            self.user_history = jnp.asarray(train_inter.recent_history(H))
            self.eval_history = jnp.asarray(loo_train.recent_history(H))

        # ---- params / optimizer / steps
        key = jax.random.PRNGKey(cfg.train.seed)
        self.params = self.model.init(key, cfg.model)
        self.batch_shard = None
        from ncf_tpu.ops import embedding as embedding_ops

        # a prior Trainer in this process may have registered an explicit
        # exchange; routing is per-Trainer, so reset before (re)registering
        embedding_ops.clear_exchange()
        if mesh is not None:
            # embedding tables row-sharded over 'ici', dense replicated,
            # batch data-parallel over (dcn, ici) — SURVEY.md §2.8 layout.
            from ncf_tpu.parallel import (
                batch_sharding, param_shardings, replicated, shard_pytree)

            p_sh = param_shardings(self.params, mesh,
                                   cfg.mesh.shard_embeddings)
            self.params = shard_pytree(self.params, p_sh)
            if cfg.mesh.embedding_exchange == "explicit":
                # rows of every table that actually got P('ici', None):
                # lookups on those (and their vocab-precomputed derived
                # tables, same row counts) go through the explicit
                # all-to-all schedule instead of pjit-auto collectives
                flat = jax.tree_util.tree_leaves_with_path(
                    jax.tree_util.tree_map(lambda s: s.spec, p_sh))
                rows_flat = jax.tree_util.tree_leaves_with_path(self.params)
                self._exchange_rows = {
                    leaf.shape[0]
                    for (path, spec), (_, leaf) in zip(flat, rows_flat)
                    if spec and spec[0] is not None}
                self._register_exchange()
            self.batch_shard = batch_sharding(mesh)
            rep = replicated(mesh)
            self.neg_cdf = jax.device_put(self.neg_cdf, rep)
            if self.item_dept is not None:
                self.item_dept = jax.device_put(self.item_dept, rep)
                self.item_cat = jax.device_put(self.item_cat, rep)
        # sparse-table-update mode (train/sparse.py): rowwise-Adagrad
        # tables update by scatter on touched rows only — O(batch) HBM
        # traffic per step instead of O(vocab) (the fbgemm fused-sparse
        # path; measured 215k -> see BENCH_NOTES at 12M entities)
        from ncf_tpu.train.step import (
            init_sparse_opt_state, make_sparse_multi_train_step,
            make_sparse_train_step, sparse_mode_available)

        mode = getattr(cfg.train, "sparse_table_update", "auto")
        self.sparse_tables = (
            mode == "on"
            or (mode == "auto" and sparse_mode_available(cfg, mesh)))
        if self.sparse_tables and not sparse_mode_available(cfg, mesh):
            raise ValueError(
                "sparse_table_update=on requires rowwise_adagrad tables, "
                "advanced_ncf in the big-vocab regime (static-table "
                "history only — causal_history is incompatible); "
                "under a mesh: shard_embeddings with table rows divisible "
                "by ici and batch divisible by the device count")
        if self.sparse_tables:
            import dataclasses

            from ncf_tpu.train.optim import make_schedule

            # dense-only optax chain: the step clips the FULL grad set
            # itself, so the chain must not clip again
            dense_cfg = dataclasses.replace(
                cfg.train, gradient_clip_norm=0.0)
            self.optimizer = make_optimizer(dense_cfg, len(self.train_iter))
            self._sparse_schedule = make_schedule(
                cfg.train, len(self.train_iter))
            self.opt_state = init_sparse_opt_state(
                self.optimizer, self.params)
        else:
            self.optimizer = make_optimizer(cfg.train, len(self.train_iter))
            # init AFTER sharding: optax states are zeros_like(params) and
            # inherit each param's NamedSharding
            self.opt_state = self.optimizer.init(self.params)
        if mesh is not None:
            # rowwise-Adagrad accumulators ([rows] jnp.full, not
            # zeros_like) don't inherit table sharding — place the whole
            # state explicitly (no-op for leaves already placed right)
            from ncf_tpu.parallel import shard_pytree, state_shardings
            self.opt_state = shard_pytree(
                self.opt_state,
                state_shardings(self.opt_state, mesh,
                                cfg.mesh.shard_embeddings))
        self.rng = jax.random.PRNGKey(cfg.train.seed + 1)
        if mesh is not None:
            self.rng = jax.device_put(self.rng, replicated(mesh))

        from ncf_tpu.ops import embedding as embedding_ops

        embedding_ops.set_scatter_impl(
            *{"fast": ("fast", "bf16"),
              "exact": ("auto", "split"),
              "xla": ("xla", "split")}[cfg.train.embedding_scatter])

        if cfg.train.steps_per_dispatch == 0:
            if self.sparse_tables:
                # the autotune probe builds the dense-path steps; skip it
                log.info("sparse_table_update: steps_per_dispatch=8")
                cfg.train.steps_per_dispatch = 8
            else:
                # auto: measure per-dispatch overhead vs step time and
                # pick K (replaces the hard-coded K=8 in scale configs)
                cfg.train.steps_per_dispatch = self._autotune_dispatch()
        if self.sparse_tables:
            builder = (make_sparse_multi_train_step
                       if cfg.train.steps_per_dispatch > 1
                       else make_sparse_train_step)
            self.train_step = builder(
                self.model, cfg, self.optimizer, self._sparse_schedule,
                self.neg_cdf, self.item_dept, self.item_cat, mesh=mesh,
                user_history=self.user_history)
        elif cfg.train.steps_per_dispatch > 1:
            self.train_step = make_multi_train_step(
                self.model, cfg, self.optimizer, self.neg_cdf,
                self.item_dept, self.item_cat, self.user_history)
        else:
            self.train_step = make_train_step(
                self.model, cfg, self.optimizer, self.neg_cdf,
                self.item_dept, self.item_cat, self.user_history)
        self.eval_step = make_eval_step(
            self.model, cfg, self.neg_cdf, self.item_dept, self.item_cat,
            self.user_history)

        self.metrics_logger = MetricsLogger(cfg.train.metrics_file or None)
        self.global_step = 0
        self._resume_dispatch = 0
        self.start_epoch = 0
        self.best_val = float("inf")
        self.best_metrics: Dict[str, float] = {}

    def _autotune_dispatch(self) -> int:
        """Measure dispatch overhead on a real-shaped probe batch and pick
        steps_per_dispatch (train/autotune.py); training state untouched."""
        from ncf_tpu.train.autotune import choose_steps_per_dispatch

        cfg = self.cfg
        probe_np = next(iter(self.train_iter.epoch(0)))
        if self.batch_shard is not None:
            probe = {k: jax.device_put(jnp.asarray(v), self.batch_shard)
                     for k, v in probe_np.items()}
        else:
            probe = {k: jnp.asarray(v) for k, v in probe_np.items()}

        def stack_batch(batch, k):
            stacked = {key: np.stack([np.asarray(probe_np[key])] * k)
                       for key in batch}
            if self.batch_shard is not None:
                from ncf_tpu.parallel import stacked_batch_sharding

                sh = stacked_batch_sharding(self.batch_shard.mesh)
                return {key: jax.device_put(jnp.asarray(v), sh)
                        for key, v in stacked.items()}
            return {key: jnp.asarray(v) for key, v in stacked.items()}

        make_args = (self.model, cfg, self.optimizer, self.neg_cdf,
                     self.item_dept, self.item_cat, self.user_history)
        return choose_steps_per_dispatch(
            make_single=lambda: make_train_step(*make_args),
            make_multi=lambda: make_multi_train_step(*make_args),
            params=self.params, opt_state=self.opt_state, rng=self.rng,
            probe_batch=probe, stack_batch=stack_batch)

    # ------------------------------------------------------------ training

    def train_epoch(self, epoch: int) -> Dict[str, float]:
        """One epoch over the train split (reference trainer.py:216-337)."""
        cfg = self.cfg
        totals: Dict[str, float] = {}
        n_batches = 0
        t_epoch = time.perf_counter()
        t_window = t_epoch
        spd = cfg.train.steps_per_dispatch
        # mid-epoch resume: the epoch iterators are deterministic per
        # (seed, epoch), so continuing is exactly "skip the dispatches
        # already consumed" with the restored params/opt/rng
        skip = self._resume_dispatch
        self._resume_dispatch = 0
        if self.device_pipeline is not None:
            it = self.device_pipeline.epoch(epoch, steps_per_dispatch=spd)
            if skip:
                it = itertools.islice(it, skip, None)
        else:
            it = self.train_iter.epoch(epoch)
            shard = self.batch_shard
            if spd > 1:
                from ncf_tpu.data.pipeline import group_batches

                it = group_batches(it, spd)
                if shard is not None:
                    from ncf_tpu.parallel import stacked_batch_sharding

                    shard = stacked_batch_sharding(shard.mesh)
            if skip:  # before prefetch: skipped groups are never uploaded
                it = itertools.islice(it, skip, None)
            it = prefetch_to_device(it, sharding=shard)
        dispatch = skip
        every = cfg.train.checkpoint_every_dispatches
        for batch in it:
            k = next(iter(batch.values())).shape[0] if spd > 1 else 1
            self.params, self.opt_state, self.rng, metrics = self.train_step(
                self.params, self.opt_state, self.rng, batch)
            n_batches += k
            prev_window = self.global_step // cfg.train.log_every_steps
            self.global_step += k
            dispatch += 1
            if every > 0 and dispatch % every == 0:
                self.save_checkpoint(
                    epoch, {"mid_epoch": 1.0},
                    extra={"dispatch": dispatch, "in_epoch": True})
            if self.global_step // cfg.train.log_every_steps != prev_window:
                metrics = {k: float(v) for k, v in metrics.items()}
                dt = time.perf_counter() - t_window
                t_window = time.perf_counter()
                eps = cfg.train.log_every_steps * cfg.train.batch_size / max(dt, 1e-9)
                log.info(
                    "epoch %d step %d loss=%.4f acc=%.3f pos=%.3f neg=%.3f "
                    "examples/s=%.0f",
                    epoch, self.global_step, metrics["loss"], metrics["accuracy"],
                    metrics["pos_accuracy"], metrics["neg_accuracy"], eps)
                self.metrics_logger.write(
                    kind="train", epoch=epoch, step=self.global_step,
                    examples_per_s=eps, **metrics)
                for k, v in metrics.items():
                    totals[k] = totals.get(k, 0.0) + v
        # ensure device work finished before timing the epoch
        jax.block_until_ready(jax.tree_util.tree_leaves(self.params)[0])
        epoch_s = time.perf_counter() - t_epoch
        n_logged = max(1, n_batches // max(1, self.cfg.train.log_every_steps))
        out = {k: v / n_logged for k, v in totals.items()}
        out["epoch_seconds"] = epoch_s
        out["examples_per_s"] = n_batches * cfg.train.batch_size / max(epoch_s, 1e-9)
        return out

    def validate(self, epoch: int) -> Dict[str, float]:
        """Validation loss on the held-out time window + leave-one-out
        ranking metrics (the corrected protocol; reference
        trainer.py:350-410)."""
        totals: Dict[str, float] = {}
        n = 0
        rng = jax.random.PRNGKey(self.cfg.train.seed + 12345)  # fixed negs per run
        for batch in prefetch_to_device(self.val_iter.epoch(0),
                                        sharding=self.batch_shard):
            rng, metrics = self.eval_step(self.params, rng, batch)
            for k, v in metrics.items():
                totals[k] = totals.get(k, 0.0) + float(v)
            n += 1
        out = {f"val_{k}": v / max(1, n) for k, v in totals.items()}

        if self._device_eval is None:
            sharding = None
            if self.mesh is not None:
                from ncf_tpu.parallel import replicated
                sharding = replicated(self.mesh)
            if self.cfg.data.eval_protocol == "full":
                self._device_eval = self._build_full_evaluator(sharding)
            else:
                self._device_eval = DeviceEvaluator(
                    self.model, self.cfg.model, self.eval_set,
                    batch_size=self.cfg.data.eval_batch_size,
                    item_dept=self.item_dept, item_cat=self.item_cat,
                    user_history=self.eval_history, sharding=sharding)
        rank = self._device_eval(self.params)
        out.update(rank)
        self.metrics_logger.write(kind="val", epoch=epoch,
                                  step=self.global_step, **out)
        return out

    def _build_full_evaluator(self, sharding=None):
        """Exact full-catalog leave-one-out evaluator
        (``data.eval_protocol: full`` — evals/full_eval.py).  AdvancedNCF
        gets the decomposed blocked pass; other models fall back to
        naive whole-catalog scoring (fine at their vocab scales)."""
        from ncf_tpu.evals.full_eval import (FullCatalogEvaluator,
                                             full_ranks_naive,
                                             metrics_from_ranks)

        eval_users = np.asarray(self.eval_set.users)
        eval_items = np.asarray(self.eval_set.candidates[:, 0])
        if self.cfg.model.name == "advanced_ncf":
            return FullCatalogEvaluator(
                self.cfg.model, self.full, eval_users, eval_items,
                user_history=self.eval_history,
                item_dept=self.item_dept, item_cat=self.item_cat,
                user_block=self.cfg.data.full_eval_user_block,
                item_block=self.cfg.data.full_eval_item_block,
                sharding=sharding)

        model, cfg_m, full = self.model, self.cfg.model, self.full
        hist, dept, cat = self.eval_history, self.item_dept, self.item_cat

        def _naive_eval(params, ks=(1, 5, 10)):
            ranks = full_ranks_naive(
                model, params, cfg_m, full, eval_users, eval_items,
                user_history=hist, item_dept=dept, item_cat=cat)
            out = metrics_from_ranks(ranks, ks)
            out["eval_protocol_full"] = 1.0
            return out

        return _naive_eval

    def _register_exchange(self) -> None:
        """(Re)register this Trainer's explicit all-to-all exchange in
        the process-global routing table (ops.embedding)."""
        from ncf_tpu.ops import embedding as embedding_ops

        if getattr(self, "_exchange_rows", None):
            embedding_ops.set_exchange(
                self.mesh, self._exchange_rows,
                self.cfg.mesh.exchange_capacity_factor)
            log.info("explicit all-to-all embedding exchange on "
                     "for table rows %s", sorted(self._exchange_rows))

    def train(self, num_epochs: Optional[int] = None) -> Dict[str, float]:
        """Full loop with early stopping + best/periodic/emergency
        checkpoints (reference trainer.py:412-546)."""
        self._register_exchange()
        cfg = self.cfg
        num_epochs = num_epochs or cfg.train.num_epochs
        patience = cfg.train.early_stopping_patience
        metric = cfg.train.early_stopping_metric
        # val_loss is minimized (reference convention, trainer.py:478);
        # ranking metrics (hr@k / ndcg@k / mrr@k / map@k) are maximized
        maximize = metric != "val_loss"
        bad_epochs = 0
        try:
            for epoch in range(self.start_epoch, num_epochs):
                train_m = self.train_epoch(epoch)
                log.info("epoch %d done in %.1fs (%.0f examples/s)",
                         epoch, train_m["epoch_seconds"], train_m["examples_per_s"])
                if (epoch + 1) % cfg.train.eval_every_epochs == 0:
                    val_m = self.validate(epoch)
                    log.info(
                        "epoch %d val_loss=%.4f hr@10=%.4f ndcg@10=%.4f",
                        epoch, val_m["val_loss"], val_m["hr@10"], val_m["ndcg@10"])
                    ckpt_dir = self.save_checkpoint(epoch, val_m)
                    score = val_m[metric]
                    if maximize:
                        improved = score > -self.best_val
                    else:
                        improved = score < self.best_val
                    if improved:
                        # stored negated for maximized metrics so that
                        # "smaller best_val is better" stays invariant
                        self.best_val = -score if maximize else score
                        self.best_metrics = {**val_m, "epoch": epoch}
                        ckpt_lib.mark_best(cfg.train.checkpoint_dir, ckpt_dir)
                        bad_epochs = 0
                    else:
                        bad_epochs += 1
                        if bad_epochs >= patience:
                            log.info("early stopping at epoch %d (patience %d)",
                                     epoch, patience)
                            break
        except KeyboardInterrupt:
            raise
        except Exception:
            # emergency checkpoint (reference trainer.py:530-546)
            log.exception("training failed; writing emergency checkpoint")
            self.save_checkpoint(epoch=-1, metrics={"emergency": 1.0})
            raise
        finally:
            ckpt_lib.wait_for_pending()   # commit in-flight async saves
            # the explicit-exchange registry is process-global and keyed
            # only by table row count: left registered, any SERVING
            # lookup in this process whose table matches (e.g. the
            # scorer's user_emb) would be silently routed through
            # shard_map over the stale training mesh — pointless on one
            # host, a deadlock on many.  pjit-auto lookups still work
            # for in-training validate(); a post-train validate() falls
            # back to them too.
            from ncf_tpu.ops import embedding as embedding_ops

            embedding_ops.clear_exchange()
        if cfg.train.artifact_store and jax.process_index() == 0:
            # post-training artifact push (reference train.py:71-107)
            from ncf_tpu.utils.artifacts import push_training_artifacts

            job = cfg.train.job_name or f"run-{cfg.train.seed}"
            try:
                push_training_artifacts(
                    cfg.train.artifact_store, job,
                    checkpoint_dir=cfg.train.checkpoint_dir,
                    metrics_file=cfg.train.metrics_file or None)
            except Exception:
                log.exception("artifact push failed (training result kept)")
        return self.best_metrics or {"val_loss": self.best_val}

    # ---------------------------------------------------------- checkpoints

    def _state(self):
        # the device PRNG key is part of the training trajectory
        # (negatives + dropout); saving it is what makes mid-epoch resume
        # bit-for-bit
        return {"params": self.params, "opt_state": self.opt_state,
                "rng": self.rng}

    def save_checkpoint(self, epoch: int, metrics: Dict[str, float],
                        extra: Optional[Dict] = None) -> str:
        be = self.cfg.train.checkpoint_backend
        path = ckpt_lib.save(
            self.cfg.train.checkpoint_dir, self._state(),
            step=self.global_step, epoch=epoch,
            metrics={k: v for k, v in metrics.items() if isinstance(v, (int, float))},
            config=self.cfg.to_dict(),
            backend="orbax" if be.startswith("orbax") else "native",
            async_save=be == "orbax_async",
            extra=extra)
        # mid-epoch saves GC only other mid-epoch checkpoints: frequent
        # dispatch-interval saves must not cycle the epoch-boundary
        # checkpoints out of the shared retention budget
        ckpt_lib.garbage_collect(
            self.cfg.train.checkpoint_dir, self.cfg.train.keep_checkpoints,
            in_epoch_only=bool((extra or {}).get("in_epoch")))
        return path

    def resume(self, ckpt_dir: Optional[str] = None) -> bool:
        """Restore the latest (or given) checkpoint; returns True if resumed
        (the repaired trainer.py:450 path).  Mid-epoch checkpoints
        (extra.in_epoch) re-enter their epoch at the recorded dispatch."""
        ckpt_dir = ckpt_dir or ckpt_lib.find_latest(self.cfg.train.checkpoint_dir)
        if ckpt_dir is None:
            return False
        try:
            state, manifest = ckpt_lib.restore(ckpt_dir, self._state())
            self.rng = jnp.asarray(state["rng"])
        except Exception as err:    # noqa: BLE001 — see fallback below
            # pre-round-3 checkpoint without the rng leaf: restore the
            # rest, keep this run's fresh key (epoch-boundary semantics).
            # The native backend raises KeyError here, but orbax raises
            # its own structure-mismatch error types — so retry with the
            # rng-less template on ANY failure and only surface the
            # original error if that fallback fails too.
            try:
                state, manifest = ckpt_lib.restore(
                    ckpt_dir,
                    {"params": self.params, "opt_state": self.opt_state})
            except Exception:
                raise err
            log.warning("checkpoint has no rng key; resumed run will not "
                        "be bit-identical to an uninterrupted one")
        self.params, self.opt_state = state["params"], state["opt_state"]
        self.global_step = manifest["step"]
        extra = manifest.get("extra") or {}
        if extra.get("in_epoch"):
            self.start_epoch = manifest["epoch"]
            self._resume_dispatch = int(extra["dispatch"])
        else:
            self.start_epoch = manifest["epoch"] + 1
        saved_cfg = manifest.get("config", {})
        if saved_cfg and saved_cfg.get("model") != self.cfg.to_dict().get("model"):
            log.warning("checkpoint model config differs from current config")
        log.info("resumed from %s (epoch %d, step %d)",
                 ckpt_dir, manifest["epoch"], self.global_step)
        return True
