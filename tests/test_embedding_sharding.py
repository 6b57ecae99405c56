"""Tests for the explicit all-to-all sharded embedding exchange on the
8-device CPU mesh (SURVEY.md §4 plan (c): multi-host simulation without a
cluster)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ncf_tpu.parallel import make_mesh
from ncf_tpu.parallel.embedding_sharding import ShardedEmbedding


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(dcn=1, ici=8)


@pytest.fixture(scope="module")
def table_and_ids(mesh):
    rng = np.random.default_rng(0)
    N, D, n = 64, 16, 128
    table = jnp.asarray(rng.normal(size=(N, D)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, N, n), jnp.int32)
    emb = ShardedEmbedding(mesh, N, D)
    return emb, emb.shard(table), jax.device_put(
        ids, emb.batch_sharding), table, ids


class TestLookup:
    def test_matches_take(self, table_and_ids):
        emb, sharded, ids_s, table, ids = table_and_ids
        out = emb.lookup(sharded, ids_s)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(jnp.take(table, ids, axis=0)),
            rtol=1e-6)

    def test_jit_compatible(self, table_and_ids):
        emb, sharded, ids_s, table, ids = table_and_ids
        f = jax.jit(emb.lookup)
        out = f(sharded, ids_s)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(jnp.take(table, ids, axis=0)),
            rtol=1e-6)

    def test_skewed_ids_within_capacity(self, mesh):
        """All ids owned by one shard: capacity_factor must cover it."""
        N, D, n = 64, 8, 32
        table = jnp.asarray(np.random.default_rng(1).normal(size=(N, D)),
                            jnp.float32)
        emb = ShardedEmbedding(mesh, N, D, capacity_factor=8 * 1.0)
        # every id in shard 3's range [24, 32)
        ids = jnp.asarray(np.random.default_rng(2).integers(24, 32, n),
                          jnp.int32)
        out = emb.lookup(emb.shard(table),
                         jax.device_put(ids, emb.batch_sharding))
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(jnp.take(table, ids, axis=0)),
            rtol=1e-6)


class TestGradient:
    def test_grad_matches_dense(self, table_and_ids):
        emb, sharded, ids_s, table, ids = table_and_ids
        w = jnp.asarray(
            np.random.default_rng(3).normal(size=(len(ids), table.shape[1])),
            jnp.float32)
        w_s = jax.device_put(w, jax.sharding.NamedSharding(
            emb.mesh, jax.sharding.PartitionSpec("ici", None)))

        def loss_sharded(t):
            return (emb.lookup(t, ids_s) * w_s).sum()

        def loss_dense(t):
            return (jnp.take(t, ids, axis=0) * w).sum()

        g_sharded = jax.grad(loss_sharded)(sharded)
        g_dense = jax.grad(loss_dense)(table)
        np.testing.assert_allclose(np.asarray(g_sharded),
                                   np.asarray(g_dense), rtol=1e-5, atol=1e-6)

    def test_duplicate_ids_accumulate(self, mesh):
        N, D = 16, 8
        table = jnp.ones((N, D), jnp.float32)
        emb = ShardedEmbedding(mesh, N, D, capacity_factor=16.0)
        ids = jnp.asarray([5] * 8, jnp.int32)  # all the same id
        ids_s = jax.device_put(ids, emb.batch_sharding)

        def loss(t):
            return emb.lookup(t, ids_s).sum()

        g = jax.grad(loss)(emb.shard(table))
        g = np.asarray(g)
        assert g[5, 0] == pytest.approx(8.0)  # 8 occurrences accumulated
        assert g[4].sum() == 0

    def test_grad_in_train_like_step(self, mesh):
        """lookup composes with a jitted loss + optimizer update."""
        import optax

        N, D, n = 64, 8, 64
        rng = np.random.default_rng(5)
        table = jnp.asarray(rng.normal(size=(N, D)), jnp.float32)
        emb = ShardedEmbedding(mesh, N, D, capacity_factor=4.0)
        sharded = emb.shard(table)
        ids = jax.device_put(
            jnp.asarray(rng.integers(0, N, n), jnp.int32),
            emb.batch_sharding)
        opt = optax.sgd(0.1)
        state = opt.init(sharded)

        @jax.jit
        def step(t, state):
            def loss(t):
                return (emb.lookup(t, ids) ** 2).sum()
            g = jax.grad(loss)(t)
            up, state = opt.update(g, state)
            return optax.apply_updates(t, up), state

        t2, _ = step(sharded, state)
        # rows that were looked up moved toward zero, others unchanged
        moved = np.unique(np.asarray(ids))
        t2 = np.asarray(t2)
        assert not np.allclose(t2[moved], np.asarray(table)[moved])
        untouched = np.setdiff1d(np.arange(N), moved)
        np.testing.assert_allclose(t2[untouched],
                                   np.asarray(table)[untouched])


class TestValidation:
    def test_indivisible_rows_raise(self, mesh):
        with pytest.raises(ValueError):
            ShardedEmbedding(mesh, 63, 8)
