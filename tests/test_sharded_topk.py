"""Item-sharded retrieval on the 8-virtual-device CPU mesh: exact parity
with single-device top-k (ncf_tpu/parallel/sharded_topk.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from ncf_tpu.ops.topk import topk_scores_xla
from ncf_tpu.parallel.sharded_topk import shard_items, sharded_topk_scores


@pytest.fixture(scope="module")
def mesh():
    devs = np.array(jax.devices()[:8])
    return Mesh(devs, ("ici",))


class TestShardedTopk:
    def test_parity_with_single_device(self, mesh):
        rng = np.random.default_rng(0)
        B, I, D = 32, 1000, 16          # I=1000 not divisible by 8: pads
        q = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
        t = jnp.asarray(rng.normal(size=(I, D)), jnp.float32)
        b = jnp.asarray(rng.normal(size=(I,)), jnp.float32)

        items_s, bias_s, n = shard_items(t, b, mesh)
        assert items_s.shape[0] % 8 == 0
        vs, ids = sharded_topk_scores(q, items_s, bias_s, n, mesh, k=10)
        vx, ix = topk_scores_xla(q, t, k=10, bias=b)
        np.testing.assert_allclose(np.asarray(vs), np.asarray(vx),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(ids), np.asarray(ix))

    def test_no_bias_and_small_k(self, mesh):
        rng = np.random.default_rng(1)
        B, I, D = 8, 64, 8              # i_loc=8 < k: per-shard k clamps
        q = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
        t = jnp.asarray(rng.normal(size=(I, D)), jnp.float32)
        items_s, bias_s, n = shard_items(t, None, mesh)
        vs, ids = sharded_topk_scores(q, items_s, bias_s, n, mesh, k=10)
        vx, ix = topk_scores_xla(q, t, k=10)
        np.testing.assert_allclose(np.asarray(vs), np.asarray(vx),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(ids), np.asarray(ix))

    def test_padded_rows_never_win(self, mesh):
        # all scores negative => padded zero-rows (score 0) would win
        # without the NEG_INF bias padding
        rng = np.random.default_rng(2)
        B, I, D = 4, 9, 4               # pads 9 -> 16 (7 fake rows)
        q = -jnp.abs(jnp.asarray(rng.normal(size=(B, D)), jnp.float32))
        t = jnp.abs(jnp.asarray(rng.normal(size=(I, D)), jnp.float32))
        items_s, bias_s, n = shard_items(t, None, mesh)
        vs, ids = sharded_topk_scores(q, items_s, bias_s, n, mesh, k=5)
        assert int(np.asarray(ids).max()) < I
        assert np.all(np.asarray(vs) < 0)
