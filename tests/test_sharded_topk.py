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


class TestShardedPreparedTopk:
    """The once-prepared sharded path (no per-call re-fold) must match
    the exact single-device reference on the CPU mesh (interpret-mode
    streaming kernel)."""

    def _run(self, mesh, I=1000, B=24, D=16, k=10, bias=True, seg_top=2,
             block_items=128, seg_width=64):
        from ncf_tpu.parallel.sharded_topk import (
            shard_prepare_items, sharded_topk_scores_prepared)

        rng = np.random.default_rng(4)
        q = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
        t = jnp.asarray(rng.normal(size=(I, D)), jnp.float32)
        b = (jnp.asarray(rng.normal(size=(I,)), jnp.float32)
             if bias else None)
        prep = shard_prepare_items(t, b, mesh, block_items=block_items,
                                   seg_width=seg_width)
        # every shard holds a block-multiple slice
        assert prep.table.shape[0] % (8 * block_items) == 0
        vs, ids = sharded_topk_scores_prepared(
            q, prep, mesh, k=k, seg_top=seg_top, interpret=True)
        # shard boundaries are block_items-aligned, so segments
        # partition identically: the sharded result must be
        # BIT-IDENTICAL to the single-device streaming kernel at the
        # same geometry (top-k of per-shard top-k == global top-k of
        # the same candidate set)
        from ncf_tpu.ops.topk import topk_scores_streaming
        vr, ir = topk_scores_streaming(
            q, t, k=k, bias=b, block_items=block_items,
            seg_width=seg_width, seg_top=seg_top, user_tile=256,
            interpret=True)
        vx, ix = topk_scores_xla(q, t, k=k, bias=b)
        return (np.asarray(vs), np.asarray(ids), np.asarray(vr),
                np.asarray(ir), np.asarray(vx), np.asarray(ix))

    def test_parity_with_single_device_streaming(self, mesh):
        vs, ids, vr, ir, vx, ix = self._run(mesh)
        np.testing.assert_array_equal(vs, vr)
        np.testing.assert_array_equal(ids, ir)
        # and recall vs exact follows the surfacing model (loose bound)
        recall = np.mean([np.isin(ix[r], ids[r]).mean()
                          for r in range(len(ix))])
        assert recall > 0.8

    def test_no_bias(self, mesh):
        vs, ids, vr, ir, *_ = self._run(mesh, bias=False)
        np.testing.assert_array_equal(vs, vr)
        np.testing.assert_array_equal(ids, ir)

    def test_k_exceeds_shard(self, mesh):
        # k=10 with only 4 surfaceable candidates (2 segments x seg_top
        # across 72 real rows): the filled slots must match the
        # single-device kernel; unfilled slots are NEG_INF in both
        # (their ids are implementation-defined carry garbage)
        vs, ids, vr, ir, vx, ix = self._run(mesh, I=72, k=10,
                                            block_items=64)
        filled = vr > -1e38
        np.testing.assert_array_equal(filled, vs > -1e38)
        np.testing.assert_array_equal(np.where(filled, ids, -1),
                                      np.where(filled, ir, -1))
        assert (ids < 72).all()

    def test_table_built_once_is_reused(self, mesh):
        """The prepared table array is identical across calls (the
        re-fold the unprepared path pays per call happens zero times
        here)."""
        from ncf_tpu.parallel.sharded_topk import (
            shard_prepare_items, sharded_topk_scores_prepared)

        rng = np.random.default_rng(5)
        q1 = jnp.asarray(rng.normal(size=(8, 16)), jnp.float32)
        q2 = jnp.asarray(rng.normal(size=(8, 16)), jnp.float32)
        t = jnp.asarray(rng.normal(size=(300, 16)), jnp.float32)
        prep = shard_prepare_items(t, None, mesh, block_items=64,
                                   seg_width=64)
        tbl = prep.table
        sharded_topk_scores_prepared(q1, prep, mesh, k=5, interpret=True)
        sharded_topk_scores_prepared(q2, prep, mesh, k=5, interpret=True)
        assert prep.table is tbl


class TestShardedInt8Topk:
    """The int8 sharded tier: global quantization means each shard's
    slice equals the single-device int8 prepared table, so results are
    bit-identical to the single-device int8 kernel."""

    def _run(self, mesh, I=1000, B=16, D=16, k=8, seg_top=1,
             block_items=128, seg_width=32):
        from ncf_tpu.ops.topk import (prepare_items_int8,
                                      topk_scores_streaming_int8)
        from ncf_tpu.parallel.sharded_topk import (
            shard_prepare_items_int8, sharded_topk_scores_prepared)

        rng = np.random.default_rng(7)
        q = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
        t = jnp.asarray(rng.normal(size=(I, D)), jnp.float32)
        b = jnp.asarray(rng.normal(size=(I,)), jnp.float32)
        prep = shard_prepare_items_int8(
            t, b, q, mesh, block_items=block_items, seg_width=seg_width)
        assert prep.table.dtype == jnp.int8
        assert prep.table.shape[0] % (8 * block_items) == 0
        vs, ids = sharded_topk_scores_prepared(
            q, prep, mesh, k=k, seg_top=seg_top, interpret=True)
        ref = prepare_items_int8(t, b, q, block_items=block_items,
                                 seg_width=seg_width)
        vr, ir = topk_scores_streaming_int8(
            q, ref, k, seg_top=seg_top, interpret=True)
        return (np.asarray(vs), np.asarray(ids),
                np.asarray(vr), np.asarray(ir), q, t, b)

    def test_bit_identical_to_single_device(self, mesh):
        vs, ids, vr, ir, *_ = self._run(mesh)
        filled = vr > -1e38
        np.testing.assert_array_equal(np.where(filled, ids, -1),
                                      np.where(filled, ir, -1))
        np.testing.assert_array_equal(np.where(filled, vs, 0),
                                      np.where(filled, vr, 0))

    def test_seg_top2(self, mesh):
        vs, ids, vr, ir, *_ = self._run(mesh, seg_top=2, k=10)
        filled = vr > -1e38
        np.testing.assert_array_equal(np.where(filled, ids, -1),
                                      np.where(filled, ir, -1))

    def test_recall_vs_exact(self, mesh):
        vs, ids, vr, ir, q, t, b = self._run(mesh, I=4000, B=24,
                                             seg_width=16, k=10)
        _, ix = topk_scores_xla(q, t, k=10, bias=b)
        ix = np.asarray(ix)
        recall = np.mean([np.isin(ix[r], ids[r]).mean()
                          for r in range(len(ix))])
        assert recall > 0.8
        assert (ids < 4000).all()
