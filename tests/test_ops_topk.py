"""Parity tests for the streaming top-k kernels (SURVEY.md §7 PR3: every
kernel needs an XLA-reference parity test).  The Pallas kernel runs in
interpreter mode on the CPU backend; the real-TPU path is exercised by
bench.py and scripts/bench_kernels.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ncf_tpu.ops.topk import topk_scores_pallas, topk_scores_xla


def dense_topk(q, t, k, bias=None):
    scores = q @ t.T
    if bias is not None:
        scores = scores + bias[None, :]
    vals, idxs = jax.lax.top_k(scores, k)
    return np.asarray(vals), np.asarray(idxs)


@pytest.fixture
def data():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(40, 32)), jnp.float32)
    t = jnp.asarray(rng.normal(size=(500, 32)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(500,)), jnp.float32)
    return q, t, bias


class TestXlaTopk:
    def test_matches_dense(self, data):
        q, t, bias = data
        vals, idxs = topk_scores_xla(q, t, k=10, block_items=128)
        dv, di = dense_topk(q, t, 10)
        np.testing.assert_allclose(np.asarray(vals), dv, rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(idxs), di)

    def test_with_bias(self, data):
        q, t, bias = data
        vals, idxs = topk_scores_xla(q, t, k=7, bias=bias, block_items=256)
        dv, di = dense_topk(q, t, 7, bias)
        np.testing.assert_allclose(np.asarray(vals), dv, rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(idxs), di)

    def test_nondivisible_items(self, data):
        q, t, bias = data   # 500 items, block 128 -> ragged final block
        vals, idxs = topk_scores_xla(q, t, k=5, block_items=128)
        assert (np.asarray(idxs) < 500).all()


class TestPallasTopk:
    def test_matches_dense_interpret(self, data):
        q, t, bias = data
        vals, idxs = topk_scores_pallas(
            q, t, k=10, block_items=128, user_tile=16, interpret=True)
        dv, di = dense_topk(q, t, 10)
        np.testing.assert_allclose(np.asarray(vals), dv, rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(idxs), di)

    def test_with_bias_interpret(self, data):
        q, t, bias = data
        vals, idxs = topk_scores_pallas(
            q, t, k=10, bias=bias, block_items=128, user_tile=16,
            interpret=True)
        dv, di = dense_topk(q, t, 10, bias)
        np.testing.assert_allclose(np.asarray(vals), dv, rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(idxs), di)

    def test_user_padding(self, data):
        """B=40 with user_tile=16 pads to 48 users; padded rows must not
        leak into real outputs."""
        q, t, bias = data
        vals, idxs = topk_scores_pallas(
            q, t, k=4, block_items=256, user_tile=16, interpret=True)
        assert vals.shape == (40, 4) and idxs.shape == (40, 4)
        dv, di = dense_topk(q, t, 4)
        np.testing.assert_allclose(np.asarray(vals), dv, rtol=1e-5, atol=1e-5)

    def test_ties_prefer_lowest_index(self):
        q = jnp.ones((4, 8), jnp.float32)
        t = jnp.ones((32, 8), jnp.float32)  # all scores equal
        _, idxs = topk_scores_pallas(
            q, t, k=3, block_items=16, user_tile=4, interpret=True)
        np.testing.assert_array_equal(np.asarray(idxs),
                                      np.tile([0, 1, 2], (4, 1)))


class TestSegmentedTopk:
    """Approximate streaming kernel: recall follows the segment-collision
    model (expected misses ~ C(k,2) * seg_width / I), surfaced values are
    exact re-scores."""

    def _run(self, seg_width, num_items=5000):
        from ncf_tpu.ops.topk import topk_scores_segmented

        rng = np.random.default_rng(1)
        q = jnp.asarray(rng.normal(size=(24, 32)), jnp.float32)
        t = jnp.asarray(rng.normal(size=(num_items, 32)), jnp.float32)
        bias = jnp.asarray(rng.normal(size=(num_items,)), jnp.float32)
        vs, i_seg = topk_scores_segmented(
            q, t, k=10, bias=bias, block_items=512, user_tile=8,
            seg_width=seg_width, interpret=True)
        vx, i_ex = topk_scores_xla(q, t, k=10, bias=bias)
        return (np.asarray(vs), np.asarray(i_seg),
                np.asarray(vx), np.asarray(i_ex), q, t, bias)

    def test_recall_matches_collision_model(self):
        vs, i_seg, vx, i_ex, *_ = self._run(seg_width=128)
        recall = np.mean([len(set(i_seg[r]) & set(i_ex[r])) / 10
                          for r in range(len(i_ex))])
        # expected ~1.15 collisions/row at 128/5000 => recall ~0.88
        assert recall > 0.8

    def test_high_recall_with_narrow_segments(self):
        vs, i_seg, vx, i_ex, *_ = self._run(seg_width=8)
        recall = np.mean([len(set(i_seg[r]) & set(i_ex[r])) / 10
                          for r in range(len(i_ex))])
        assert recall > 0.95

    def test_surfaced_values_are_exact(self):
        vs, i_seg, vx, i_ex, q, t, bias = self._run(seg_width=128)
        scores = np.asarray(q) @ np.asarray(t).T + np.asarray(bias)[None, :]
        for r in range(len(i_seg)):
            np.testing.assert_allclose(
                vs[r], scores[r, i_seg[r]], rtol=1e-5, atol=1e-5)
        # and sorted descending
        assert (np.diff(vs, axis=1) <= 1e-6).all()


class TestStreamingTopk:
    """The production streaming kernel: exact f32 scores, exact item ids,
    recall 1.0 unless > seg_top true top-k items share one segment."""

    def _run(self, num_items=5000, B=24, k=10, bias=True, seg_top=2,
             block_items=512, user_tile=8, seg_width=64, D=32):
        from ncf_tpu.ops.topk import topk_scores_streaming

        rng = np.random.default_rng(2)
        q = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
        t = jnp.asarray(rng.normal(size=(num_items, D)), jnp.float32)
        b = (jnp.asarray(rng.normal(size=(num_items,)), jnp.float32)
             if bias else None)
        vs, ids = topk_scores_streaming(
            q, t, k=k, bias=b, block_items=block_items, user_tile=user_tile,
            seg_width=seg_width, seg_top=seg_top, interpret=True)
        vx, ix = topk_scores_xla(q, t, k=k, bias=b)
        return (np.asarray(vs), np.asarray(ids),
                np.asarray(vx), np.asarray(ix))

    def test_matches_exact_with_bias(self):
        vs, ids, vx, ix = self._run()
        np.testing.assert_allclose(vs, vx, rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(ids, ix)

    def test_matches_exact_no_bias(self):
        vs, ids, vx, ix = self._run(bias=False)
        np.testing.assert_allclose(vs, vx, rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(ids, ix)

    def test_non_divisible_items_and_batch(self):
        # I not a multiple of block_items or seg_width; B not of the tile
        vs, ids, vx, ix = self._run(num_items=4999, B=13)
        np.testing.assert_allclose(vs, vx, rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(ids, ix)
        assert ids.max() < 4999

    def test_k1(self):
        vs, ids, vx, ix = self._run(k=1)
        np.testing.assert_array_equal(ids, ix)

    def test_seg_top1_recall_model(self):
        # seg_top=1 reverts to one-candidate-per-segment: misses only
        # same-segment collisions among the true top-k
        from ncf_tpu.ops.topk import topk_scores_streaming

        rng = np.random.default_rng(2)
        q = jnp.asarray(rng.normal(size=(24, 32)), jnp.float32)
        t = jnp.asarray(rng.normal(size=(5000, 32)), jnp.float32)
        b = jnp.asarray(rng.normal(size=(5000,)), jnp.float32)
        vs, ids = topk_scores_streaming(
            q, t, k=10, bias=b, block_items=512, user_tile=8,
            seg_width=128, seg_top=1, interpret=True)
        _, ix = topk_scores_xla(q, t, k=10, bias=b)
        vs, ids, ix = np.asarray(vs), np.asarray(ids), np.asarray(ix)
        recall = np.mean([len(set(ids[r]) & set(ix[r])) / 10
                          for r in range(len(ix))])
        assert recall > 0.8
        # surfaced values are the EXACT scores of the surfaced items
        exact = (np.asarray(q) @ np.asarray(t).T) + np.asarray(b)[None, :]
        np.testing.assert_allclose(
            vs, np.take_along_axis(exact, ids, axis=1), rtol=1e-5, atol=1e-5)

    def test_duplicate_free(self):
        _, ids, _, _ = self._run(num_items=300, block_items=512)
        for r in range(ids.shape[0]):
            assert len(set(ids[r])) == len(ids[r])

    def test_auto_block_items_fits_vmem(self):
        # the public default (block_items=None) must never pick a block
        # whose score tile + double-buffered lane-padded item block
        # exceeds the scoped-VMEM budget (f32 at the old fixed 8192
        # default measured 16.09 MB > the 16 MB v5e limit and crashed)
        from ncf_tpu.ops.topk import _STREAM_VMEM_BUDGET, _auto_block_items

        assert _auto_block_items(64, 2, 256, 128) == 8192   # bf16 keeps 8k
        assert _auto_block_items(64, 4, 256, 128) <= 4096   # f32 shrinks
        for d in (16, 64, 128, 256):
            for nbytes in (2, 4):
                for tu in (8, 128, 256, 512):
                    ti = _auto_block_items(d, nbytes, tu, 128)
                    lanes = -(-(d + 3) // 128) * 128
                    assert ti % 128 == 0
                    assert (ti * tu * 4 + ti * lanes * nbytes * 2
                            <= _STREAM_VMEM_BUDGET) or ti == 128

    def test_default_block_items_auto(self):
        # block_items=None end-to-end (interpret): matches exact
        from ncf_tpu.ops.topk import topk_scores_streaming

        rng = np.random.default_rng(3)
        q = jnp.asarray(rng.normal(size=(16, 32)), jnp.float32)
        t = jnp.asarray(rng.normal(size=(9000, 32)), jnp.float32)
        b = jnp.asarray(rng.normal(size=(9000,)), jnp.float32)
        vs, ids = topk_scores_streaming(
            q, t, k=10, bias=b, user_tile=8, interpret=True)
        vx, ix = topk_scores_xla(q, t, k=10, bias=b)
        np.testing.assert_allclose(np.asarray(vs), np.asarray(vx),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(ids), np.asarray(ix))

    def test_prepared_items_parity(self):
        # prepare_items + streaming == inline streaming == exact XLA
        from ncf_tpu.ops.topk import (prepare_items, topk_scores,
                                      topk_scores_streaming)

        rng = np.random.default_rng(7)
        q = jnp.asarray(rng.normal(size=(16, 32)), jnp.float32)
        t = jnp.asarray(rng.normal(size=(5000, 32)), jnp.float32)
        b = jnp.asarray(rng.normal(size=(5000,)), jnp.float32)
        prep = prepare_items(t, b, block_items=1024)
        assert prep.table.shape == (5120, 35)      # padded + 3 bias cols
        assert prep.num_items == 5000 and prep.dim == 32
        vp, ip = topk_scores_streaming(q, prep, k=10, user_tile=8,
                                       interpret=True)
        vi, ii = topk_scores_streaming(q, t, k=10, bias=b, block_items=1024,
                                       user_tile=8, interpret=True)
        vx, ix = topk_scores_xla(q, t, k=10, bias=b)
        np.testing.assert_array_equal(np.asarray(ip), np.asarray(ii))
        np.testing.assert_array_equal(np.asarray(vp), np.asarray(vi))
        np.testing.assert_allclose(np.asarray(vp), np.asarray(vx),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(ip), np.asarray(ix))
        # dispatcher routes PreparedItems to streaming
        with pytest.raises(ValueError):
            topk_scores_streaming(q, prep, k=10, bias=b)

    def test_prepared_unfold_and_large_k_fallback(self):
        # k > 64 must not reach the streaming kernel (k-round unroll +
        # recall degradation): the dispatcher unfolds the prepared table
        # and takes the exact XLA path
        from ncf_tpu.ops.topk import prepare_items, topk_scores

        rng = np.random.default_rng(11)
        q = jnp.asarray(rng.normal(size=(4, 16)), jnp.float32)
        t = jnp.asarray(rng.normal(size=(3000, 16)), jnp.float32)
        b = jnp.asarray(rng.normal(size=(3000,)), jnp.float32)
        prep = prepare_items(t, b, block_items=512)
        raw, rb = prep.unfold()
        np.testing.assert_array_equal(np.asarray(raw), np.asarray(t))
        np.testing.assert_allclose(np.asarray(rb), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)
        v, i = topk_scores(q, prep, k=100)
        vx, ix = topk_scores_xla(q, t, k=100, bias=b)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ix))
        np.testing.assert_allclose(np.asarray(v), np.asarray(vx),
                                   rtol=1e-5, atol=1e-5)

    def test_prepared_guards(self):
        from ncf_tpu.ops.topk import prepare_items, topk_scores_streaming

        t = jnp.ones((600, 16), jnp.float32)
        q = jnp.ones((2048, 16), jnp.float32)
        prep = prepare_items(t, None, block_items=256, user_tile=256)
        with pytest.raises(ValueError):    # call tile > prepare-time tile
            topk_scores_streaming(q, prep, k=5, user_tile=512,
                                  interpret=True)
        with pytest.raises(ValueError):    # seg_width fixed at prepare
            topk_scores_streaming(q[:16], prep, k=5, seg_width=64,
                                  interpret=True)

    def test_prepared_items_is_pytree(self):
        from ncf_tpu.ops.topk import prepare_items

        t = jnp.ones((300, 16), jnp.float32)
        prep = prepare_items(t, None, block_items=128)
        leaves, treedef = jax.tree_util.tree_flatten(prep)
        assert len(leaves) == 1
        back = jax.tree_util.tree_unflatten(treedef, leaves)
        assert back.num_items == 300 and back.block_items == 128

    def test_dispatch_streaming(self):
        from ncf_tpu.ops.topk import topk_scores

        rng = np.random.default_rng(3)
        q = jnp.asarray(rng.normal(size=(8, 16)), jnp.float32)
        t = jnp.asarray(rng.normal(size=(200, 16)), jnp.float32)
        v_auto, i_auto = topk_scores(q, t, k=5)
        v_ref, i_ref = topk_scores_xla(q, t, k=5)
        np.testing.assert_allclose(np.asarray(v_auto), np.asarray(v_ref),
                                   rtol=1e-5)


class TestInt8StreamingTopk:
    """The int8 approximate tier: the kernel must match a NumPy
    simulation of the SAME integer computation bit-for-bit (isolating
    kernel bugs from quantization effects), and the rescore phase must
    return exact f32 scores."""

    def _quantized_reference(self, prep, q, st, k):
        """NumPy re-implementation of the quantized scoring + per-segment
        top-seg_top surfacing + global top-k."""
        import numpy as np
        tab = np.asarray(prep.table, np.int32)
        cs = np.asarray(prep.col_scale)
        qs = float(prep.q_scale)
        B = q.shape[0]
        I = prep.num_items
        w = prep.seg_width
        q8 = np.clip(np.round(np.asarray(q) * cs[None, :] / qs), -127, 127)
        q8 = np.concatenate(
            [q8, np.tile([[127.0, 127.0, 1.0]], (B, 1))], 1).astype(np.int32)
        acc = q8 @ tab.T
        nseg = tab.shape[0] // w
        segacc = acc.reshape(B, nseg, w)
        out_v = np.zeros((B, k)); out_i = np.zeros((B, k), np.int64)
        for b in range(B):
            cands = []
            for s in range(nseg):
                seg = segacc[b, s]
                o1 = int(np.argmax(seg))
                cands.append((seg[o1], s * w + o1))
                if st == 2:
                    seg2 = seg.copy(); seg2[o1] = -(2 ** 30)
                    o2 = int(np.argmax(seg2))
                    cands.append((seg2[o2], s * w + o2))
            cands.sort(key=lambda x: (-x[0], x[1]))
            for j in range(k):
                # winners at/below the pad floor report as empty slots
                out_v[b, j] = (cands[j][0] * qs
                               if cands[j][0] > -32384.5 else -3.0e38)
                out_i[b, j] = min(cands[j][1], I - 1)
        return out_v, out_i

    def _data(self, B=24, I=1000, D=16, seed=1):
        rng = np.random.default_rng(seed)
        q = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
        t = jnp.asarray(rng.normal(size=(I, D)), jnp.float32)
        bias = jnp.asarray(rng.normal(size=(I,)), jnp.float32)
        return q, t, bias

    @pytest.mark.parametrize("w,st,k", [(64, 1, 5), (64, 2, 7),
                                        (128, 1, 4), (128, 2, 10)])
    def test_matches_integer_simulation(self, w, st, k):
        from ncf_tpu.ops.topk import (prepare_items_int8,
                                      topk_scores_streaming_int8)
        q, t, bias = self._data()
        prep = prepare_items_int8(t, bias, q, block_items=256, seg_width=w)
        vals, idxs = topk_scores_streaming_int8(
            q, prep, k, seg_top=st, interpret=True)
        rv, ri = self._quantized_reference(prep, q, st, k)
        np.testing.assert_allclose(np.asarray(vals), rv, rtol=1e-6, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(idxs), ri)

    def test_bias_digits_exact(self):
        """127*d1 + 127*d2 + d3 reconstructs round(bias/q_scale) exactly
        within the clip range."""
        from ncf_tpu.ops.topk import prepare_items_int8
        q, t, _ = self._data()
        bias = jnp.asarray(
            np.linspace(-5.0, 5.0, t.shape[0]), jnp.float32)
        prep = prepare_items_int8(t, bias, q, block_items=256)
        _, b2 = prep.unfold()
        qs = float(prep.q_scale)
        np.testing.assert_allclose(
            np.asarray(b2), np.round(np.asarray(bias) / qs) * qs,
            rtol=0, atol=qs * 1e-3)

    def test_unfold_roundtrip_tolerance(self):
        """Dequantized items are within half a column LSB of the input."""
        from ncf_tpu.ops.topk import prepare_items_int8
        q, t, bias = self._data()
        prep = prepare_items_int8(t, bias, q, block_items=256)
        items2, _ = prep.unfold()
        lsb = np.asarray(prep.col_scale)[None, :]
        assert (np.abs(np.asarray(items2) - np.asarray(t)) <= lsb * 0.5 + 1e-7).all()

    def test_rescore_exact_scores_and_order(self):
        from ncf_tpu.ops.topk import (prepare_items_int8, rescore_exact,
                                      topk_scores_streaming_int8)
        q, t, bias = self._data(I=2000)
        prep = prepare_items_int8(t, bias, q, block_items=256, seg_width=64)
        _, idxs = topk_scores_streaming_int8(
            q, prep, 20, seg_top=2, interpret=True)
        vals, ids = rescore_exact(q, t, bias, idxs)
        scores = np.asarray(q) @ np.asarray(t).T + np.asarray(bias)[None, :]
        for r in range(q.shape[0]):
            np.testing.assert_allclose(
                np.asarray(vals)[r],
                scores[r, np.asarray(ids)[r]], rtol=1e-5, atol=1e-5)
        assert (np.diff(np.asarray(vals), axis=1) <= 1e-6).all()

    def test_overfetch_rescore_recall(self):
        """fetch 2k + exact rescore -> top-10: recall well above the
        no-rescore tier at the same size (quantization flips recover)."""
        from ncf_tpu.ops.topk import (prepare_items_int8, rescore_exact,
                                      topk_scores_streaming_int8)
        q, t, bias = self._data(B=32, I=4000, D=32, seed=3)
        prep = prepare_items_int8(t, bias, q, block_items=512, seg_width=64)
        _, ix = topk_scores_xla(q, t, 10, bias)
        ix = np.asarray(ix)
        _, i8 = topk_scores_streaming_int8(q, prep, 20, seg_top=2,
                                           interpret=True)
        _, ids = rescore_exact(q, t, bias, i8)
        ids = np.asarray(ids)[:, :10]
        recall = np.mean([np.isin(ix[r], ids[r]).mean()
                          for r in range(len(ix))])
        assert recall > 0.9

    def test_dispatch_routes_prepared_int8(self):
        from ncf_tpu.ops import topk as topk_mod
        from ncf_tpu.ops.topk import prepare_items_int8, topk_scores
        q, t, bias = self._data()
        prep = prepare_items_int8(t, bias, q, block_items=256)
        with pytest.raises(ValueError):
            topk_scores(q, prep, 5, bias=bias)
        # large k unfolds to the exact-XLA path over dequantized operands
        vals, idxs = topk_scores(q, prep, 100)
        items2, b2 = prep.unfold()
        vx, ix = topk_scores_xla(q, items2, 100, b2)
        np.testing.assert_array_equal(np.asarray(idxs), np.asarray(ix))
