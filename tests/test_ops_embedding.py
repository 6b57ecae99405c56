"""Parity tests for the Pallas embedding lookup (interpret mode on CPU)
and its custom VJP."""

import jax
import jax.numpy as jnp
import numpy as np

from ncf_tpu.ops.embedding import embedding_lookup, get_impl, set_impl
from ncf_tpu.ops.pallas_embedding import _pallas_gather, pallas_embedding_lookup


class TestPallasGather:
    def test_matches_take(self):
        rng = np.random.default_rng(0)
        table = jnp.asarray(rng.normal(size=(1000, 64)), jnp.float32)
        ids = jnp.asarray(rng.integers(0, 1000, 700), jnp.int32)  # ragged chunk
        out = _pallas_gather(table, ids, interpret=True)
        np.testing.assert_array_equal(
            np.asarray(out), np.asarray(jnp.take(table, ids, axis=0)))

    def test_nd_ids_shape(self):
        rng = np.random.default_rng(1)
        table = jnp.asarray(rng.normal(size=(50, 16)), jnp.float32)
        ids = jnp.asarray(rng.integers(0, 50, (8, 5)), jnp.int32)
        # interpret-mode path via the public wrapper
        import ncf_tpu.ops.pallas_embedding as pe
        orig = pe._pallas_gather
        pe_out = jnp.take(table, ids, axis=0)
        out = pe._pallas_gather(table, ids.reshape(-1), interpret=True)
        np.testing.assert_array_equal(
            np.asarray(out).reshape(8, 5, 16), np.asarray(pe_out))

    def test_custom_vjp_scatter_add(self):
        """Gradient must scatter-ADD over duplicate ids."""
        table = jnp.zeros((6, 4), jnp.float32)
        ids = jnp.asarray([1, 1, 3], jnp.int32)

        # use the XLA-forward equivalent for grad math; the custom VJP's
        # backward is XLA regardless of forward impl
        def loss(t):
            return (jnp.take(t, ids, axis=0) * 2.0).sum()

        expect = jax.grad(loss)(table)
        from ncf_tpu.ops.pallas_embedding import _bwd
        g = jnp.full((3, 4), 2.0)
        got, none = _bwd((ids, table.shape, table.dtype), g)
        assert none is None
        np.testing.assert_array_equal(np.asarray(got), np.asarray(expect))
        assert float(got[1, 0]) == 4.0  # duplicates accumulated


class TestImplDispatch:
    def test_set_impl_roundtrip(self):
        assert get_impl() == "xla"
        set_impl("pallas")
        assert get_impl() == "pallas"
        set_impl("xla")
        try:
            set_impl("bogus")
            raised = False
        except ValueError:
            raised = True
        assert raised

    def test_lookup_xla(self):
        table = jnp.arange(12.0).reshape(4, 3)
        out = embedding_lookup(table, jnp.asarray([2, 0]))
        np.testing.assert_array_equal(np.asarray(out),
                                      [[6, 7, 8], [0, 1, 2]])


class TestOnehotScatter:
    """Parity tests for the Pallas one-hot scatter-add (interpret mode)."""

    def _ref(self, ids, g, num_rows):
        return jnp.zeros((num_rows, g.shape[-1]), jnp.float32).at[
            ids.reshape(-1)].add(g.reshape(-1, g.shape[-1]))

    def test_modes_match_xla_scatter(self):
        from ncf_tpu.ops.pallas_scatter import onehot_scatter_add

        rng = np.random.default_rng(0)
        for num_rows, n, d in [(300, 5000, 64), (1000, 4096, 128)]:
            ids = jnp.asarray(rng.integers(0, num_rows, n), jnp.int32)
            g = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
            ref = self._ref(ids, g, num_rows)
            scale = float(jnp.max(jnp.abs(ref)))
            for mode, tol in [("split", 1e-5), ("f32", 1e-6), ("bf16", 2e-2)]:
                out = onehot_scatter_add(
                    ids, g, num_rows, mode=mode, interpret=True)
                err = float(jnp.max(jnp.abs(out - ref))) / scale
                assert err < tol, (mode, err)

    def test_out_of_range_ids_dropped(self):
        """Padding ids (-1 / >= num_rows) must contribute nothing."""
        from ncf_tpu.ops.pallas_scatter import onehot_scatter_add

        ids = jnp.asarray([0, -1, 2, 99], jnp.int32)
        g = jnp.ones((4, 8), jnp.float32)
        # n below kernel pad size exercises the wrapper's padding too
        out = onehot_scatter_add(ids, g, 3, mode="f32", interpret=True)
        exp = np.zeros((3, 8), np.float32)
        exp[0] = 1.0
        exp[2] = 1.0
        np.testing.assert_array_equal(np.asarray(out), exp)

    def test_nd_ids(self):
        from ncf_tpu.ops.pallas_scatter import onehot_scatter_add

        rng = np.random.default_rng(1)
        ids = jnp.asarray(rng.integers(0, 40, (64, 5)), jnp.int32)
        g = jnp.asarray(rng.normal(size=(64, 5, 16)), jnp.float32)
        out = onehot_scatter_add(ids, g, 40, mode="f32", interpret=True)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(self._ref(ids, g, 40)),
            rtol=1e-6, atol=1e-6)

    def test_scatter_routing_gates(self):
        from ncf_tpu.ops.pallas_scatter import scatter_fits, scatter_preferred

        assert scatter_fits(3706, 128, 81920)            # items: fits VMEM
        # cost model (v5e in-graph calibration): items win in bf16, lose
        # in split; users are near the crossover (kernel by a nose in
        # bf16, XLA in split); tiny temporal tables always win
        assert not scatter_preferred(3706, 128, 81920, "split")
        assert scatter_preferred(3706, 128, 81920, "bf16")
        assert scatter_preferred(6040, 128, 16384, "bf16")
        assert not scatter_preferred(6040, 128, 16384, "split")
        assert scatter_preferred(24, 32, 16384)
        assert not scatter_fits(24, 32, 1024)            # too few ids
        assert not scatter_fits(10_000_000, 128, 81920)  # acc > VMEM

    def test_auto_and_fast_impls_cpu_fall_back_to_xla(self):
        """On the CPU test backend auto/fast must not route through
        Mosaic (the one-hot kernel is TPU-only)."""
        from ncf_tpu.ops import embedding

        table = jnp.asarray(np.random.default_rng(2).normal(size=(24, 32)),
                            jnp.float32)
        ids = jnp.asarray(np.arange(4096) % 24, jnp.int32)

        def loss(t):
            return (embedding_lookup(t, ids) ** 2).sum()

        orig = embedding.get_scatter_impl()
        try:
            for impl in ("auto", "fast"):
                embedding.set_scatter_impl(impl)
                grad = jax.grad(loss)(table)  # crashes if Mosaic is used
                assert grad.shape == table.shape
        finally:
            embedding.set_scatter_impl(orig)


class TestNarrowSpanScatter:
    """The narrow-span fast path (ops/pallas_scatter kernel): sorted-run
    ids take a single dynamically-placed row window per chunk; results
    must be identical to XLA scatter for every id pattern."""

    def _check(self, ids_np, num_rows, d=128, mode="f32"):
        import jax.numpy as jnp

        from ncf_tpu.ops.pallas_scatter import onehot_scatter_add

        rng = np.random.default_rng(1)
        g = jnp.asarray(rng.normal(size=(len(ids_np), d)), jnp.float32)
        ids = jnp.asarray(ids_np, jnp.int32)
        out = onehot_scatter_add(ids, g, num_rows, mode=mode,
                                 interpret=True)
        ref = jnp.zeros((num_rows, d), jnp.float32).at[ids].add(g)
        # atol covers f32 accumulation-order noise on rows that sum
        # ~1e3 gradients (e.g. a whole chunk of one id)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-6, atol=1e-4)

    def test_sorted_ids_narrow_path(self):
        rng = np.random.default_rng(0)
        # num_rows 2560 > 2*_NARROW gates the narrow path on
        self._check(np.sort(rng.integers(0, 2560, 4096)), 2560)

    def test_sorted_cluster_at_top_rows(self):
        rng = np.random.default_rng(2)
        self._check(np.sort(rng.integers(2400, 2560, 4096)), 2560)

    def test_per_chunk_mixed_random_and_sorted(self):
        rng = np.random.default_rng(3)
        ids = np.concatenate([
            rng.integers(0, 2560, 1024),            # random chunk
            np.sort(rng.integers(0, 2560, 1024)),   # sorted chunk
            np.full(1024, 7),                       # constant chunk
            np.sort(rng.integers(1000, 1100, 1024)),
        ])
        self._check(ids, 2560)

    def test_small_table_full_sweep_unchanged(self):
        rng = np.random.default_rng(4)
        self._check(rng.integers(0, 300, 2048), 300)

    def test_slot_major_flatten_2d(self):
        """2-D ids flatten slot-major; output identical to XLA either way."""
        import jax.numpy as jnp

        from ncf_tpu.ops.pallas_scatter import onehot_scatter_add

        rng = np.random.default_rng(5)
        B, S, d, I = 512, 5, 64, 2560
        ids = jnp.asarray(rng.integers(0, I, (B, S)), jnp.int32)
        g = jnp.asarray(rng.normal(size=(B, S, d)), jnp.float32)
        out = onehot_scatter_add(ids, g, I, mode="f32", interpret=True)
        ref = jnp.zeros((I, d), jnp.float32).at[ids.reshape(-1)].add(
            g.reshape(-1, d))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-6, atol=1e-5)
