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
