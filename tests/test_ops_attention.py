"""Parity tests for the fused single-query attention kernel."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ncf_tpu.models.layers import mha_init
from ncf_tpu.models.advanced_ncf import _single_query_attention
from ncf_tpu.ops.pallas_attention import (
    _pallas_forward,
    _reference,
    fused_single_query_attention,
)


@pytest.fixture
def setup():
    rng = np.random.default_rng(0)
    B, S, D = 24, 5, 64
    p = mha_init(jax.random.PRNGKey(1), D)
    user = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
    items = jnp.asarray(rng.normal(size=(B, S, D)), jnp.float32)
    return p, user, items


class TestFusedAttention:
    def test_matches_model_attention(self, setup):
        p, user, items = setup
        want = _single_query_attention(
            p, user, items, num_heads=4, dropout_rate=0.0, rng=None,
            deterministic=True, dtype=jnp.float32)
        got = _pallas_forward(
            p["q"]["w"], p["q"]["b"], p["k"]["w"], p["k"]["b"],
            p["v"]["w"], p["v"]["b"], p["o"]["w"], p["o"]["b"],
            user, items, num_heads=4, batch_tile=8, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)

    def test_reference_formula_matches_model(self, setup):
        p, user, items = setup
        want = _single_query_attention(
            p, user, items, num_heads=4, dropout_rate=0.0, rng=None,
            deterministic=True, dtype=jnp.float32)
        got = _reference(
            p["q"]["w"], p["q"]["b"], p["k"]["w"], p["k"]["b"],
            p["v"]["w"], p["v"]["b"], p["o"]["w"], p["o"]["b"],
            user, items, 4)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_batch_padding(self, setup):
        """B=24 with tile 16 pads to 32; padded rows must not leak."""
        p, user, items = setup
        a = _pallas_forward(
            p["q"]["w"], p["q"]["b"], p["k"]["w"], p["k"]["b"],
            p["v"]["w"], p["v"]["b"], p["o"]["w"], p["o"]["b"],
            user, items, num_heads=4, batch_tile=16, interpret=True)
        b = _pallas_forward(
            p["q"]["w"], p["q"]["b"], p["k"]["w"], p["k"]["b"],
            p["v"]["w"], p["v"]["b"], p["o"]["w"], p["o"]["b"],
            user, items, num_heads=4, batch_tile=8, interpret=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)

    def test_custom_vjp_gradients_match_xla(self, setup):
        p, user, items = setup

        def loss_kernel(p, u, it):
            # interpret-mode pallas inside grad: route through the public
            # custom_vjp entry (its fwd uses compiled pallas; on CPU tests
            # we call the interpret parity above instead, and here verify
            # the VJP wiring against the XLA formula directly)
            return (_reference(
                p["q"]["w"], p["q"]["b"], p["k"]["w"], p["k"]["b"],
                p["v"]["w"], p["v"]["b"], p["o"]["w"], p["o"]["b"],
                u, it, 4) ** 2).sum()

        g_ref = jax.grad(loss_kernel)(p, user, items)
        # the custom bwd is literally jax.vjp of _reference, so the check
        # is that the plumbing returns matching tree structure + values
        from ncf_tpu.ops.pallas_attention import _bwd
        out, vjp_res = jax.vjp(
            lambda p, u, it: _reference(
                p["q"]["w"], p["q"]["b"], p["k"]["w"], p["k"]["b"],
                p["v"]["w"], p["v"]["b"], p["o"]["w"], p["o"]["b"],
                u, it, 4), p, user, items)
        gp, gu, git = _bwd(4, (p, user, items), 2 * out)
        want_gp = jax.grad(loss_kernel)(p, user, items)
        for a, b in zip(jax.tree_util.tree_leaves(gp),
                        jax.tree_util.tree_leaves(want_gp)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)
