"""Fused Pallas MLP tower (ops/pallas_tower.py) — interpret-mode parity
with the XLA layer stack (models/layers.py::mlp_tower) on CPU.

The kernel's load-bearing properties: bit-exact forward in deterministic
mode, close gradients (backward runs in f32 — tighter than XLA's bf16
operand backward), zero-padded lanes stay exactly zero, and the routing
guard.  Dropout-mode behavior (on-core PRNG) is validated on real TPU
(BENCH_NOTES round 4 convergence A/B); here only the deterministic path
runs, since Mosaic PRNG is TPU-only.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ncf_tpu.models.layers import mlp_tower, mlp_tower_init
from ncf_tpu.ops.pallas_tower import _ROW_TILE, fused_tower, tower_fits


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(0)
    layers = mlp_tower_init(key, 96, [256, 128, 64])
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(300, 96)), jnp.float32).astype(
        jnp.bfloat16)
    return layers, x


def test_forward_matches_xla(setup):
    layers, x = setup
    ref = mlp_tower(layers, x, 0.0, None, True, jnp.bfloat16)
    out = fused_tower(layers, x, 0.0, None, True, interpret=True)
    assert out.shape == ref.shape and out.dtype == ref.dtype
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_forward_3d_batch(setup):
    """[B, S, D] inputs (independent candidate mode's shape)."""
    layers, _ = setup
    rng = np.random.default_rng(1)
    x3 = jnp.asarray(rng.normal(size=(40, 5, 96)), jnp.float32).astype(
        jnp.bfloat16)
    ref = mlp_tower(layers, x3, 0.0, None, True, jnp.bfloat16)
    out = fused_tower(layers, x3, 0.0, None, True, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_gradients_close(setup):
    layers, x = setup

    def loss_ref(layers, x):
        return (mlp_tower(layers, x, 0.0, None, True, jnp.bfloat16) ** 2).sum()

    def loss_fused(layers, x):
        return (fused_tower(layers, x, 0.0, None, True,
                            interpret=True) ** 2).sum()

    gr, gxr = jax.grad(loss_ref, argnums=(0, 1))(layers, x)
    gf, gxf = jax.grad(loss_fused, argnums=(0, 1))(layers, x)
    flat_r = jax.tree_util.tree_flatten_with_path(gr)[0]
    flat_f = dict(jax.tree_util.tree_flatten_with_path(gf)[0])
    for path, leaf in flat_r:
        a = np.asarray(leaf, np.float32)
        b = np.asarray(flat_f[path], np.float32)
        scale = np.max(np.abs(a)) + 1e-9
        # f32 backward vs XLA's bf16-operand backward: agree to ~bf16
        # rounding of the forward activations
        assert np.max(np.abs(a - b)) / scale < 2e-2, (
            jax.tree_util.keystr(path))
    # input grads come back in x's dtype; compare in f32
    a = np.asarray(gxr, np.float32)
    b = np.asarray(gxf, np.float32)
    assert np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9) < 2e-2


def test_rows_beyond_tile(setup):
    """Multi-tile grid (> _ROW_TILE rows) and non-multiple row counts."""
    layers, _ = setup
    rng = np.random.default_rng(2)
    n = _ROW_TILE + 137
    x = jnp.asarray(rng.normal(size=(n, 96)), jnp.float32).astype(
        jnp.bfloat16)
    ref = mlp_tower(layers, x, 0.0, None, True, jnp.bfloat16)
    out = fused_tower(layers, x, 0.0, None, True, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_tower_fits_guard():
    key = jax.random.PRNGKey(1)
    ok = mlp_tower_init(key, 96, [256, 128, 64])
    assert tower_fits(ok, 96)
    too_wide = mlp_tower_init(key, 96, [1024, 64])
    assert not tower_fits(too_wide, 96)


def test_routing_knob_off_on_cpu(setup):
    """cfg.fused_tower='auto' must NOT route on CPU (Mosaic is
    TPU-only); the model keeps the XLA layers."""
    from ncf_tpu.models import advanced_ncf
    from ncf_tpu.utils.config import Config

    cfg = Config()
    cfg.model.fused_tower = "auto"
    cfg.model.num_users = 50
    cfg.model.num_items = 40
    cfg.model.mf_dim = 16
    cfg.model.mlp_dim = 16
    cfg.model.temporal_dim = 8
    cfg.model.mlp_hidden_dims = [32, 16]
    cfg.model.compute_dtype = "float32"
    params = advanced_ncf.init(jax.random.PRNGKey(0), cfg.model)
    logits = advanced_ncf.apply(
        params, cfg.model,
        jnp.arange(8, dtype=jnp.int32),
        jnp.arange(8, dtype=jnp.int32)[:, None].repeat(3, 1) % 40,
        None, None, None, deterministic=True)
    assert np.isfinite(np.asarray(logits)).all()
