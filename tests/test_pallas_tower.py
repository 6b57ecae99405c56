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


# ---------------------------------------------------------------- mesh path
# The fused tower under jax.shard_map (multichip training: rows split
# over the batch axes, param grads psum'd in the manual backward).

from ncf_tpu.parallel import make_mesh  # noqa: E402


@pytest.mark.parametrize("dcn,ici", [(1, 8), (2, 4)])
def test_mesh_forward_matches_single(setup, dcn, ici):
    layers, x = setup
    mesh = make_mesh(dcn=dcn, ici=ici)
    ref = mlp_tower(layers, x, 0.0, None, True, jnp.bfloat16)
    out = fused_tower(layers, x, 0.0, None, True, interpret=True, mesh=mesh)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))
    single = fused_tower(layers, x, 0.0, None, True, interpret=True)
    np.testing.assert_array_equal(np.asarray(single), np.asarray(out))


def test_mesh_gradients_match_single_fused(setup):
    """Sharded backward == single-device fused backward up to f32
    psum reduction order (both are the same f32 recompute kernel)."""
    layers, x = setup
    mesh = make_mesh(dcn=2, ici=4)

    def loss(fn):
        def f(layers, x):
            return (fn(layers, x) ** 2).sum()
        return f

    single = loss(lambda l, xx: fused_tower(
        l, xx, 0.0, None, True, interpret=True))
    sharded = loss(lambda l, xx: fused_tower(
        l, xx, 0.0, None, True, interpret=True, mesh=mesh))
    gs, gxs = jax.grad(single, argnums=(0, 1))(layers, x)
    gm, gxm = jax.grad(sharded, argnums=(0, 1))(layers, x)
    flat_s = jax.tree_util.tree_flatten_with_path(gs)[0]
    flat_m = dict(jax.tree_util.tree_flatten_with_path(gm)[0])
    for path, leaf in flat_s:
        np.testing.assert_allclose(
            np.asarray(leaf, np.float32),
            np.asarray(flat_m[path], np.float32),
            rtol=1e-4, atol=1e-5, err_msg=jax.tree_util.keystr(path))
    np.testing.assert_allclose(np.asarray(gxs, np.float32),
                               np.asarray(gxm, np.float32),
                               rtol=1e-4, atol=1e-5)


def _trainer_cfg(tmp_path, tag, tower_mode, pipeline="auto"):
    from ncf_tpu.utils.config import Config

    cfg = Config()
    cfg.train.input_pipeline = pipeline
    cfg.model.num_users = 896
    cfg.model.num_items = 640
    cfg.model.mf_dim = 8
    cfg.model.mlp_dim = 8
    cfg.model.temporal_dim = 4
    cfg.model.mlp_hidden_dims = [16, 8]
    cfg.model.compute_dtype = "float32"
    cfg.model.dropout = 0.0            # interpret mode has no Mosaic PRNG
    cfg.model.fused_tower = tower_mode
    # one batch >= the whole train split: the epoch is ONE Adam step, so
    # the mesh-vs-single comparison stays at grad-tolerance scale (f32
    # psum reduction order) instead of compounding through Adam's
    # sqrt-normalization over many steps
    cfg.train.batch_size = 8192
    cfg.train.num_epochs = 1
    cfg.train.embedding_scatter = "xla"
    cfg.train.checkpoint_dir = str(tmp_path / tag)
    return cfg


@pytest.fixture(scope="module")
def inter_small():
    from ncf_tpu.data.synthetic import generate_interactions

    return generate_interactions(num_users=896, num_items=640, num_days=40,
                                 avg_txns_per_user=6, seed=11)


def test_trainer_mesh_fused_tower(inter_small, tmp_path):
    """Full Trainer step under a (1,8) mesh with the fused tower routed
    through shard_map ('interpret' CI mode) vs the single-device fused
    run: same data, same rng stream -> params agree to f32 reduction
    order."""
    from ncf_tpu.train import Trainer

    t1 = Trainer(_trainer_cfg(tmp_path, "t1", "interpret",
                              pipeline="host"), inter_small)
    t1.train_epoch(0)
    t8 = Trainer(_trainer_cfg(tmp_path, "t8", "interpret"), inter_small,
                 mesh=make_mesh(dcn=1, ici=8))
    assert getattr(t8.cfg.model, "_tower_mesh", None) is not None
    t8.train_epoch(0)
    fa = jax.tree_util.tree_flatten_with_path(t1.params)[0]
    fb = dict(jax.tree_util.tree_flatten_with_path(t8.params)[0])
    for path, leaf in fa:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(fb[path]), rtol=2e-4, atol=2e-5,
            err_msg=jax.tree_util.keystr(path))
