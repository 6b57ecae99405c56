"""Scalable leave-one-out eval (evals/evaluate.py::DeviceEvaluator).

Round-2 verdict item 3: the host-loop driver dispatched U/B device calls
with per-batch NumPy assembly — ~200k dispatches per eval epoch at
BASELINE-config-5 scale.  DeviceEvaluator uploads the padded candidate
sets once and runs ONE lax.scan dispatch per evaluation; these tests pin
its equivalence to the host loop, the eval_user_sample determinism, and
the mesh path.
"""

import jax
import numpy as np
import pytest

from ncf_tpu.data import generate_interactions
from ncf_tpu.evals import (
    DeviceEvaluator,
    EvalSet,
    evaluate,
    make_score_fn,
    sample_eval_users,
)
from ncf_tpu.models import get_model
from ncf_tpu.utils.config import Config


@pytest.fixture(scope="module")
def setup():
    inter = generate_interactions(num_users=300, num_items=80, num_days=40,
                                  avg_txns_per_user=10, seed=3)
    cfg = Config()
    cfg.model.num_users = inter.num_users
    cfg.model.num_items = inter.num_items
    cfg.model.num_departments = inter.num_departments
    cfg.model.num_categories = inter.num_categories
    cfg.model.mf_dim = 8
    cfg.model.mlp_dim = 8
    cfg.model.temporal_dim = 4
    cfg.model.mlp_hidden_dims = [16, 8]
    cfg.model.compute_dtype = "float32"
    model = get_model("advanced_ncf")
    params = model.init(jax.random.PRNGKey(1), cfg.model)
    _, eval_users, eval_items = inter.leave_one_out()
    eval_set = EvalSet.build(inter, eval_users, eval_items,
                             num_negatives=20, seed=0)
    return inter, cfg, model, params, eval_set


def test_device_evaluator_matches_host_loop(setup):
    """Same ranks, same metrics as the per-batch host driver — including
    a batch size that does not divide the user count (padding path)."""
    inter, cfg, model, params, eval_set = setup
    score_fn = make_score_fn(model, params, cfg.model,
                             inter.item_dept, inter.item_cat)
    host = evaluate(score_fn, eval_set, batch_size=128)
    dev = DeviceEvaluator(model, cfg.model, eval_set, batch_size=128,
                          item_dept=inter.item_dept, item_cat=inter.item_cat)
    got = dev(params)
    assert got.keys() == host.keys()
    for k in host:
        assert got[k] == pytest.approx(host[k], abs=1e-6), k


def test_device_evaluator_single_dispatch_ranks(setup):
    inter, cfg, model, params, eval_set = setup
    dev = DeviceEvaluator(model, cfg.model, eval_set, batch_size=64,
                          item_dept=inter.item_dept, item_cat=inter.item_cat)
    ranks = dev.ranks(params)
    assert ranks.shape == (len(eval_set.users),)
    assert ranks.dtype == np.int32
    assert (ranks >= 0).all() and (ranks <= eval_set.candidates.shape[1] - 1).all()


def test_sample_eval_users_deterministic():
    users = np.arange(1000, dtype=np.int32)
    items = np.arange(1000, 2000, dtype=np.int32)
    u1, i1 = sample_eval_users(users, items, 100, seed=5)
    u2, i2 = sample_eval_users(users, items, 100, seed=5)
    np.testing.assert_array_equal(u1, u2)
    np.testing.assert_array_equal(i1, i2)
    assert len(u1) == 100
    # pairs stay aligned
    np.testing.assert_array_equal(i1, u1 + 1000)
    # different seed, different sample
    u3, _ = sample_eval_users(users, items, 100, seed=6)
    assert not np.array_equal(u1, u3)
    # no-op when the cap is off or not binding
    u4, _ = sample_eval_users(users, items, 0, seed=5)
    assert u4 is users
    u5, _ = sample_eval_users(users, items, 5000, seed=5)
    assert u5 is users


def test_trainer_eval_user_sample_caps_eval_set():
    inter = generate_interactions(num_users=400, num_items=64, num_days=30,
                                  avg_txns_per_user=8, seed=1)
    from ncf_tpu.train import Trainer
    import tempfile
    cfg = Config()
    cfg.model.mf_dim = 8
    cfg.model.mlp_dim = 8
    cfg.model.temporal_dim = 4
    cfg.model.mlp_hidden_dims = [16, 8]
    cfg.model.compute_dtype = "float32"
    cfg.train.batch_size = 128
    cfg.train.num_epochs = 1
    cfg.train.checkpoint_dir = tempfile.mkdtemp()
    cfg.data.eval_user_sample = 50
    t = Trainer(cfg, inter)
    assert len(t.eval_set.users) == 50
    m = t.validate(0)
    assert m["num_eval_users"] == 50.0


def test_device_evaluator_on_mesh(setup):
    """Stacked arrays replicated over a mesh coexist with sharded params."""
    inter, cfg, model, params, eval_set = setup
    from ncf_tpu.parallel import make_mesh, param_shardings, replicated, shard_pytree
    mesh = make_mesh(dcn=1, ici=8)
    # tables here aren't divisible by 8 necessarily; use whatever shards fit
    p_sh = param_shardings(params, mesh, shard_embeddings=True)
    sharded = shard_pytree(params, p_sh)
    dev = DeviceEvaluator(model, cfg.model, eval_set, batch_size=128,
                          item_dept=inter.item_dept, item_cat=inter.item_cat,
                          sharding=replicated(mesh))
    base = DeviceEvaluator(model, cfg.model, eval_set, batch_size=128,
                           item_dept=inter.item_dept, item_cat=inter.item_cat)
    np.testing.assert_array_equal(dev.ranks(sharded), base.ranks(params))
