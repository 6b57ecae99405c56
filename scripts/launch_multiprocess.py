"""Local multi-process launch harness — the Vertex CustomJob analogue.

The reference launches training as a managed multi-worker job
(reference: scripts/1. datagen & training/04_vertex_job.py:25-58 builds an
aiplatform.CustomJob around ``python -m src.train``).  This script is the
TPU-native local equivalent: it SPAWNS N real OS processes, each of which
calls ``ncf_tpu.parallel.multihost.initialize_distributed`` against a
shared coordinator, forms ONE global ('dcn','ici') mesh across all
processes' devices, and runs sharded AdvancedNCF training steps with
per-process batch feeding — exercising coordinator init, cross-process
array construction, and compiler-inserted collectives end-to-end on CPU
devices (no cluster needed; CI-runnable).

Usage:
    python scripts/launch_multiprocess.py                 # 2 procs x 4 dev
    python scripts/launch_multiprocess.py --num-processes 4 \
        --devices-per-process 2 --steps 3
    # FULL composition: sparse row updates + row-sharded tables +
    # sequence path, with a cross-process sharded checkpoint at the end
    python scripts/launch_multiprocess.py --mode sparse_seq \
        --checkpoint-dir /tmp/mp_ckpt --out-json /tmp/mp.json
    # then validate the 2-process run against ONE process holding the
    # same (dcn x ici) mesh: loss-trajectory identity, topology-change
    # restore of the sharded checkpoint, consolidation, and a served
    # top-k match (reference anchor: consolidate_shards.py:72-116 — the
    # DMP sharded-checkpoint lifecycle across real process boundaries)
    python scripts/launch_multiprocess.py --single-process \
        --mode sparse_seq --checkpoint-dir /tmp/mp_ckpt \
        --out-json /tmp/sp.json

Exit 0 = every process initialized, stepped, and agreed on the loss.
"""

from __future__ import annotations

import argparse
import os
import socket
import subprocess
import sys

# self-locating: worker subprocesses are spawned as `python <this file>`,
# which puts scripts/ (not the repo root) on sys.path — the package must
# resolve without a pip install
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


# ------------------------------------------------------- shared setup

def _build_cfg(mode: str, n: int, ici: int):
    """Config + host-side const tables for a run, identical across every
    process AND the single-process checker (the loss-trajectory oracle).

    mode 'dense':      replicated-dense-param sharded training (original).
    mode 'sparse_seq': the FULL composition — rowwise-Adagrad sparse row
    updates (train/sparse.py) under row-sharded tables
    (train/sparse_sharded.py) with the sequence path's history attention,
    category hierarchy and temporal features all on.
    """
    import numpy as np

    from ncf_tpu.utils.config import Config

    cfg = Config()
    cfg.model.mf_dim = 16
    cfg.model.mlp_dim = 16
    cfg.model.temporal_dim = 8
    cfg.model.mlp_hidden_dims = [32, 16]
    cfg.model.compute_dtype = "float32"
    cfg.train.batch_size = 8 * n * ici
    tables = {}
    if mode == "sparse_seq":
        # big-vocab regime (entities > 4*B*S) so the precompute-OFF
        # sparse path applies; rows divide the ici axis
        cfg.model.num_users = 1024
        cfg.model.num_items = 1024
        cfg.model.use_sequence = True
        cfg.model.history_len = 4
        cfg.train.embedding_optimizer = "rowwise_adagrad"
        cfg.train.sparse_table_update = "on"
        tr = np.random.default_rng(11)
        hist = tr.integers(0, cfg.model.num_items,
                           (cfg.model.num_users, cfg.model.history_len))
        hist[tr.random(hist.shape) < 0.3] = -1       # ragged padding
        tables["user_history"] = hist.astype(np.int32)
        tables["item_dept"] = tr.integers(
            0, cfg.model.num_departments, cfg.model.num_items).astype(np.int32)
        tables["item_cat"] = tr.integers(
            0, cfg.model.num_categories, cfg.model.num_items).astype(np.int32)
    else:
        cfg.model.num_users = 16 * ici
        cfg.model.num_items = 16 * ici
    return cfg, tables


def _build_step(cfg, mesh, mode, neg_cdf, tables):
    """Step function + host-template (params, opt_state) for the mode.
    Placement onto the mesh is the caller's job (differs between the
    multi-process and single-process paths)."""
    import jax

    from ncf_tpu.models import get_model
    from ncf_tpu.train.optim import make_optimizer
    from ncf_tpu.train.step import make_train_step

    model = get_model(cfg.model.name)
    params = model.init(jax.random.PRNGKey(0), cfg.model)
    if mode == "sparse_seq":
        import dataclasses

        from ncf_tpu.train.optim import make_schedule
        from ncf_tpu.train.step import (init_sparse_opt_state,
                                        make_sparse_train_step,
                                        sparse_mode_available)

        assert sparse_mode_available(cfg, mesh), (
            "sparse_seq config must satisfy the sparse-path invariants")
        dense_cfg = dataclasses.replace(cfg.train, gradient_clip_norm=0.0)
        optimizer = make_optimizer(dense_cfg, steps_per_epoch=10)
        schedule = make_schedule(cfg.train, steps_per_epoch=10)
        opt_state = init_sparse_opt_state(optimizer, params)
        step_fn = make_sparse_train_step(
            model, cfg, optimizer, schedule, neg_cdf,
            tables.get("item_dept"), tables.get("item_cat"), mesh=mesh,
            user_history=tables.get("user_history"))
    else:
        optimizer = make_optimizer(cfg.train, steps_per_epoch=10)
        opt_state = optimizer.init(params)
        step_fn = make_train_step(model, cfg, optimizer, neg_cdf)
    return model, params, opt_state, step_fn


def _make_batches(cfg, steps: int):
    """The deterministic host data stream — identical in every process
    and in the single-process checker."""
    import numpy as np

    data_rng = np.random.default_rng(7)
    out = []
    B = cfg.train.batch_size
    for _ in range(steps):
        out.append({
            "user_ids": data_rng.integers(0, cfg.model.num_users, B),
            "item_ids": data_rng.integers(0, cfg.model.num_items, B),
            "hour": data_rng.integers(0, 24, B),
            "day": data_rng.integers(0, 7, B),
            "month": data_rng.integers(0, 12, B),
            "day_of_year": data_rng.integers(0, 365, B),
        })
    return out


# --------------------------------------------------------------- worker

def worker(args) -> int:
    # backend setup must precede the first jax import side effects
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.devices_per_process}"
    ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

    from ncf_tpu.parallel.multihost import (
        initialize_distributed, is_primary, local_batch_slice, sync_hosts)

    pid, n = initialize_distributed(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id)
    assert n == args.num_processes, f"process_count {n} != {args.num_processes}"

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ncf_tpu.data.sampler import make_sampling_cdf
    from ncf_tpu.parallel import make_mesh, param_shardings, state_shardings
    from ncf_tpu.parallel.mesh import DCN_AXIS, ICI_AXIS

    # one global mesh over every process's devices: hosts x chips
    ici = args.devices_per_process
    mesh = make_mesh(dcn=n, ici=ici)
    cfg, tables = _build_cfg(args.mode, n, ici)

    rep = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P((DCN_AXIS, ICI_AXIS)))
    # const tables ride replicated (every process passes the full array)
    dev_tables = {
        k: jax.make_array_from_process_local_data(rep, np.asarray(v))
        for k, v in tables.items()}
    neg_cdf = jax.make_array_from_process_local_data(
        rep, np.asarray(make_sampling_cdf(jnp.ones((cfg.model.num_items,)))))

    model, params, opt_state, step_fn = _build_step(
        cfg, mesh, args.mode, neg_cdf, dev_tables)

    # place global arrays from process-local data: every process passes
    # its addressable portion (full array for replicated/ici-sharded
    # leaves — the dcn axis replicates them across processes)
    p_sh = param_shardings(params, mesh, shard_embeddings=True)
    params = jax.tree_util.tree_map(
        lambda x, s: jax.make_array_from_process_local_data(
            s, np.asarray(x)), params, p_sh)
    o_sh = state_shardings(opt_state, mesh, shard_embeddings=True)
    opt_state = jax.tree_util.tree_map(
        lambda x, s: jax.make_array_from_process_local_data(
            s, np.asarray(x)), opt_state, o_sh)
    rng = jax.make_array_from_process_local_data(
        rep, np.asarray(jax.random.PRNGKey(1)))

    # per-process batch slice (the host feeds only its own devices)
    start, size = local_batch_slice(cfg.train.batch_size)
    losses = []
    with mesh:
        for full in _make_batches(cfg, args.steps):
            batch = {
                k: jax.make_array_from_process_local_data(
                    batch_sh, v[start:start + size].astype(np.int32))
                for k, v in full.items()}
            params, opt_state, rng, metrics = step_fn(
                params, opt_state, rng, batch)
            losses.append(float(metrics["loss"]))

    sync_hosts("final")
    from jax.experimental import multihost_utils

    all_last = np.asarray(
        multihost_utils.process_allgather(jnp.float32(losses[-1])))
    assert np.all(np.isfinite(all_last)), f"non-finite losses {all_last}"
    assert np.allclose(all_last, all_last[0]), (
        f"processes disagree on the loss: {all_last}")

    if args.checkpoint_dir:
        # cross-process SHARDED save: each process writes only its
        # addressable shards (train/checkpoint.py manifest format) —
        # the real-process-boundary version of the reference's DMP
        # sharded checkpoint (consolidate_shards.py:72-116)
        from ncf_tpu.train import checkpoint as ckpt_lib

        ckpt_lib.save(args.checkpoint_dir,
                      {"params": params, "opt_state": opt_state},
                      step=args.steps)
        sync_hosts("ckpt")

    if args.out_json and is_primary():
        import json

        with open(args.out_json, "w") as f:
            json.dump({"mode": args.mode, "losses": losses,
                       "num_processes": n, "ici": ici}, f)

    print(f"[worker {pid}/{n}] ok: primary={is_primary()} "
          f"losses={['%.4f' % l for l in losses]}", flush=True)
    return 0


# ----------------------------------------------- single-process checker

def single_process(args) -> int:
    """Run the SAME config on one process holding the whole (dcn x ici)
    mesh, then (a) assert loss-trajectory identity with a prior
    multi-process run (--out-json of that run vs this one), (b) restore
    the multi-process sharded checkpoint across the topology change,
    (c) consolidate it and serve top-k from the consolidated params —
    asserting they match serving from this run's own final params."""
    n, ici = args.num_processes, args.devices_per_process
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n * ici}").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    import json

    import numpy as np
    import jax.numpy as jnp

    from ncf_tpu.data.sampler import make_sampling_cdf
    from ncf_tpu.parallel import (make_mesh, param_shardings, replicated,
                                  shard_pytree, state_shardings)
    from ncf_tpu.parallel.mesh import batch_sharding

    mesh = make_mesh(dcn=n, ici=ici)
    cfg, tables = _build_cfg(args.mode, n, ici)
    rep = replicated(mesh)
    dev_tables = {k: jax.device_put(jnp.asarray(v), rep)
                  for k, v in tables.items()}
    neg_cdf = jax.device_put(
        make_sampling_cdf(jnp.ones((cfg.model.num_items,))), rep)
    model, params, opt_state, step_fn = _build_step(
        cfg, mesh, args.mode, neg_cdf, dev_tables)
    params = shard_pytree(params, param_shardings(params, mesh, True))
    opt_state = shard_pytree(opt_state, state_shardings(opt_state, mesh, True))
    rng = jax.device_put(jax.random.PRNGKey(1), rep)
    b_sh = batch_sharding(mesh)

    losses = []
    with mesh:
        for full in _make_batches(cfg, args.steps):
            batch = {k: jax.device_put(jnp.asarray(v.astype(np.int32)), b_sh)
                     for k, v in full.items()}
            params, opt_state, rng, metrics = step_fn(
                params, opt_state, rng, batch)
            losses.append(float(metrics["loss"]))
    print(f"[single-process] losses={['%.4f' % l for l in losses]}",
          flush=True)

    if args.out_json:
        ref = json.load(open(args.out_json))
        assert ref["mode"] == args.mode and ref["num_processes"] == n
        np.testing.assert_allclose(
            np.asarray(losses), np.asarray(ref["losses"]), rtol=2e-6,
            err_msg="multi-process trajectory != single-process trajectory")
        print("[single-process] trajectory identical to the "
              f"{n}-process run ({len(losses)} steps)", flush=True)

    if args.checkpoint_dir:
        from ncf_tpu.serving import ModelServer
        from ncf_tpu.train import checkpoint as ckpt_lib

        ckpt = ckpt_lib.find_latest(args.checkpoint_dir)
        assert ckpt, f"no checkpoint under {args.checkpoint_dir}"
        host = lambda t: jax.tree_util.tree_map(np.asarray, t)
        # (b) topology-change restore: 2-process shards -> 1 process.
        # Corroborate against this run's own final state: the grad psum
        # rides different collectives in the two topologies (~1e-11
        # reduction-order noise) and Adam's eps-division amplifies that
        # to ~1e-6 in params over the first steps, so this is a
        # tolerance check; bit-exactness is asserted below where it IS
        # guaranteed (restore-vs-consolidated-restore of the same bytes)
        state, _ = ckpt_lib.restore(
            ckpt, host({"params": params, "opt_state": opt_state}))
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-4),
            host({"params": params, "opt_state": opt_state}), state)
        print("[single-process] sharded checkpoint restored across the "
              "topology change; state matches this run's trajectory",
              flush=True)

        # (c) consolidate -> restore -> BIT-IDENTICAL to the sharded
        # restore (same source bytes through both paths)
        out_dir = args.checkpoint_dir.rstrip("/") + "_consolidated"
        cpath = ckpt_lib.consolidate(ckpt, out_dir)
        cstate, _ = ckpt_lib.restore(
            cpath, host({"params": params, "opt_state": opt_state}))
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)), state, cstate)
        print("[single-process] consolidation round-trips bit-exact",
              flush=True)

        # (d) serve from the sharded restore and from the consolidated
        # restore: identical params => identical top-k, exactly
        kw = dict(item_dept=tables.get("item_dept"),
                  item_cat=tables.get("item_cat"),
                  user_history=tables.get("user_history"))
        serve_a = ModelServer(cfg, params=state["params"], **kw)
        serve_b = ModelServer(cfg, params=cstate["params"], **kw)
        users = np.arange(8, dtype=np.int32)
        sa, ia, _ = serve_a.recommend_batch(users, k=5)
        sb, ib, _ = serve_b.recommend_batch(users, k=5)
        np.testing.assert_array_equal(np.asarray(ia), np.asarray(ib))
        np.testing.assert_array_equal(np.asarray(sa), np.asarray(sb))
        print("[single-process] restored checkpoint serves top-k "
              "(sharded == consolidated, exact)", flush=True)

    print("single_process: OK", flush=True)
    return 0


# -------------------------------------------------------------- launcher

def launch(args) -> int:
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    procs = []
    for i in range(args.num_processes):
        cmd = [
            sys.executable, os.path.abspath(__file__), "--worker",
            "--coordinator", coordinator,
            "--num-processes", str(args.num_processes),
            "--process-id", str(i),
            "--devices-per-process", str(args.devices_per_process),
            "--steps", str(args.steps),
            "--mode", args.mode,
        ]
        if args.checkpoint_dir:
            cmd += ["--checkpoint-dir", args.checkpoint_dir]
        if args.out_json:
            cmd += ["--out-json", args.out_json]
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)  # each worker sets its own device count
        procs.append(subprocess.Popen(
            cmd, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    rc = 0
    for i, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=args.timeout)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            print(f"--- worker {i} TIMED OUT ---\n{out}")
            rc = 1
            continue
        print(f"--- worker {i} (exit {p.returncode}) ---\n{out}", end="")
        rc = rc or p.returncode
    print("launch_multiprocess:", "OK" if rc == 0 else "FAILED")
    return rc


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--worker", action="store_true",
                    help="internal: run as a spawned worker process")
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--devices-per-process", type=int, default=4)
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--timeout", type=float, default=420.0)
    ap.add_argument("--mode", default="dense",
                    choices=["dense", "sparse_seq"],
                    help="dense = sharded dense training (original); "
                         "sparse_seq = sparse row updates + row-sharded "
                         "tables + sequence path")
    ap.add_argument("--checkpoint-dir", default="",
                    help="save a cross-process sharded checkpoint here "
                         "after the last step")
    ap.add_argument("--out-json", default="",
                    help="worker: write the loss trajectory here; "
                         "--single-process: compare against it")
    ap.add_argument("--single-process", action="store_true",
                    help="run the same config on ONE process holding the "
                         "whole mesh; verify trajectory/checkpoint/serving "
                         "against a prior multi-process run")
    args = ap.parse_args()
    if args.single_process:
        return single_process(args)
    return worker(args) if args.worker else launch(args)


if __name__ == "__main__":
    sys.exit(main())
