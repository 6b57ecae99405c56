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
    from ncf_tpu.models import get_model
    from ncf_tpu.parallel import make_mesh, param_shardings
    from ncf_tpu.parallel.mesh import DCN_AXIS, ICI_AXIS
    from ncf_tpu.train.optim import make_optimizer
    from ncf_tpu.train.step import make_train_step
    from ncf_tpu.utils.config import Config

    # one global mesh over every process's devices: hosts x chips
    mesh = make_mesh(dcn=n, ici=args.devices_per_process)

    ici = args.devices_per_process
    cfg = Config()
    cfg.model.num_users = 16 * ici
    cfg.model.num_items = 16 * ici
    cfg.model.mf_dim = 16
    cfg.model.mlp_dim = 16
    cfg.model.temporal_dim = 8
    cfg.model.mlp_hidden_dims = [32, 16]
    cfg.model.compute_dtype = "float32"
    cfg.train.batch_size = 8 * n * ici

    model = get_model(cfg.model.name)
    params = model.init(jax.random.PRNGKey(0), cfg.model)  # same on all procs
    optimizer = make_optimizer(cfg.train, steps_per_epoch=10)
    opt_state = optimizer.init(params)

    # place global arrays from process-local data: every process passes
    # its addressable portion (full array for replicated/ici-sharded
    # leaves — the dcn axis replicates them across processes)
    p_sh = param_shardings(params, mesh, shard_embeddings=True)
    params = jax.tree_util.tree_map(
        lambda x, s: jax.make_array_from_process_local_data(
            s, np.asarray(x)), params, p_sh)
    opt_state = jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            NamedSharding(mesh, P()), np.asarray(x)), opt_state)

    rep = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P((DCN_AXIS, ICI_AXIS)))

    neg_cdf = jax.make_array_from_process_local_data(
        rep, np.asarray(make_sampling_cdf(jnp.ones((cfg.model.num_items,)))))
    step_fn = make_train_step(model, cfg, optimizer, neg_cdf)
    rng = jax.make_array_from_process_local_data(
        rep, np.asarray(jax.random.PRNGKey(1)))

    # per-process batch slice (the host feeds only its own devices)
    start, size = local_batch_slice(cfg.train.batch_size)
    data_rng = np.random.default_rng(7)  # identical stream on all procs
    losses = []
    with mesh:
        for step in range(args.steps):
            full = {
                "user_ids": data_rng.integers(
                    0, cfg.model.num_users, cfg.train.batch_size),
                "item_ids": data_rng.integers(
                    0, cfg.model.num_items, cfg.train.batch_size),
                "hour": data_rng.integers(0, 24, cfg.train.batch_size),
                "day": data_rng.integers(0, 7, cfg.train.batch_size),
                "month": data_rng.integers(0, 12, cfg.train.batch_size),
                "day_of_year": data_rng.integers(0, 365, cfg.train.batch_size),
            }
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
    print(f"[worker {pid}/{n}] ok: primary={is_primary()} "
          f"losses={['%.4f' % l for l in losses]}", flush=True)
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
        ]
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
    args = ap.parse_args()
    return worker(args) if args.worker else launch(args)


if __name__ == "__main__":
    sys.exit(main())
