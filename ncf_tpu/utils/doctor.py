"""Environment validator — ``ncf-tpu doctor``.

The TPU-native analogue of the reference's setup validator
(reference: scripts/0. setup/validate_setup.py:17-30, which checks
buckets / service accounts / BigQuery views / Vertex endpoints before
anything runs).  Here the checks are the ones that matter without a
cloud: accelerator visibility, a real compile smoke, the HBM budget of
the CONFIGURED model vs the device, artifact-store writability, the
native data-loader build, and (optionally) redis reachability.

Each check returns (status, message) with status in {"ok", "warn",
"fail"}; ``run()`` prints a report and returns a process exit code
(0 = no failures).  Pure stdlib + jax — safe to run anywhere,
including CI and inside the serving container (deploy/Containerfile.api).
"""

from __future__ import annotations

import os
import tempfile
import time
from typing import Callable, List, Optional, Tuple

Check = Tuple[str, str, str]   # (name, status, message)


def _fmt_bytes(n: float) -> str:
    for unit in ("B", "KB", "MB", "GB", "TB"):
        if abs(n) < 1024 or unit == "TB":
            return f"{n:.1f} {unit}"
        n /= 1024
    return f"{n:.1f} TB"


def check_devices() -> Check:
    import jax

    try:
        devs = jax.devices()
    except Exception as e:                                # pragma: no cover
        return ("devices", "fail", f"jax.devices() raised: {e}")
    if not devs:
        return ("devices", "fail", "no XLA devices visible")
    kinds = {d.device_kind for d in devs}
    platform = jax.default_backend()
    msg = f"{len(devs)}x {'/'.join(sorted(kinds))} (backend={platform})"
    if platform == "cpu":
        return ("devices", "warn", msg + " — no accelerator; training "
                "will run but far below the TPU numbers in BASELINE.md")
    return ("devices", "ok", msg)


def check_compile_smoke() -> Check:
    import jax
    import jax.numpy as jnp

    try:
        t0 = time.time()
        y = jax.jit(lambda x: (x @ x.T).sum())(jnp.ones((128, 128)))
        y.block_until_ready()
        return ("compile", "ok",
                f"jit matmul compiled+ran in {time.time() - t0:.2f}s "
                f"(= {float(y):.0f})")
    except Exception as e:
        return ("compile", "fail", f"jit smoke failed: {e}")


def estimate_train_hbm(cfg) -> int:
    """Rough peak-HBM estimate for a training step of the configured
    model: fused tables + dense params, optimizer state (adam = 2 slots;
    rowwise_adagrad = 1 scalar/row), gradients, and the dominant batch
    activations.  Deliberately conservative (f32 accounting)."""
    m, t = cfg.model, cfg.train
    d2 = m.mf_dim + m.mlp_dim
    table_rows = m.num_users + m.num_items
    table = table_rows * d2 * 4
    dense = (sum(a * b for a, b in zip(
        [m.mlp_dim + (m.mlp_dim if m.use_sequence else 0) + m.temporal_dim]
        + list(m.mlp_hidden_dims[:-1]), m.mlp_hidden_dims))
        + 4 * m.mlp_dim * m.mlp_dim + m.temporal_dim * 64) * 4
    params = table + dense
    if t.embedding_optimizer == "rowwise_adagrad":
        opt = table_rows * 4 + 2 * dense * 2 + params  # row slots + adam on dense + grads
    else:
        opt = 3 * params                               # m + v + grads
    S = 1 + m.negative_samples
    rows = t.batch_size * S * (1 + (m.history_len if m.use_sequence else 0))
    acts = rows * (d2 + sum(m.mlp_hidden_dims)) * 2 * 3   # bf16, fwd+bwd
    return int(params + opt + acts)


def check_hbm_budget(cfg) -> Check:
    import jax

    est = estimate_train_hbm(cfg)
    try:
        stats = jax.devices()[0].memory_stats() or {}
        limit = stats.get("bytes_limit") or stats.get("bytes_reservable_limit")
    except Exception:
        limit = None
    if not limit:
        return ("hbm", "warn",
                f"estimated train footprint {_fmt_bytes(est)}; device "
                "reports no memory limit (CPU backend?)")
    frac = est / limit
    msg = (f"estimated train footprint {_fmt_bytes(est)} of "
           f"{_fmt_bytes(limit)} ({frac:.0%})")
    if frac > 1.0:
        return ("hbm", "fail", msg + " — enable "
                "train.sparse_table_update/rowwise_adagrad or shard the "
                "tables over a mesh (configs/mesh.yaml)")
    if frac > 0.7:
        return ("hbm", "warn", msg)
    return ("hbm", "ok", msg)


def check_mesh(cfg) -> Check:
    import jax

    mesh = cfg.mesh
    have = len(jax.devices())
    if mesh.enable == "off":
        return ("mesh", "ok", "single-device config (mesh.enable=off)")
    ici = mesh.ici_axis if mesh.ici_axis > 0 else have
    want = mesh.dcn_axis * ici
    shape = f"(dcn={mesh.dcn_axis}, ici={ici})"
    if want > have and mesh.enable == "on":
        return ("mesh", "fail",
                f"mesh {shape} needs {want} devices, {have} visible (set "
                f"XLA_FLAGS=--xla_force_host_platform_device_count={want} "
                "for CPU-mesh testing)")
    if want > have:
        return ("mesh", "warn",
                f"mesh {shape} needs {want} devices, {have} visible — "
                "mesh.enable=auto will fall back to single-device")
    return ("mesh", "ok", f"mesh {shape} fits {have} visible devices")


def check_artifact_store(cfg) -> Check:
    d = cfg.train.checkpoint_dir or "checkpoints"
    try:
        os.makedirs(d, exist_ok=True)
        with tempfile.NamedTemporaryFile(dir=d, prefix=".doctor_", mode="w") as f:
            f.write("ok")
        return ("artifact_store", "ok", f"checkpoint dir writable: {d}")
    except OSError as e:
        return ("artifact_store", "fail",
                f"checkpoint dir {d!r} not writable: {e}")


def check_native_loader() -> Check:
    try:
        from ncf_tpu import native
        lib = native.get_lib()
    except Exception as e:                                # pragma: no cover
        return ("native", "fail", f"native module import failed: {e}")
    if lib is None:
        return ("native", "warn",
                "libncf_native.so unavailable (no toolchain?); the NumPy "
                "fallback sampler is active — correct but slower "
                "host-side sampling")
    return ("native", "ok", "C++ alias sampler/CSR loader loaded")


def check_redis(cfg) -> Check:
    url = getattr(cfg.serving, "redis_url", "") or os.environ.get(
        "NCF_REDIS_URL", "")
    if not url:
        return ("redis", "ok",
                "no redis configured; in-process TTL cache active "
                "(serving works without it)")
    try:
        import redis  # optional dependency

        client = redis.from_url(url, socket_connect_timeout=2)
        client.ping()
        return ("redis", "ok", f"redis reachable at {url}")
    except Exception as e:
        return ("redis", "warn",
                f"redis configured ({url}) but unreachable: {e} — "
                "FeatureCache will fall back to the in-process cache")


def check_config(cfg) -> Check:
    try:
        cfg.validate()
        return ("config", "ok", "config invariants hold")
    except ValueError as e:
        return ("config", "fail", str(e))


def run(cfg, out=print) -> int:
    """Run all checks, print a report, return an exit code."""
    checks: List[Callable[[], Check]] = [
        lambda: check_config(cfg),
        check_devices,
        check_compile_smoke,
        lambda: check_hbm_budget(cfg),
        lambda: check_mesh(cfg),
        lambda: check_artifact_store(cfg),
        check_native_loader,
        lambda: check_redis(cfg),
    ]
    icons = {"ok": "✓", "warn": "!", "fail": "✗"}
    worst = 0
    for fn in checks:
        try:
            name, status, msg = fn()
        except Exception as e:                            # pragma: no cover
            name, status, msg = (getattr(fn, "__name__", "check"),
                                 "fail", f"check crashed: {e}")
        out(f"{icons[status]} {name:<15} {msg}")
        worst = max(worst, {"ok": 0, "warn": 0, "fail": 1}[status])
    out("doctor: " + ("all checks passed" if worst == 0
                      else "FAILURES found — see above"))
    return worst
