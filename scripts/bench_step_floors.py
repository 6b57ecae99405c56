"""Per-component standalone floors for the flagship train step
(round-4 verdict task 3, second half): dispatch_wall.py shows the step
runs at ~100% device occupancy — there is NO idle/dispatch gap to
recover — so the only honest "wall" statement is that the big ops on
the critical path each run at (or near) the time they cost STANDALONE.
This bench measures exactly that: each major step component alone, at
the exact flagship shape (B=16384, S=5, 6040x3706 vocab, fused [*,128]
tables, bf16 activations), iterated inside ONE jitted lax.scan with a
zero-at-runtime data dependence between iterations (the tunnel pays
~50 ms per host dispatch — host-loop chaining is useless here), short/
long scan differencing for the marginal per-iteration cost.

The sum of components vs the measured ~1.34 ms step, and each component
vs its own bytes/FLOP roofline, is the arithmetic that replaces the
round-4 "small-kernel bound — parked" hand-wave.

Writes results/step_floors.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_default_prng_impl", "rbg")
jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

B, S, D2, DMF = 16384, 5, 128, 64
U, V = 6040, 3706
PEAK_HBM = 819e9
N_SHORT, N_LONG = 16, 128


def scan_time_us(body, n_short=N_SHORT, n_long=N_LONG, reps=4) -> float:
    """Marginal per-iteration time of ``body(c) -> c`` (int32-scalar
    carry, value 0 at runtime but data-dependent on the previous
    iteration's output) inside one jitted lax.scan."""
    c0 = jnp.zeros((), jnp.int32)

    def make(nn):
        @jax.jit
        def run(c):
            def step(c, _):
                return body(c), ()
            c, _ = jax.lax.scan(step, c, None, length=nn)
            return c
        return run

    def t_of(nn):
        run = make(nn)
        _ = np.asarray(run(c0))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            _ = np.asarray(run(c0))
            best = min(best, time.perf_counter() - t0)
        return best

    return 1e6 * (t_of(n_long) - t_of(n_short)) / (n_long - n_short)


def dep(out) -> jax.Array:
    """int32 0 (at runtime) data-dependent on ``out``."""
    lead = jax.tree_util.tree_leaves(out)[0]
    return (lead.reshape(-1)[0].astype(jnp.float32) * 1e-30).astype(jnp.int32)


def main():
    rng = np.random.default_rng(0)
    res = {}

    item_t = jnp.asarray(rng.normal(size=(V, D2)), jnp.bfloat16)
    user_t = jnp.asarray(rng.normal(size=(U, D2)), jnp.bfloat16)
    from ncf_tpu.data.sampler import (make_sampling_cdf,
                                      sample_negatives_stratified)

    counts0 = rng.zipf(1.3, V).astype(np.float64)
    cdf0 = make_sampling_cdf(1.0 / counts0)
    pos0 = jnp.asarray(rng.integers(0, V, B), jnp.int32)
    negs0 = sample_negatives_stratified(
        jax.random.PRNGKey(9), pos0, V, 4, cdf=cdf0)
    # ids exactly as the step lays them out: [B, 1+4].reshape(-1)
    item_ids = jnp.concatenate([pos0[:, None], negs0], axis=1).reshape(-1)
    user_ids = jnp.asarray(np.sort(rng.integers(0, U, B)), jnp.int32)

    # ---- gathers (fwd)
    res["item_gather_us"] = scan_time_us(
        lambda c: dep(jnp.take(item_t, item_ids + c, axis=0)))
    res["user_gather_us"] = scan_time_us(
        lambda c: dep(jnp.take(user_t, user_ids + c, axis=0)))
    res["gather_bytes_roofline_us"] = 1e6 * (
        2 * (B * S + B) * D2 * 2) / PEAK_HBM

    # ---- scatter-adds (bwd, the shipped "fast" bf16 one-hot kernel)
    from ncf_tpu.ops.pallas_scatter import onehot_scatter_add

    g_i = jnp.asarray(rng.normal(size=(B * S, D2)), jnp.bfloat16)
    g_u = jnp.asarray(rng.normal(size=(B, D2)), jnp.bfloat16)
    res["item_scatter_us"] = scan_time_us(
        lambda c: dep(onehot_scatter_add(item_ids + c, g_i, V, mode="bf16")))
    res["user_scatter_us"] = scan_time_us(
        lambda c: dep(onehot_scatter_add(user_ids + c, g_u, U, mode="bf16")))
    res["scatter_mxu_roofline_us"] = 1e6 * (
        2 * (B * S * V + B * U) * D2) / 197e12

    # ---- fused tower fwd / fwd+bwd at the joint-mode shape [B, 96]
    from ncf_tpu.models.layers import mlp_tower_init
    from ncf_tpu.ops.pallas_tower import fused_tower

    layers = mlp_tower_init(jax.random.PRNGKey(0), DMF + 32, [256, 128, 64])
    x_t = jnp.asarray(rng.normal(size=(B, DMF + 32)), jnp.bfloat16)
    key_t = jax.random.PRNGKey(1)

    res["tower_fwd_us"] = scan_time_us(
        lambda c: dep(fused_tower(
            layers, x_t + c.astype(jnp.bfloat16), 0.2,
            jax.random.fold_in(key_t, c), False)))

    def tower_loss(x, key):
        return fused_tower(layers, x, 0.2, key, False).astype(
            jnp.float32).sum()

    tg = jax.grad(tower_loss)
    res["tower_fwd_bwd_us"] = scan_time_us(
        lambda c: dep(tg(x_t + c.astype(jnp.bfloat16),
                         jax.random.fold_in(key_t, c))))

    # ---- attention block fwd+bwd (projections + softmax pool) at
    # [B, S, 128] -> [B, 128]
    from ncf_tpu.models.advanced_ncf import _single_query_attention
    from ncf_tpu.models.layers import mha_init

    p_attn = mha_init(jax.random.PRNGKey(2), D2)
    im = jnp.asarray(rng.normal(size=(B, S, D2)), jnp.bfloat16)
    um = jnp.asarray(rng.normal(size=(B, D2)), jnp.bfloat16)

    def attn_fwd(im, key):
        return _single_query_attention(
            p_attn, um, im, 4, 0.2, key, False, jnp.bfloat16)

    res["attention_fwd_us"] = scan_time_us(
        lambda c: dep(attn_fwd(im + c.astype(jnp.bfloat16),
                               jax.random.fold_in(key_t, c))))
    ag = jax.grad(lambda x, k: attn_fwd(x, k).astype(jnp.float32).sum())
    res["attention_fwd_bwd_us"] = scan_time_us(
        lambda c: dep(ag(im + c.astype(jnp.bfloat16),
                         jax.random.fold_in(key_t, c))))

    # ---- negative sampler (stratified, the shipped tree kernel)
    from ncf_tpu.data.sampler import make_sampling_cdf
    from ncf_tpu.train.step import sample_negatives_stratified

    counts = rng.zipf(1.3, V).astype(np.float64)
    cdf = make_sampling_cdf(1.0 / counts)
    pos = jnp.asarray(rng.integers(0, V, B), jnp.int32)
    key0 = jax.random.PRNGKey(5)

    res["sampler_us"] = scan_time_us(
        lambda c: dep(sample_negatives_stratified(
            jax.random.fold_in(key0, c), pos, V, 4, cdf=cdf)))

    # ---- full-table Adam update (clip+wd+adam on both fused tables —
    # the dense-path optimizer's table traffic; dense grads enter as
    # bf16 from the scatter kernel, tables/moments are f32)
    import optax

    tx = optax.chain(optax.clip_by_global_norm(5.0),
                     optax.add_decayed_weights(1e-5),
                     optax.scale_by_adam(), optax.scale(-1e-3))
    tabs = {"u": jnp.asarray(rng.normal(size=(U, D2)), jnp.float32),
            "i": jnp.asarray(rng.normal(size=(V, D2)), jnp.float32)}
    state0 = tx.init(tabs)
    g0 = jax.tree.map(lambda x: (x * 1e-3).astype(jnp.bfloat16), tabs)

    def adam_body(carry):
        tabs, state = carry
        g = jax.tree.map(lambda x: x.astype(jnp.bfloat16) * 1e-3, tabs)
        up, state = tx.update(g, state, tabs)
        return optax.apply_updates(tabs, up), state

    def make(nn):
        @jax.jit
        def run(tabs, state):
            def step(c, _):
                return adam_body(c), ()
            (tabs, state), _ = jax.lax.scan(
                step, (tabs, state), None, length=nn)
            return tabs
        return run

    def t_of(nn):
        run = make(nn)
        _ = np.asarray(run(tabs, state0)["u"])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(run(tabs, state0)["u"])
            best = min(best, time.perf_counter() - t0)
        return best

    res["table_adam_us"] = 1e6 * (t_of(N_LONG) - t_of(N_SHORT)) / (
        N_LONG - N_SHORT)
    res["table_adam_bytes_roofline_us"] = 1e6 * (
        (U + V) * D2 * 4 * 7) / PEAK_HBM

    # ---- vocab precompute (4x LN over the tables, bf16 cast + concat)
    from ncf_tpu.models.layers import layer_norm, layer_norm_init

    ln = layer_norm_init(DMF)
    raw_i = jnp.asarray(rng.normal(size=(V, D2)), jnp.float32)
    raw_u = jnp.asarray(rng.normal(size=(U, D2)), jnp.float32)

    def precompute(c):
        ri = raw_i + c
        a = layer_norm(ln, ri[:, :DMF])
        b = layer_norm(ln, ri[:, DMF:])
        cc = layer_norm(ln, raw_u[:, :DMF])
        d = layer_norm(ln, raw_u[:, DMF:])
        return dep((jnp.concatenate([a, b], -1).astype(jnp.bfloat16),
                    jnp.concatenate([cc, d], -1).astype(jnp.bfloat16)))

    res["vocab_precompute_fwd_us"] = scan_time_us(precompute)

    for k_, v_ in res.items():
        res[k_] = round(v_, 2)
    total = sum(v_ for k_, v_ in res.items()
                if k_.endswith("_us") and "roofline" not in k_
                and k_ not in ("tower_fwd_us", "attention_fwd_us"))
    res["sum_components_us"] = round(total, 1)
    print(json.dumps(res, indent=2))
    os.makedirs("results", exist_ok=True)
    with open("results/step_floors.json", "w") as f:
        json.dump(res, f, indent=2)


if __name__ == "__main__":
    main()
