"""Fused MLP-tower kernel: the whole [Linear -> ReLU -> LayerNorm ->
Dropout] stack (reference architecture.py:230-242) in ONE Pallas kernel
per direction.

Why: the tower dominates the training step in independent candidate
mode — measured 2.36 ms of the 3.54 ms step (67%) at [81920, 96 -> 256
-> 128 -> 64], batch 16384 x 5 slots, yet its FLOP floor is ~0.16 ms
and its HBM floor ~0.4 ms (BENCH_NOTES round 4).  XLA builds it as ~30
small kernels (per-layer matmul + LN stats + dropout mask + layout
copies) whose f32 inter-layer activations round-trip HBM.  Here:

  - forward: one kernel, one pass over the rows; inter-layer
    activations never leave VMEM; dropout masks come from the on-core
    PRNG (seeded per (row-tile, layer) — no HBM mask traffic).
  - backward: one kernel that RECOMPUTES the forward per row-tile
    (the FLOPs are cheap; the activations staying in VMEM is the win),
    reusing the identical PRNG sequence for bit-identical masks, then
    chains ReLU/LN/dropout/matmul backward and accumulates dW/db/dg/dbe
    across row tiles in VMEM scratch (TPU grid iterations are
    sequential — same pattern as ops/pallas_scatter.py).

HBM traffic: fwd reads x once + writes y once; bwd reads (x, dy) once +
writes (dx, weight grads) once — the analytic minimum for a no-remat
interface.

Numerics vs the XLA path (models/layers.py::mlp_tower): matmuls run
bf16 x bf16 -> f32 accumulation in forward (same as ``dense``), f32 in
backward; LayerNorm in f32 (same).  Dropout masks draw from the Mosaic
PRNG instead of ``jax.random.bernoulli``, so masks differ stream-wise
from the XLA path at equal rate — the same class of deviation as the
validated bf16 scatter path (convergence A/B required before default-on;
see BENCH_NOTES round 4).

Dim constraints: every hidden dim is padded to a lane multiple (128)
with zero weight columns/rows; LayerNorm statistics divide by the REAL
width with padded lanes masked out of the variance, and zero
scale/bias on padded lanes pins them to exact zero through the stack.
"""

from __future__ import annotations

import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROW_TILE = 1024      # rows per grid step (bf16 sublane multiple)
_LANE = 128
_EPS = 1e-5


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _layer_fwd(h_bf16, w_ref, b_ref, g_ref, be_ref, real_dim: int,
               keep: float, use_dropout: bool, tile_rows: int):
    """One tower layer on a resident tile.  Returns (h_out_f32, z_f32,
    mean, rstd, drop_mask) — the residuals backward recomputes too."""
    hpad = w_ref.shape[1]
    z = jnp.dot(h_bf16, w_ref[:].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
    z = z + b_ref[:].astype(jnp.float32)
    z = jnp.maximum(z, 0.0)                               # ReLU
    # masked LayerNorm over the REAL lanes (padded lanes carry exact
    # zeros out of the matmul, but must not pollute the variance)
    if real_dim != hpad:
        lane = jax.lax.broadcasted_iota(jnp.int32, z.shape, 1)
        mask = (lane < real_dim).astype(jnp.float32)
    else:
        mask = None
    mean = jnp.sum(z, axis=1, keepdims=True) / real_dim   # pads are 0
    xm = z - mean
    if mask is not None:
        xm = xm * mask
    var = jnp.sum(xm * xm, axis=1, keepdims=True) / real_dim
    rstd = jax.lax.rsqrt(var + _EPS)
    y = xm * rstd * g_ref[:].astype(jnp.float32) + be_ref[:].astype(
        jnp.float32)
    # padded lanes: g == be == 0  =>  y == 0 exactly
    if use_dropout:
        bits = pltpu.prng_random_bits((tile_rows, hpad))
        thresh = jnp.uint32(min(int(keep * 2.0 ** 32), 2 ** 32 - 1))
        dmask = (pltpu.bitcast(bits, jnp.uint32) < thresh)
        y = jnp.where(dmask, y * (1.0 / keep), 0.0)
    else:
        dmask = None
    return y, z, mean, rstd, dmask


def _make_fwd_kernel(dims_pad, dims_real, keep: float, use_dropout: bool,
                     tile_rows: int, n_layers: int):
    def kernel(seed_ref, x_ref, *refs):
        # refs: per-layer (w, b, g, be) then out_ref
        out_ref = refs[-1]
        if use_dropout:
            pltpu.prng_seed(seed_ref[0], pl.program_id(0))
        h = x_ref[:]                                      # [T, D0p] bf16
        for i in range(n_layers):
            w, b, g, be = refs[4 * i: 4 * i + 4]
            y, *_ = _layer_fwd(h, w, b, g, be, dims_real[i + 1], keep,
                               use_dropout, tile_rows)
            if i + 1 < n_layers:
                h = y.astype(jnp.bfloat16)
            else:
                # last activation stays f32 (mlp_tower's output dtype)
                out_ref[:] = y

    return kernel


def _make_bwd_kernel(dims_pad, dims_real, keep: float, use_dropout: bool,
                     tile_rows: int, n_layers: int):
    def kernel(seed_ref, x_ref, dy_ref, *refs):
        # refs layout: per-layer (w, b, g, be) inputs,
        # then outputs: dx, per-layer (dw, db, dg, dbe),
        # then scratch: per-layer (dw_acc, db_acc, dg_acc, dbe_acc)
        n_in = 4 * n_layers
        ins = refs[:n_in]
        dx_ref = refs[n_in]
        outs = refs[n_in + 1: n_in + 1 + 4 * n_layers]
        accs = refs[n_in + 1 + 4 * n_layers:]
        tile = pl.program_id(0)

        @pl.when(tile == 0)
        def _():
            for a in accs:
                a[:] = jnp.zeros_like(a)

        if use_dropout:
            # identical seed + generation order as forward => identical
            # masks without any HBM mask traffic
            pltpu.prng_seed(seed_ref[0], tile)

        # ---- recompute forward, keeping residuals in VMEM
        h_ins = []       # bf16 input to each layer's matmul
        resids = []
        h = x_ref[:]
        for i in range(n_layers):
            w, b, g, be = ins[4 * i: 4 * i + 4]
            h_ins.append(h)
            y, z, mean, rstd, dmask = _layer_fwd(
                h, w, b, g, be, dims_real[i + 1], keep, use_dropout,
                tile_rows)
            resids.append((z, mean, rstd, dmask))
            h = y.astype(jnp.bfloat16)

        # ---- chain backward
        dh = dy_ref[:].astype(jnp.float32)                # [T, H_last]
        for i in range(n_layers - 1, -1, -1):
            w, b, g, be = ins[4 * i: 4 * i + 4]
            z, mean, rstd, dmask = resids[i]
            real = dims_real[i + 1]
            hpad = dims_pad[i + 1]
            if use_dropout:
                dh = jnp.where(dmask, dh * (1.0 / keep), 0.0)
            # LayerNorm backward (xhat = (z - mean) * rstd, masked lanes
            # have g == 0 so their dh is already 0 through dy)
            xm = z - mean
            if real != hpad:
                lane = jax.lax.broadcasted_iota(jnp.int32, z.shape, 1)
                xm = xm * (lane < real).astype(jnp.float32)
            xhat = xm * rstd
            dxhat = dh * g[:].astype(jnp.float32)
            m1 = jnp.sum(dxhat, axis=1, keepdims=True) / real
            m2 = jnp.sum(dxhat * xhat, axis=1, keepdims=True) / real
            dz = rstd * (dxhat - m1 - xhat * m2)
            # ReLU backward (z is post-ReLU: gate on z > 0)
            dz = jnp.where(z > 0.0, dz, 0.0)
            # param grads, accumulated across tiles in f32
            dw_a, db_a, dg_a, dbe_a = accs[4 * i: 4 * i + 4]
            h_f32 = h_ins[i].astype(jnp.float32)
            dw_a[:] += jax.lax.dot_general(
                h_f32, dz, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            db_a[:] += jnp.sum(dz, axis=0, keepdims=True)
            dg_a[:] += jnp.sum(dh * xhat, axis=0, keepdims=True)
            dbe_a[:] += jnp.sum(dh, axis=0, keepdims=True)
            # input grad for the next (lower) layer
            dh = jax.lax.dot_general(
                dz, w[:].astype(jnp.float32),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        dx_ref[:] = dh.astype(dx_ref.dtype)

        @pl.when(tile == pl.num_programs(0) - 1)
        def _():
            for o, a in zip(outs, accs):
                o[:] = a[:]

    return kernel


def _pad2(a, rows: int, cols: int):
    return jnp.pad(a, ((0, rows - a.shape[0]), (0, cols - a.shape[1])))


def _pack_params(layers: List[dict], dims_pad):
    """Zero-pad every layer's params to lane-multiple shapes."""
    packed = []
    for i, layer in enumerate(layers):
        din, dout = dims_pad[i], dims_pad[i + 1]
        w = _pad2(layer["dense"]["w"].astype(jnp.float32), din, dout)
        b = jnp.pad(layer["dense"]["b"].astype(jnp.float32),
                    (0, dout - layer["dense"]["b"].shape[0]))[None, :]
        g = jnp.pad(layer["norm"]["scale"].astype(jnp.float32),
                    (0, dout - layer["norm"]["scale"].shape[0]))[None, :]
        be = jnp.pad(layer["norm"]["bias"].astype(jnp.float32),
                     (0, dout - layer["norm"]["bias"].shape[0]))[None, :]
        packed += [w, b, g, be]
    return packed


def _dims(layers: List[dict], in_dim: int):
    real = [in_dim] + [l["dense"]["w"].shape[1] for l in layers]
    pad = [_round_up(d, _LANE) for d in real]
    return real, pad


def fused_tower(
    layers: List[dict],
    x: jax.Array,                    # [..., D0]
    dropout_rate: float = 0.0,
    rng: Optional[jax.Array] = None,
    deterministic: bool = True,
    interpret: bool = False,
    mesh=None,
    batch_axes=None,
) -> jax.Array:
    """Drop-in fused replacement for ``models.layers.mlp_tower``.

    Differentiable (custom VJP; recompute backward).  Returns f32
    activations of the last layer, matching mlp_tower's output dtype.

    ``mesh``/``batch_axes``: run the kernel under ``jax.shard_map`` with
    rows split over the given mesh axes (default: all of them).  The
    tower is purely row-parallel, so each device runs the same kernel on
    its batch shard; parameter grads are ``psum``-reduced across the
    batch axes in the manual backward (the multichip equivalent of the
    data-parallel dense-grad all-reduce).  Dropout streams fold the
    device's linear mesh index into the seed so shards draw distinct
    masks, replayed identically by the recompute backward.
    """
    in_dim = x.shape[-1]
    dims_real, dims_pad = _dims(layers, in_dim)
    n_layers = len(layers)
    use_dropout = (not deterministic) and dropout_rate > 0.0 and rng is not None
    keep = 1.0 - dropout_rate
    if use_dropout:
        seed = jax.random.randint(rng, (1,), 0, jnp.iinfo(jnp.int32).max,
                                  dtype=jnp.int32)
    else:
        seed = jnp.zeros((1,), jnp.int32)

    ndev = 1
    if mesh is not None:
        if batch_axes is None:
            batch_axes = tuple(mesh.axis_names)
        elif isinstance(batch_axes, str):
            batch_axes = (batch_axes,)
        for a in batch_axes:
            ndev *= mesh.shape[a]
        if ndev == 1:
            mesh = None                    # trivial mesh: plain path

    lead_shape = x.shape[:-1]
    n = 1
    for s in lead_shape:
        n *= s
    x2 = x.reshape(n, in_dim)
    npad = _round_up(max(n, ndev * _ROW_TILE), ndev * _ROW_TILE)
    rows_local = npad // ndev
    x_pad = jnp.zeros((npad, dims_pad[0]), jnp.bfloat16)
    x_pad = x_pad.at[:n, :in_dim].set(x2.astype(jnp.bfloat16))
    packed = _pack_params(layers, dims_pad)

    grid = (rows_local // _ROW_TILE,)
    vec_spec = lambda d: pl.BlockSpec((1, d), lambda i: (0, 0),
                                      memory_space=pltpu.VMEM)
    mat_spec = lambda r, c: pl.BlockSpec((r, c), lambda i: (0, 0),
                                         memory_space=pltpu.VMEM)
    row_spec = lambda c: pl.BlockSpec((_ROW_TILE, c), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM)
    param_specs = []
    for i in range(n_layers):
        param_specs += [mat_spec(dims_pad[i], dims_pad[i + 1]),
                        vec_spec(dims_pad[i + 1]),
                        vec_spec(dims_pad[i + 1]),
                        vec_spec(dims_pad[i + 1])]

    flops_fwd = 2 * rows_local * sum(
        dims_pad[i] * dims_pad[i + 1] for i in range(n_layers))

    def _dev_seed(seed):
        """Per-device dropout seed: fold the linear mesh index in so
        shards draw distinct PRNG streams (fwd and bwd derive it the
        same way, keeping the recompute masks bit-identical)."""
        idx = jnp.int32(0)
        for a in batch_axes:
            idx = idx * mesh.shape[a] + jax.lax.axis_index(a)
        return seed + idx

    def _pallas_fwd(seed, x_loc, *packed):
        kernel = _make_fwd_kernel(dims_pad, dims_real, keep, use_dropout,
                                  _ROW_TILE, n_layers)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      row_spec(dims_pad[0])] + param_specs,
            out_specs=row_spec(dims_pad[-1]),
            out_shape=jax.ShapeDtypeStruct((rows_local, dims_pad[-1]),
                                           jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=flops_fwd,
                bytes_accessed=rows_local * (dims_pad[0] + dims_pad[-1]) * 2,
                transcendentals=rows_local,
            ),
            interpret=interpret,
        )(seed, x_loc, *packed)

    def _pallas_bwd(seed, x_loc, dy_loc, *packed):
        kernel = _make_bwd_kernel(dims_pad, dims_real, keep, use_dropout,
                                  _ROW_TILE, n_layers)
        out_shapes = [jax.ShapeDtypeStruct((rows_local, dims_pad[0]),
                                           jnp.bfloat16)]
        out_specs = [row_spec(dims_pad[0])]
        scratches = []
        for i in range(n_layers):
            din, dout = dims_pad[i], dims_pad[i + 1]
            out_shapes += [jax.ShapeDtypeStruct((din, dout), jnp.float32),
                           jax.ShapeDtypeStruct((1, dout), jnp.float32),
                           jax.ShapeDtypeStruct((1, dout), jnp.float32),
                           jax.ShapeDtypeStruct((1, dout), jnp.float32)]
            out_specs += [mat_spec(din, dout), vec_spec(dout),
                          vec_spec(dout), vec_spec(dout)]
            scratches += [pltpu.VMEM((din, dout), jnp.float32),
                          pltpu.VMEM((1, dout), jnp.float32),
                          pltpu.VMEM((1, dout), jnp.float32),
                          pltpu.VMEM((1, dout), jnp.float32)]
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      row_spec(dims_pad[0]),
                      row_spec(dims_pad[-1])] + param_specs,
            out_specs=out_specs,
            out_shape=out_shapes,
            scratch_shapes=scratches,
            cost_estimate=pl.CostEstimate(
                flops=3 * flops_fwd,
                bytes_accessed=rows_local * (2 * dims_pad[0]
                                             + dims_pad[-1]) * 2,
                transcendentals=rows_local,
            ),
            interpret=interpret,
        )(seed, x_loc, dy_loc, *packed)

    from jax.sharding import PartitionSpec as P  # local: keep import light

    @jax.custom_vjp
    def _run(packed, x_pad, seed):
        if mesh is None:
            return _pallas_fwd(seed, x_pad, *packed)

        def local_fwd(seed, x_loc, *pk):
            return _pallas_fwd(_dev_seed(seed), x_loc, *pk)

        fn = jax.shard_map(
            local_fwd, mesh=mesh,
            in_specs=(P(), P(batch_axes, None))
            + tuple(P(None, None) for _ in packed),
            out_specs=P(batch_axes, None),
            check_vma=False)
        return fn(seed, x_pad, *packed)

    def _run_fwd(packed, x_pad, seed):
        return _run(packed, x_pad, seed), (packed, x_pad, seed)

    def _run_bwd(res, dy):
        packed, x_pad, seed = res
        dy = dy.astype(jnp.float32)
        if mesh is None:
            outs = _pallas_bwd(seed, x_pad, dy, *packed)
        else:
            def local_bwd(seed, x_loc, dy_loc, *pk):
                o = _pallas_bwd(_dev_seed(seed), x_loc, dy_loc, *pk)
                # dx stays row-sharded; param grads are partial sums over
                # the local rows -> reduce across the batch axes
                return (o[0],) + tuple(
                    jax.lax.psum(g, batch_axes) for g in o[1:])

            fn = jax.shard_map(
                local_bwd, mesh=mesh,
                in_specs=(P(), P(batch_axes, None), P(batch_axes, None))
                + tuple(P(None, None) for _ in packed),
                out_specs=(P(batch_axes, None),)
                + tuple(P(None, None) for _ in range(4 * n_layers)),
                check_vma=False)
            outs = fn(seed, x_pad, dy, *packed)
        dx_pad = outs[0]
        return tuple(outs[1:]), dx_pad, None

    _run.defvjp(_run_fwd, _run_bwd)

    out_pad = _run(tuple(packed), x_pad, seed)
    out = out_pad[:n, :dims_real[-1]].astype(jnp.float32)
    return out.reshape(*lead_shape, dims_real[-1])


def tower_fits(layers: List[dict], in_dim: int) -> bool:
    """Routing guard: every dim lane-padded <= 512 and the per-tile
    weight + activation working set fits comfortably in VMEM."""
    real, pad = _dims(layers, in_dim)
    if any(p > 512 for p in pad):
        return False
    weight_bytes = sum(pad[i] * pad[i + 1] * 4 for i in range(len(layers)))
    act_bytes = _ROW_TILE * max(pad) * 4 * (len(layers) + 2)
    return weight_bytes + 2 * act_bytes < 12 * 1024 * 1024
