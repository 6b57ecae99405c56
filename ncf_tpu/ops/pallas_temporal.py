"""Fused temporal-encoding forward: 4 tiny-table gathers + sum in one
Pallas kernel.

The temporal encoding (models/temporal.py; reference TemporalEncoding,
src/model/architecture.py:59-94) sums four lookups per example: learned
hour[24]/day[7]/month[12] embeddings + the sinusoidal pe[365] buffer.
As XLA gathers these cost ~25 us EACH at batch 16k on v5e (4 x
[16384, 32] VMEM-write-bound fusions) plus the adds.  Here each lookup
is a one-hot matmul against the transposed table resident in VMEM —
(24+8+16+368) x B x dt MACs ~= 218 MMACs, ~5 us of MXU — with the sum
fused into the accumulator, one output tensor instead of four.

Layout: ids-on-lanes (same trick as ops/pallas_sampler.py), so the
one-hot build is a lane-broadcast compare and the output comes back
transposed [dt, B]; the caller pays one cheap [dt, B] -> [B, dt]
relayout.

Backward (custom VJP): d(table_k) = onehot_k @ g — exactly the
embedding-grad scatter, routed through ops/pallas_scatter's one-hot
kernel; the sinusoidal pe table is a constant buffer and gets a zero
cotangent.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CHUNK = 8192


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _make_kernel(num_tables: int):
    def kernel(ids_ref, *refs):
        table_refs = refs[:num_tables]
        out_ref = refs[num_tables]
        ch = ids_ref.shape[1]
        acc = None
        for k, tref in enumerate(table_refs):
            t = tref[:, :]                              # [dt, rows_pad]
            rows_pad = t.shape[1]
            idk = ids_ref[k:k + 1, :]                   # [1, CH]
            iota = jax.lax.broadcasted_iota(jnp.int32, (rows_pad, ch), 0)
            onehot = (iota == idk).astype(t.dtype)      # [rows_pad, CH]
            val = jnp.dot(t, onehot, preferred_element_type=jnp.float32)
            acc = val if acc is None else acc + val
        out_ref[:, :] = acc

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_lookup_sum_t(ids: jax.Array, tables: tuple,
                        interpret: bool = False) -> jax.Array:
    """ids int32 [K, B]; tables K x [rows_k, dt]  ->  f32 [dt, B] summed
    lookups (transposed)."""
    k, b = ids.shape
    dt = tables[0].shape[1]
    b_pad = _round_up(b, _CHUNK)
    # pad ids out-of-range: the one-hot row is all-zero -> contributes 0
    ids_p = jnp.pad(ids.astype(jnp.int32), ((0, 0), (0, b_pad - b)),
                    constant_values=-1)
    tables_t = tuple(
        jnp.pad(t, ((0, _round_up(t.shape[0], 128) - t.shape[0]), (0, 0))
                ).T.astype(jnp.float32)
        for t in tables)

    full = lambda *shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _make_kernel(len(tables)),
        grid=(b_pad // _CHUNK,),
        in_specs=[
            pl.BlockSpec((k, _CHUNK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            *[full(*t.shape) for t in tables_t],
        ],
        out_specs=pl.BlockSpec((dt, _CHUNK), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((dt, b_pad), jnp.float32),
        interpret=interpret,
    )(ids_p, *tables_t)
    return out[:, :b]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_lookup_sum(ids: jax.Array, tables: tuple,
                     interpret: bool = False) -> jax.Array:
    """sum_k tables[k][ids[k]] : ids int32 [K, B], tables K x [rows_k, dt]
    -> f32 [B, dt].  Out-of-range ids contribute zero."""
    return _fused_lookup_sum_t(ids, tables, interpret=interpret).T


def _fwd(ids, tables, interpret):
    # residuals hold the tables themselves (params — alive regardless);
    # shapes/dtypes are read off them during the backward trace
    return fused_lookup_sum(ids, tables, interpret), (ids, tables)


def _bwd(interpret, res, g):
    from ncf_tpu.ops.pallas_scatter import onehot_scatter_add, scatter_fits

    ids, tables = res
    grads = []
    for k, t in enumerate(tables):
        if scatter_fits(t.shape[0], t.shape[1], ids.shape[1]):
            gk = onehot_scatter_add(ids[k], g, t.shape[0], mode="split",
                                    interpret=interpret)
        else:
            gk = jnp.zeros(t.shape, jnp.float32).at[ids[k]].add(
                g.astype(jnp.float32))
        grads.append(gk.astype(t.dtype))
    return jnp.zeros_like(ids), tuple(grads)


fused_lookup_sum.defvjp(_fwd, _bwd)
