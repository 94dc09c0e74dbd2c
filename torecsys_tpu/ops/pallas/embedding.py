"""Pallas TPU kernel: pipelined embedding row gather.

The reference's embedding hot path is a fused-table ``nn.Embedding`` gather
(``/root/reference/torecsys/inputs/base/multi_indices_emb.py:103-104``). On
TPU the analogous op — ``jnp.take(packed_table, row_ids, axis=0)`` — is a
random-access HBM gather and therefore *latency* bound, not bandwidth bound:
XLA issues it as one serialized dynamic-gather loop. This kernel instead
keeps the table in HBM and streams each requested row to the output block
with all row DMAs issued back-to-back and grouped waits (see
``_gather_kernel``), so row fetches overlap and the throughput approaches
the per-row DMA issue-rate ceiling.

Layout contract: rows are *packed* (``torecsys_tpu.ops.embedding.pack_table``)
so each stored row is ``P*E >= 128`` lanes wide — every DMA moves at least one
full lane-width transaction. The in-row slot selection (``ids % P``) stays
outside the kernel as a one-hot MXU contraction that XLA fuses.

The backward pass (scatter-add of duplicate ids) is defined via
``jax.custom_vjp`` as the XLA ``.at[rows].add`` — a read-modify-write race
under a naive Pallas grid, and measured on v5e the XLA scatter path is
already within ~20% of the packed-layout bandwidth bound, so the kernel is
forward-only by design.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# ids handled per grid program; scratch/out block is (TILE, row_width).
TILE = 512
# rows per start-loop step / grouped wait (scalar-core loop amortization)
GUNROLL = 8


def _gather_kernel(rows_ref, table_ref, out_ref, sems):
    """One program gathers TILE rows: table[rows[base+i]] -> out[i].

    ``rows_ref`` is scalar-prefetched (SMEM) so row indices are known before
    the body runs; the table stays in HBM/ANY and rows stream directly into
    the VMEM output block.  All TILE starts issue back-to-back (every row
    targets a distinct output row — no slot hazard; the hardware DMA queue
    applies backpressure), then one GUNROLL-row size-only descriptor per
    group retires the copies: DMA semaphores count transfer units, so the
    grouped wait decrements exactly GUNROLL single-row copies.  The windowed
    start/wait rotation this replaces was scalar-core issue bound (the r4
    window sweep on the RMW kernel measured window size irrelevant).
    """
    base = pl.program_id(0) * TILE

    def row_dma(i):
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(rows_ref[base + i], 1), :],
            out_ref.at[pl.ds(i, 1), :],
            sems,
        )

    def start_body(c, _):
        for u in range(GUNROLL):
            row_dma(c * GUNROLL + u).start()
        return 0

    jax.lax.fori_loop(0, TILE // GUNROLL, start_body, 0)

    def wait_body(c, _):
        pltpu.make_async_copy(
            table_ref.at[pl.ds(0, GUNROLL), :],
            out_ref.at[pl.ds(c * GUNROLL, GUNROLL), :],
            sems,
        ).wait()
        return 0

    jax.lax.fori_loop(0, TILE // GUNROLL, wait_body, 0)


def row_gather(table: jnp.ndarray, row_ids: jnp.ndarray) -> jnp.ndarray:
    """``table[row_ids]`` as a pipelined Pallas gather.

    Args:
        table: ``(M, W)`` packed table, W a multiple of 128 lanes.
        row_ids: ``(num,)`` int32 stored-row indices in ``[0, M)``.

    Returns:
        ``(num, W)``.
    """
    return _row_gather_cvjp(table.shape[0], str(table.dtype), table, row_ids)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _row_gather_cvjp(num_rows, dtype_name, table, row_ids):
    return _row_gather_impl(table, row_ids)


def _row_gather_impl(table, row_ids, interpret: bool = False):
    num = row_ids.shape[0]
    pad = (-num) % TILE
    if pad:
        row_ids = jnp.pad(row_ids, (0, pad))
    padded = num + pad

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(padded // TILE,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (TILE, table.shape[1]),
            lambda i, rows: (i, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
    )
    out = pl.pallas_call(
        _gather_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((padded, table.shape[1]), table.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=0,
            bytes_accessed=padded * table.shape[1] * table.dtype.itemsize * 2,
            transcendentals=0,
        ),
    )(row_ids.astype(jnp.int32), table)
    return out[:num] if pad else out


UTILE = 512    # unique ids per grid program (unique_stored_gather)


def _unique_gather_kernel(uids_ref, nvalid_ref, table_ref, out_ref, sems):
    """Gather the STORED rows of sorted-unique logical ids into a compact
    buffer: out[i] = table[uids[i] // P].

    (A 4·E-byte logical-slice DMA would be 3× fewer bytes, but Mosaic
    rejects lane-dim slices not aligned to the 128 tiling — measured r4 —
    so the unit is the full stored row; the gather is issue-rate bound
    anyway, and unique stored rows are ~3× fewer than slots under Zipf.)
    Validity is a prefix (sorted ids, sentinel tail), so the dynamic grid
    covers only ceil(n_valid/UTILE) tiles and the start predicate is a pure
    index bound; grouped waits as in :func:`_gather_kernel`.
    """
    base = pl.program_id(0) * UTILE
    n_here = jnp.clip(nvalid_ref[0] - base, 0, UTILE)
    p = nvalid_ref[1]  # pack factor, prefetched

    def row_dma(i):
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(uids_ref[base + i] // p, 1), :],
            out_ref.at[pl.ds(i, 1), :],
            sems,
        )

    def start_body(c, _):
        for u in range(GUNROLL):
            i = c * GUNROLL + u

            @pl.when(i < n_here)
            def _():
                row_dma(i).start()

        return 0

    jax.lax.fori_loop(0, (n_here + GUNROLL - 1) // GUNROLL, start_body, 0)
    n_groups = n_here // GUNROLL

    def wait_group(c, _):
        pltpu.make_async_copy(
            table_ref.at[pl.ds(0, GUNROLL), :],
            out_ref.at[pl.ds(c * GUNROLL, GUNROLL), :],
            sems,
        ).wait()
        return 0

    def wait_one(i, _):
        pltpu.make_async_copy(
            table_ref.at[pl.ds(0, 1), :],
            out_ref.at[pl.ds(i, 1), :],
            sems,
        ).wait()
        return 0

    jax.lax.fori_loop(0, n_groups, wait_group, 0)
    jax.lax.fori_loop(n_groups * GUNROLL, n_here, wait_one, 0)


def unique_stored_gather(table: jnp.ndarray, uids: jnp.ndarray,
                         embed_size: int, interpret: bool = False) -> jnp.ndarray:
    """Compact stored-row gather from a packed table.

    Args:
        table: ``(Vp, P*E)`` packed table.
        uids: ``(M,)`` int32 **sorted unique** logical ids, sentinel-padded
            with values ``>= Vp*P`` (``_dedup_ids`` contract — validity is a
            prefix, which bounds the dynamic grid).
        embed_size: E.

    Returns:
        ``(M, P*E)`` — row ``i`` is the stored row holding logical id
        ``uids[i]`` for valid ids, unspecified for sentinel slots (callers
        never index them).  Slot selection (``uids % P``) stays outside.
    """
    m = uids.shape[0]
    pack = table.shape[1] // embed_size
    pad = (-m) % UTILE
    num_logical = table.shape[0] * pack
    if pad:
        uids = jnp.pad(uids, (0, pad), constant_values=num_logical)
    padded = m + pad
    n_valid = jnp.stack([
        jnp.sum(uids < num_logical, dtype=jnp.int32), jnp.int32(pack),
    ])
    if interpret:
        n_tiles = padded // UTILE
    else:
        n_tiles = jnp.maximum((n_valid[0] + UTILE - 1) // UTILE, 1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (UTILE, table.shape[1]), lambda i, uids, nv: (i, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
    )
    out = pl.pallas_call(
        _unique_gather_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((padded, table.shape[1]), table.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=0,
            bytes_accessed=padded * table.shape[1] * table.dtype.itemsize * 2,
            transcendentals=0,
        ),
    )(uids.astype(jnp.int32), n_valid, table)
    return out[:m] if pad else out


def _row_gather_fwd(num_rows, dtype_name, table, row_ids):
    return _row_gather_impl(table, row_ids), row_ids


def _row_gather_bwd(num_rows, dtype_name, row_ids, g):
    # scatter-add of duplicate-id cotangents; XLA's transpose-of-gather path
    # (SURVEY.md §7 hard part #1 — grads for duplicate ids).
    dtype = jnp.dtype(dtype_name)
    dt = jnp.zeros((num_rows, g.shape[1]), dtype).at[row_ids].add(g.astype(dtype))
    return dt, None


_row_gather_cvjp.defvjp(_row_gather_fwd, _row_gather_bwd)
