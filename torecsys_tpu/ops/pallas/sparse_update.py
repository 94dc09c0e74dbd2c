"""Pallas TPU kernel: fused touched-rows-only optimizer update.

The sparse embedding update (``torecsys_tpu.ops.sparse``) needs, per unique
touched stored row ``r``: read ``table[r]``, ``m[r]``, ``v[r]``, combine with
the row's summed gradient, write all three back.  As separate XLA ops that is
6 random-access gathers/scatters of ~100k rows each — XLA lowers each one as
its own serialized dynamic-slice loop over HBM, measured ~10ms+ apiece on v5e
for Criteo-shaped batches.  This kernel fuses the whole update into ONE pass:
row indices are scalar-prefetched, every slot array streams through VMEM with
a window of concurrent DMAs (the pattern proven by
``ops/pallas/embedding.row_gather``), the optimizer math runs on the VPU over
a whole tile, and outputs alias the inputs so the tables update in place —
zero extra HBM copies of multi-GB state.

Supported row-wise rules (selected by which slot arrays are passed):

* Adam/AdamW: one fused slot ``(mv,)`` of shape ``(R, 2, W)`` (m ‖ v per
  stored row — halves the per-row DMA count); global-step bias correction;
  optional decoupled weight decay.
* Adagrad:    slot ``(v,)``.
* SGD:        no slots.

Layout contract: all arrays are stored-row layout ``(R, W)`` with ``W`` a
multiple of 128 lanes (``pack_table``); ``uids`` are **unique** stored-row
ids sorted ascending with out-of-range sentinel padding (``dedup_sum``
output) — uniqueness is what makes the in-flight DMA window race-free.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 256     # unique rows per grid program
WINDOW = 16    # concurrent row DMAs in flight per phase
UNROLL = 8     # partial unroll of the DMA loop (scalar-core loop overhead
               # dominates otherwise; full unroll explodes compile time)


def _make_kernel(num_slots: int, rule: str):
    """Kernel factory: ``num_slots`` slot arrays (m, v, ...) besides the table.

    Kernel signature (built by PrefetchScalarGridSpec):
        (uids, hyper, gsum_block, table, *slots,
         out_table, *out_slots, t_scr, *slot_scr, sems)
    ``table``/``slots`` live in ANY/HBM and alias the outputs; ``gsum_block``
    is the auto-pipelined VMEM block of summed gradients; ``hyper`` is a
    scalar-prefetched f32 vector (lr, b1, b2, eps, wd, bc1, bc2).
    """

    def kernel(uids_ref, nvalid_ref, hyper_ref, gsum_ref, *refs):
        hbm_in = refs[: 1 + num_slots]
        hbm_out = refs[1 + num_slots : 2 * (1 + num_slots)]
        scratch = refs[2 * (1 + num_slots) : 3 * (1 + num_slots)]
        sems = refs[-1]
        num_rows = hbm_in[0].shape[0]
        base = pl.program_id(0) * TILE
        # rows in THIS tile that are real (uids is sorted with all sentinel
        # padding at the tail, so validity is a prefix): bounds the DMA loops
        # dynamically — sentinel tails cost zero scalar-loop iterations.
        n_here = jnp.clip(nvalid_ref[0] - base, 0, TILE)

        n_arr = 1 + num_slots

        def read_dma(a, i):
            # full-trailing-dims row slice: works for (R, W) tables and
            # (R, 2, W) fused mv slots alike
            return pltpu.make_async_copy(
                hbm_in[a].at[pl.ds(uids_ref[base + i], 1)],
                scratch[a].at[pl.ds(i, 1)],
                sems.at[a, i % WINDOW],
            )

        def write_dma(a, i):
            return pltpu.make_async_copy(
                scratch[a].at[pl.ds(i, 1)],
                hbm_out[a].at[pl.ds(uids_ref[base + i], 1)],
                sems.at[a, i % WINDOW],
            )

        def phase(dma_fn):
            # start(i) and wait(i) share the same sentinel predicate, so the
            # per-slot semaphore rotation stays balanced: a skipped row skips
            # both sides and its slot is simply free for row i + WINDOW.
            # Manually partially-unrolled (UNROLL rows per fori_loop step):
            # Mosaic supports only unroll=1/full, and the scalar-core loop
            # control otherwise dominates the kernel.
            def step(i):
                @pl.when(jnp.logical_and(
                    i < TILE,
                    uids_ref[base + jnp.minimum(i, TILE - 1)] < num_rows,
                ))
                def _():
                    for a in range(n_arr):
                        dma_fn(a, i).start()

                # The index is clamped to 0 so it is in-bounds even when the
                # i >= WINDOW conjunct is False (predicates evaluate both
                # operands; an unclamped base+i-WINDOW would read SMEM out of
                # bounds on the first WINDOW steps).
                @pl.when(jnp.logical_and(
                    i >= WINDOW,
                    uids_ref[base + jnp.maximum(i - WINDOW, 0)] < num_rows,
                ))
                def _():
                    for a in range(n_arr):
                        dma_fn(a, i - WINDOW).wait()

            def body(c, _):
                for u in range(UNROLL):
                    step(c * UNROLL + u)
                return 0

            n_chunks = (n_here + WINDOW + UNROLL - 1) // UNROLL
            jax.lax.fori_loop(0, n_chunks, body, 0)

        # ---- phase 1: stream current rows HBM -> VMEM scratch -------------
        phase(read_dma)

        # ---- phase 2: vectorized optimizer math over the tile -------------
        lr = hyper_ref[0]
        b1 = hyper_ref[1]
        b2 = hyper_ref[2]
        eps = hyper_ref[3]
        wd = hyper_ref[4]
        bc1 = hyper_ref[5]  # 1 / (1 - b1^t)
        bc2 = hyper_ref[6]  # 1 / (1 - b2^t)
        g = gsum_ref[:]
        w = g.shape[1]
        row = scratch[0][:]
        if rule == "adam":
            # slot array is the fused (TILE, 2, W) mv scratch: [:,0]=m, [:,1]=v
            m_new = b1 * scratch[1][:, 0, :] + (1.0 - b1) * g
            v_new = b2 * scratch[1][:, 1, :] + (1.0 - b2) * g * g
            upd = lr * ((m_new * bc1) / (jnp.sqrt(v_new * bc2) + eps))
            upd = upd + lr * wd * row  # decoupled wd; folds to 0 when wd == 0
            scratch[1][:, 0, :] = m_new
            scratch[1][:, 1, :] = v_new
        elif rule == "adagrad":
            v_new = scratch[1][:] + g * g
            upd = lr * g * jax.lax.rsqrt(v_new + eps)
            scratch[1][:] = v_new
        else:  # sgd
            upd = lr * g
        scratch[0][:] = row - upd

        # ---- phase 3: stream updated rows VMEM -> HBM ----------------------
        phase(write_dma)

    return kernel


@functools.partial(jax.jit, static_argnames=("rule", "interpret"))
def _fused_update(uids, gsum, table, slots, hyper, rule, interpret=False):
    num = uids.shape[0]
    pad = (-num) % TILE
    if pad:
        # sentinel-pad: padded ids are >= num_rows so the kernel skips them
        uids = jnp.pad(uids, (0, pad), constant_values=table.shape[0])
        gsum = jnp.pad(gsum, ((0, pad), (0, 0)))
    padded = num + pad
    w = table.shape[1]
    n_arr = 1 + len(slots)

    n_valid = jnp.sum(uids < table.shape[0], dtype=jnp.int32).reshape(1)
    # DYNAMIC grid bound: uids is sentinel-padded with all valid entries in a
    # prefix (dedup contract), so only ceil(n_valid/TILE) tiles hold work.
    # The static bound is the batch's slot count (~100k positions -> 400+
    # tiles) while the real unique-row count is often 10-50x smaller; a
    # static grid paid fixed per-program overhead AND streamed the whole
    # (M, W) gsum through VMEM for tiles that are 100% sentinel (measured
    # 2.96 ms for 7.5k unique rows at 500k-row scale — ~15x this kernel's
    # useful DMA time).  Mosaic supports traced grid sizes; sentinel tiles
    # now simply never run.
    # (interpret mode can't run a traced trip count — fall back static there)
    if interpret:
        n_tiles = padded // TILE
    else:
        n_tiles = jnp.maximum((n_valid[0] + TILE - 1) // TILE, 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # uids, n_valid, hyper
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((TILE, w), lambda i, uids, nv, hyper: (i, 0),
                         memory_space=pltpu.VMEM),      # gsum block
        ] + [pl.BlockSpec(memory_space=pl.ANY)] * n_arr,  # table + slots
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_arr,
        # per-array scratch matches each array's own per-row shape (the
        # fused adam mv slot is (2, W))
        scratch_shapes=[pltpu.VMEM((TILE, *a.shape[1:]), a.dtype)
                        for a in (table, *slots)]
        + [pltpu.SemaphoreType.DMA((n_arr, WINDOW))],
    )
    out_shapes = [jax.ShapeDtypeStruct(a.shape, a.dtype) for a in (table, *slots)]
    # inputs (flattened order): uids, n_valid, hyper, gsum, table, *slots
    # alias table->out0, slots->out1..  (in-place update of multi-GB state)
    aliases = {4 + a: a for a in range(n_arr)}
    outs = pl.pallas_call(
        _make_kernel(len(slots), rule),
        grid_spec=grid_spec,
        out_shape=out_shapes,
        input_output_aliases=aliases,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * padded * w,
            bytes_accessed=2 * n_arr * padded * w * table.dtype.itemsize,
            transcendentals=0,
        ),
    )(uids.astype(jnp.int32), n_valid, hyper, gsum, table, *slots)
    return outs[0], list(outs[1:])


def fused_rowwise_update(
    uids: jnp.ndarray,
    gsum: jnp.ndarray,
    table: jnp.ndarray,
    slots: Tuple[jnp.ndarray, ...],
    hyper: jnp.ndarray,
    rule: str,
    interpret: bool = False,
):
    """Apply a row-wise optimizer rule to the unique touched rows, fused.

    Args:
        uids: ``(M,)`` int32 — unique stored-row ids, ascending, padded with
            out-of-range sentinels (``dedup_sum`` contract).
        gsum: ``(M, W)`` summed gradients per unique row (zeros on padding).
        table: ``(R, W)`` stored table, W % 128 == 0.
        slots: optimizer slot arrays — (mv,) of shape ``(R, 2, W)`` for
            adam, (v,) of ``(R, W)`` for adagrad, () for sgd.
        hyper: ``(7,)`` f32: lr, b1, b2, eps, weight_decay, 1/(1-b1^t),
            1/(1-b2^t) (unused entries ignored per rule).
        rule: 'adam' | 'adagrad' | 'sgd'.

    Returns:
        (new_table, [new_slots...]) — aliased onto the inputs on TPU.
    """
    assert rule in ("adam", "adagrad", "sgd"), rule
    return _fused_update(uids, gsum, table, tuple(slots), hyper, rule,
                         interpret=interpret)
