"""Pallas TPU kernel: fused touched-rows-only optimizer update.

The sparse embedding update (``torecsys_tpu.ops.sparse``) needs, per unique
touched stored row ``r``: read ``table[r]``, ``m[r]``, ``v[r]``, combine with
the row's summed gradient, write all three back.  As separate XLA ops that is
6 random-access gathers/scatters of ~100k rows each — XLA lowers each one as
its own serialized dynamic-slice loop over HBM, measured ~10ms+ apiece on v5e
for Criteo-shaped batches.  This kernel fuses the whole update into ONE pass:
row indices are scalar-prefetched, every slot array streams through VMEM
with all row DMAs issued back-to-back and grouped waits (the scheme shared
with ``ops/pallas/embedding``), the optimizer math runs on the VPU over a
whole tile, and outputs alias the inputs so the tables update in place —
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

import os as _os

# Tuning knobs (env-overridable for the bench's parameter sweeps; the
# defaults are the measured winners on v5e — see SPEED.md).
TILE = int(_os.environ.get("TORECSYS_TPU_RMW_TILE", "256"))
# rows per start-loop unroll step AND per grouped wait (the r4 window sweep
# showed the old in-flight WINDOW knob irrelevant — the kernels are
# scalar-issue bound, so the only loop parameter left is the unroll)
UNROLL = int(_os.environ.get("TORECSYS_TPU_RMW_UNROLL", "8"))


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
                sems.at[a],
            )

        def write_dma(a, i):
            return pltpu.make_async_copy(
                scratch[a].at[pl.ds(i, 1)],
                hbm_out[a].at[pl.ds(uids_ref[base + i], 1)],
                sems.at[a],
            )

        def phase(dma_fn, hbm):
            # All-at-once pipeline: every row's DMAs target DISTINCT scratch
            # rows, so there is no slot-reuse hazard — issue all starts
            # back-to-back (the hardware DMA queue applies backpressure),
            # then drain with GROUPED waits: a DMA semaphore counts transfer
            # units and ``wait`` decrements by the waiting descriptor's size,
            # so one UNROLL-row descriptor retires UNROLL single-row copies.
            # The windowed start/wait rotation this replaces spent ~40
            # scalar-core cycles per row on SMEM predicate loads + per-row
            # waits, and the r4 window sweep (16/32/64 × unroll 8/16)
            # measured the kernel invariant to the window — it was
            # scalar-issue bound, not latency bound.  (A double-banked
            # ping-pong variant deferring write waits across grid tiles was
            # built and measured NO faster — 2.70 vs 2.66 ms update at 30M —
            # confirming the kernel is issue-bound, not drain-stall bound;
            # the simpler single-bank form is kept.)  Validity is a prefix,
            # so the only start predicate left is the index bound.
            def body(c, _):
                for u in range(UNROLL):
                    i = c * UNROLL + u

                    @pl.when(i < n_here)
                    def _():
                        for a in range(n_arr):
                            dma_fn(a, i).start()

                return 0

            jax.lax.fori_loop(0, (n_here + UNROLL - 1) // UNROLL, body, 0)
            n_groups = n_here // UNROLL

            def wait_group(c, _):
                for a in range(n_arr):
                    # size-only descriptor: decrements sems[a] by UNROLL rows
                    pltpu.make_async_copy(
                        hbm[a].at[pl.ds(0, UNROLL)],
                        scratch[a].at[pl.ds(c * UNROLL, UNROLL)],
                        sems.at[a],
                    ).wait()
                return 0

            def wait_one(i, _):
                for a in range(n_arr):
                    pltpu.make_async_copy(
                        hbm[a].at[pl.ds(0, 1)],
                        scratch[a].at[pl.ds(i, 1)],
                        sems.at[a],
                    ).wait()
                return 0

            jax.lax.fori_loop(0, n_groups, wait_group, 0)
            jax.lax.fori_loop(n_groups * UNROLL, n_here, wait_one, 0)

        # ---- phase 1: stream current rows HBM -> VMEM scratch -------------
        phase(read_dma, hbm_in)

        # ---- phase 2: vectorized optimizer math over the tile -------------
        lr = hyper_ref[0]
        b1 = hyper_ref[1]
        b2 = hyper_ref[2]
        eps = hyper_ref[3]
        wd = hyper_ref[4]
        bc1 = hyper_ref[5]  # 1 / (1 - b1^t)
        bc2 = hyper_ref[6]  # 1 / (1 - b2^t)
        g = gsum_ref[:]
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
        phase(write_dma, hbm_out)

    return kernel


@functools.partial(jax.jit, static_argnames=("rule", "interpret"))
def _fused_update(uids, gsum, table, slots, hyper, rule, interpret=False,
                  n_valid=None):
    num = uids.shape[0]
    pad = (-num) % TILE
    if pad:
        # sentinel-pad: padded ids are >= num_rows so the kernel skips them
        uids = jnp.pad(uids, (0, pad), constant_values=table.shape[0])
        gsum = jnp.pad(gsum, ((0, pad), (0, 0)))
    padded = num + pad
    w = table.shape[1]
    n_arr = 1 + len(slots)

    if n_valid is None:
        n_valid = jnp.sum(uids < table.shape[0], dtype=jnp.int32).reshape(1)
    else:
        # trusted host-computed unique count (data.presort) — skips the
        # device-side reduction over the M-sized uid stream
        n_valid = n_valid.astype(jnp.int32).reshape(1)
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
        + [pltpu.SemaphoreType.DMA((n_arr,))],
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


def _make_widen_segsum_kernel(pack: int, embed: int):
    """Widen-fused variant of the segsum kernel: NARROW sorted grads in.

    Same combine/carry/output-window scheme as :func:`_make_segsum_kernel`,
    but the input block is the ``(TILE_P, E)`` narrow sorted grad stream plus
    the per-position in-row slot ``lo``; the one-hot widen to ``(TILE_P,
    P*E)`` runs in-kernel on the VPU (the ``lane_slot == lo`` mask trick from
    the fused dedup kernel).  Removes the XLA widen einsum's full (M, W)
    HBM round-trip (~54 MB write + read at Criteo shapes) from the
    decomposed sparse-update path — the widened rows now exist only in VMEM.
    """
    w = pack * embed

    def kernel(first_seg_ref, cont_ref, seg_ref, lo_ref, g_ref, zeros_ref,
               out_ref, partial_scr, carry_scr, sem):
        del zeros_ref  # aliased onto out_ref: pre-zeroed backing buffer
        t = pl.program_id(0)
        base_seg = first_seg_ref[t]
        cont_in = cont_ref[t]
        cont_out = cont_ref[t + 1]
        nseg = first_seg_ref[t + 1] - base_seg + cont_out

        g = g_ref[0]                        # (TILE_P, E)
        lo = lo_ref[0, 0, :]                # (TILE_P,)
        seg_local = seg_ref[0, 0, :] - base_seg
        if pack > 1:
            # lane c of the wide row holds g[:, c % E] iff lo == c // E
            lane_slot = jax.lax.broadcasted_iota(jnp.int32, (TILE_P, w), 1) // embed
            g_rep = pltpu.repeat(g, pack, axis=1)
            wide = jnp.where(lane_slot == lo[:, None], g_rep,
                             jnp.zeros((), g.dtype))
        else:
            wide = g
        partial_scr[:] = jnp.zeros_like(partial_scr)
        sub_iota = jax.lax.broadcasted_iota(jnp.int32, (SUB, SUB), 0)
        for k in range(TILE_P // SUB):
            pos0 = k * SUB
            seg_sub = seg_local[pos0:pos0 + SUB]
            win0 = seg_sub[0]
            rel = seg_sub - win0
            oh = (sub_iota == rel[None, :]).astype(wide.dtype)
            acc = jax.lax.dot(
                oh, wide[pos0:pos0 + SUB], preferred_element_type=jnp.float32,
                precision=_DOT_PRECISION,
            )
            partial_scr[pl.ds(win0, SUB), :] += acc

        @pl.when(cont_in == 1)
        def _():
            partial_scr[0:1, :] += carry_scr[:]

        @pl.when(cont_out == 1)
        def _():
            carry_scr[:] = partial_scr[pl.ds(nseg - 1, 1), :]

        row_iota = jax.lax.broadcasted_iota(
            jnp.int32, (TILE_P, partial_scr.shape[1]), 0
        )
        partial_scr[0:TILE_P, :] = jnp.where(
            row_iota < nseg, partial_scr[0:TILE_P, :], 0.0
        )

        out_dma = pltpu.make_async_copy(
            partial_scr.at[pl.ds(0, TILE_P), :],
            out_ref.at[pl.ds(base_seg, TILE_P), :],
            sem,
        )
        out_dma.start()
        out_dma.wait()

    return kernel


@functools.partial(jax.jit, static_argnames=("pack", "interpret"))
def sorted_widen_segment_sum(g_sorted, lo, seg, pack, interpret=False):
    """Compact per-segment WIDE sums of a sorted narrow grad stream.

    Args:
        g_sorted: ``(M, E)`` f32 narrow per-slot grads, sorted by id.
        lo: ``(M,)`` int32 in-stored-row slot (``id % pack``) per position.
        seg: ``(M,)`` int32 nondecreasing stored-row segment index.
        pack: logical rows per stored row (``P``; ``P*E % 128 == 0``).

    Returns:
        ``(M, P*E)`` — row ``s`` holds the widened sum of ``seg == s``
        positions; rows past the last segment are zero.
    """
    m, e = g_sorted.shape
    w = pack * e
    pad = (-m) % TILE_P
    if pad:
        g_sorted = jnp.pad(g_sorted, ((0, pad), (0, 0)))
        lo = jnp.pad(lo, (0, pad))
        seg = jnp.concatenate([seg, jnp.full((pad,), seg[-1], seg.dtype)])
    mp = m + pad
    t_tiles = mp // TILE_P
    first_seg = jnp.concatenate([seg[::TILE_P], seg[-1:] + 1])
    cont_mid = (seg[TILE_P::TILE_P] == seg[TILE_P - 1::TILE_P][:-1]).astype(jnp.int32)
    cont = jnp.concatenate([jnp.zeros((1,), jnp.int32), cont_mid,
                            jnp.zeros((1,), jnp.int32)])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # first_seg, cont
        grid=(t_tiles,),
        in_specs=[
            pl.BlockSpec((1, 1, TILE_P), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),          # seg
            pl.BlockSpec((1, 1, TILE_P), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),          # lo
            pl.BlockSpec((1, TILE_P, e), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),          # g
            pl.BlockSpec(memory_space=pl.ANY),              # zeros (aliased)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((TILE_P + SUB, w), jnp.float32),
            pltpu.VMEM((1, w), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    zeros = jnp.zeros((mp + TILE_P, w), jnp.float32)
    out = pl.pallas_call(
        _make_widen_segsum_kernel(pack, e),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((mp + TILE_P, w), jnp.float32),
        # flattened inputs: first_seg, cont, seg, lo, g, zeros → alias zeros
        input_output_aliases={5: 0},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * SUB * w,
            bytes_accessed=mp * (e + w) * 4,
            transcendentals=0,
        ),
    )(first_seg, cont, seg.reshape(t_tiles, 1, TILE_P),
      lo.astype(jnp.int32).reshape(t_tiles, 1, TILE_P),
      g_sorted.reshape(t_tiles, TILE_P, e), zeros)
    return out[:m]


def _make_segsum_kernel():
    """Thin sorted-segment-sum kernel: SORTED wide grads → compact per-
    segment sums, written at each tile's dynamic segment offset.

    Replaces the XLA ``segment_sum`` in ``ops.sparse._combine_sorted_stored``
    — XLA lowers it to a row-granular scatter-add (~8 ns/row ≈ 1 ms at
    Criteo shapes) while this kernel's cost is streaming + sub-tiled MXU
    one-hot dots.  Per tile of TILE_P sorted positions:

      1. sub-tiled combine into ``partial_scr`` (same scheme as the fused
         dedup kernel: (SUB, SUB) one-hot dots accumulated into dynamic
         windows; segments are nondecreasing so a SUB-chunk spans ≤ SUB
         segments);
      2. cross-tile carry for the boundary segment (TPU grids run
         sequentially; a later tile REWRITES the boundary row with the
         completed value — overlapping output windows are correct because
         the later write wins);
      3. ONE output DMA of the tile's (TILE_P, W) partial window at the
         dynamic offset ``first_seg[t]`` (the output is padded by TILE_P
         rows so the window never runs off the end; garbage past a tile's
         real segments is overwritten by the next tile's window).

    Operands (PrefetchScalarGridSpec): scalar-prefetch first_seg, cont;
    VMEM blocks seg (1,1,TILE_P), wide (1,TILE_P,W); out (ANY) gsum.
    """

    def kernel(first_seg_ref, cont_ref, seg_ref, wide_ref, zeros_ref,
               out_ref, partial_scr, carry_scr, sem):
        del zeros_ref  # aliased onto out_ref: pre-zeroed backing buffer
        t = pl.program_id(0)
        base_seg = first_seg_ref[t]
        cont_in = cont_ref[t]
        cont_out = cont_ref[t + 1]
        nseg = first_seg_ref[t + 1] - base_seg + cont_out

        wide = wide_ref[0]
        seg_local = seg_ref[0, 0, :] - base_seg
        partial_scr[:] = jnp.zeros_like(partial_scr)
        sub_iota = jax.lax.broadcasted_iota(jnp.int32, (SUB, SUB), 0)
        for k in range(TILE_P // SUB):
            pos0 = k * SUB
            seg_sub = seg_local[pos0:pos0 + SUB]
            win0 = seg_sub[0]
            rel = seg_sub - win0
            oh = (sub_iota == rel[None, :]).astype(wide.dtype)
            acc = jax.lax.dot(
                oh, wide[pos0:pos0 + SUB], preferred_element_type=jnp.float32,
                precision=_DOT_PRECISION,
            )
            partial_scr[pl.ds(win0, SUB), :] += acc

        @pl.when(cont_in == 1)
        def _():
            partial_scr[0:1, :] += carry_scr[:]

        @pl.when(cont_out == 1)
        def _():
            carry_scr[:] = partial_scr[pl.ds(nseg - 1, 1), :]

        # zero rows past this tile's segments so the FINAL tile leaves exact
        # zeros beyond the last segment (matching XLA segment_sum's output);
        # intermediate tiles' zeroed tails are overwritten by later windows
        row_iota = jax.lax.broadcasted_iota(
            jnp.int32, (TILE_P, partial_scr.shape[1]), 0
        )
        partial_scr[0:TILE_P, :] = jnp.where(
            row_iota < nseg, partial_scr[0:TILE_P, :], 0.0
        )

        out_dma = pltpu.make_async_copy(
            partial_scr.at[pl.ds(0, TILE_P), :],
            out_ref.at[pl.ds(base_seg, TILE_P), :],
            sem,
        )
        out_dma.start()
        out_dma.wait()

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def sorted_segment_sum_wide(wide, seg, interpret=False):
    """Compact per-segment sums of a SORTED wide stream.

    Args:
        wide: ``(M, W)`` f32, position-ordered (sorted by id), W % 128 == 0.
        seg: ``(M,)`` int32 nondecreasing segment index per position
            (``prefix_sum(is_first) - 1``).

    Returns:
        ``(M, W)`` — row ``s`` holds the sum of ``wide`` rows with
        ``seg == s``; rows past the last segment are unspecified (callers
        bound by the valid-segment count).
    """
    m, w = wide.shape
    pad = (-m) % TILE_P
    if pad:
        wide = jnp.pad(wide, ((0, pad), (0, 0)))
        # padded positions continue the LAST segment with zero contribution
        seg = jnp.concatenate([seg, jnp.full((pad,), seg[-1], seg.dtype)])
    mp = m + pad
    t_tiles = mp // TILE_P
    first_seg = jnp.concatenate([seg[::TILE_P], seg[-1:] + 1])
    cont_mid = (seg[TILE_P::TILE_P] == seg[TILE_P - 1::TILE_P][:-1]).astype(jnp.int32)
    cont = jnp.concatenate([jnp.zeros((1,), jnp.int32), cont_mid,
                            jnp.zeros((1,), jnp.int32)])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # first_seg, cont
        grid=(t_tiles,),
        in_specs=[
            pl.BlockSpec((1, 1, TILE_P), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),          # seg
            pl.BlockSpec((1, TILE_P, w), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),          # wide
            pl.BlockSpec(memory_space=pl.ANY),              # zeros (aliased)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((TILE_P + SUB, w), jnp.float32),
            pltpu.VMEM((1, w), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    # the output aliases a ZEROED operand: rows no tile window covers (when
    # segments are few) must read as exact zeros, matching XLA segment_sum
    zeros = jnp.zeros((mp + TILE_P, w), jnp.float32)
    out = pl.pallas_call(
        _make_segsum_kernel(),
        grid_spec=grid_spec,
        # padded by TILE_P rows so the last tile's window stays in bounds
        out_shape=jax.ShapeDtypeStruct((mp + TILE_P, w), jnp.float32),
        # flattened inputs: first_seg, cont, seg, wide, zeros → alias zeros
        input_output_aliases={4: 0},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * SUB * w,
            bytes_accessed=3 * mp * w * 4,
            transcendentals=0,
        ),
    )(first_seg, cont, seg.reshape(t_tiles, 1, TILE_P),
      wide.reshape(t_tiles, TILE_P, w), zeros)
    return out[:m]


# Sorted positions per grid program (fused dedup+update kernel).  Larger
# tiles amortize per-program overhead and lengthen the RMW DMA bursts; the
# sub-tiled combine (below) keeps MXU flops independent of TILE_P.
TILE_P = int(_os.environ.get("TORECSYS_TPU_DEDUP_TILE", "1024"))
# Sub-tile width of the segment-combine matmuls: positions are processed in
# SUB-sized chunks, each contracting a (SUB, SUB) one-hot against (SUB, W)
# wide grads into a dynamic window of the partial accumulator.  MXU flops
# scale with M*SUB*W instead of M*TILE_P*W — the r3 single-matmul combine
# (SUB == TILE_P == 512) measured 0.55 ms of pure matmul at Criteo shapes;
# SUB=256 halves that, decoupled from the tile size.
SUB = int(_os.environ.get("TORECSYS_TPU_DEDUP_SUB", "256"))
# Timing-isolation knobs (produce WRONG results — bench diagnostics only):
# skip the RMW phases / use a static combine window instead of the dynamic
# per-chunk one.  Never set outside tools/ experiments.
_DEBUG_NORMW = _os.environ.get("TORECSYS_TPU_DEDUP_NORMW", "0") == "1"
_DEBUG_STATICWIN = _os.environ.get("TORECSYS_TPU_DEDUP_STATICWIN", "0") == "1"
# Combine-matmul precision: HIGHEST (6-pass, exact f32 sums) vs DEFAULT.
# r3's bench measured the DEFAULT-precision combine bitwise identical to the
# XLA segment_sum on v5e; the knob lets the bench re-verify that while the
# default stays the safe one (r3 ADVICE).
_DOT_PRECISION = (jax.lax.Precision.DEFAULT
                  if _os.environ.get("TORECSYS_TPU_DEDUP_PRECISION", "highest")
                  == "default" else jax.lax.Precision.HIGHEST)


def _make_dedup_kernel(num_slots: int, rule: str, pack: int, embed: int):
    """Fully-fused dedup + optimizer kernel over a SORTED slot-grad stream.

    Replaces the XLA-side one-hot widen + 128-lane segment_sum + compact-gsum
    materialization (measured ~1 ms/step at Criteo shapes, SPEED.md) with
    in-kernel VPU widening and an MXU one-hot segment combine, then applies
    the optimizer to each finalized row with the same windowed-DMA
    read-modify-write machinery as the post-dedup kernel.

    Per grid program (one tile of TILE_P sorted positions):
      1. widen: place each narrow (E,) grad into its in-row slot of a
         (TILE_P, P*E) tile via an iota==lo mask (VPU);
      2. combine: partial[s] = Σ_p [seg_local[p] == s] · wide[p] — ONE
         (TILE_P, TILE_P) x (TILE_P, W) matmul on the MXU (duplicate ids are
         adjacent in the sorted stream, so segments are contiguous);
      3. carry: a segment spanning a tile boundary accumulates through a
         persistent VMEM carry row (TPU grids run sequentially) and is
         finalized exactly once, in the tile where it ends;
      4. update: windowed-DMA RMW of the finalized rows (table + slots),
         optimizer math vectorized over the whole tile.

    Kernel operand order (PrefetchScalarGridSpec):
      scalar-prefetch: uids, first_seg, last_seg, cont, hyper
      blocked VMEM:    seg (1,TILE_P), lo (1,TILE_P), g (1,TILE_P,E)
      ANY:             table, *slots  (aliased to outputs)
      scratch:         partial (TILE_P,W), per-array row scratch, carry (1,W),
                       DMA semaphores
    """
    w = pack * embed

    def kernel(uids_ref, first_seg_ref, last_seg_ref, cont_ref, nvalidseg_ref,
               hyper_ref, seg_ref, lo_ref, g_ref, *refs):
        n_arr = 1 + num_slots
        hbm_in = refs[:n_arr]
        hbm_out = refs[n_arr:2 * n_arr]
        partial_scr = refs[2 * n_arr]
        scratch = refs[2 * n_arr + 1: 3 * n_arr + 1]
        carry_scr = refs[3 * n_arr + 1]
        sems = refs[-1]

        t = pl.program_id(0)
        base_seg = first_seg_ref[t]
        nseg = last_seg_ref[t] - base_seg + 1
        cont_in = cont_ref[t]
        cont_out = cont_ref[t + 1]
        n_fin = nseg - cont_out  # segments finalized in this tile
        # valid (non-sentinel) segments are a PREFIX of the global segment
        # list (ids ascend, sentinel padding sorts last) — so the RMW bound
        # is a pure index comparison, no per-row uid loads
        n_rmw = jnp.clip(nvalidseg_ref[0] - base_seg, 0, n_fin)

        # ---- widen + segment combine (VPU + MXU) --------------------------
        g = g_ref[0]                        # (TILE_P, E)
        lo = lo_ref[0, 0, :]                # (TILE_P,)
        seg_local = seg_ref[0, 0, :] - base_seg
        if pack > 1:
            # 2-D widen (Mosaic cannot shape-cast (TILE_P, P, E) ->
            # (TILE_P, P*E)): lane c of the wide row holds g[:, c % E] iff
            # this row's slot is c // E.
            lane_slot = jax.lax.broadcasted_iota(jnp.int32, (TILE_P, w), 1) // embed
            g_rep = pltpu.repeat(g, pack, axis=1)          # [g | g | ... ]
            wide = jnp.where(lane_slot == lo[:, None], g_rep,
                             jnp.zeros((), g.dtype))
        else:
            wide = g
        # Sub-tiled combine: chunk of SUB positions -> (SUB, SUB) one-hot
        # against its wide grads, accumulated into a DYNAMIC window of the
        # partial buffer.  Segments are nondecreasing, so the SUB positions
        # of a chunk span at most SUB distinct segments starting at the
        # chunk's first segment — window [win0, win0 + SUB).  Chunks sharing
        # a boundary segment accumulate into the same row (+=, sequential,
        # deterministic).  partial_scr is padded by SUB rows so the last
        # window never writes out of bounds.
        partial_scr[:] = jnp.zeros_like(partial_scr)
        sub_iota = jax.lax.broadcasted_iota(jnp.int32, (SUB, SUB), 0)
        for k in range(TILE_P // SUB):
            pos0 = k * SUB
            seg_sub = seg_local[pos0:pos0 + SUB]
            win0 = seg_sub[0]
            rel = seg_sub - win0
            oh = (sub_iota == rel[None, :]).astype(wide.dtype)
            # HIGHEST precision: the default MXU passes accumulate f32
            # operands at reduced precision, so duplicate-id gradient sums
            # could diverge from the XLA segment_sum this replaces
            # (r3 ADVICE).
            acc = jax.lax.dot(
                oh, wide[pos0:pos0 + SUB], preferred_element_type=jnp.float32,
                precision=_DOT_PRECISION,
            )
            if _DEBUG_STATICWIN:
                partial_scr[0:SUB, :] += acc  # timing only: wrong results
            else:
                partial_scr[pl.ds(win0, SUB), :] += acc

        # ---- boundary carry ----------------------------------------------
        @pl.when(cont_in == 1)
        def _():
            partial_scr[0:1, :] += carry_scr[:]

        @pl.when(cont_out == 1)
        def _():
            carry_scr[:] = partial_scr[pl.ds(nseg - 1, 1), :]

        # ---- all-at-once DMA RMW of finalized rows ------------------------
        def read_dma(a, i):
            return pltpu.make_async_copy(
                hbm_in[a].at[pl.ds(uids_ref[base_seg + i], 1)],
                scratch[a].at[pl.ds(i, 1)],
                sems.at[a],
            )

        def write_dma(a, i):
            return pltpu.make_async_copy(
                scratch[a].at[pl.ds(i, 1)],
                hbm_out[a].at[pl.ds(uids_ref[base_seg + i], 1)],
                sems.at[a],
            )

        def phase(dma_fn, hbm):
            # every row targets a DISTINCT scratch row, so all starts issue
            # back-to-back (hardware queue backpressure), drained by GROUPED
            # waits (one UNROLL-row size-only descriptor retires UNROLL
            # single-row copies) — see _make_kernel.phase for the rationale
            def body(c, _):
                for u in range(UNROLL):
                    i = c * UNROLL + u

                    @pl.when(i < n_rmw)
                    def _():
                        for a in range(1 + num_slots):
                            dma_fn(a, i).start()

                return 0

            jax.lax.fori_loop(0, (n_rmw + UNROLL - 1) // UNROLL, body, 0)
            n_groups = n_rmw // UNROLL

            def wait_group(c, _):
                for a in range(1 + num_slots):
                    pltpu.make_async_copy(
                        hbm[a].at[pl.ds(0, UNROLL)],
                        scratch[a].at[pl.ds(c * UNROLL, UNROLL)],
                        sems.at[a],
                    ).wait()
                return 0

            def wait_one(i, _):
                for a in range(1 + num_slots):
                    pltpu.make_async_copy(
                        hbm[a].at[pl.ds(0, 1)],
                        scratch[a].at[pl.ds(i, 1)],
                        sems.at[a],
                    ).wait()
                return 0

            jax.lax.fori_loop(0, n_groups, wait_group, 0)
            jax.lax.fori_loop(n_groups * UNROLL, n_rmw, wait_one, 0)

        if not _DEBUG_NORMW:
            phase(read_dma, hbm_in)

        # ---- vectorized optimizer math over the tile ----------------------
        lr = hyper_ref[0]
        b1 = hyper_ref[1]
        b2 = hyper_ref[2]
        eps = hyper_ref[3]
        wd = hyper_ref[4]
        bc1 = hyper_ref[5]
        bc2 = hyper_ref[6]
        gsum = partial_scr[0:TILE_P, :]
        row = scratch[0][:]
        if rule == "adam":
            m_new = b1 * scratch[1][:, 0, :] + (1.0 - b1) * gsum
            v_new = b2 * scratch[1][:, 1, :] + (1.0 - b2) * gsum * gsum
            upd = lr * ((m_new * bc1) / (jnp.sqrt(v_new * bc2) + eps))
            upd = upd + lr * wd * row
            scratch[1][:, 0, :] = m_new
            scratch[1][:, 1, :] = v_new
        elif rule == "adagrad":
            v_new = scratch[1][:] + gsum * gsum
            upd = lr * gsum * jax.lax.rsqrt(v_new + eps)
            scratch[1][:] = v_new
        else:  # sgd
            upd = lr * gsum
        scratch[0][:] = row - upd

        if not _DEBUG_NORMW:
            phase(write_dma, hbm_out)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("pack", "rule", "interpret")
)
def _fused_sorted_update(sorted_ids, g_sorted, table, slots, hyper, pack,
                         rule, interpret=False):
    from torecsys_tpu.ops.sparse import prefix_sum

    m, e = g_sorted.shape
    num_rows = table.shape[0]
    sentinel = num_rows * pack
    pad = (-m) % TILE_P
    if pad:
        sorted_ids = jnp.pad(sorted_ids, (0, pad), constant_values=sentinel)
        g_sorted = jnp.pad(g_sorted, ((0, pad), (0, 0)))
    mp = m + pad
    t_tiles = mp // TILE_P

    sorted_ids = sorted_ids.astype(jnp.int32)
    hi = sorted_ids // pack
    lo = sorted_ids % pack
    is_first = jnp.concatenate([jnp.ones((1,), bool), hi[1:] != hi[:-1]])
    seg = prefix_sum(is_first.astype(jnp.int32)) - 1
    # segment s's stored-row id (sentinel rows land at >= num_rows and are
    # skipped by the kernel's row-bound predicate)
    uids = jnp.full((mp,), num_rows, jnp.int32).at[seg].set(
        hi, indices_are_sorted=True
    )
    first_seg = jnp.concatenate([seg[::TILE_P], seg[-1:] + 1])
    last_seg = seg[TILE_P - 1::TILE_P]
    cont_mid = (seg[TILE_P::TILE_P] == seg[TILE_P - 1::TILE_P][:-1]).astype(jnp.int32)
    cont = jnp.concatenate([jnp.zeros((1,), jnp.int32), cont_mid,
                            jnp.zeros((1,), jnp.int32)])
    # count of non-sentinel segments (a global prefix): the kernel's pure-
    # index RMW bound
    nvalidseg = jnp.sum(uids < num_rows, dtype=jnp.int32).reshape(1)

    n_arr = 1 + len(slots)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,  # uids, first/last_seg, cont, nvalidseg, hyper
        grid=(t_tiles,),
        in_specs=[
            # (T, 1, TILE_P) int blocks: Mosaic requires the last two block
            # dims be (8k, 128k) or equal the array dims — the dummy middle
            # dim makes (1, TILE_P) satisfy that.
            pl.BlockSpec((1, 1, TILE_P), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),          # seg
            pl.BlockSpec((1, 1, TILE_P), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),          # lo
            pl.BlockSpec((1, TILE_P, e), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),          # g
        ] + [pl.BlockSpec(memory_space=pl.ANY)] * n_arr,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_arr,
        scratch_shapes=[pltpu.VMEM((TILE_P + SUB, table.shape[1]), jnp.float32)]
        + [pltpu.VMEM((TILE_P, *a.shape[1:]), a.dtype) for a in (table, *slots)]
        + [pltpu.VMEM((1, table.shape[1]), jnp.float32)]
        + [pltpu.SemaphoreType.DMA((n_arr,))],
    )
    out_shapes = [jax.ShapeDtypeStruct(a.shape, a.dtype) for a in (table, *slots)]
    # flattened inputs: uids, first_seg, last_seg, cont, nvalidseg, hyper,
    # seg, lo, g, table, *slots → alias table/slots onto the outputs
    aliases = {9 + a: a for a in range(n_arr)}
    outs = pl.pallas_call(
        _make_dedup_kernel(len(slots), rule, pack, e),
        grid_spec=grid_spec,
        out_shape=out_shapes,
        input_output_aliases=aliases,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * TILE_P * table.shape[1],
            bytes_accessed=2 * n_arr * mp * table.shape[1] * 4,
            transcendentals=0,
        ),
    )(uids, first_seg, last_seg, cont, nvalidseg, hyper,
      seg.reshape(t_tiles, 1, TILE_P), lo.reshape(t_tiles, 1, TILE_P),
      g_sorted.reshape(t_tiles, TILE_P, e), table, *slots)
    return outs[0], list(outs[1:])


def fused_sorted_dedup_update(
    sorted_ids: jnp.ndarray,
    g_sorted: jnp.ndarray,
    table: jnp.ndarray,
    slots: Tuple[jnp.ndarray, ...],
    hyper: jnp.ndarray,
    pack: int,
    rule: str,
    interpret: bool = False,
):
    """Dedup + row-wise optimizer update fused into one kernel pass.

    Args:
        sorted_ids: ``(M,)`` int32 **logical** row ids sorted ascending
            (duplicates allowed — this kernel does the dedup); sentinel
            padding must be ``>= num_stored_rows * pack``.
        g_sorted: ``(M, E)`` narrow per-slot grads, permuted to match
            ``sorted_ids``.
        table: ``(R, P*E)`` packed stored table.
        slots: optimizer slot arrays (see :func:`fused_rowwise_update`).
        hyper: ``(7,)`` f32 hyperparameter vector.
        pack: logical rows per stored row (``P``).
        rule: 'adam' | 'adagrad' | 'sgd'.

    Returns:
        (new_table, [new_slots...]) — aliased onto the inputs on TPU.
    """
    assert rule in ("adam", "adagrad", "sgd"), rule
    return _fused_sorted_update(
        sorted_ids, g_sorted, table, tuple(slots), hyper, pack, rule,
        interpret=interpret,
    )


def fused_rowwise_update(
    uids: jnp.ndarray,
    gsum: jnp.ndarray,
    table: jnp.ndarray,
    slots: Tuple[jnp.ndarray, ...],
    hyper: jnp.ndarray,
    rule: str,
    interpret: bool = False,
    n_valid: jnp.ndarray | None = None,
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
                         interpret=interpret, n_valid=n_valid)
