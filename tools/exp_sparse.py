"""Stage-isolation experiments for the sparse embedding path (round 4).

Measures each stage of the train_row pipeline in isolation, in-scan with a
donated carry (the bench_embed methodology — in-scan behavior differs from
standalone: XLA overlaps row-granular ops across scan iterations), so the
per-stage numbers decompose the measured end-to-end 4.57 ms at 30M rows and
point at the next 2x.

Usage: python tools/exp_sparse.py [rows...] [stage...]
Stages:
  fwd_xla        packed_lookup via XLA gather (r3 default)
  fwd_pallas     packed_lookup via Pallas row_gather (r3 opt-in)
  sort           sort_key_val(ids, arange) only
  sort_permute   sort + narrow (M,16) grad permute via jnp.take
  dedup          sort + permute + one-hot widen + segment_sum (full dedup)
  update         full sparse update (dedup + fused RMW kernel), no fwd
  rmw            RMW kernel alone on precomputed uids/gsum
  train_row      the full r3 train path (reference point)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 4096
N_FIELDS = 26
EMBED = 16
ITERS = 20
REPS = 5


def make_ids(total_rows, iters, rng):
    from bench_embed import make_field_ids

    return make_field_ids(total_rows, iters, rng)


def timed_scan(body, init, ids):
    import jax

    scan_fn = jax.jit(
        lambda carry, all_ids: jax.lax.scan(body, carry, all_ids),
        donate_argnums=(0,),
    )
    t0 = time.perf_counter()
    carry, _ = scan_fn(init, ids)
    jax.block_until_ready(jax.tree_util.tree_leaves(carry)[0])
    compile_s = time.perf_counter() - t0
    import jax.numpy as jnp

    jax.device_get(jnp.zeros(()))
    t0 = time.perf_counter()
    for _ in range(REPS):
        carry, _ = scan_fn(carry, ids)
    jax.block_until_ready(jax.tree_util.tree_leaves(carry)[0])
    dt = time.perf_counter() - t0
    acc = float(np.asarray(jax.tree_util.tree_leaves(carry)[-1]))
    assert np.isfinite(acc), acc
    return dt / (REPS * ITERS) * 1000, compile_s


def run(total_rows: int, stage: str):
    import jax
    import jax.numpy as jnp

    from torecsys_tpu.ops import pallas as pallas_mod
    from torecsys_tpu.ops.embedding import packed_lookup, packed_shape
    from torecsys_tpu.ops.sparse import (
        RowAdam,
        _combine_sorted_stored,
        sort_slot_grads,
    )

    m = BATCH * N_FIELDS
    rng = np.random.default_rng(0)
    ids_np, total = make_ids(total_rows, ITERS, rng)
    ids = jnp.asarray(ids_np)
    vp, w = packed_shape(total, EMBED)
    pack = w // EMBED
    # on-device init: a host-side 1.9 GB normal + tunnel transfer costs
    # minutes per config at 30M rows; the values don't matter for timing
    table = (jax.jit(
        lambda k: 0.01 * jax.random.normal(k, (vp, w), jnp.float32)
    )(jax.random.PRNGKey(0)))
    jax.block_until_ready(table)
    # a fixed fake per-slot grad stream (narrow), refreshed per step from ids
    row_tx = RowAdam(learning_rate=1e-3)

    if stage in ("fwd_xla", "fwd_pallas"):
        import contextlib

        ctx = contextlib.nullcontext() if stage == "fwd_pallas" else pallas_mod.disable()
        if stage == "fwd_pallas" and not pallas_mod.enabled():
            os.environ["TORECSYS_TPU_PALLAS"] = "1"

        def body(carry, step_ids):
            t, acc = carry
            out = packed_lookup(t, step_ids, EMBED)
            return (t, acc + out.sum()), ()

        with ctx:
            ms, compile_s = timed_scan(body, (table, jnp.zeros(())), ids)
    elif stage == "fwd_dedup":
        # sort + dedup + unique-STORED Pallas gather + XLA expand + slot
        # select: the dedup-once forward (candidate per-slot-gather killer)
        from torecsys_tpu.ops.pallas.embedding import unique_stored_gather
        from torecsys_tpu.parallel.lookup import _dedup_ids

        num_logical = vp * pack

        def body(carry, step_ids):
            t, acc = carry
            flat = step_ids.reshape(-1)
            uids, inv, _ = _dedup_ids(flat)
            uids = jnp.minimum(uids, num_logical)
            cw = unique_stored_gather(t, uids, EMBED)
            wide = jnp.take(cw, inv, axis=0).reshape(-1, pack, EMBED)
            lo = jnp.take(uids % pack, inv)
            oh = jax.nn.one_hot(lo, pack, dtype=wide.dtype)
            out = jnp.einsum("mp,mpe->me", oh, wide)
            return (t, acc + out.sum()), ()

        ms, compile_s = timed_scan(body, (table, jnp.zeros(())), ids)
    elif stage == "take_wide":
        # XLA take of (M, 128) rows from a static (M, 128) buffer (the
        # expand primitive's cost in isolation)
        cbuf = jnp.ones((m, w), jnp.float32)

        def body(carry, step_ids):
            t, acc = carry
            flat = step_ids.reshape(-1)
            _, order = jax.lax.sort_key_val(flat, jnp.arange(m, dtype=jnp.int32))
            out = jnp.take(cbuf, order, axis=0)
            return (t, acc + out.sum()), ()

        ms, compile_s = timed_scan(body, (table, jnp.zeros(())), ids)
    elif stage == "sort":
        def body(carry, step_ids):
            t, acc = carry
            flat = step_ids.reshape(-1)
            sid, order = jax.lax.sort_key_val(
                flat, jnp.arange(m, dtype=jnp.int32)
            )
            return (t, acc + sid.sum() + order.sum()), ()

        ms, compile_s = timed_scan(body, (table, jnp.zeros(())), ids)
    elif stage == "sort_permute":
        def body(carry, step_ids):
            t, acc = carry
            g = step_ids.reshape(BATCH, -1, 1).astype(jnp.float32) * jnp.ones(
                (1, 1, EMBED)
            )
            sid, gs = sort_slot_grads(step_ids.reshape(BATCH, -1), g)
            return (t, acc + sid.sum() + gs.sum()), ()

        ms, compile_s = timed_scan(body, (table, jnp.zeros(())), ids)
    elif stage == "dedup":
        def body(carry, step_ids):
            t, acc = carry
            g = step_ids.reshape(BATCH, -1, 1).astype(jnp.float32) * jnp.ones(
                (1, 1, EMBED)
            )
            sid, gs = sort_slot_grads(step_ids.reshape(BATCH, -1), g)
            uids, gsum = _combine_sorted_stored(sid, gs, pack, vp)
            return (t, acc + uids.sum() + gsum.sum()), ()

        ms, compile_s = timed_scan(body, (table, jnp.zeros(())), ids)
    elif stage == "update":
        slots = row_tx.init(table)

        def body(carry, step_ids):
            t, sl, acc = carry
            g = step_ids.reshape(BATCH, -1, 1).astype(jnp.float32) * jnp.ones(
                (1, 1, EMBED)
            ) * 1e-6
            sid, gs = sort_slot_grads(step_ids.reshape(BATCH, -1), g)
            t, sl = row_tx.update_sorted(t, sl, sid, gs, jnp.int32(1))
            return (t, sl, acc + 1.0), ()

        ms, compile_s = timed_scan(body, (table, slots, jnp.zeros(())), ids)
    elif stage == "rmw":
        slots = row_tx.init(table)

        def body(carry, step_ids):
            t, sl, acc = carry
            # precomputed-looking uids: unique sorted stored rows from the
            # step's ids, computed OUTSIDE the timed expectation... still in
            # step; so use a cheap surrogate: first m/8 sorted unique-ish.
            flat = step_ids.reshape(-1)
            hi = flat // pack
            sid = jax.lax.sort(hi)
            is_first = jnp.concatenate([jnp.ones((1,), bool), sid[1:] != sid[:-1]])
            uids = jnp.where(is_first, sid, vp)
            uids = jax.lax.sort(uids)
            gsum = jnp.ones((m, w), jnp.float32) * 1e-7
            t, sl = row_tx.update(t, sl, uids, gsum, jnp.int32(1))
            return (t, sl, acc + 1.0), ()

        ms, compile_s = timed_scan(body, (table, slots, jnp.zeros(())), ids)
    elif stage == "train_row":
        slots = row_tx.init(table)

        def body(carry, step_ids):
            t, sl, acc = carry
            out = packed_lookup(jax.lax.stop_gradient(t), step_ids, EMBED)
            g = 2.0 * out
            sid, gs = sort_slot_grads(
                step_ids.reshape(BATCH, -1), g.reshape(BATCH, -1, EMBED)
            )
            t, sl = row_tx.update_sorted(t, sl, sid, gs, jnp.int32(1))
            return (t, sl, acc + out.sum()), ()

        ms, compile_s = timed_scan(body, (table, slots, jnp.zeros(())), ids)
    else:
        raise KeyError(stage)

    rec = {
        "stage": stage,
        "rows": total_rows,
        "ms_per_step": round(ms, 3),
        "compile_s": round(compile_s, 1),
    }
    print(json.dumps(rec), flush=True)
    return rec


if __name__ == "__main__":
    rows = [int(a) for a in sys.argv[1:] if a.isdigit()] or [500_000, 30_000_000]
    stages = [a for a in sys.argv[1:] if not a.isdigit()] or [
        "fwd_xla", "sort", "sort_permute", "dedup", "update", "train_row",
    ]
    for r in rows:
        for s in stages:
            try:
                run(r, s)
            except Exception as e:  # keep the sweep going
                print(json.dumps({"stage": s, "rows": r, "error": repr(e)[:300]}),
                      flush=True)
