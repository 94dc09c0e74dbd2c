"""Round-5 design experiments (run on the real chip; results -> SPEED.md).

Questions, each mapped to a VERDICT r4 "next round" ask:

  host   - ask 1: what does the host-side presort (argsort + segment ids +
           compact uids + inverse map) cost in numpy for a Criteo batch
           (M=106,496), single-thread and with 4 concurrent threads (does
           numpy release the GIL enough to overlap device steps)?
  pre    - ask 1: device ms/step of the TRUSTED presorted route (host aux
           fed as scan inputs: order/seg/uids/lo) vs the current on-device
           sort route, at 500k/8M/30M rows.
  fwd    - ask 3: forward gather from host-deduped uniques (gather U_cap
           stored rows + narrow expand take) vs the plain M-row gather.
  joint  - ask 2: (a) is a gather from an interleaved (R,3,W)[:,0,:] slice
           as fast as from a (R,W) table (or does XLA materialize the
           slice)?  (b) RMW DMA-count scaling: sgd-rule kernel on a
           (R,3W)-wide table (2 DMAs/row) vs adam on (R,W)+(R,2,W)
           (4 DMAs/row).

Usage: python tools/exp_r5.py host|pre|fwd|joint [rows...]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BATCH = 4096
N_FIELDS = 26
EMBED = 16
M = BATCH * N_FIELDS
ITERS = 20
REPS = 5


sys.path.insert(0, "/root/repo")


def make_stream(total_rows, iters, rng):
    from bench_embed import make_field_ids

    return make_field_ids(total_rows, iters, rng)


def host_aux(flat_ids: np.ndarray, pack: int, num_stored: int, ucap: int | None):
    """The candidate host-side preprocessing (pure numpy)."""
    order = np.argsort(flat_ids, kind="stable").astype(np.int32)
    s = flat_ids[order]
    hi = s // pack
    lo = (s % pack).astype(np.int32)
    first = np.empty(s.shape[0], dtype=bool)
    first[0] = True
    np.not_equal(hi[1:], hi[:-1], out=first[1:])
    seg = np.cumsum(first, dtype=np.int32) - 1
    n_unique = int(seg[-1]) + 1
    uids = np.full(s.shape[0] if ucap is None else ucap, num_stored, np.int32)
    uids[:n_unique] = hi[first]
    inv = np.empty(s.shape[0], np.int32)
    inv[order] = seg
    return order, s.astype(np.int32), lo, seg, uids, inv, n_unique


def exp_host():
    rng = np.random.default_rng(0)
    ids_np, total = make_stream(30_000_000, ITERS, rng)
    pack = 8
    num_stored = -(-total // pack)
    flats = [ids_np[i].reshape(-1) for i in range(ITERS)]

    # single-thread cost
    t0 = time.perf_counter()
    for f in flats:
        host_aux(f, pack, num_stored, None)
    dt1 = (time.perf_counter() - t0) / ITERS
    # components
    t0 = time.perf_counter()
    for f in flats:
        np.argsort(f, kind="stable")
    dt_sort = (time.perf_counter() - t0) / ITERS

    # 4 threads: does it scale (GIL release)?
    from concurrent.futures import ThreadPoolExecutor

    work = flats * 4
    with ThreadPoolExecutor(4) as ex:
        t0 = time.perf_counter()
        list(ex.map(lambda f: host_aux(f, pack, num_stored, None), work))
        dt4 = (time.perf_counter() - t0) / len(work)
    print(json.dumps({
        "exp": "host_presort",
        "ms_single": round(dt1 * 1e3, 2),
        "ms_argsort_only": round(dt_sort * 1e3, 2),
        "ms_amortized_4threads": round(dt4 * 1e3, 2),
        "batches_per_sec_4threads": round(1.0 / dt4, 1),
        "needed_for_1M_exps": round(1e6 / BATCH, 1),
    }), flush=True)


def _scan_time(body, init, xs, donate=True):
    import jax

    scan_fn = jax.jit(
        lambda carry, all_xs: jax.lax.scan(body, carry, all_xs),
        donate_argnums=(0,) if donate else (),
    )
    t0 = time.perf_counter()
    carry, _ = scan_fn(init, xs)
    jax.block_until_ready(jax.tree_util.tree_leaves(carry)[0])
    compile_s = time.perf_counter() - t0
    import jax.numpy as jnp

    jax.device_get(jnp.zeros(()))
    t0 = time.perf_counter()
    for _ in range(REPS):
        carry, _ = scan_fn(carry, xs)
    acc = float(np.asarray(jax.tree_util.tree_leaves(carry)[-1]))
    dt = time.perf_counter() - t0
    assert np.isfinite(acc), acc
    return dt / (REPS * ITERS) * 1e3, compile_s


def exp_pre(rows_list):
    import jax
    import jax.numpy as jnp

    from torecsys_tpu.ops.embedding import packed_lookup, packed_shape
    from torecsys_tpu.ops.pallas.sparse_update import (
        fused_rowwise_update,
        sorted_segment_sum_wide,
    )
    from torecsys_tpu.ops.sparse import RowAdam, sort_slot_grads

    for total_rows in rows_list:
        rng = np.random.default_rng(0)
        ids_np, total = make_stream(total_rows, ITERS, rng)
        vp, w = packed_shape(total, EMBED)
        pack = w // EMBED
        table = jnp.asarray(rng.normal(0, 0.01, (vp, w)).astype(np.float32))
        row_tx = RowAdam(learning_rate=1e-3)
        slots = row_tx.init(table)
        hyper, _ = row_tx.hyper_and_rule(jnp.int32(1))

        aux = [host_aux(ids_np[i].reshape(-1), pack, vp, None) for i in range(ITERS)]
        order = jnp.asarray(np.stack([a[0] for a in aux]))
        lo = jnp.asarray(np.stack([a[2] for a in aux]))
        seg = jnp.asarray(np.stack([a[3] for a in aux]))
        uids = jnp.asarray(np.stack([a[4] for a in aux]))
        ids = jnp.asarray(ids_np)

        def body_cur(carry, step_ids):
            t, sl, acc = carry
            out = packed_lookup(jax.lax.stop_gradient(t), step_ids, EMBED)
            g = 2.0 * out
            sorted_ids, g_sorted = sort_slot_grads(
                step_ids.reshape(BATCH, -1), g.reshape(BATCH, -1, EMBED)
            )
            t, sl = row_tx.update_sorted(t, sl, sorted_ids, g_sorted, jnp.int32(1))
            return (t, sl, acc + out.sum()), ()

        def body_pre(carry, xs):
            t, sl, acc = carry
            step_ids, o, l, sg, u = xs
            out = packed_lookup(jax.lax.stop_gradient(t), step_ids, EMBED)
            g = (2.0 * out).reshape(-1, EMBED)
            g_sorted = jnp.take(g, o, axis=0)       # narrow permute (host order)
            oh = jax.nn.one_hot(l, pack, dtype=g.dtype)
            wide = jnp.einsum("mp,me->mpe", oh, g_sorted).reshape(-1, pack * EMBED)
            gsum = sorted_segment_sum_wide(wide, sg)
            new_t, (new_mv,) = fused_rowwise_update(
                u, gsum, t, (sl["mv"].reshape(-1, 2, w),), hyper, "adam"
            )
            sl = {"mv": new_mv.reshape(sl["mv"].shape)}
            return (new_t, sl, acc + out.sum()), ()

        ms_cur, c1 = _scan_time(body_cur, (table, slots, jnp.zeros(())), ids)
        table2 = jnp.asarray(rng.normal(0, 0.01, (vp, w)).astype(np.float32))
        slots2 = row_tx.init(table2)
        ms_pre, c2 = _scan_time(
            body_pre, (table2, slots2, jnp.zeros(())), (ids, order, lo, seg, uids)
        )
        print(json.dumps({
            "exp": "presorted_route", "rows": total_rows,
            "ms_current": round(ms_cur, 3), "ms_presorted": round(ms_pre, 3),
            "compile_s": [round(c1, 1), round(c2, 1)],
        }), flush=True)


def exp_fwd(rows_list):
    import jax
    import jax.numpy as jnp

    from torecsys_tpu.ops.embedding import packed_lookup, packed_shape

    UCAP = 49152
    for total_rows in rows_list:
        rng = np.random.default_rng(0)
        ids_np, total = make_stream(total_rows, ITERS, rng)
        vp, w = packed_shape(total, EMBED)
        pack = w // EMBED
        table = jnp.asarray(rng.normal(0, 0.01, (vp, w)).astype(np.float32))
        aux = [host_aux(ids_np[i].reshape(-1), pack, vp, UCAP) for i in range(ITERS)]
        n_uni = max(a[6] for a in aux)
        uids = jnp.asarray(np.stack([a[4] for a in aux]))
        inv = jnp.asarray(np.stack([a[5] for a in aux]))
        lo_orig = jnp.asarray(ids_np % pack)          # (I, B, N)
        ids = jnp.asarray(ids_np)

        def body_plain(carry, xs):
            t, acc = carry
            out = packed_lookup(t, xs[0], EMBED)
            return (t, acc + out.sum()), ()

        def body_dedup(carry, xs):
            t, acc = carry
            step_ids, u, iv, lo = xs
            wide_u = jnp.take(t, u, axis=0, mode="fill", fill_value=0,
                              indices_are_sorted=True)         # (UCAP, W)
            narrow = wide_u.reshape(UCAP * pack, EMBED)
            idx = iv * pack + lo.reshape(-1)
            out = jnp.take(narrow, idx, axis=0).reshape(BATCH, N_FIELDS, EMBED)
            return (t, acc + out.sum()), ()

        ms_plain, _ = _scan_time(body_plain, (table, jnp.zeros(())), (ids,),
                                 donate=False)
        ms_dedup, _ = _scan_time(
            body_dedup, (table, jnp.zeros(())), (ids, uids, inv, lo_orig),
            donate=False,
        )
        print(json.dumps({
            "exp": "fwd_dedup", "rows": total_rows, "ucap": UCAP,
            "max_n_unique": int(n_uni),
            "ms_plain": round(ms_plain, 3), "ms_dedup": round(ms_dedup, 3),
        }), flush=True)


def exp_joint(rows_list):
    import jax
    import jax.numpy as jnp

    from torecsys_tpu.ops.embedding import packed_shape
    from torecsys_tpu.ops.pallas.sparse_update import fused_rowwise_update

    for total_rows in rows_list:
        rng = np.random.default_rng(0)
        ids_np, total = make_stream(total_rows, ITERS, rng)
        vp, w = packed_shape(total, EMBED)
        pack = w // EMBED
        hi = jnp.asarray(ids_np.reshape(ITERS, -1) // pack)

        # (a) gather from (R,3,W)[:,0,:] slice vs (R,W)
        table = jnp.asarray(rng.normal(0, 0.01, (vp, w)).astype(np.float32))
        joint = jnp.stack([table, jnp.zeros_like(table), jnp.zeros_like(table)], 1)

        def b_plain(carry, xs):
            t, acc = carry
            out = jnp.take(t, xs[0], axis=0)
            return (t, acc + out.sum()), ()

        def b_slice(carry, xs):
            j, acc = carry
            out = jnp.take(j[:, 0, :], xs[0], axis=0)
            return (j, acc + out.sum()), ()

        def b_wide(carry, xs):
            j, acc = carry
            out = jnp.take(j.reshape(vp, 3 * w), xs[0], axis=0)[:, :w]
            return (j, acc + out.sum()), ()

        ms_p, _ = _scan_time(b_plain, (table, jnp.zeros(())), (hi,), donate=False)
        ms_s, _ = _scan_time(b_slice, (joint, jnp.zeros(())), (hi,), donate=False)
        ms_w, _ = _scan_time(b_wide, (joint, jnp.zeros(())), (hi,), donate=False)
        print(json.dumps({
            "exp": "joint_gather", "rows": total_rows,
            "gather_ms": {"plain": round(ms_p, 3), "slice_R3W": round(ms_s, 3),
                          "wide_row_slice": round(ms_w, 3)},
        }), flush=True)
        del joint

        # (b) RMW DMA scaling: sgd on (R, 3W) single array (2 DMAs/row) vs
        # adam on (R,W)+(R,2,W) (4 DMAs/row), same uid stream
        aux = [host_aux(ids_np[i].reshape(-1), pack, vp, None) for i in range(ITERS)]
        uids = jnp.asarray(np.stack([a[4] for a in aux]))
        gsum_w = jnp.zeros((M, w), jnp.float32) + 1e-6
        gsum_3w = jnp.zeros((M, 3 * w), jnp.float32) + 1e-6
        from torecsys_tpu.ops.sparse import RowAdam

        row_tx = RowAdam(1e-3)
        hyper, _ = row_tx.hyper_and_rule(jnp.int32(1))
        joint_flat = jnp.concatenate(
            [table, jnp.zeros((vp, 2 * w), jnp.float32)], axis=1
        )
        mv = jnp.zeros((vp, 2, w), jnp.float32)

        def b_rmw2(carry, xs):
            j, acc = carry
            new_j, _ = fused_rowwise_update(xs[0], gsum_3w, j, (), hyper, "sgd")
            return (new_j, acc + 1.0), ()

        def b_rmw4(carry, xs):
            (t, s), acc = carry
            new_t, (new_mv,) = fused_rowwise_update(
                xs[0], gsum_w, t, (s,), hyper, "adam"
            )
            return ((new_t, new_mv), acc + 1.0), ()

        ms2, _ = _scan_time(b_rmw2, (joint_flat, jnp.zeros(())), (uids,))
        del joint_flat
        ms4, _ = _scan_time(b_rmw4, ((table, mv), jnp.zeros(())), (uids,))
        print(json.dumps({
            "exp": "joint_rmw", "rows": total_rows,
            "rmw_ms": {"joint_2dma_sgd_3W": round(ms2, 3),
                       "split_4dma_adam": round(ms4, 3)},
        }), flush=True)


if __name__ == "__main__":
    which = sys.argv[1]
    rows = [int(a) for a in sys.argv[2:]] or [500_000, 30_000_000]
    if which == "host":
        exp_host()
    elif which == "pre":
        exp_pre(rows)
    elif which == "fwd":
        exp_fwd(rows)
    elif which == "joint":
        exp_joint(rows)
    else:
        raise SystemExit(f"unknown experiment {which}")
