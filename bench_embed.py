"""Embedding-lookup microbenchmark: lookups/sec + %-of-roofline (BASELINE.md).

Measures the fused-table packed lookup (the reference's hot path,
``/root/reference/torecsys/inputs/base/multi_indices_emb.py:103-104``) on the
real TPU, Criteo-shaped: batch 4096 x 26 fields = 106,496 lookups per step,
per-field Zipf ids over a long-tailed field-size split of the total vocab
(offsets applied, as ``MultiIndicesEmbedding.embed`` does), embed size 16
(packed (V/8, 128) layout).

Three measurements, each as steps inside one jitted ``lax.scan`` with the
carry DONATED (the 30M-row config holds ~5.8 GB of table+slot state; without
donation it is held twice and OOMs — learned the hard way):

* ``fwd``:       gather only (inference path)
* ``fwd_bwd``:   gather + scatter-add cotangent + dense optax Adam over the
                 full table (the dense-grad training path)
* ``train_row``: gather + per-slot grads + dedup + fused row-wise Adam
                 (the sparse train path's full embedding cost)

Before timing, a compiled-on-TPU numeric check runs the fused Pallas update
kernel against the pure-XLA row path on identical inputs and fails loudly on
divergence (the interpret-mode equivalence test cannot catch a Mosaic
miscompile; this does).

Output: one JSON line per (table_rows, mode) with lookups/sec and
bytes-moved/sec vs the v5e HBM peak (819 GB/s); a combined artifact is
written to SPEED.json.  SPEED.md records the numbers and the roofline
accounting.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

BATCH = 4096
N_FIELDS = 26
EMBED = 16
ITERS = 20         # steps per dispatch (lax.scan)
REPS = 5
V5E_HBM_GBPS = 819.0
ARTIFACT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "SPEED.json")


def make_field_ids(total_rows: int, iters: int, rng) -> np.ndarray:
    """Per-field Zipf ids with offsets applied — the id stream
    ``MultiIndicesEmbedding.embed`` actually produces."""
    raw_sizes = rng.zipf(1.3, N_FIELDS).astype(np.float64)
    sizes = np.maximum(
        (raw_sizes / raw_sizes.sum() * total_rows).astype(np.int64), 4
    )
    offs = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    cols = [
        np.minimum(rng.zipf(1.2, size=(iters, BATCH)) - 1, s - 1) + o
        for s, o in zip(sizes, offs)
    ]
    return np.stack(cols, axis=2).astype(np.int32), int(sizes.sum())  # (I,B,N)


def check_kernel_numerics(rng):
    """Compiled-on-TPU equivalence: fused Pallas update vs the XLA row path.

    Runs once per bench invocation; raises on divergence (VERDICT r2 §weak-4:
    interpret-mode tests cannot catch a Mosaic miscompile/DMA race).
    """
    import jax
    import jax.numpy as jnp

    from torecsys_tpu.ops import pallas as pallas_mod
    from torecsys_tpu.ops.sparse import RowAdam, dedup_sum_fields, sort_slot_grads

    if not pallas_mod.sparse_update_enabled():
        print(json.dumps({"kernel_numeric_check": "skipped (no TPU kernel)"}))
        return
    rows, e = 4096, EMBED
    from torecsys_tpu.ops.embedding import packed_shape

    vp, w = packed_shape(rows, e)
    pack = w // e
    ids = jnp.asarray(rng.integers(0, rows, (256, 8)).astype(np.int32))
    g = jnp.asarray(rng.normal(size=(256, 8, e)).astype(np.float32))
    table = jnp.asarray(rng.normal(0, 0.1, size=(vp, w)).astype(np.float32))
    tx = RowAdam(learning_rate=1e-2, weight_decay=1e-4)
    slots = tx.init(table)

    @jax.jit
    def run_postdedup(t, sl):
        # exercises fused_rowwise_update (dedup done in XLA)
        uids, gsum = dedup_sum_fields(ids, g, pack, vp)
        return tx.update(t, sl, uids, gsum, jnp.int32(3))

    @jax.jit
    def run_sorted(t, sl):
        # exercises fused_sorted_dedup_update (dedup inside the kernel)
        sorted_ids, g_sorted = sort_slot_grads(ids, g)
        return tx.update_sorted(t, sl, sorted_ids, g_sorted, jnp.int32(3))

    # trusted presorted route: host (C++) aux + widen-fused segsum kernel +
    # RMW with the host unique count
    from torecsys_tpu.data.presort import AUX_NAMES, Presorter, PresortSpec

    spec = PresortSpec(("ids",), (0,), pack, vp)
    aux_np = Presorter([spec])({"ids": np.asarray(ids).reshape(-1)})
    aux = {n: jnp.asarray(aux_np[spec.aux_key(n)]) for n in AUX_NAMES}

    @jax.jit
    def run_host_aux(t, sl):
        return tx.update_from_host_aux(
            t, sl, g.reshape(-1, e), aux, jnp.int32(3)
        )

    report = {}
    fail = False
    os.environ["TORECSYS_TPU_FUSED_DEDUP"] = "1"  # check the opt-in kernel too
    for name, fn in (("postdedup", run_postdedup), ("sorted", run_sorted),
                     ("host_aux", run_host_aux)):
        new_t_k, new_sl_k = fn(table, slots)             # kernel path (TPU)
        with pallas_mod.disable():                       # XLA fallback path
            new_t_x, new_sl_x = jax.jit(
                lambda t, sl, fn=fn: fn(t, sl)
            )(table, slots)
        dt = float(jnp.max(jnp.abs(new_t_k - new_t_x)))
        dm = float(jnp.max(jnp.abs(new_sl_k["mv"] - new_sl_x["mv"])))
        report[f"max_abs_diff_table[{name}]"] = dt
        report[f"max_abs_diff_mv[{name}]"] = dm
        fail = fail or dt > 1e-5 or dm > 1e-5
    os.environ.pop("TORECSYS_TPU_FUSED_DEDUP", None)
    print(json.dumps({
        "kernel_numeric_check": "FAILED" if fail else "ok", **report,
    }), flush=True)
    if fail:
        raise SystemExit("fused kernel diverges from XLA row path on TPU")


def run(total_rows: int, mode: str, results: list):
    import jax
    import jax.numpy as jnp
    import optax

    from torecsys_tpu.ops.embedding import packed_lookup, packed_shape
    from torecsys_tpu.ops.sparse import RowAdam, sort_slot_grads

    m = BATCH * N_FIELDS
    rng = np.random.default_rng(0)
    ids_np, total = make_field_ids(total_rows, ITERS, rng)
    ids = jnp.asarray(ids_np)
    vp, w = packed_shape(total, EMBED)
    pack = w // EMBED
    table = jnp.asarray(rng.normal(0, 0.01, size=(vp, w)).astype(np.float32))

    if mode == "fwd":
        def body(carry, step_ids):
            t, acc = carry
            out = packed_lookup(t, step_ids, EMBED)
            return (t, acc + out.sum()), ()

        init = (table, jnp.zeros(()))
        # bytes: read one 512B stored row per lookup + write 64B activation
        bytes_per_lookup = w * 4 + EMBED * 4
    elif mode == "fwd_bwd":
        # Dense training path: dense cotangent buffer + full-table Adam — the
        # reference's semantics (torch.optim.Adam over nn.Embedding.weight).
        tx = optax.adam(1e-3)
        opt0 = tx.init(table)

        def body(carry, step_ids):
            t, opt, acc = carry
            gfn = jax.grad(lambda tt: (packed_lookup(tt, step_ids, EMBED) ** 2).sum())
            gr = gfn(t)
            updates, opt = tx.update(gr, opt, t)
            t = optax.apply_updates(t, updates)
            return (t, opt, acc + gr.sum()), ()

        init = (table, opt0, jnp.zeros(()))
        # fwd row read + dense cotangent zero+scatter (2x) + full-table
        # adam: read t,m,v + write t,m,v (6x)
        bytes_per_lookup = w * 4 * 3 + (vp * w * 4 * 8) // m
    elif mode == "train_row":
        row_tx = RowAdam(learning_rate=1e-3)
        slots = row_tx.init(table)

        def body(carry, step_ids):
            t, sl, acc = carry
            out = packed_lookup(jax.lax.stop_gradient(t), step_ids, EMBED)
            g = 2.0 * out  # cotangent of sum(out**2); per-slot, O(batch)
            sorted_ids, g_sorted = sort_slot_grads(
                step_ids.reshape(BATCH, -1), g.reshape(BATCH, -1, EMBED)
            )
            t, sl = row_tx.update_sorted(t, sl, sorted_ids, g_sorted, jnp.int32(1))
            return (t, sl, acc + out.sum()), ()

        init = (table, slots, jnp.zeros(()))
        # sort+permute passes over (M,8B)+(M,64B) + widen/segsum over
        # (M,512B) + touched-row (table+mv) read&write
        bytes_per_lookup = w * 4 * 2
    elif mode == "fwd_bwd_bf16":
        # Dense training path with BF16 TABLE STORAGE (VERDICT r4 weak-6:
        # the dense fallback is genuinely bandwidth-bound — 34-59% of the
        # HBM roofline — so halving row bytes should nearly halve it;
        # m/v slots follow the param dtype under optax).  f32 loss math:
        # rows cast up after the gather.
        tx = optax.adam(1e-3)
        table = table.astype(jnp.bfloat16)
        opt0 = tx.init(table)

        def body(carry, step_ids):
            t, opt, acc = carry
            gfn = jax.grad(
                lambda tt: (packed_lookup(tt, step_ids, EMBED)
                            .astype(jnp.float32) ** 2).sum()
            )
            gr = gfn(t)
            updates, opt = tx.update(gr, opt, t)
            t = optax.apply_updates(t, updates)
            return (t, opt, acc + gr.astype(jnp.float32).sum()), ()

        init = (table, opt0, jnp.zeros(()))
        bytes_per_lookup = w * 2 * 3 + (vp * w * 2 * 8) // m
    elif mode == "train_row_pre":
        # TRUSTED presorted route (VERDICT r4 ask #1): the id-stream sort /
        # segment / unique-row aux arrives from the host input pipeline
        # (data.presort — computed by the C++ radix preprocessor in the
        # prefetch workers, overlapped with device steps).  Aux is computed
        # OUTSIDE the timed loop here; the host side's own throughput is
        # measured separately (exp/host record in SPEED.md).
        from torecsys_tpu.data.presort import AUX_NAMES, Presorter, PresortSpec

        row_tx = RowAdam(learning_rate=1e-3)
        slots = row_tx.init(table)
        spec = PresortSpec(("ids",), (0,), pack, vp)
        presorter = Presorter([spec])
        aux_steps = []
        for i in range(ITERS):
            out_b = presorter({"ids": ids_np[i].reshape(-1)})
            aux_steps.append([out_b[spec.aux_key(n)] for n in AUX_NAMES])
        aux_stacked = tuple(
            jnp.asarray(np.stack([a[j] for a in aux_steps]))
            for j in range(len(AUX_NAMES))
        )

        def body(carry, xs):
            t, sl, acc = carry
            step_ids, order, lo, seg, uids, n_unique = xs
            out = packed_lookup(jax.lax.stop_gradient(t), step_ids, EMBED)
            g = (2.0 * out).reshape(-1, EMBED)
            aux = {"order": order, "lo": lo, "seg": seg, "uids": uids,
                   "n_unique": n_unique}
            t, sl = row_tx.update_from_host_aux(t, sl, g, aux, jnp.int32(1))
            return (t, sl, acc + out.sum()), ()

        init = (table, slots, jnp.zeros(()))
        ids = (ids, *aux_stacked)
        bytes_per_lookup = w * 4 * 2
    else:
        raise KeyError(mode)

    scan_fn = jax.jit(
        lambda carry, all_ids: jax.lax.scan(body, carry, all_ids),
        donate_argnums=(0,),
    )
    t0 = time.perf_counter()
    carry, _ = scan_fn(init, ids)
    jax.block_until_ready(jax.tree_util.tree_leaves(carry)[0])
    compile_s = time.perf_counter() - t0
    # flip the tunneled runtime into synchronous-acknowledgment dispatch;
    # without this the timed loop measures enqueue, not execution
    jax.device_get(jnp.zeros(()))
    t0 = time.perf_counter()
    for _ in range(REPS):
        carry, _ = scan_fn(carry, ids)
    acc = float(np.asarray(jax.tree_util.tree_leaves(carry)[-1]))
    dt = time.perf_counter() - t0
    assert np.isfinite(acc)

    steps = REPS * ITERS
    lookups_per_sec = m * steps / dt
    gbps = lookups_per_sec * bytes_per_lookup / 1e9
    rec = {
        "metric": f"embedding_lookups_per_sec[{mode}]",
        "table_rows": total_rows,
        "value": round(lookups_per_sec, 0),
        "unit": "lookups/sec",
        "ms_per_step": round(dt / steps * 1000, 3),
        "approx_gbps": round(gbps, 1),
        "pct_of_hbm_roofline": round(100 * gbps / V5E_HBM_GBPS, 1),
        "compile_s": round(compile_s, 1),
    }
    print(json.dumps(rec), flush=True)
    results.append(rec)


if __name__ == "__main__":
    import sys

    rows = [int(a) for a in sys.argv[1:] if a.isdigit()] or [500_000, 30_000_000]
    modes = [a for a in sys.argv[1:] if not a.isdigit()] or [
        "fwd", "fwd_bwd", "train_row", "train_row_pre"]
    check_kernel_numerics(np.random.default_rng(1))
    results = []
    for r in rows:
        for mo in modes:
            run(r, mo, results)
    if results:
        existing = []
        if os.path.exists(ARTIFACT):
            with open(ARTIFACT) as f:
                try:
                    existing = json.load(f)
                except json.JSONDecodeError:
                    existing = []
        keyed = {(e.get("metric"), e.get("table_rows")): e for e in existing}
        for rec in results:
            keyed[(rec["metric"], rec["table_rows"])] = rec
        with open(ARTIFACT, "w") as f:
            json.dump(list(keyed.values()), f, indent=1)
        print(f"wrote {ARTIFACT}", file=sys.stderr)
