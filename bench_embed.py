"""Embedding-lookup microbenchmark: lookups/sec + %-of-roofline (BASELINE.md).

Measures the fused-table packed lookup (the reference's hot path,
``/root/reference/torecsys/inputs/base/multi_indices_emb.py:103-104``) on the
real TPU, Criteo-shaped: batch 4096 x 26 fields = 106,496 Zipf-distributed
lookups per step against a 0.5M/30M-row fused table, embed size 16 (packed
(V/8, 128) layout).

Three measurements, each as steps inside one jitted ``lax.scan`` (the only
reliable timing on the tunneled runtime — see bench.py):

* ``fwd``:       gather only (inference path)
* ``fwd_bwd``:   gather + scatter-add cotangent (dense-grad training path)
* ``train_row``: gather + per-slot grads + dedup + fused row-wise Adam
                 (the sparse train path's full embedding cost)

Output: one JSON line per (table_rows, mode) with lookups/sec and
bytes-moved/sec vs the v5e HBM peak (819 GB/s).  SPEED.md records the
numbers and the roofline accounting.
"""

from __future__ import annotations

import json
import time

import numpy as np

BATCH = 4096
N_FIELDS = 26
EMBED = 16
ITERS = 40         # steps per dispatch (lax.scan)
REPS = 5
V5E_HBM_GBPS = 819.0


def run(total_rows: int, mode: str):
    import jax
    import jax.numpy as jnp

    from torecsys_tpu.ops.embedding import packed_lookup, packed_shape
    from torecsys_tpu.ops.sparse import RowAdam, dedup_sum_stored

    m = BATCH * N_FIELDS
    rng = np.random.default_rng(0)
    raw = rng.zipf(1.2, size=(ITERS, m))
    ids = jnp.asarray(np.minimum(raw - 1, total_rows - 1).astype(np.int32))
    vp, w = packed_shape(total_rows, EMBED)
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
        def body(carry, step_ids):
            t, acc = carry
            g = jax.grad(lambda tt: (packed_lookup(tt, step_ids, EMBED) ** 2).sum())(t)
            return (t, acc + g.sum()), ()

        init = (table, jnp.zeros(()))
        # fwd row read + dense cotangent buffer write + scatter r/м-w
        bytes_per_lookup = w * 4 * 3
    elif mode == "train_row":
        row_tx = RowAdam(learning_rate=1e-3)
        slots = row_tx.init(table)

        def body(carry, step_ids):
            t, sl, acc = carry
            out, vjp = jax.vjp(lambda tt: packed_lookup(tt, step_ids, EMBED),
                               jax.lax.stop_gradient(t))
            g = 2.0 * out  # cotangent of sum(out**2); per-slot, O(batch)
            uids, gsum = dedup_sum_stored(
                step_ids.reshape(-1), g.reshape(-1, EMBED), pack, vp
            )
            t, sl = row_tx.update(t, sl, uids, gsum, jnp.int32(1))
            return (t, sl, acc + out.sum()), ()

        init = (table, slots, jnp.zeros(()))
        # row read + (table + mv) read&write on ~unique rows; amortized per
        # lookup this is well under fwd_bwd's dense-buffer traffic
        bytes_per_lookup = w * 4 * 2
    else:
        raise KeyError(mode)

    @jax.jit
    def scan_fn(carry, all_ids):
        return jax.lax.scan(body, carry, all_ids)

    carry, _ = scan_fn(init, ids)
    jax.block_until_ready(jax.tree_util.tree_leaves(carry)[0])
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
    print(json.dumps({
        "metric": f"embedding_lookups_per_sec[{mode}]",
        "table_rows": total_rows,
        "value": round(lookups_per_sec, 0),
        "unit": "lookups/sec",
        "ms_per_step": round(dt / steps * 1000, 3),
        "approx_gbps": round(gbps, 1),
        "pct_of_hbm_roofline": round(100 * gbps / V5E_HBM_GBPS, 1),
    }), flush=True)


if __name__ == "__main__":
    import sys

    rows = [int(a) for a in sys.argv[1:] if a.isdigit()] or [500_000, 30_000_000]
    modes = [a for a in sys.argv[1:] if not a.isdigit()] or ["fwd", "fwd_bwd", "train_row"]
    for r in rows:
        for mo in modes:
            run(r, mo)
