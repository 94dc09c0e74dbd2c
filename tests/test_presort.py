"""Host-side id-stream presort (data.presort + the trusted device route).

Covers: native C++ vs NumPy preprocessing equivalence, spec derivation and
producer/consumer key agreement, the widen-fused segment-sum kernel
(interpret) vs the XLA reference, op-level update_from_host_aux vs the
on-device sort route, end-to-end Trainer parity (presort on vs off), and the
prefetch pipeline's ordering/exception semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from torecsys_tpu.data.native import presort_lib
from torecsys_tpu.data.prefetch import prefetch_map
from torecsys_tpu.data.presort import (
    AUX_NAMES,
    Presorter,
    PresortSpec,
    _presort_numpy,
    build_presort_specs,
    spec_for_module,
)
from torecsys_tpu.inputs import (
    Inputs,
    MultiIndicesEmbedding,
    MultiIndicesFieldAwareEmbedding,
    SingleIndexEmbedding,
    ValueInput,
)
from torecsys_tpu.ops.embedding import field_offsets, packed_shape


@pytest.fixture
def np_rng():
    return np.random.default_rng(0)


def _spec(sizes, pack=8):
    offs = field_offsets(sizes)
    num_stored = -(-int(sum(sizes)) // pack)
    return PresortSpec(
        tuple(f"f{i}" for i in range(len(sizes))),
        tuple(int(o) for o in offs), pack, num_stored,
    )


class TestHostPreprocessing:
    @pytest.mark.parametrize("case", [
        # (field sizes, batch, pack) — incl. degenerate single-field,
        # extreme duplication (size-1 vocab), big vocabs (radix passes),
        # and every supported pack factor
        ([100, 50, 4000, 8, 300, 77], 512, 8),
        ([1], 256, 1),
        ([1, 1, 1], 128, 4),
        ([3_000_000, 9], 1024, 2),
        ([65536] * 4, 333, 8),
    ])
    def test_native_matches_numpy(self, np_rng, case):
        if presort_lib() is None:
            pytest.skip("no C++ toolchain")
        sizes, b, pack = case
        spec = _spec(sizes, pack=pack)
        batch = {f"f{i}": np_rng.integers(0, s, b).astype(np.int32)
                 for i, s in enumerate(sizes)}
        native = Presorter([spec])(dict(batch))
        fallback = Presorter([spec], force_numpy=True)(dict(batch))
        for name in AUX_NAMES:
            np.testing.assert_array_equal(
                native[spec.aux_key(name)], fallback[spec.aux_key(name)],
                err_msg=f"{name} {case}",
            )

    def test_numpy_aux_contract(self, np_rng):
        sizes = [64, 32]
        spec = _spec(sizes, pack=4)
        b = 200
        batch = {f"f{i}": np_rng.integers(0, s, b).astype(np.int32)
                 for i, s in enumerate(sizes)}
        out = Presorter([spec], force_numpy=True)(dict(batch))
        stacked = np.stack([batch["f0"], batch["f1"]], axis=1)
        flat = (stacked + np.asarray(spec.slot_offsets)[None, :]).reshape(-1)
        order = out[spec.aux_key("order")]
        s = flat[order]
        assert np.array_equal(s, np.sort(flat))          # ascending stream
        hi = s // spec.pack
        np.testing.assert_array_equal(out[spec.aux_key("lo")], s % spec.pack)
        seg = out[spec.aux_key("seg")]
        assert (np.diff(seg) >= 0).all()
        n_unique = int(out[spec.aux_key("n_unique")])
        assert n_unique == len(np.unique(hi))
        uids = out[spec.aux_key("uids")]
        np.testing.assert_array_equal(uids[:n_unique], np.unique(hi))
        assert (uids[n_unique:] == spec.num_stored_rows).all()

    def test_missing_fields_skip_spec(self, np_rng):
        spec = _spec([64, 32])
        out = Presorter([spec], force_numpy=True)({"other": np.zeros(4)})
        assert spec.aux_key("order") not in out


class TestSpecDerivation:
    def test_multi_indices_roundtrip(self):
        mod = MultiIndicesEmbedding(embed_size=16, field_sizes=(100, 50),
                                    fields=("a", "b"))
        spec = spec_for_module(mod)
        vp, w = packed_shape(150, 16)
        assert spec.pack == w // 16
        assert spec.num_stored_rows == vp
        assert spec.slot_fields == ("a", "b")
        assert spec.slot_offsets == (0, 100)

    def test_field_aware_slots(self):
        mod = MultiIndicesFieldAwareEmbedding(
            embed_size=16, field_sizes=(100, 50), fields=("a", "b"))
        spec = spec_for_module(mod)
        vp, w = packed_shape(150, 16)
        pack = w // 16
        # slot (i, j) order, offsets off[j] + i * vp * pack
        assert spec.slot_fields == ("a", "b", "a", "b")
        assert spec.slot_offsets == (0, 100, vp * pack, 100 + vp * pack)
        assert spec.num_stored_rows == 2 * vp

    def test_single_index(self):
        mod = SingleIndexEmbedding(field_size=77, embed_size=8, fields=("x",))
        spec = spec_for_module(mod)
        assert spec.pack == 1 and spec.num_stored_rows == 77

    def test_build_specs_walks_schema_and_dedupes(self):
        emb = MultiIndicesEmbedding(embed_size=16, field_sizes=(10, 20),
                                    fields=("a", "b"))
        inputs = Inputs(schema={
            "feat_inputs": ValueInput(fields=("d",)),
            "emb_inputs": emb,
            "emb_again": MultiIndicesEmbedding(
                embed_size=16, field_sizes=(10, 20), fields=("a", "b")),
        })
        specs = build_presort_specs(inputs)
        assert len(specs) == 1  # identical schemas share one aux set


class TestWidenSegsumKernel:
    @pytest.mark.parametrize("pack", [1, 2, 4, 8])
    def test_matches_xla(self, np_rng, pack):
        from torecsys_tpu.ops.pallas.sparse_update import (
            sorted_widen_segment_sum,
        )

        m, e = 2048 + 512, 16
        rows = 700 * pack
        ids = np.sort(np_rng.integers(0, rows, m)).astype(np.int32)
        g = np_rng.normal(size=(m, e)).astype(np.float32)
        hi = ids // pack
        lo = (ids % pack).astype(np.int32)
        first = np.concatenate([[True], hi[1:] != hi[:-1]])
        seg = np.cumsum(first).astype(np.int32) - 1
        out = sorted_widen_segment_sum(
            jnp.asarray(g), jnp.asarray(lo), jnp.asarray(seg), pack,
            interpret=True,
        )
        oh = jax.nn.one_hot(lo, pack, dtype=np.float32)
        wide = np.einsum("mp,me->mpe", oh, g).reshape(m, pack * e)
        ref = jax.ops.segment_sum(
            jnp.asarray(wide), jnp.asarray(seg), num_segments=m,
            indices_are_sorted=True,
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_single_segment(self, np_rng):
        from torecsys_tpu.ops.pallas.sparse_update import (
            sorted_widen_segment_sum,
        )

        m, e, pack = 1024, 16, 8
        g = np_rng.normal(size=(m, e)).astype(np.float32)
        lo = np_rng.integers(0, pack, m).astype(np.int32)
        seg = np.zeros(m, np.int32)
        out = sorted_widen_segment_sum(
            jnp.asarray(g), jnp.asarray(lo), jnp.asarray(seg), pack,
            interpret=True,
        )
        oh = jax.nn.one_hot(lo, pack, dtype=np.float32)
        wide = np.einsum("mp,me->mpe", oh, g).reshape(m, pack * e)
        np.testing.assert_allclose(np.asarray(out[0]), wide.sum(0), rtol=1e-4,
                                   atol=1e-5)
        assert np.abs(np.asarray(out[1:])).max() == 0.0


class TestTrustedRoute:
    def test_update_from_host_aux_matches_update_sorted(self, np_rng):
        from torecsys_tpu.ops.sparse import RowAdam, RowAdagrad, RowSGD

        sizes = [500, 300, 900]
        spec = _spec(sizes)
        b = 256
        batch = {f"f{i}": np_rng.integers(0, s, b).astype(np.int32)
                 for i, s in enumerate(sizes)}
        out = Presorter([spec], force_numpy=True)(dict(batch))
        aux = {n: jnp.asarray(out[spec.aux_key(n)]) for n in AUX_NAMES}
        stacked = np.stack([batch[f] for f in spec.slot_fields], axis=1)
        flat = (stacked + np.asarray(spec.slot_offsets)[None, :]).reshape(-1)
        g = np_rng.normal(size=(flat.shape[0], 16)).astype(np.float32)
        vp, w = packed_shape(int(sum(sizes)), 16)

        for tx in (RowAdam(1e-2), RowAdagrad(1e-2), RowSGD(1e-2)):
            table = jnp.asarray(np_rng.normal(0, 0.1, (vp, w)).astype(np.float32))
            slots = tx.init(table)
            order = np.argsort(flat, kind="stable")
            t_ref, s_ref = tx.update_sorted(
                table, slots, jnp.asarray(flat[order].astype(np.int32)),
                jnp.asarray(g[order]), jnp.int32(2),
            )
            t_aux, s_aux = tx.update_from_host_aux(
                table, slots, jnp.asarray(g), aux, jnp.int32(2),
            )
            np.testing.assert_allclose(np.asarray(t_ref), np.asarray(t_aux),
                                       rtol=1e-6, atol=1e-7)
            for a, c in zip(jax.tree_util.tree_leaves(s_ref),
                            jax.tree_util.tree_leaves(s_aux)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                           rtol=1e-6, atol=1e-7)

    def test_trainer_presort_bitwise_parity(self):
        """Full-fit parity: the trusted presorted route reproduces the
        on-device sort route's trained parameters exactly (same float op
        order on the XLA fallback paths)."""
        from torecsys_tpu.train import Pipeline, Trainer

        field_sizes = (1000, 500, 200)

        def make_batches(n, b=64):
            r = np.random.default_rng(42)
            return [
                {**{f"c{i}": r.integers(0, s, b).astype(np.int32)
                    for i, s in enumerate(field_sizes)},
                 "d0": r.normal(size=b).astype(np.float32),
                 "label": r.integers(0, 2, b).astype(np.float32)}
                for _ in range(n)
            ]

        def build(presort):
            inputs = Inputs(schema={
                "feat_inputs": ValueInput(fields=("d0",)),
                "emb_inputs": MultiIndicesEmbedding(
                    embed_size=16, field_sizes=field_sizes,
                    fields=("c0", "c1", "c2")),
            })
            p = (Pipeline().set_objective("ctr").set_inputs(inputs)
                 .set_model("FM").set_criterion("BCEWithLogitsLoss")
                 .set_optimizer("Adam", lr=1e-2).set_target_fields("label"))
            p.sparse_embeddings = True
            return Trainer(p, presort=presort, prefetch=2 if presort else 0,
                           log_every=10_000)

        batches = make_batches(5)
        t_off = build(False)
        t_off.fit(lambda: iter(batches), max_epochs=1)
        t_on = build(True)
        t_on.fit(lambda: iter(batches), max_epochs=1)
        assert t_on._presorter is not None, "presorter did not activate"
        for a, b in zip(jax.tree_util.tree_leaves(t_off.state.params),
                        jax.tree_util.tree_leaves(t_on.state.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestPrefetch:
    def test_order_preserved(self):
        out = list(prefetch_map(range(50), lambda x: x * 2, num_workers=4,
                                depth=6))
        assert out == [x * 2 for x in range(50)]

    def test_zero_workers_inline(self):
        assert list(prefetch_map(range(5), None, num_workers=0)) == list(range(5))

    def test_exception_propagates(self):
        def bad(x):
            if x == 3:
                raise ValueError("boom")
            return x

        it = prefetch_map(range(10), bad, num_workers=2, depth=3)
        with pytest.raises(ValueError, match="boom"):
            list(it)

    def test_early_stop_shuts_down(self):
        it = prefetch_map(range(1000), lambda x: x, num_workers=2, depth=4)
        got = [next(it) for _ in range(3)]
        it.close()
        assert got == [0, 1, 2]


class TestFieldAwarePresort:
    def test_ffm_trainer_presort_parity(self):
        """The field-aware spec (slot (i,j) -> field j + offset off[j] +
        i*rows_per_table) through a full FFM fit: presort-on must equal
        presort-off bitwise."""
        from torecsys_tpu.train import Pipeline, Trainer

        sizes = (600, 400)

        def make_batches(n, b=64):
            r = np.random.default_rng(7)
            return [
                {"c0": r.integers(0, sizes[0], b).astype(np.int32),
                 "c1": r.integers(0, sizes[1], b).astype(np.int32),
                 "d0": r.normal(size=b).astype(np.float32),
                 "label": r.integers(0, 2, b).astype(np.float32)}
                for _ in range(n)
            ]

        def build(presort):
            inputs = Inputs(schema={
                "feat_inputs": ValueInput(fields=("d0",)),
                "field_emb_inputs": MultiIndicesFieldAwareEmbedding(
                    embed_size=16, field_sizes=sizes, fields=("c0", "c1")),
            })
            p = (Pipeline().set_objective("ctr").set_inputs(inputs)
                 .set_model("FFM", num_fields=2)
                 .set_criterion("BCEWithLogitsLoss")
                 .set_optimizer("Adam", lr=1e-2).set_target_fields("label"))
            p.sparse_embeddings = True
            return Trainer(p, presort=presort, prefetch=2 if presort else 0,
                           log_every=10_000)

        batches = make_batches(4)
        t_off = build(False)
        t_off.fit(lambda: iter(batches), max_epochs=1)
        t_on = build(True)
        t_on.fit(lambda: iter(batches), max_epochs=1)
        assert t_on._presorter is not None
        for a, b in zip(jax.tree_util.tree_leaves(t_off.state.params),
                        jax.tree_util.tree_leaves(t_on.state.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_presort_with_stacked_dispatch_parity():
    """presort aux must survive the steps_per_execution>1 stacked scan
    dispatch ((K, B*F) aux arrays sliced per micro-batch) with the same
    trained parameters as single-step dispatch."""
    from torecsys_tpu.train import Pipeline, Trainer

    sizes = (800, 300)

    def make_batches(n, b=64):
        r = np.random.default_rng(3)
        return [
            {"c0": r.integers(0, sizes[0], b).astype(np.int32),
             "c1": r.integers(0, sizes[1], b).astype(np.int32),
             "d0": r.normal(size=b).astype(np.float32),
             "label": r.integers(0, 2, b).astype(np.float32)}
            for _ in range(n)
        ]

    def build(spe):
        inputs = Inputs(schema={
            "feat_inputs": ValueInput(fields=("d0",)),
            "emb_inputs": MultiIndicesEmbedding(
                embed_size=16, field_sizes=sizes, fields=("c0", "c1")),
        })
        p = (Pipeline().set_objective("ctr").set_inputs(inputs)
             .set_model("FM").set_criterion("BCEWithLogitsLoss")
             .set_optimizer("Adam", lr=1e-2).set_target_fields("label"))
        p.sparse_embeddings = True
        return Trainer(p, presort=True, prefetch=2, log_every=10_000,
                       steps_per_execution=spe)

    batches = make_batches(6)
    t1 = build(1)
    t1.fit(lambda: iter(batches), max_epochs=1)
    t3 = build(3)
    t3.fit(lambda: iter(batches), max_epochs=1)
    assert t3._presorter is not None
    for a, b in zip(jax.tree_util.tree_leaves(t1.state.params),
                    jax.tree_util.tree_leaves(t3.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


class TestWidenSegsumCarryChain:
    @pytest.mark.parametrize("n_ids", [2, 3, 7])
    def test_segments_spanning_tiles(self, np_rng, n_ids):
        """A handful of huge segments spanning multiple TILE_P grid tiles:
        stresses the cross-tile carry row (accumulate through 2+ tiles,
        finalize exactly once) that random-id tests rarely hit."""
        from torecsys_tpu.ops.pallas.sparse_update import (
            TILE_P,
            sorted_widen_segment_sum,
        )

        m, e, pack = 3 * TILE_P, 16, 8
        ids = np.sort(np_rng.choice(n_ids * pack, size=m)).astype(np.int32)
        g = np_rng.normal(size=(m, e)).astype(np.float32)
        hi = ids // pack
        lo = (ids % pack).astype(np.int32)
        first = np.concatenate([[True], hi[1:] != hi[:-1]])
        seg = np.cumsum(first).astype(np.int32) - 1
        out = sorted_widen_segment_sum(
            jnp.asarray(g), jnp.asarray(lo), jnp.asarray(seg), pack,
            interpret=True,
        )
        oh = jax.nn.one_hot(lo, pack, dtype=np.float32)
        wide = np.einsum("mp,me->mpe", oh, g).reshape(m, pack * e)
        ref = jax.ops.segment_sum(
            jnp.asarray(wide), jnp.asarray(seg), num_segments=m,
            indices_are_sorted=True,
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-3)
