"""End-to-end trainer tests: convergence on synthetic CTR data, LTR/emb
objectives, checkpoint/resume, pipeline build from config (the reference's one
integration test ``tests/test_trainer.py:16-101`` plus what SURVEY.md §4 adds)."""

import numpy as np
import pytest

from torecsys_tpu.data import make_synthetic_ctr
from torecsys_tpu.inputs import Inputs, MultiIndicesEmbedding, ValueInput
from torecsys_tpu.train import (
    Pipeline,
    Trainer,
    restore_checkpoint,
    save_checkpoint,
)

FIELD_SIZES = (100, 50, 20)
CAT = ("cat_0", "cat_1", "cat_2")
DENSE = ("dense_0", "dense_1")


@pytest.fixture(scope="module")
def data():
    return make_synthetic_ctr(num_rows=20000, field_sizes=FIELD_SIZES, num_dense=2)


def make_inputs(embed_size=8):
    return Inputs(schema={
        "feat_inputs": ValueInput(fields=DENSE),
        "emb_inputs": MultiIndicesEmbedding(
            embed_size=embed_size, field_sizes=FIELD_SIZES, fields=CAT
        ),
    })


def loader(data, lo, hi, bs=512):
    def gen():
        for s in range(lo, hi - bs + 1, bs):
            yield {k: v[s:s + bs] for k, v in data.items()}
    return gen


def test_ctr_convergence_beats_random(data):
    p = (Pipeline().set_objective("ctr").set_inputs(make_inputs())
         .set_model("FM").set_criterion("BCEWithLogitsLoss")
         .set_optimizer("Adam", lr=0.01).set_target_fields("label"))
    tr = Trainer(p, log_every=10_000)
    m = tr.fit(loader(data, 0, 18000), val_loader=loader(data, 18000, 20000),
               max_epochs=3)
    assert m["val_auc"] > 0.6, m


def test_regularizer_changes_training(data):
    p = (Pipeline().set_objective("ctr").set_inputs(make_inputs())
         .set_model("FM").set_criterion("BCEWithLogitsLoss")
         .set_optimizer("Adam", lr=0.01).set_target_fields("label")
         .set_regularizer(weight_decay=0.1))
    tr = Trainer(p, log_every=10_000)
    m = tr.fit(loader(data, 0, 4096), max_epochs=1)
    assert np.isfinite(m["train_loss"])


def test_checkpoint_roundtrip(data, tmp_path):
    p = (Pipeline().set_objective("ctr").set_inputs(make_inputs())
         .set_model("FM").set_optimizer("Adam", lr=0.01).set_target_fields("label"))
    tr = Trainer(p, log_every=10_000)
    tr.fit(loader(data, 0, 2048), max_epochs=1)
    path = str(tmp_path / "ckpt.msgpack")
    save_checkpoint(path, tr.state)

    p2 = (Pipeline().set_objective("ctr").set_inputs(make_inputs())
          .set_model("FM").set_optimizer("Adam", lr=0.01).set_target_fields("label"))
    tr2 = Trainer(p2, log_every=10_000)
    tr2.init_state(next(loader(data, 0, 2048)()))
    restored = restore_checkpoint(path, tr2.state)
    assert int(restored.step) == int(tr.state.step)
    flat1 = np.concatenate([np.ravel(x) for x in
                            __import__("jax").tree_util.tree_leaves(tr.state.params)])
    flat2 = np.concatenate([np.ravel(x) for x in
                            __import__("jax").tree_util.tree_leaves(restored.params)])
    np.testing.assert_allclose(flat1, flat2, rtol=1e-6)


def test_ltr_objective_trains(data):
    """BPR over in-batch mined negatives on an MF model (BASELINE config 5)."""
    inputs = Inputs(schema={
        "emb_inputs": MultiIndicesEmbedding(
            embed_size=8, field_sizes=FIELD_SIZES[:2], fields=CAT[:2]
        ),
    })
    p = (Pipeline().set_objective("ltr").set_inputs(inputs)
         .set_model("MF")
         .set_criterion("BayesianPersonalizedRankingLoss")
         .set_miner("UniformBatchMiner", num_negs=2)
         .set_miner_target_field("cat_1")
         .set_optimizer("Adam", lr=0.01).set_target_fields("label"))
    tr = Trainer(p, log_every=10_000)
    m = tr.fit(loader(data, 0, 4096), max_epochs=2)
    assert np.isfinite(m["train_loss"])


def _interaction_data(n=12000, users=60, items=40, seed=0):
    """User→item interactions with real structure: each user prefers a small
    cluster of items, so a ranking model can beat chance (unlike independent
    Zipf draws, where mined negatives share the positives' marginal and NDCG
    is information-free)."""
    rng = np.random.default_rng(seed)
    u = rng.integers(0, users, n).astype(np.int32)
    preferred = (u * 3) % items
    noise = rng.integers(0, items, n).astype(np.int32)
    it = np.where(rng.uniform(size=n) < 0.8, (preferred + rng.integers(0, 3, n)) % items, noise)
    return {"cat_0": u, "cat_1": it.astype(np.int32),
            "label": np.ones(n, np.float32)}


def _ltr_pipeline(criterion, users=60, items=40):
    inputs = Inputs(schema={
        "emb_inputs": MultiIndicesEmbedding(
            embed_size=8, field_sizes=(users, items), fields=("cat_0", "cat_1")
        ),
    })
    return (Pipeline().set_objective("ltr").set_inputs(inputs)
            .set_model("MF")
            .set_criterion(criterion)
            .set_miner("UniformBatchMiner", num_negs=4)
            .set_miner_target_field("cat_1")
            .set_optimizer("Adam", lr=0.02).set_target_fields("label"))


def test_ltr_groupwise_listnet_trains():
    """The groupwise (ListNet) path through the train step: per-anchor
    [pos|negs] lists with one-hot relevance (reference
    groupwise_ranking_loss.py:20-59)."""
    d = _interaction_data()
    tr = Trainer(_ltr_pipeline("ListnetLoss"), log_every=10_000)
    m1 = tr.fit(loader(d, 0, 4096), max_epochs=1)
    m2 = tr.fit(loader(d, 0, 4096), max_epochs=2)
    assert np.isfinite(m1["train_loss"]) and np.isfinite(m2["train_loss"])
    assert m2["train_loss"] < m1["train_loss"]


def test_ltr_ndcg_improves_with_training():
    """Ranking eval: mean NDCG@k over mined candidate lists must IMPROVE
    as the model learns the planted user→item structure."""
    d = _interaction_data()
    tr = Trainer(_ltr_pipeline("BayesianPersonalizedRankingLoss"),
                 log_every=10_000, ndcg_k=5)
    tr._build_steps()
    tr.init_state(next(loader(d, 0, 2048)()))
    before = tr.evaluate(loader(d, 10240, 12000))["val_ndcg@5"]
    tr.fit(loader(d, 0, 10240), max_epochs=4)
    after = tr.evaluate(loader(d, 10240, 12000))["val_ndcg@5"]
    assert after > before + 0.05, (before, after)


def test_pipeline_build_from_config(data):
    p = Pipeline.build(
        objective="ctr",
        inputs_config=make_inputs(),
        model_config={"method": "DeepFM", "deep_layer_sizes": [16, 16]},
        criterion_config={"method": "BCEWithLogitsLoss"},
        optimizer_config={"method": "AdamW", "lr": 1e-3},
        regularizer_config={"weight_decay": 0.001},
        target_fields="label",
    )
    tr = Trainer(p, log_every=10_000)
    m = tr.fit(loader(data, 0, 2048), max_epochs=1)
    assert np.isfinite(m["train_loss"])
    assert "DeepF" in p.summary()


def test_pipeline_incomplete_raises():
    with pytest.raises(ValueError):
        Pipeline().finalize()
    with pytest.raises(ValueError):
        (Pipeline().set_objective("ltr").set_inputs(make_inputs())
         .set_model("MF").finalize())  # missing miner_target_field


def test_predict(data):
    p = (Pipeline().set_objective("ctr").set_inputs(make_inputs())
         .set_model("FM").set_optimizer("Adam", lr=0.01).set_target_fields("label"))
    tr = Trainer(p, log_every=10_000)
    tr.fit(loader(data, 0, 2048), max_epochs=1)
    batch = next(loader(data, 0, 512)())
    preds = tr.predict(batch)
    assert preds.shape == (512, 1)
    assert float(preds.min()) >= 0.0 and float(preds.max()) <= 1.0


def test_trainer_steps_per_execution(np_rng):
    """Scanned multi-step dispatch trains identically-shaped state and makes
    progress; remainder batches (< steps_per_execution) are handled."""
    from torecsys_tpu.inputs import Inputs, MultiIndicesEmbedding, ValueInput
    from torecsys_tpu.train import Pipeline, Trainer

    def make_batches(n):
        out = []
        for _ in range(n):
            out.append({
                "c": np_rng.integers(0, 10, size=(16,)).astype(np.int32),
                "d": np_rng.normal(size=(16,)).astype(np.float32),
                "label": (np_rng.uniform(size=(16,)) < 0.5).astype(np.float32),
            })
        return out

    inputs = Inputs(schema={
        "feat_inputs": ValueInput(fields=("d",)),
        "emb_inputs": MultiIndicesEmbedding(
            embed_size=4, field_sizes=(10,), fields=("c",)
        ),
    })
    pipeline = (
        Pipeline()
        .set_objective("ctr")
        .set_inputs(inputs)
        .set_model("FM")
        .set_criterion("BCEWithLogitsLoss")
        .set_optimizer("Adam", lr=1e-2)
        .set_target_fields("label")
    )
    batches = make_batches(7)  # 7 = 2 full scans of 3 + remainder of 1
    trainer = Trainer(pipeline, log_every=1000, steps_per_execution=3)
    metrics = trainer.fit(lambda: iter(batches), max_epochs=2)
    assert np.isfinite(metrics["train_loss"])
    assert int(trainer.state.step) == 14  # all 7 batches, both epochs


def test_bf16_compute_dtype_trains_to_parity(data):
    """compute_dtype='bfloat16': tower matmuls in bf16, params stay f32,
    Sequential outputs f32, and held-out AUC matches the f32 run within a
    small margin (the mixed-precision recipe is convergence-safe)."""
    import jax

    aucs = {}
    for dtype in (None, "bfloat16"):
        p = (Pipeline().set_objective("ctr").set_inputs(make_inputs())
             .set_model("DeepFM", deep_layer_sizes=(32, 32))
             .set_criterion("BCEWithLogitsLoss")
             .set_optimizer("Adam", lr=0.01)
             .set_compute_dtype(dtype)
             .set_target_fields("label"))
        tr = Trainer(p, log_every=10_000, seed=0)
        m = tr.fit(loader(data, 0, 18000), val_loader=loader(data, 18000, 20000),
                   max_epochs=2)
        aucs[dtype] = m["val_auc"]
        for leaf in jax.tree_util.tree_leaves(tr.state.params):
            assert leaf.dtype == np.float32  # params never bf16
        preds = tr.predict({k: v[:64] for k, v in data.items()})
        assert np.asarray(preds).dtype == np.float32  # f32 loss contract
    assert aucs["bfloat16"] > 0.6, aucs
    assert abs(aucs["bfloat16"] - aucs[None]) < 0.02, aucs


def test_bf16_table_storage_trains_dense(data):
    """set_table_dtype('bfloat16'): table params STORE bf16 (halved HBM
    traffic/memory on the bandwidth-bound dense path — SPEED.md), lookups
    cast to f32 at the module boundary, training converges, and the
    pipeline stays on the dense path even in sparse auto mode."""
    import jax.numpy as jnp

    from torecsys_tpu.train.sparse import is_hybrid_opt_state

    p = (Pipeline().set_objective("ctr").set_inputs(make_inputs())
         .set_model("FM").set_criterion("BCEWithLogitsLoss")
         .set_optimizer("Adam", lr=0.01).set_target_fields("label")
         .set_table_dtype("bfloat16"))
    tr = Trainer(p, log_every=10_000)
    m = tr.fit(loader(data, 0, 18000), val_loader=loader(data, 18000, 20000),
               max_epochs=3)
    table = tr.state.params["inputs"]["schema_emb_inputs"]["embedding"]
    assert table.dtype == jnp.bfloat16
    assert not is_hybrid_opt_state(tr.state.opt_state)
    assert m["val_auc"] > 0.6, m


def test_bf16_table_storage_rejects_sparse():
    p = (Pipeline().set_objective("ctr").set_inputs(make_inputs())
         .set_model("FM").set_optimizer("Adam", lr=0.01)
         .set_target_fields("label")
         .set_sparse_embeddings(True).set_table_dtype("bfloat16"))
    with pytest.raises(ValueError, match="dense embedding path"):
        p.finalize()
