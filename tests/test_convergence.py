"""In-tree model-math guards: interaction models must BEAT logistic
regression on planted-pairwise-interaction data (SURVEY.md §4 implication c).

This is the CI version of the parity harness's high-signal protocol
(`parity/run_parity.py`, ~15 min): same data recipe, smaller budget, no
torch twin — it catches silent interaction-math regressions (a broken FM
sum-of-squares or CIN contraction still *trains*, it just stops beating LR).
"""

import numpy as np
import pytest

from torecsys_tpu.data import make_synthetic_ctr
from torecsys_tpu.inputs import Inputs, MultiIndicesEmbedding
from torecsys_tpu.train import Pipeline, Trainer

FIELD_SIZES = (120, 80, 50, 30)
CAT = tuple(f"cat_{i}" for i in range(len(FIELD_SIZES)))
ROWS, TRAIN = 30_000, 26_000
EPOCHS = 5


@pytest.fixture(scope="module")
def data():
    # pure-categorical + boosted planted interactions: the regime where
    # interaction models separate cleanly from LR (see PARITY.md)
    return make_synthetic_ctr(
        num_rows=ROWS, field_sizes=FIELD_SIZES, num_dense=0, seed=3,
        pair_scale=2.0,
    )


def _fit(data, model, schema_kind, **kwargs):
    schema = {
        "feat_inputs": MultiIndicesEmbedding(
            embed_size=1, field_sizes=FIELD_SIZES, fields=CAT
        ),
    }
    if schema_kind == "feat_emb":
        schema["emb_inputs"] = MultiIndicesEmbedding(
            embed_size=8, field_sizes=FIELD_SIZES, fields=CAT
        )
    if schema_kind == "emb_only":
        schema = {"emb_inputs": MultiIndicesEmbedding(
            embed_size=8, field_sizes=FIELD_SIZES, fields=CAT)}
    crit = "BCELoss" if model == "LR" else "BCEWithLogitsLoss"
    p = Pipeline.build(
        objective="ctr",
        inputs_config=Inputs(schema=schema),
        model_config={"method": model, **kwargs},
        criterion_config={"method": crit},
        optimizer_config={"method": "Adam", "lr": 3e-3},
        target_fields="label",
    )
    tr = Trainer(p, log_every=10**9, seed=0)

    def loader(lo, hi):
        def gen():
            for s in range(lo, hi - 1024 + 1, 1024):
                yield {k: v[s:s + 1024] for k, v in data.items()}
        return gen

    m = tr.fit(loader(0, TRAIN), val_loader=loader(TRAIN, ROWS),
               max_epochs=EPOCHS)
    return m["val_auc"], m["val_logloss"]


@pytest.fixture(scope="module")
def lr_auc(data):
    auc, logloss = _fit(data, "LR", "feat_only")
    assert logloss < np.log(2), (auc, logloss)
    return auc


@pytest.mark.parametrize("model,schema,kwargs", [
    ("FM", "feat_emb", {"dropout_rate": 0.0}),
    ("DeepFM", "feat_emb", {"deep_layer_sizes": (32, 32)}),
    ("DCN", "emb_only", {"cross_num_layers": 2, "deep_output_size": 8,
                         "deep_layer_sizes": (32, 32)}),
    ("xDeepFM", "feat_emb", {"embed_size": 8, "num_fields": len(FIELD_SIZES),
                             "use_batchnorm": False,
                             "cin_layer_sizes": (8, 8),
                             "deep_layer_sizes": (32, 32)}),
])
def test_interaction_model_beats_lr(data, lr_auc, model, schema, kwargs):
    auc, logloss = _fit(data, model, schema, **kwargs)
    assert auc > lr_auc + 0.005, (model, auc, lr_auc)
    assert logloss < np.log(2), (model, logloss)
