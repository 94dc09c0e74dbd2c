"""Train a Factorization Machine on the bundled Criteo sample.

The 60-second tour of the library surface: parse a real-format Criteo DAC
TSV with the native C++ parser, build the input schema (dense values + one
fused embedding table), configure a Pipeline, and fit with the Trainer.

Run:  python examples/train_fm_sample.py

Reference analogue: example/script + the getting-started notebook flow of
/root/reference (load_criteo → build inputs → TorecsysPipeline → fit).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

if os.environ.get("TORECSYS_TPU_EXAMPLE_CPU"):  # CI rig has no TPU
    import jax

    jax.config.update("jax_platforms", "cpu")

from torecsys_tpu.data.native import NUM_CATS, NUM_DENSE, parse_criteo_tsv
from torecsys_tpu.inputs import Inputs, MultiIndicesEmbedding, ValueInput
from torecsys_tpu.train import Pipeline, Trainer

SAMPLE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "torecsys_tpu", "data", "sample", "criteo_sample.tsv",
)


def main(batch_size: int = 256, epochs: int = 3) -> float:
    hash_sizes = (1000,) * NUM_CATS
    with open(SAMPLE, "rb") as f:
        parsed = parse_criteo_tsv(f.read(), hash_sizes)

    # column-dict convention: label / dense_j / cat_i
    data = {"label": parsed["label"]}
    for j in range(NUM_DENSE):
        data[f"dense_{j}"] = parsed["dense"][:, j]
    for i in range(NUM_CATS):
        data[f"cat_{i}"] = parsed["cats"][:, i]
    n = len(data["label"])
    split = int(n * 0.9)

    inputs = Inputs(schema={
        "feat_inputs": ValueInput(
            fields=tuple(f"dense_{j}" for j in range(NUM_DENSE))),
        "emb_inputs": MultiIndicesEmbedding(
            embed_size=8, field_sizes=hash_sizes,
            fields=tuple(f"cat_{i}" for i in range(NUM_CATS))),
    })
    pipeline = (
        Pipeline()
        .set_objective("ctr")
        .set_inputs(inputs)
        .set_model("FM")
        .set_criterion("BCEWithLogitsLoss")
        .set_optimizer("Adam", lr=0.01)
        .set_target_fields("label")
    )

    def loader(lo, hi):
        def gen():
            for s in range(lo, hi - batch_size + 1, batch_size):
                yield {k: v[s:s + batch_size] for k, v in data.items()}
        return gen

    trainer = Trainer(pipeline, log_every=1000)
    metrics = trainer.fit(loader(0, split), val_loader=loader(split, n),
                          max_epochs=epochs)
    print(f"val AUC {metrics['val_auc']:.4f}  "
          f"val logloss {metrics['val_logloss']:.4f}")
    return metrics["val_auc"]


if __name__ == "__main__":
    main()
