"""Learning-to-rank with in-batch negative mining (BPR on matrix factorization).

Shows the ``ltr`` objective: the miner splits each batch into positive /
sampled-negative views INSIDE the jitted step (no host round trip), the
model scores both, and a pairwise loss (BPR here; Hinge / AdaptiveHinge /
Triplet / groupwise ListNet work the same way) drives the update.
Evaluation is streaming NDCG@k over mined candidate lists.

Run:  python examples/ltr_with_miner.py

Reference analogue: ``LearningToRankWrapper`` + the pairwise losses
(/root/reference/torecsys/models/ltr/, losses/ltr/pairwise_ranking_loss.py).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

if os.environ.get("TORECSYS_TPU_EXAMPLE_CPU"):  # CI rig has no TPU
    import jax

    jax.config.update("jax_platforms", "cpu")

from torecsys_tpu.inputs import Inputs, MultiIndicesEmbedding
from torecsys_tpu.train import Pipeline, Trainer

USERS, ITEMS = 200, 120


def make_interactions(n=20_000, seed=0):
    """Implicit feedback with planted structure: user u prefers items near
    (u * ITEMS / USERS), so a working ranker beats random NDCG easily."""
    rng = np.random.default_rng(seed)
    users = rng.integers(0, USERS, n)
    items = (users * ITEMS // USERS
             + rng.integers(-8, 9, n)) % ITEMS
    return {
        "user": users.astype(np.int32),
        "item": items.astype(np.int32),
        "label": np.ones(n, np.float32),
    }


def main(epochs: int = 4, batch_size: int = 512) -> float:
    data = make_interactions()
    n = len(data["label"])
    split = int(n * 0.85)

    inputs = Inputs(schema={
        "emb_inputs": MultiIndicesEmbedding(
            embed_size=8, field_sizes=(USERS, ITEMS),
            fields=("user", "item")),
    })
    pipeline = (
        Pipeline()
        .set_objective("ltr")
        .set_inputs(inputs)
        .set_model("MF")
        .set_criterion("BayesianPersonalizedRankingLoss")
        .set_miner("UniformBatchMiner", num_negs=4)   # in-jit negative sampling
        .set_miner_target_field("item")
        .set_optimizer("Adam", lr=0.02)
        .set_target_fields("label")
    )

    def loader(lo, hi):
        def gen():
            for s in range(lo, hi - batch_size + 1, batch_size):
                yield {k: v[s:s + batch_size] for k, v in data.items()}
        return gen

    trainer = Trainer(pipeline, log_every=10_000, ndcg_k=10)
    trainer.fit(loader(0, split), max_epochs=epochs)
    ndcg = trainer.evaluate(loader(split, n))["val_ndcg@10"]
    print(f"NDCG@10 after {epochs} epochs: {ndcg:.4f}")
    return ndcg


if __name__ == "__main__":
    main()
