"""Multi-chip embedding-table sharding on a virtual 8-device mesh.

Demonstrates the ``('data', 'table')`` mesh: the fused embedding table is
row-sharded over the ``table`` axis, batches are split over ``data``, and
the lookup routes through the sharded collective path — ``psum``
(contribute-and-reduce), ``alltoall`` (unique-id exchange with a capacity
factor), or ``auto`` (the calibrated comm-byte model picks per lookup; see
COMM_VOLUME.json).  The SAME Trainer/step code runs 1-chip or N-chip.

This example forces 8 *virtual CPU devices* so it runs anywhere — on real
hardware drop the XLA_FLAGS line and build the mesh over ``jax.devices()``.

Run:  python examples/sharded_lookup.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from torecsys_tpu.data import make_synthetic_ctr  # noqa: E402
from torecsys_tpu.inputs import (  # noqa: E402
    Inputs,
    MultiIndicesEmbedding,
    ValueInput,
)
from torecsys_tpu.parallel import make_mesh  # noqa: E402
from torecsys_tpu.train import Pipeline, Trainer  # noqa: E402

FIELD_SIZES = (5000, 3000, 1000)


def main(epochs: int = 2, batch_size: int = 512) -> float:
    data = make_synthetic_ctr(num_rows=16_384, field_sizes=FIELD_SIZES,
                              num_dense=2)
    inputs = Inputs(schema={
        "feat_inputs": ValueInput(fields=("dense_0", "dense_1")),
        "emb_inputs": MultiIndicesEmbedding(
            embed_size=16, field_sizes=FIELD_SIZES,
            fields=("cat_0", "cat_1", "cat_2")),
    })
    pipeline = (
        Pipeline()
        .set_objective("ctr")
        .set_inputs(inputs)
        .set_model("DeepFM", deep_layer_sizes=(32, 32))
        .set_criterion("BCEWithLogitsLoss")
        .set_optimizer("Adam", lr=0.01)
        .set_target_fields("label")
    )

    mesh = make_mesh(data=2, table=4)  # 2-way data x 4-way table sharding
    trainer = Trainer(
        pipeline,
        mesh=mesh,
        log_every=10_000,
        lookup_options={
            "min_rows_to_shard": 0,     # shard even this demo-sized table
            "strategy": "auto",         # psum vs alltoall from the byte model
            "capacity_factor": 2.0,
        },
    )

    def loader(lo, hi):
        def gen():
            for s in range(lo, hi - batch_size + 1, batch_size):
                yield {k: v[s:s + batch_size] for k, v in data.items()}
        return gen

    metrics = trainer.fit(loader(0, 14_336), val_loader=loader(14_336, 16_384),
                          max_epochs=epochs)

    table = trainer.state.params["inputs"]["schema_emb_inputs"]["embedding"]
    print(f"mesh: {dict(mesh.shape)}")
    print(f"table sharding: {table.sharding}")
    print(f"val AUC {metrics['val_auc']:.4f}")
    return metrics["val_auc"]


if __name__ == "__main__":
    main()
