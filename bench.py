"""Benchmark: DeepFM CTR training throughput (examples/sec/chip).

Prints ONE JSON line:
    {"metric": "deepfm_examples_per_sec_per_chip", "value": N,
     "unit": "examples/sec", "vs_baseline": N}

Protocol (BASELINE.md): the reference publishes no numbers, so the baseline
is self-generated as the *reference's semantics on this exact workload*: the
same DeepFM trained with a dense optimizer over the full embedding table
(``torch.optim.Adam`` over ``nn.Embedding.weight`` is what
``/root/reference/torecsys/trainer/torecsys_pipeline.py:562`` does).
``BENCH_BASELINE.json`` records that dense-path number (re-measured whenever
the workload fingerprint changes); ``vs_baseline`` is therefore the
end-to-end win of the TPU-native sparse embedding path on identical work.

The workload is the Criteo-scale synthetic CTR task: 26 categorical fields
with a long-tailed size split totalling ~33M fused rows (real Criteo hashing
scale — the r2 bench's 0.5M-row vocab was ~70x too small for the sparse
path's advantage to be visible), 13 dense features, DeepFM with a
(400, 400, 400) tower, batch 4096, full train steps (fwd + loss + grad +
optimizer update).  ``Pipeline`` auto-selects the touched-rows sparse path
at this scale (train/trainer.py SPARSE_AUTO_MIN_ELEMENTS).

Measurement rules (learned the hard way on the tunneled TPU runtime):
  * a device_get is issued BEFORE timing — on this runtime the first
    device->host transfer flips dispatch from fire-and-forget (which makes
    un-drained timings meaningless) to synchronous acknowledgment;
  * batches are device-resident and STACKED, and the step loop runs inside a
    jitted ``lax.scan`` (``steps_per_execution``), so the measurement is
    device compute, not per-dispatch tunnel latency;
  * the clock stops only after a device->host fetch of the final loss — the
    full pipeline is drained.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

BATCH = 4096
SCAN_STEPS = 8       # micro-batches per device dispatch (lax.scan)
REPS = 12            # timed dispatches -> REPS*SCAN_STEPS steps total
WARMUP_REPS = 3
EMBED = 16
# Criteo-scale: 26 categorical fields, long-tailed, ~33.2M fused rows
FIELD_SIZES = tuple(
    int(v) for v in (
        [10_000_000, 5_000_000, 4_000_000, 3_000_000, 2_000_000, 2_000_000]
        + [1_000_000] * 6 + [200_000] * 4 + [20_000] * 4 + [1_000] * 4
        + [100] * 4
    )
)
NUM_DENSE = 13


def make_batches(seed: int = 0, n_batches: int = SCAN_STEPS):
    rng = np.random.default_rng(seed)
    batches = []
    for _ in range(n_batches):
        b = {}
        for i, v in enumerate(FIELD_SIZES):
            raw = rng.zipf(1.2, size=BATCH)
            b[f"cat_{i}"] = np.minimum(raw - 1, v - 1).astype(np.int32)
        for j in range(NUM_DENSE):
            b[f"dense_{j}"] = rng.normal(size=BATCH).astype(np.float32)
        b["label"] = (rng.uniform(size=BATCH) < 0.5).astype(np.float32)
        batches.append(b)
    return batches


def _fingerprint() -> str:
    import hashlib

    key = repr((FIELD_SIZES, NUM_DENSE, BATCH, EMBED, (400, 400, 400)))
    return hashlib.sha256(key.encode()).hexdigest()[:16]


def measure(sparse_embeddings):
    """examples/sec of the full DeepFM train step on the bench workload.

    ``sparse_embeddings=None`` = Pipeline auto (picks the touched-rows path
    at this vocab scale); ``False`` = dense full-table optimizer — the
    reference's semantics (``torch.optim.Adam`` over ``nn.Embedding``,
    ``torecsys_pipeline.py:562``), which is the recorded baseline.
    """
    import jax
    import jax.numpy as jnp

    from torecsys_tpu.inputs import Inputs, MultiIndicesEmbedding, ValueInput
    from torecsys_tpu.train import Pipeline, Trainer
    from torecsys_tpu.train.steps import make_train_scan, make_train_step

    cat = tuple(f"cat_{i}" for i in range(len(FIELD_SIZES)))
    dense = tuple(f"dense_{j}" for j in range(NUM_DENSE))
    inputs = Inputs(schema={
        "feat_inputs": ValueInput(fields=dense),
        "emb_inputs": MultiIndicesEmbedding(
            embed_size=EMBED, field_sizes=FIELD_SIZES, fields=cat
        ),
    })
    pipeline = (
        Pipeline()
        .set_objective("ctr")
        .set_inputs(inputs)
        .set_model("DeepFM", deep_layer_sizes=(400, 400, 400))
        .set_criterion("BCEWithLogitsLoss")
        .set_optimizer("Adam", lr=1e-3)
        .set_sparse_embeddings(sparse_embeddings)
        .set_target_fields("label")
    )
    trainer = Trainer(pipeline, log_every=1_000_000)
    batches = make_batches()

    state = trainer.init_state(batches[0])
    with trainer._trace_contexts():
        scan_fn = jax.jit(
            make_train_scan(make_train_step(trainer.pipeline)), donate_argnums=(0,)
        )

        # stack the micro-batches on device: dict of (K, B, ...) arrays
        stacked = {
            k: jax.device_put(np.stack([b[k] for b in batches])) for k in batches[0]
        }
        jax.block_until_ready(stacked)
        # force synchronous-acknowledgment dispatch mode BEFORE timing
        jax.device_get(jnp.zeros(()))

        for _ in range(WARMUP_REPS):  # compile + stabilize
            state, logs = scan_fn(state, stacked)
        jax.block_until_ready(state.params)

        t0 = time.perf_counter()
        for _ in range(REPS):
            state, logs = scan_fn(state, stacked)
        final_loss = float(np.asarray(logs["loss"]))  # drains the pipeline
        elapsed = time.perf_counter() - t0
    assert np.isfinite(final_loss)
    # free the multi-GB table/slot state before the next measurement
    del state, stacked
    n_steps = REPS * SCAN_STEPS
    return BATCH * n_steps / elapsed


def main():
    baseline_path = os.path.join(os.path.dirname(__file__), "BENCH_BASELINE.json")
    fp = _fingerprint()
    baseline = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            rec = json.load(f)
        if rec.get("fingerprint") == fp:
            baseline = rec["value"]
    if baseline is None:
        # (re-)measure the reference-semantics dense path on THIS workload
        baseline = measure(sparse_embeddings=False)
        with open(baseline_path, "w") as f:
            json.dump({
                "metric": "deepfm_examples_per_sec_per_chip",
                "value": baseline,
                "fingerprint": fp,
                "semantics": "dense full-table optimizer (reference parity: "
                             "torch.optim.Adam over nn.Embedding.weight)",
            }, f)

    examples_per_sec = measure(sparse_embeddings=None)  # auto → sparse here
    print(json.dumps({
        "metric": "deepfm_examples_per_sec_per_chip",
        "value": round(examples_per_sec, 1),
        "unit": "examples/sec",
        "vs_baseline": round(examples_per_sec / baseline, 4),
    }))


if __name__ == "__main__":
    main()
