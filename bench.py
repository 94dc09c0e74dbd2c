"""Benchmark: DeepFM CTR training throughput (examples/sec/chip).

Prints ONE JSON line:
    {"metric": "deepfm_examples_per_sec_per_chip", "value": N,
     "unit": "examples/sec", "vs_baseline": N}

Protocol (BASELINE.md): the reference publishes no numbers, so baselines are
self-generated.  ``vs_baseline`` compares against the first recorded value in
``BENCH_BASELINE.json`` (written on first run) so later rounds show relative
progress.

The workload is the Criteo-shaped synthetic CTR task: 26 categorical fields
(Zipf ids, ~0.5M fused rows) + 13 dense, DeepFM with a (400, 400, 400) tower,
batch 4096, full train steps (fwd + loss + grad + Adam update).

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
# Criteo-shaped: 26 categorical fields with a long-tailed size distribution
FIELD_SIZES = tuple(
    int(v) for v in (
        [200_000, 100_000, 50_000, 20_000, 10_000, 10_000] + [5_000] * 6
        + [1_000] * 6 + [100] * 8
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


def main():
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
        .set_target_fields("label")
    )
    trainer = Trainer(pipeline, log_every=1_000_000)
    batches = make_batches()

    state = trainer.init_state(batches[0])
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

    n_steps = REPS * SCAN_STEPS
    examples_per_sec = BATCH * n_steps / elapsed

    baseline_path = os.path.join(os.path.dirname(__file__), "BENCH_BASELINE.json")
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            baseline = json.load(f)["value"]
    else:
        baseline = examples_per_sec
        with open(baseline_path, "w") as f:
            json.dump({"metric": "deepfm_examples_per_sec_per_chip",
                       "value": examples_per_sec}, f)

    print(json.dumps({
        "metric": "deepfm_examples_per_sec_per_chip",
        "value": round(examples_per_sec, 1),
        "unit": "examples/sec",
        "vs_baseline": round(examples_per_sec / baseline, 4),
    }))


if __name__ == "__main__":
    main()
