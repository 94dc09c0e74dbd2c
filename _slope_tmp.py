import time, sys, numpy as np, jax, jax.numpy as jnp
import bench
from torecsys_tpu.inputs import Inputs, MultiIndicesEmbedding, ValueInput
from torecsys_tpu.train import Pipeline, Trainer
from torecsys_tpu.train.steps import make_train_step

cat = tuple(f"cat_{i}" for i in range(len(bench.FIELD_SIZES)))
dense = tuple(f"dense_{j}" for j in range(bench.NUM_DENSE))
inputs = Inputs(schema={
    "feat_inputs": ValueInput(fields=dense),
    "emb_inputs": MultiIndicesEmbedding(embed_size=bench.EMBED, field_sizes=bench.FIELD_SIZES, fields=cat),
})
pipeline = (Pipeline().set_objective("ctr").set_inputs(inputs)
    .set_model("DeepFM", deep_layer_sizes=(400, 400, 400))
    .set_criterion("BCEWithLogitsLoss").set_optimizer("Adam", lr=1e-3)
    .set_target_fields("label"))
trainer = Trainer(pipeline, log_every=1_000_000)
batches = bench.make_batches(n_batches=1)
db = {k: jax.device_put(v) for k, v in batches[0].items()}
state = trainer.init_state(batches[0])
fn = jax.jit(make_train_step(trainer.pipeline), donate_argnums=(0,))
# warmup/compile only (no device_get!)
for i in range(5):
    state, logs = fn(state, db)
jax.block_until_ready(state.params)

def run_and_drain(n):
    global state
    t0 = time.perf_counter()
    for i in range(n):
        state, logs = fn(state, db)
    v = float(np.asarray(logs["loss"]))   # force full drain via D2H
    return time.perf_counter() - t0, v

n1 = int(sys.argv[1]); n2 = int(sys.argv[2])
t1, v1 = run_and_drain(n1)
t2, v2 = run_and_drain(n2)
print(f"N={n1}: {t1:.3f}s  N={n2}: {t2:.3f}s  slope ms/step: {(t2-t1)/(n2-n1)*1000:.3f}  loss {v1:.4f}->{v2:.4f}")
