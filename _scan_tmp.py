import time, numpy as np, jax, jax.numpy as jnp
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
batches = bench.make_batches(n_batches=8)
state = trainer.init_state(batches[0])
step = make_train_step(trainer.pipeline)

# stack 8 batches on device: dict of (8, B, ...) arrays
stacked = {k: jax.device_put(np.stack([b[k] for b in batches])) for k in batches[0]}

@jax.jit
def scan_epoch(state, stacked):
    def body(s, batch):
        s, logs = step(s, batch)
        return s, logs["loss"]
    return jax.lax.scan(body, state, stacked)

# pay channel setup & enter "honest" mode
jax.device_get(jnp.zeros(()))

state, losses = scan_epoch(state, stacked)  # compile
jax.block_until_ready(losses)
t0 = time.perf_counter()
REPS = 12
for _ in range(REPS):
    state, losses = scan_epoch(state, stacked)
l = float(np.asarray(losses)[-1])
dt = time.perf_counter() - t0
n_steps = REPS * 8
print(f"scan: {dt/n_steps*1000:.3f} ms/step  -> {4096*n_steps/dt:.0f} ex/s  loss {l:.4f}")

# per-call single step in degraded mode for comparison
fn = jax.jit(step, donate_argnums=(0,))
db = {k: jax.device_put(v) for k, v in batches[0].items()}
for i in range(3):
    state, logs = fn(state, db)
jax.block_until_ready(state.params)
t0 = time.perf_counter()
for i in range(30):
    state, logs = fn(state, db)
jax.block_until_ready(state.params)
print(f"single-dispatch: {(time.perf_counter()-t0)/30*1000:.3f} ms/step")
