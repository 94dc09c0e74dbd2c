import time, numpy as np, jax, jax.numpy as jnp
import bench
from torecsys_tpu.inputs import Inputs, MultiIndicesEmbedding, ValueInput
from torecsys_tpu.train import Pipeline, Trainer
from torecsys_tpu.train.steps import make_train_step, make_eval_step, make_eval_metrics_step
from torecsys_tpu.metrics import StreamingAUC, StreamingLogLoss

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

def run(state, label, n=30):
    for i in range(5):
        state, _ = fn(state, db)
    jax.block_until_ready(state.params)
    t0 = time.perf_counter()
    for i in range(n):
        state, _ = fn(state, db)
    jax.block_until_ready(state.params)
    print(label, "ms/step:", (time.perf_counter()-t0)/n*1000, flush=True)
    return state

state = run(state, "baseline")
auc = StreamingAUC(); ll = StreamingLogLoss()
state = run(state, "after metric objs")
es = jax.jit(make_eval_step(trainer.pipeline))
state = run(state, "after eval jit")
ms = jax.jit(make_eval_metrics_step(trainer.pipeline, auc, ll))
state = run(state, "after metrics jit")

ac = jax.jit(auc.compute); lc = jax.jit(ll.compute)
state = run(state, "after compute jits")
jax.device_get(jnp.zeros(()))
state = run(state, "after device_get")
trainer._build_steps()
state = run(state, "after full _build_steps (same fn)")
state = run(state, "trainer fn", )
for i in range(5):
    state, _ = trainer._train_step_fn(state, db)
jax.block_until_ready(state.params)
import time as _t
t0 = _t.perf_counter()
for i in range(30):
    state, _ = trainer._train_step_fn(state, db)
jax.block_until_ready(state.params)
print("trainer._train_step_fn ms/step:", (_t.perf_counter()-t0)/30*1000, flush=True)
