import time, numpy as np, jax, jax.numpy as jnp, optax
import bench
from torecsys_tpu.inputs import Inputs, MultiIndicesEmbedding, ValueInput
from torecsys_tpu.train import Pipeline, Trainer

cat = tuple(f"cat_{i}" for i in range(len(bench.FIELD_SIZES)))
dense = tuple(f"dense_{j}" for j in range(bench.NUM_DENSE))
inputs = Inputs(schema={
    "feat_inputs": ValueInput(fields=dense),
    "emb_inputs": MultiIndicesEmbedding(embed_size=bench.EMBED, field_sizes=bench.FIELD_SIZES, fields=cat),
})
pipeline = (Pipeline().set_objective("ctr").set_inputs(inputs)
    .set_model("DeepFM", deep_layer_sizes=(400, 400, 400))
    .set_criterion("BCEWithLogitsLoss").set_optimizer("Adam", lr=1e-3)
    .set_target_fields("label")).finalize()
seq = pipeline.sequential
tx = pipeline.optimizer
b = bench.make_batches(n_batches=1)[0]
feats = {k: jax.device_put(v) for k, v in b.items() if k != "label"}
y = jax.device_put(b["label"])
variables = jax.jit(lambda r, x: seq.init(r, x, training=False))({"params": jax.random.PRNGKey(0)}, feats)
params = jax.tree.map(jnp.asarray, variables["params"])
opt_state = jax.jit(tx.init)(params)
jax.device_get(jnp.zeros(()))  # honest mode

def loss_fn(p, feats, y):
    preds = seq.apply({"params": p}, feats, training=False)
    return jnp.mean(optax.sigmoid_binary_cross_entropy(preds, y))

def timeit(f, *a, n=20, label=""):
    r = f(*a); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*a)
    jax.block_until_ready(r)
    print(f"{label}: {(time.perf_counter()-t0)/n*1000:.3f} ms", flush=True)

timeit(jax.jit(loss_fn), params, feats, y, label="fwd only")
timeit(jax.jit(jax.grad(loss_fn)), params, feats, y, label="fwd+bwd")

# frozen embedding table: grads only for dense tower
def loss_frozen(p, feats, y):
    p = dict(p)
    p = jax.tree.map(jax.lax.stop_gradient, p) | p  # no-op placeholder
    return loss_fn(p, feats, y)
# proper: split params
flat = jax.tree_util.tree_flatten_with_path(params)[0]
emb_keys = [jax.tree_util.keystr(k) for k, v in flat if v.ndim == 2 and v.shape[0] > 100000]
print("emb param paths:", emb_keys)

def loss_split(dense_p, emb_p, feats, y):
    merged = jax.tree.map(lambda a: a, dense_p)
    return None

# simpler: grad only wrt dense params via partition
import flax.traverse_util as tu
fp = tu.flatten_dict(params)
emb_part = {k: v for k, v in fp.items() if v.ndim == 2 and v.shape[0] > 100000}
dense_part = {k: v for k, v in fp.items() if not (v.ndim == 2 and v.shape[0] > 100000)}
def loss2(dense_part, emb_part, feats, y):
    p = tu.unflatten_dict({**dense_part, **emb_part})
    preds = seq.apply({"params": p}, feats, training=False)
    return jnp.mean(optax.sigmoid_binary_cross_entropy(preds, y))
timeit(jax.jit(jax.grad(loss2, argnums=0)), dense_part, emb_part, feats, y, label="fwd+bwd dense-only (no emb scatter)")

# adam update alone
g = jax.tree.map(jnp.ones_like, params)
timeit(jax.jit(lambda g, o, p: tx.update(g, o, p)), g, opt_state, params, label="adam update")
