import time, numpy as np, jax, jax.numpy as jnp, optax

rng = np.random.default_rng(0)
jax.device_get(jnp.zeros(()))

def scanbench(op, consts, n=100, label="", base=0.0):
    @jax.jit
    def run(c0, consts):
        def body(c, _):
            return op(c, *consts), ()
        c, _ = jax.lax.scan(body, c0, None, length=n)
        return c
    c0 = jnp.float32(0)
    r = run(c0, consts); jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = run(c0, consts); jax.block_until_ready(r)
    dt = (time.perf_counter()-t0)/n*1000
    print(f"{label}: {dt - base:.4f} ms  (raw {dt:.4f})", flush=True)
    return dt

base = scanbench(lambda c: c + 1.0, (), label="empty")

V, E, B, N = 532800, 16, 4096, 26
P = 8; Vp = V // P
M = B * N
tP = jax.device_put(rng.normal(size=(Vp, P*E)).astype(np.float32) * 0.01)
ids = jax.device_put(np.minimum(rng.zipf(1.2, size=(B, N)) - 1, V-1).astype(np.int32))
dense = jax.device_put(rng.normal(size=(B, 13)).astype(np.float32))
y = jax.device_put((rng.uniform(size=(B,)) < 0.5).astype(np.float32))

# dense tower params
def mk_mlp(key, sizes):
    ks = jax.random.split(key, len(sizes)-1)
    return [(jax.random.normal(k, (a, b)) * (2.0/a)**0.5, jnp.zeros((b,)))
            for k, (a, b) in zip(ks, zip(sizes[:-1], sizes[1:]))]
tower = mk_mlp(jax.random.PRNGKey(1), [N*E + 13, 400, 400, 400, 1])
params = {"table": tP, "tower": tower,
          "w1": jnp.zeros((V,)).reshape(Vp, P)}  # first-order weights packed too

tx = optax.adam(1e-3)
opt_state = jax.jit(tx.init)(params)

def fwd(p, ids, dense, y):
    hi = ids // P; lo = ids % P
    wide = jnp.take(p["table"], hi.reshape(-1), axis=0).reshape(M, P, E)
    oh = jax.nn.one_hot(lo.reshape(-1), P, dtype=wide.dtype)
    emb = jnp.einsum('mp,mpe->me', oh, wide).reshape(B, N, E)
    # FM second order
    s = jnp.sum(emb, axis=1); fm = 0.5 * jnp.sum(s*s - jnp.sum(emb*emb, axis=1), axis=-1)
    # first order
    w1 = jnp.einsum('mp,mp->m', jnp.take(p["w1"], hi.reshape(-1), axis=0), oh).reshape(B, N).sum(1)
    x = jnp.concatenate([emb.reshape(B, N*E), dense], axis=1)
    for i, (w, b) in enumerate(p["tower"]):
        x = x @ w + b
        if i < len(p["tower"]) - 1:
            x = jax.nn.relu(x)
    logits = x[:, 0] + fm + w1
    return jnp.mean(optax.sigmoid_binary_cross_entropy(logits, y))

def step_op(c, params, opt_state, ids, dense, y):
    i = (ids + c.astype(jnp.int32)) % V
    loss, grads = jax.value_and_grad(lambda p: fwd(p, i, dense, y))(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return (params, opt_state), loss

def full(c, ids, dense, y, params=params, opt_state=opt_state):
    (p2, o2), loss = step_op(c, params, opt_state, ids, dense, y)
    return c * 0.5 + loss * 1e-9 + jnp.sum(p2["table"][0]) * 1e-12

scanbench(full, (ids, dense, y), n=50, label="FULL packed step (no state carry!)", base=base)

# proper carried version
@jax.jit
def run_carried(params, opt_state, ids, dense, y):
    def body(carry, _):
        params, opt_state, c = carry
        i = (ids + c) % V
        loss, grads = jax.value_and_grad(lambda p: fwd(p, i, dense, y))(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state, c + 1), loss
    (params, opt_state, _), losses = jax.lax.scan(body, (params, opt_state, jnp.int32(0)), None, length=50)
    return losses[-1]

r = run_carried(params, opt_state, ids, dense, y); jax.block_until_ready(r)
t0 = time.perf_counter()
r = run_carried(params, opt_state, ids, dense, y); jax.block_until_ready(r)
print(f"FULL packed step carried: {(time.perf_counter()-t0)/50*1000:.4f} ms -> {B*50/((time.perf_counter()-t0)):.0f} ex/s", flush=True)

# optax adam alone honest
g = jax.tree.map(jnp.ones_like, params)
def adam_op(c, g, opt_state, params):
    g2 = jax.tree.map(lambda x: x * (1 + c * 1e-9), g)
    updates, o2 = tx.update(g2, opt_state, params)
    p2 = optax.apply_updates(params, updates)
    return c * 0.5 + jnp.sum(p2["table"][0]) * 1e-12
scanbench(adam_op, (g, opt_state, params), n=50, label="optax adam (8.7M params)", base=base)
