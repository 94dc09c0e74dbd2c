import time, numpy as np, jax, jax.numpy as jnp

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

V, E, M = 532800, 16, 106496
table = jax.device_put(rng.normal(size=(V, E)).astype(np.float32))
ids = jax.device_put(np.minimum(rng.zipf(1.2, size=(M,)) - 1, V-1).astype(np.int32))
g = jax.device_put(rng.normal(size=(M, E)).astype(np.float32))

base = scanbench(lambda c: c + 1.0, (), label="empty loop")

def with_dep(f):
    # mixes carry into ids (prevents hoisting) and sums output (prevents DCE)
    def op(c, *consts):
        out = f(c, *consts)
        return c * 0.5 + jnp.sum(out[0]) * 1e-9
    return op

scanbench(with_dep(lambda c, t, i: jnp.take(t, (i + c.astype(jnp.int32)) % V, axis=0)),
          (table, ids), label=f"gather M={M}", base=base)
ids24 = jax.device_put(np.minimum(rng.zipf(1.2, size=(24576,)) - 1, V-1).astype(np.int32))
scanbench(with_dep(lambda c, t, i: jnp.take(t, (i + c.astype(jnp.int32)) % V, axis=0)),
          (table, ids24), label="gather M=24576", base=base)
scanbench(with_dep(lambda c, i, g: jnp.zeros((V, E), jnp.float32).at[(i + c.astype(jnp.int32)) % V].add(g)),
          (ids, g), label=f"scatter M={M}", base=base)

P, Vp = 8, V // 8
tP = jax.device_put(rng.normal(size=(Vp, P*E)).astype(np.float32))
def pg(c, tP, i):
    i = (i + c.astype(jnp.int32)) % V
    wide = jnp.take(tP, i // P, axis=0).reshape(M, P, E)
    return jnp.einsum('mp,mpe->me', jax.nn.one_hot(i % P, P, dtype=wide.dtype), wide)
scanbench(with_dep(pg), (tP, ids), label="packed gather P=8", base=base)
def ps(c, i, g):
    i = (i + c.astype(jnp.int32)) % V
    wide = jnp.einsum('mp,me->mpe', jax.nn.one_hot(i % P, P, dtype=g.dtype), g).reshape(M, P*E)
    return jnp.zeros((Vp, P*E), jnp.float32).at[i // P].add(wide)
scanbench(with_dep(ps), (ids, g), label="packed scatter P=8", base=base)

Bs, Vs = 4096, 5000
ts = jax.device_put(rng.normal(size=(Vs, E)).astype(np.float32))
ids_s = jax.device_put(rng.integers(0, Vs, size=(Bs,)).astype(np.int32))
def og(c, ts, i):
    i = (i + c.astype(jnp.int32)) % Vs
    oh = jax.nn.one_hot(i, Vs, dtype=jnp.bfloat16)
    return jnp.dot(oh, ts.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
scanbench(with_dep(og), (ts, ids_s), label="onehot gather B=4096 V=5000", base=base)
scanbench(with_dep(lambda c, t, i: jnp.take(t, (i + c.astype(jnp.int32)) % Vs, axis=0)),
          (ts, ids_s), label="take gather B=4096 V=5000", base=base)
