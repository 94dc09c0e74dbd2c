import time, numpy as np, jax, jax.numpy as jnp

V, E = 532_800, 16
rng = np.random.default_rng(0)
table = jax.device_put(rng.normal(size=(V, E)).astype(np.float32))
tableT = jax.device_put(np.ascontiguousarray(np.asarray(table).T))
jax.device_get(jnp.zeros(()))

def timeit(f, *a, n=20, label=""):
    r = f(*a); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n): r = f(*a)
    jax.block_until_ready(r)
    print(f"{label}: {(time.perf_counter()-t0)/n*1000:.3f} ms", flush=True)

take = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
for M in (4096, 26624, 106496, 425984):
    ids = jax.device_put(np.minimum(rng.zipf(1.2, size=(M,)) - 1, V-1).astype(np.int32))
    timeit(take, table, ids, label=f"gather M={M}")

ids = jax.device_put(np.minimum(rng.zipf(1.2, size=(106496,)) - 1, V-1).astype(np.int32))
timeit(jax.jit(lambda t, i: jnp.take(t, i, axis=1)), tableT, ids, label="gather transposed (E,V) axis=1")

# scatter scaling
for M in (4096, 26624, 106496):
    idsM = jax.device_put(np.minimum(rng.zipf(1.2, size=(M,)) - 1, V-1).astype(np.int32))
    gM = jax.device_put(rng.normal(size=(M, E)).astype(np.float32))
    timeit(jax.jit(lambda i, g: jnp.zeros((V, E), jnp.float32).at[i].add(g)), idsM, gM, label=f"scatter M={M}")

# scatter into small table (same M)
for VV in (4096, 65536):
    idsV = jax.device_put((np.asarray(ids) % VV).astype(np.int32))
    gM = jax.device_put(rng.normal(size=(106496, E)).astype(np.float32))
    timeit(jax.jit(lambda i, g: jnp.zeros((VV, E), jnp.float32).at[i].add(g)), idsV, gM, label=f"scatter V={VV} M=106496")

# wider rows: does cost scale with bytes or rows?
tableW = jax.device_put(rng.normal(size=(V//8, 128)).astype(np.float32))
idsW = jax.device_put((np.asarray(ids) // 8).astype(np.int32))
timeit(take, tableW, idsW, label="gather E=128 M=106496")
gW = jax.device_put(rng.normal(size=(106496, 128)).astype(np.float32))
timeit(jax.jit(lambda i, g: jnp.zeros((V//8, 128), jnp.float32).at[i].add(g)), idsW, gW, label="scatter E=128 M=106496")
