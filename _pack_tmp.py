import time, numpy as np, jax, jax.numpy as jnp

E, M = 16, 106496
rng = np.random.default_rng(0)
jax.device_get(jnp.zeros(()))

def timeit(f, *a, n=20, label=""):
    r = f(*a); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n): r = f(*a)
    jax.block_until_ready(r)
    dt = (time.perf_counter()-t0)/n*1000
    print(f"{label}: {dt:.3f} ms", flush=True)
    return dt

take = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
for V in (8192, 65536, 532800, 2_000_000):
    t = jax.device_put(rng.normal(size=(V, E)).astype(np.float32))
    ids = jax.device_put(np.minimum(rng.zipf(1.2, size=(M,)) - 1, V-1).astype(np.int32))
    timeit(take, t, ids, label=f"gather V={V}")

V = 532800
raw = np.minimum(rng.zipf(1.2, size=(M,)) - 1, V-1).astype(np.int32)
ids = jax.device_put(raw)
g = jax.device_put(rng.normal(size=(M, E)).astype(np.float32))

for P in (8, 16, 32):
    Vp = V // P
    tP = jax.device_put(rng.normal(size=(Vp, P*E)).astype(np.float32))
    @jax.jit
    def packed_gather(tP, ids, P=P, Vp=Vp):
        hi = ids // P; lo = ids % P
        wide = jnp.take(tP, hi, axis=0)            # (M, P*E)
        wide = wide.reshape(M, P, E)
        oh = jax.nn.one_hot(lo, P, dtype=wide.dtype)  # (M, P)
        return jnp.einsum('mp,mpe->me', oh, wide)
    timeit(packed_gather, tP, ids, label=f"packed gather P={P}")

    @jax.jit
    def packed_scatter(ids, g, P=P, Vp=Vp):
        hi = ids // P; lo = ids % P
        oh = jax.nn.one_hot(lo, P, dtype=g.dtype)     # (M, P)
        wide = jnp.einsum('mp,me->mpe', oh, g).reshape(M, P*E)
        return jnp.zeros((Vp, P*E), jnp.float32).at[hi].add(wide)
    timeit(packed_scatter, ids, g, label=f"packed scatter P={P}")

# correctness check P=8
P=8; Vp=V//P
tP_np = rng.normal(size=(Vp, P*E)).astype(np.float32)
tP = jax.device_put(tP_np)
hi = raw // P; lo = raw % P
want = tP_np.reshape(Vp, P, E)[hi, lo]
got = np.asarray(jax.jit(lambda tP, ids: jnp.einsum('mp,mpe->me', jax.nn.one_hot(ids%P, P, dtype=jnp.float32), jnp.take(tP, ids//P, axis=0).reshape(M,P,E)))(tP, ids))
print("packed gather correct:", np.allclose(want, got))
