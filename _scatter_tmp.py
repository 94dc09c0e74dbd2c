import time, numpy as np, jax, jax.numpy as jnp
from functools import partial

V, E, B, N = 532_800, 16, 4096, 26
rng = np.random.default_rng(0)
raw = np.minimum(rng.zipf(1.2, size=(B*N,)) - 1, V-1).astype(np.int32)
ids = jax.device_put(raw)
g = jax.device_put(rng.normal(size=(B*N, E)).astype(np.float32))
table = jax.device_put(rng.normal(size=(V, E)).astype(np.float32))
jax.device_get(jnp.zeros(()))  # honest mode

def timeit(f, *a, n=20, label=""):
    r = f(*a); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n): r = f(*a)
    jax.block_until_ready(r)
    print(f"{label}: {(time.perf_counter()-t0)/n*1000:.3f} ms", flush=True)

timeit(jax.jit(lambda t, i: jnp.take(t, i, axis=0)), table, ids, label="gather take")
timeit(jax.jit(lambda t, i: t[i]), table, ids, label="gather idx")

timeit(jax.jit(lambda i, g: jnp.zeros((V, E), jnp.float32).at[i].add(g)), ids, g, label="scatter-add plain")
timeit(jax.jit(lambda i, g: jnp.zeros((V, E), jnp.float32).at[i].add(g, indices_are_sorted=True)), jnp.sort(ids), g, label="scatter-add sorted-flag (presorted input)")

@jax.jit
def scatter_sorted(ids, g):
    si, sg = jax.lax.sort_key_val(ids, g)  # hmm sort_key_val needs same shape; use argsort
    return jnp.zeros((V, E), jnp.float32).at[si].add(sg, indices_are_sorted=True)

@jax.jit
def scatter_argsort(ids, g):
    order = jnp.argsort(ids)
    si = ids[order]; sg = g[order]
    return jnp.zeros((V, E), jnp.float32).at[si].add(sg, indices_are_sorted=True)
timeit(scatter_argsort, ids, g, label="argsort+scatter sorted")

@jax.jit
def scatter_dedup(ids, g):
    order = jnp.argsort(ids)
    si = ids[order]; sg = g[order]
    # run boundaries -> segment ids (unique-ize)
    newseg = jnp.concatenate([jnp.ones((1,), jnp.int32), (si[1:] != si[:-1]).astype(jnp.int32)])
    seg = jnp.cumsum(newseg) - 1               # (B*N,) run index, sorted
    uniq = jnp.zeros((B*N,), jnp.int32).at[seg].max(si)  # representative id per run (scatter-max, unique? no)
    summed = jnp.zeros((B*N, E), jnp.float32).at[seg].add(sg, indices_are_sorted=True)
    return jnp.zeros((V, E), jnp.float32).at[uniq].add(summed, indices_are_sorted=True, unique_indices=False)
timeit(scatter_dedup, ids, g, label="sort+dedup double-scatter")

# segment_sum over sorted ids directly to V segments
@jax.jit
def segsum(ids, g):
    order = jnp.argsort(ids)
    return jax.ops.segment_sum(g[order], ids[order], num_segments=V, indices_are_sorted=True)
timeit(segsum, ids, g, label="segment_sum sorted")
print("unique frac:", len(np.unique(raw))/len(raw))
