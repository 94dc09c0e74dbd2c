"""Golden numeric tests: ops vs brute-force reference math on tiny inputs.

The reference only asserts output shapes (SURVEY.md §4); these tests pin the
actual numbers so kernel rewrites (Pallas) can be verified against them.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torecsys_tpu.ops.embedding import field_offsets, fused_offset_lookup
from torecsys_tpu.ops.interactions import (
    afm_pairwise_products,
    cin_interaction,
    cross_layer,
    ffm_pairwise_interaction,
    fm_pairwise_interaction,
    inner_product_pairs,
    outer_product_pairs,
)
from torecsys_tpu.utils.operations import pair_indices


def test_fm_matches_bruteforce(np_rng):
    b, n, e = 4, 5, 3
    x = np_rng.normal(size=(b, n, e)).astype(np.float32)
    got = np.asarray(fm_pairwise_interaction(jnp.asarray(x)))
    want = np.zeros((b, e), dtype=np.float32)
    for i in range(n):
        for j in range(n):
            if i < j:
                want += x[:, i, :] * x[:, j, :]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_ffm_matches_double_loop(np_rng):
    b, n, e = 2, 4, 3
    x = np_rng.normal(size=(b, n * n, e)).astype(np.float32)
    got = np.asarray(ffm_pairwise_interaction(jnp.asarray(x), n))
    x4 = x.reshape(b, n, n, e)
    want = []
    for i in range(n):
        for j in range(i + 1, n):
            want.append(x4[:, i, j, :] * x4[:, j, i, :])
    want = np.stack(want, axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_afm_products(np_rng):
    b, n, e = 3, 4, 2
    x = np_rng.normal(size=(b, n, e)).astype(np.float32)
    got = np.asarray(afm_pairwise_products(jnp.asarray(x)))
    rows, cols = pair_indices(n)
    want = x[:, rows, :] * x[:, cols, :]
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_inner_product_pairs(np_rng):
    b, n, e = 3, 5, 4
    x = np_rng.normal(size=(b, n, e)).astype(np.float32)
    got = np.asarray(inner_product_pairs(jnp.asarray(x)))
    want = []
    for i in range(n):
        for j in range(i + 1, n):
            want.append((x[:, i, :] * x[:, j, :]).sum(-1))
    want = np.stack(want, axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("kernel_type", ["mat", "vec", "num"])
def test_outer_product_pairs(np_rng, kernel_type):
    b, n, e = 2, 4, 3
    p = n * (n - 1) // 2
    x = np_rng.normal(size=(b, n, e)).astype(np.float32)
    shape = {"mat": (e, p, e), "vec": (p, e), "num": (p, 1)}[kernel_type]
    k = np_rng.normal(size=shape).astype(np.float32)
    got = np.asarray(outer_product_pairs(jnp.asarray(x), jnp.asarray(k), kernel_type))
    rows, cols = pair_indices(n)
    want = np.zeros((b, p), dtype=np.float32)
    for pi, (i, j) in enumerate(zip(rows, cols)):
        outer = np.einsum("be,bf->bef", x[:, i, :], x[:, j, :])  # (B, E, E)
        if kernel_type == "mat":
            want[:, pi] = np.einsum("bef,ef->b", outer, k[:, pi, :])
        elif kernel_type == "vec":
            want[:, pi] = np.einsum("be,be->b", x[:, i, :] * x[:, j, :], np.broadcast_to(k[pi], (b, e)))
        else:
            want[:, pi] = (x[:, i, :] * x[:, j, :]).sum(-1) * k[pi, 0]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_cross_layer_recurrence(np_rng):
    b, d = 3, 6
    x0 = np_rng.normal(size=(b, d)).astype(np.float32)
    x = np_rng.normal(size=(b, d)).astype(np.float32)
    w = np_rng.normal(size=(d,)).astype(np.float32)
    bias = np_rng.normal(size=(d,)).astype(np.float32)
    got = np.asarray(cross_layer(jnp.asarray(x0), jnp.asarray(x), jnp.asarray(w), jnp.asarray(bias)))
    want = x0 * (x @ w)[:, None] + bias[None, :] + x
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_cin_interaction(np_rng):
    b, n, h, o, e = 2, 3, 4, 5, 6
    x0 = np_rng.normal(size=(b, n, e)).astype(np.float32)
    xk = np_rng.normal(size=(b, h, e)).astype(np.float32)
    w = np_rng.normal(size=(o, h, n)).astype(np.float32)
    got = np.asarray(cin_interaction(jnp.asarray(x0), jnp.asarray(xk), jnp.asarray(w)))
    want = np.einsum("bhe,bne,ohn->boe", xk, x0, w)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_field_offsets_and_fused_lookup(np_rng):
    sizes = (4, 3, 5)
    offs = field_offsets(sizes)
    np.testing.assert_array_equal(offs, [0, 4, 7])
    table = np_rng.normal(size=(12, 2)).astype(np.float32)
    ids = np.array([[1, 2, 0], [3, 0, 4]], dtype=np.int32)
    got = np.asarray(fused_offset_lookup(jnp.asarray(table), jnp.asarray(ids), offs))
    want = np.stack([
        np.stack([table[1], table[4 + 2], table[7 + 0]]),
        np.stack([table[3], table[4 + 0], table[7 + 4]]),
    ])
    np.testing.assert_allclose(got, want, rtol=1e-6)


# ---- packed embedding layout (TPU lane-width packing) ----------------------

from torecsys_tpu.ops.embedding import (  # noqa: E402
    pack_factor,
    pack_table,
    packed_lookup,
    packed_shape,
    unpack_table,
)


def test_pack_factor():
    assert pack_factor(16) == 8
    assert pack_factor(64) == 2
    assert pack_factor(128) == 1
    assert pack_factor(256) == 1
    assert pack_factor(1) == 128
    assert pack_factor(48) == 2  # power of two only


def test_packed_shape_and_roundtrip(np_rng):
    v, e = 37, 16
    tbl = jnp.asarray(np_rng.normal(size=(v, e)).astype(np.float32))
    packed = pack_table(tbl)
    assert packed.shape == packed_shape(v, e)
    back = unpack_table(packed, e, v)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(tbl))


def test_packed_lookup_matches_plain(np_rng):
    v, e, m = 100, 16, 64
    tbl = np_rng.normal(size=(v, e)).astype(np.float32)
    ids = np_rng.integers(0, v, size=(8, 8)).astype(np.int32)
    got = np.asarray(packed_lookup(pack_table(jnp.asarray(tbl)), jnp.asarray(ids), e))
    np.testing.assert_allclose(got, tbl[ids], rtol=1e-6)


def test_packed_lookup_grad_is_scatter_add(np_rng):
    """d/d(table) of sum(w * lookup) == scatter-add of w rows (through the
    packed layout and back)."""
    v, e = 24, 4
    tbl = jnp.asarray(np_rng.normal(size=(v, e)).astype(np.float32))
    packed = pack_table(tbl)
    ids = jnp.asarray(np.array([[0, 1, 1, 23], [5, 5, 5, 0]], dtype=np.int32))
    w = jnp.asarray(np_rng.normal(size=(*ids.shape, e)).astype(np.float32))

    def f(p):
        return jnp.sum(w * packed_lookup(p, ids, e))

    g = jax.grad(f)(packed)
    g_logical = np.asarray(unpack_table(g, e, v))
    want = np.zeros((v, e), np.float32)
    np.add.at(want, np.asarray(ids).reshape(-1), np.asarray(w).reshape(-1, e))
    np.testing.assert_allclose(g_logical, want, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# Pallas kernel equivalence (interpret mode on CPU; compiled path on TPU)
# ---------------------------------------------------------------------------


def test_pallas_row_gather_matches_take(np_rng):
    import torecsys_tpu.ops.pallas.embedding as pe

    m, w = 300, 128
    tbl = jnp.asarray(np_rng.normal(size=(m, w)).astype(np.float32))
    # non-multiple of TILE to exercise the padding path
    rows = jnp.asarray(np_rng.integers(0, m, size=(pe.TILE + 70,)).astype(np.int32))
    got = np.asarray(pe._row_gather_impl(tbl, rows, interpret=True))
    np.testing.assert_allclose(got, np.asarray(tbl)[np.asarray(rows)], rtol=1e-6)


def test_pallas_row_gather_grad_is_scatter_add(np_rng):
    """The custom VJP scatter-adds duplicate-row cotangents."""
    from torecsys_tpu.ops.pallas import embedding as pe

    m, w = 16, 128
    tbl = jnp.asarray(np_rng.normal(size=(m, w)).astype(np.float32))
    rows = jnp.asarray(np.array([0, 3, 3, 15, 0, 0], dtype=np.int32))
    g = jnp.asarray(np_rng.normal(size=(rows.shape[0], w)).astype(np.float32))
    dt, dr = pe._row_gather_bwd(m, "float32", rows, g)
    assert dr is None
    want = np.zeros((m, w), np.float32)
    np.add.at(want, np.asarray(rows), np.asarray(g))
    np.testing.assert_allclose(np.asarray(dt), want, rtol=1e-5, atol=1e-6)


def test_pallas_row_gather_jax_grad_end_to_end(np_rng, monkeypatch):
    """jax.grad through the custom_vjp-wrapped ``row_gather`` itself — the
    None cotangent for int32 row ids and the residual plumbing included
    (the bwd-only test above never exercises either)."""
    from torecsys_tpu.ops.pallas import embedding as pe

    monkeypatch.setattr(
        pe, "_row_gather_impl", functools.partial(pe._row_gather_impl, interpret=True)
    )
    m, w = 16, 128
    tbl = jnp.asarray(np_rng.normal(size=(m, w)).astype(np.float32))
    rows = jnp.asarray(np.array([0, 3, 3, 15, 0, 0], dtype=np.int32))
    cot = jnp.asarray(np_rng.normal(size=(rows.shape[0], w)).astype(np.float32))

    g = jax.grad(lambda t: jnp.sum(cot * pe.row_gather(t, rows)))(tbl)
    want = np.zeros((m, w), np.float32)
    np.add.at(want, np.asarray(rows), np.asarray(cot))
    np.testing.assert_allclose(np.asarray(g), want, rtol=1e-5, atol=1e-6)


def test_pallas_disabled_on_cpu():
    """Dispatch gate: CPU backend (the test rig) never routes into Pallas."""
    from torecsys_tpu.ops import pallas

    assert pallas.enabled() is False


def test_unique_stored_gather_matches_take(np_rng):
    """Dynamic-grid compact stored-row gather == logical-table lookup after
    expand + slot-select (interpret mode)."""
    import jax
    import jax.numpy as jnp

    from torecsys_tpu.ops.embedding import pack_table
    from torecsys_tpu.ops.pallas import embedding as pe
    from torecsys_tpu.parallel.lookup import _dedup_ids

    v, e = 5000, 16
    logical = np_rng.normal(size=(v, e)).astype(np.float32)
    packed = pack_table(jnp.asarray(logical))
    pk = packed.shape[1] // e
    num_logical = packed.shape[0] * pk
    ids = jnp.asarray(np_rng.integers(0, v, 3000).astype(np.int32))
    uids, inv, _ = _dedup_ids(ids)
    uids = jnp.minimum(uids, num_logical)  # INT32_MAX sentinel -> kernel's
    cw = pe.unique_stored_gather(packed, uids, e, interpret=True)
    wide = jnp.take(cw, inv, axis=0).reshape(-1, pk, e)
    lo = jnp.take(uids % pk, inv)
    oh = jax.nn.one_hot(lo, pk, dtype=wide.dtype)
    out = jnp.einsum("mp,mpe->me", oh, wide)
    np.testing.assert_allclose(np.asarray(out), logical[np.asarray(ids)],
                               rtol=1e-6)


def test_utils_decorators_and_tqdm_handler():
    """Parity surface: in_development / deprecated / not_jittable decorators
    (reference utils/decorator.py:9-66) and TqdmHandler (utils/logging.py)."""
    import logging
    import warnings

    import jax
    import jax.numpy as jnp

    from torecsys_tpu.utils import (
        TqdmHandler,
        deprecated,
        in_development,
        not_jittable,
    )

    @in_development("x")
    class Dev:
        def __init__(self):
            self.ok = True

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert Dev().ok
        assert any(issubclass(x.category, FutureWarning) for x in w)

    @deprecated("new_thing")
    def old():
        return 7

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert old() == 7
        assert any("new_thing" in str(x.message) for x in w)

    @not_jittable
    def grow(x):
        return x + 1

    assert grow(1) == 2
    with pytest.raises(RuntimeError, match="host-side"):
        jax.jit(lambda v: grow(v))(jnp.ones(()))

    # DSIN carries the reference's in-development marker
    from torecsys_tpu.models import DeepSessionInterestNetworkModel

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        DeepSessionInterestNetworkModel(embed_size=4, max_num_session=2,
                                        max_num_position=3)
        assert any(issubclass(x.category, FutureWarning) for x in w)

    handler = TqdmHandler()
    handler.setFormatter(logging.Formatter("%(message)s"))
    lg = logging.getLogger("trs_tqdm_test")
    lg.addHandler(handler)
    lg.warning("hello")  # must not raise
    lg.removeHandler(handler)
