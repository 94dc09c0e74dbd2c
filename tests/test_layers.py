"""Layer shape-contract tests (the reference's unit-test style,
``/root/reference/tests/test_layers.py`` — SURVEY.md §4) for every layer."""

import jax
import jax.numpy as jnp
import pytest

import torecsys_tpu.layers as L

SIZES = [(4, 4, 8), (2, 6, 4), (8, 3, 16)]  # (B, N, E)


def _init_apply(layer, *args, **kwargs):
    rng = jax.random.PRNGKey(0)
    variables = layer.init({"params": rng, "dropout": rng}, *args, **kwargs)
    return layer.apply(variables, *args, **kwargs)


@pytest.mark.parametrize("b,n,e", SIZES)
def test_fm_layer(b, n, e):
    x = jnp.ones((b, n, e))
    out = _init_apply(L.FMLayer(dropout_rate=0.1), x)
    assert out.shape == (b, e)


@pytest.mark.parametrize("b,n,e", SIZES)
def test_ffm_layer(b, n, e):
    x = jnp.ones((b, n * n, e))
    out = _init_apply(L.FFMLayer(num_fields=n), x)
    assert out.shape == (b, n * (n - 1) // 2, e)


@pytest.mark.parametrize("b,n,e", SIZES)
def test_afm_layer(b, n, e):
    x = jnp.ones((b, n, e))
    out, attn = _init_apply(L.AFMLayer(embed_size=e, attn_size=4), x)
    assert out.shape == (b, e)
    assert attn.shape == (b, n * (n - 1) // 2, 1)


@pytest.mark.parametrize("b,n,e", SIZES)
def test_cross_network_layer(b, n, e):
    x = jnp.ones((b, n, e))
    out = _init_apply(L.CrossNetworkLayer(num_layers=3), x)
    assert out.shape == (b, n, e)


@pytest.mark.parametrize("b,n,e", SIZES)
def test_cin_layer(b, n, e):
    x = jnp.ones((b, n, e))
    out = _init_apply(
        L.CINLayer(embed_size=e, num_fields=n, output_size=1, layer_sizes=(6, 6)), x
    )
    assert out.shape == (b, 1)


def test_cin_layer_direct():
    x = jnp.ones((2, 4, 8))
    out = _init_apply(
        L.CINLayer(embed_size=8, num_fields=4, output_size=3, layer_sizes=(6, 6),
                   is_direct=True), x
    )
    assert out.shape == (2, 3)


@pytest.mark.parametrize("b,n,e", SIZES)
def test_inner_product_layer(b, n, e):
    x = jnp.ones((b, n, e))
    out = _init_apply(L.InnerProductNetworkLayer(), x)
    assert out.shape == (b, n * (n - 1) // 2)


@pytest.mark.parametrize("kernel_type", ["mat", "vec", "num"])
def test_outer_product_layer(kernel_type):
    b, n, e = 4, 4, 8
    x = jnp.ones((b, n, e))
    out = _init_apply(
        L.OuterProductNetworkLayer(num_fields=n, embed_size=e, kernel_type=kernel_type), x
    )
    assert out.shape == (b, n * (n - 1) // 2)


@pytest.mark.parametrize("b,n,e", SIZES)
def test_mlp_layer(b, n, e):
    x = jnp.ones((b, n, e))
    out = _init_apply(L.DNNLayer(output_size=4, layer_sizes=(8, 8)), x)
    assert out.shape == (b, n, 4)
    out2 = _init_apply(L.DNNLayer(output_size=4, layer_sizes=(8,)), x.reshape(b, -1))
    assert out2.shape == (b, 4)


def test_wide_layer():
    x = jnp.ones((4, 8))
    out = _init_apply(L.WideLayer(output_size=2), x)
    assert out.shape == (4, 2)


def test_bilinear_network_layer():
    b, n, e = 2, 3, 4
    x = jnp.ones((b, n, e))
    out = _init_apply(L.BilinearNetworkLayer(num_layers=2), x)
    assert out.shape == (b, n, e)


@pytest.mark.parametrize("bilinear_type", ["all", "each", "interaction"])
def test_bilinear_interaction_layer(bilinear_type):
    b, n, e = 4, 5, 8
    x = jnp.ones((b, n, e))
    out = _init_apply(
        L.BilinearInteractionLayer(num_fields=n, embed_size=e, bilinear_type=bilinear_type), x
    )
    assert out.shape == (b, n * (n - 1) // 2, e)


@pytest.mark.parametrize("squared", [False, True])
def test_compose_excitation_layer(squared):
    b, n, e = 4, 3, 8
    m = n * n if squared else n
    x = jnp.ones((b, m, e))
    out = _init_apply(L.CENLayer(num_fields=n, reduction=1, squared=squared), x)
    assert out.shape == (b, m, e)


def test_bias_encoding_layer():
    b, l, e = 4, 6, 8
    x = jnp.ones((b, l, e))
    idx = jnp.zeros((b,), dtype=jnp.int32)
    out = _init_apply(L.BiasEncodingLayer(max_num_session=3, max_length=l, embed_size=e), x, idx)
    assert out.shape == (b, l, e)


def test_position_embedding_layer():
    b, l, e = 4, 6, 8
    out = _init_apply(L.PositionEmbeddingLayer(max_num_position=l), jnp.ones((b, l, e)))
    assert out.shape == (b, l, e)


def test_pal_layer():
    b, e = 4, 8
    out = _init_apply(
        L.PALLayer(input_size=e, max_num_position=10),
        jnp.ones((b, e)), jnp.zeros((b,), dtype=jnp.int32),
    )
    assert out.shape == (b, e)


def test_moe_layer():
    import functools
    b, n, e = 4, 3, 8
    factory = functools.partial(L.DNNLayer, output_size=5, layer_sizes=(8,))

    class FlatExpert(L.DNNLayer):
        def __call__(self, x, training=False):
            return super().__call__(x.reshape(x.shape[0], -1), training=training)

    layer = L.MOELayer(
        expert_factory=functools.partial(FlatExpert, output_size=5, layer_sizes=(8,)),
        num_experts=4, num_gates=2,
    )
    out = _init_apply(layer, jnp.ones((b, n, e)))
    assert out.shape == (b, 2, 4 * 5)


def test_dynamic_routing_layer():
    b, n, e = 4, 8, 6
    layer = L.DynamicRoutingLayer(
        embed_size=e, routed_size=5, max_num_caps=4, num_fields=n, num_iter=2
    )
    out = _init_apply(layer, jnp.ones((b, n, e)))
    k = L.resolve_num_capsules(n, 4)
    assert out.shape == (b, k, 5)


def test_gmf_layer():
    out = _init_apply(L.GMFLayer(), jnp.ones((4, 2, 8)))
    assert out.shape == (4, 1)


def test_starspace_layer():
    out = _init_apply(L.StarSpaceLayer(), jnp.ones((4, 2, 8)))
    assert out.shape == (4, 8)


def test_regularizer_differentiable():
    """The reference's regularizer was gradient-dead (detached,
    ``utils/operations.py:85``); ours must have nonzero gradients."""
    params = {"dense": {"kernel": jnp.ones((3, 3)), "bias": jnp.ones((3,))}}
    reg = L.Regularizer(weight_decay=0.1, norm=2)
    val = reg(params)
    assert val.shape == ()
    grads = jax.grad(lambda p: reg(p))(params)
    assert float(jnp.abs(grads["dense"]["kernel"]).sum()) > 0
    # bias not matched by 'kernel' filter
    assert float(jnp.abs(grads["dense"]["bias"]).sum()) == 0
