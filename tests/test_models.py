"""Model shape-contract tests for every model in the zoo
(reference style: ``/root/reference/tests/test_models.py``, SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import pytest

import torecsys_tpu.models as M

B, N, E = 4, 5, 8


def _run(model, *args, **kwargs):
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng}, *args, **kwargs)
    return model.apply(variables, *args, **kwargs, mutable=["batch_stats"])[0]


def feat():
    return jnp.ones((B, N, 1))


def emb():
    return jnp.ones((B, N, E))


def field_emb():
    return jnp.ones((B, N * N, E))


def test_logistic_regression():
    assert _run(M.LogisticRegressionModel(), feat()).shape == (B, 1)


def test_fm():
    assert _run(M.FM(), feat(), emb()).shape == (B, 1)


def test_fmnn():
    assert _run(M.FMNN(deep_layer_sizes=(8,)), feat(), emb()).shape == (B, 1)


def test_ffm():
    assert _run(M.FFM(num_fields=N), feat(), field_emb()).shape == (B, 1)


def test_afm():
    assert _run(M.AFM(embed_size=E, attn_size=4), feat(), emb()).shape == (B, 1)


def test_nfm():
    assert _run(M.NFM(deep_layer_sizes=(8,)), feat(), emb()).shape == (B, 1)


def test_deep_fm():
    assert _run(M.DeepFM(deep_layer_sizes=(8,)), feat(), emb()).shape == (B, 1)


@pytest.mark.parametrize("prod_method", ["inner", "outer"])
def test_pnn(prod_method):
    model = M.PNN(num_fields=N, embed_size=E, deep_layer_sizes=(8,), prod_method=prod_method)
    assert _run(model, feat(), emb()).shape == (B, 1)


def test_dcn():
    model = M.DCN(cross_num_layers=2, deep_output_size=4, deep_layer_sizes=(8,))
    assert _run(model, emb()).shape == (B, 1)


def test_xdeepfm():
    model = M.xDeepFM(embed_size=E, num_fields=N, cin_layer_sizes=(6, 6), deep_layer_sizes=(8,))
    assert _run(model, feat(), emb()).shape == (B, 1)


def test_ncf():
    assert _run(M.NCF(deep_layer_sizes=(8,)), jnp.ones((B, 2, E))).shape == (B, 1)


def test_wide_and_deep():
    assert _run(M.WideAndDeep(deep_layer_sizes=(8,)), feat(), emb()).shape == (B, 1)


def test_deep_ffm():
    model = M.DeepFFM(num_fields=N, deep_layer_sizes=(8,))
    assert _run(model, field_emb()).shape == (B, 1)


def test_fat_deep_ffm():
    model = M.FATDeepFFM(num_fields=N, reduction=2, deep_layer_sizes=(8,))
    assert _run(model, field_emb()).shape == (B, 1)


@pytest.mark.parametrize("bilinear_type", ["all", "each", "interaction"])
def test_fibinet(bilinear_type):
    model = M.FiBiNET(
        num_fields=N, embed_size=E, senet_reduction=2,
        deep_layer_sizes=(8,), bilinear_type=bilinear_type,
    )
    assert _run(model, emb()).shape == (B, 1)


def test_deep_moe():
    model = M.DeepMoE(num_moe_layers=2, num_experts=3, expert_output_size=4,
                      expert_layer_sizes=(8,))
    assert _run(model, emb()).shape == (B, 1)


def test_mmoe():
    model = M.MMoE(num_tasks=3, num_experts=2, expert_output_size=4,
                   expert_layer_sizes=(8,), tower_layer_sizes=(8,))
    assert _run(model, emb()).shape == (B, 3)


def test_esmm():
    pcvr, pctr = _run(M.ESMM(deep_layer_sizes=(8,)), emb())
    assert pcvr.shape == (B, 1) and pctr.shape == (B, 1)
    assert float(pcvr.min()) >= 0 and float(pcvr.max()) <= 1


def test_esm2():
    p1, p2, p3 = _run(M.ESM2(deep_layer_sizes=(8,)), emb())
    for p in (p1, p2, p3):
        assert p.shape == (B, 1)
        assert float(p.min()) >= 0 and float(p.max()) <= 1


def test_deep_mcp():
    model = M.DeepMCP(pred_layer_sizes=(8,), match_layer_sizes=(8,), corr_layer_sizes=(8,))
    y_pred, y_match, y_cpos, y_cneg = _run(
        model, jnp.ones((B, 2, E)), jnp.ones((B, 3, E)),
        jnp.ones((B, 3, E)), jnp.ones((B, 2, 3 * E)),
    )
    assert y_pred.shape == (B, 1)
    assert y_match.shape == (B, 1)
    assert y_cpos.shape == (B, 1)
    assert y_cneg.shape == (B, 2)


def test_dsin():
    L_len = 6
    model = M.DSIN(embed_size=E, max_num_session=4, max_num_position=L_len,
                   interacting_hidden_size=8)
    out = _run(model, jnp.ones((B, L_len, E)), jnp.zeros((B,), dtype=jnp.int32))
    assert out.shape == (B, 1)


def test_pal():
    pctr = M.FM()
    model = M.PAL(pctr_model=pctr, max_num_position=10, pos_layer_sizes=(4,))
    inputs = {"feat_inputs": feat(), "emb_inputs": emb()}
    out = _run(model, inputs, jnp.zeros((B,), dtype=jnp.int32))
    assert out.shape == (B, 1)


def test_matrix_factorization():
    assert _run(M.MF(), jnp.ones((B, 2, E))).shape == (B, 1)


def test_starspace():
    num_neg = 2
    agg = B * (1 + num_neg)
    model = M.StarSpaceModel(embed_size=E, num_neg=num_neg)
    out = _run(model, jnp.ones((agg, 1, E)), jnp.ones((agg, 1, E)))
    assert out.shape == (agg, 1)


def test_ltr_wrapper():
    wrapper = M.LearningToRankWrapper(model=M.FM())
    pos = {"feat_inputs": feat(), "emb_inputs": emb()}
    neg = {"feat_inputs": feat() * 0.5, "emb_inputs": emb() * 0.5}
    out = _run(wrapper, pos, neg)
    assert out["pos_outputs"].shape == (B, 1)
    assert out["neg_outputs"].shape == (B, 1)


def test_prm():
    L_len = 7
    model = M.PRM(embed_size=E, max_num_position=L_len, encoding_size=8,
                  num_encoder_layers=2, num_heads=2, ff_hidden_size=16)
    out = _run(model, jnp.ones((B, L_len, E)))
    assert out.shape == (B, L_len)
    import numpy as np
    np.testing.assert_allclose(np.asarray(out.sum(axis=1)), 1.0, rtol=1e-5)


def test_registry():
    assert "DeepFM" in M.MODELS
    assert M.get_model("DeepFM", deep_layer_sizes=(8,)) is not None
    with pytest.raises(KeyError):
        M.get_model("NopeModel")
