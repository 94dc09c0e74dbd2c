"""Input-module tests (reference style: ``/root/reference/tests/test_inputs.py``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torecsys_tpu.inputs import (
    ConcatInput,
    ImageInput,
    Inputs,
    ListIndicesEmbedding,
    MultiIndicesEmbedding,
    MultiIndicesFieldAwareEmbedding,
    PretrainedImageInput,
    SequenceIndicesEmbedding,
    SingleIndexEmbedding,
    StackedInput,
    ValueInput,
)

B = 4


def _run(module, batch, **kwargs):
    rng = jax.random.PRNGKey(0)
    variables = module.init({"params": rng, "dropout": rng}, batch, **kwargs)
    return module.apply(variables, batch, **kwargs, mutable=["batch_stats"])[0]


def test_value_input():
    batch = {"a": jnp.ones((B,)), "b": jnp.zeros((B,))}
    out = _run(ValueInput(fields=("a", "b")), batch)
    assert out.shape == (B, 2, 1)


def test_single_index_embedding():
    batch = {"u": jnp.array([0, 1, 2, 3])}
    out = _run(SingleIndexEmbedding(field_size=10, embed_size=8, fields=("u",)), batch)
    assert out.shape == (B, 1, 8)


def test_single_index_embedding_pretrained():
    w = np.arange(40, dtype=np.float32).reshape(10, 4)
    mod = SingleIndexEmbedding(field_size=10, embed_size=4, fields=("u",), pretrained=w)
    batch = {"u": jnp.array([0, 1, 2, 3])}
    out = _run(mod, batch)
    np.testing.assert_allclose(np.asarray(out[:, 0, :]), w[:4], rtol=1e-6)


def test_multi_indices_embedding_offsets():
    mod = MultiIndicesEmbedding(embed_size=8, field_sizes=(5, 7), fields=("a", "b"))
    batch = {"a": jnp.array([0, 4, 0, 1]), "b": jnp.array([6, 0, 3, 2])}
    out = _run(mod, batch)
    assert out.shape == (B, 2, 8)
    # same raw id in different fields must hit different rows
    b0 = {"a": jnp.array([2, 2, 2, 2]), "b": jnp.array([2, 2, 2, 2])}
    out0 = _run(mod, b0)
    assert not np.allclose(np.asarray(out0[:, 0, :]), np.asarray(out0[:, 1, :]))


def test_multi_indices_embedding_flatten():
    mod = MultiIndicesEmbedding(embed_size=8, field_sizes=(5, 7), fields=("a", "b"), flatten=True)
    batch = {"a": jnp.array([0, 1, 2, 3]), "b": jnp.array([0, 1, 2, 3])}
    assert _run(mod, batch).shape == (B, 1, 16)


def test_field_aware_embedding():
    n = 3
    mod = MultiIndicesFieldAwareEmbedding(
        embed_size=4, field_sizes=(5, 6, 7), fields=("a", "b", "c")
    )
    batch = {"a": jnp.array([0, 1, 2, 3]), "b": jnp.array([0, 0, 0, 0]), "c": jnp.array([1, 1, 1, 1])}
    out = _run(mod, batch)
    assert out.shape == (B, n * n, 4)


def test_concat_input():
    children = (
        SingleIndexEmbedding(field_size=10, embed_size=8, fields=("u",)),
        ValueInput(fields=("v",)),
    )
    mod = ConcatInput(inputs=children)
    batch = {"u": jnp.array([0, 1, 2, 3]), "v": jnp.ones((B,))}
    out = _run(mod, batch)
    assert out.shape == (B, 1, 9)


def test_stacked_input():
    children = (
        SingleIndexEmbedding(field_size=10, embed_size=8, fields=("u",)),
        MultiIndicesEmbedding(embed_size=8, field_sizes=(5, 5), fields=("a", "b")),
    )
    mod = StackedInput(inputs=children)
    batch = {"u": jnp.array([0, 1, 2, 3]), "a": jnp.array([0, 1, 2, 3]), "b": jnp.array([0, 1, 2, 3])}
    out = _run(mod, batch)
    assert out.shape == (B, 3, 8)


@pytest.mark.parametrize("output_method,expect_l", [
    ("avg_pooling", 1), ("max_pooling", 1), ("sum", 1), ("none", 5),
])
def test_list_indices_embedding(output_method, expect_l):
    mod = ListIndicesEmbedding(
        field_size=20, embed_size=8, fields=("hist",),
        use_attn=True, num_heads=2, output_method=output_method,
    )
    batch = {"hist": jnp.array([[1, 2, 3, 0, 0]] * B)}
    out = _run(mod, batch)
    assert out.shape == (B, expect_l, 8)


@pytest.mark.parametrize("rnn_method", ["lstm", "gru", "rnn"])
def test_sequence_indices_embedding(rnn_method):
    mod = SequenceIndicesEmbedding(
        field_size=20, embed_size=8, fields=("seq",), lengths_field="seq_lengths",
        rnn_method=rnn_method,
    )
    batch = {
        "seq": jnp.array([[1, 2, 3, 0, 0]] * B),
        "seq_lengths": jnp.array([3] * B),
    }
    out = _run(mod, batch)
    assert out.shape == (B, 1, 8)


def test_sequence_bidirectional():
    mod = SequenceIndicesEmbedding(
        field_size=20, embed_size=8, fields=("seq",), bidirectional=True,
    )
    batch = {"seq": jnp.array([[1, 2, 3, 0, 0]] * B)}
    out = _run(mod, batch)
    assert out.shape == (B, 1, 8)


def test_image_input():
    mod = ImageInput(embed_size=8, in_channels=3, layers_size=(4, 8),
                     kernel_sizes=(3, 3), strides=(1, 1), pooling_sizes=(2, 2))
    batch = {"image": jnp.ones((B, 16, 16, 3))}
    out = _run(mod, batch)
    assert out.shape == (B, 1, 8)


def test_pretrained_image_input_with_backbone():
    backbone = lambda x: x.mean(axis=(1, 2))  # (B, C) fake frozen features
    mod = PretrainedImageInput(embed_size=8, backbone=backbone)
    batch = {"image": jnp.ones((B, 16, 16, 3))}
    out = _run(mod, batch)
    assert out.shape == (B, 1, 8)


def test_inputs_wrapper_routes_by_schema():
    inputs = Inputs(schema={
        "feat_inputs": ValueInput(fields=("d",)),
        "emb_inputs": MultiIndicesEmbedding(embed_size=8, field_sizes=(5, 5), fields=("a", "b")),
    })
    batch = {"d": jnp.ones((B,)), "a": jnp.array([0, 1, 2, 3]), "b": jnp.array([4, 3, 2, 1])}
    out = _run(inputs, batch)
    assert set(out) == {"feat_inputs", "emb_inputs"}
    assert out["feat_inputs"].shape == (B, 1, 1)
    assert out["emb_inputs"].shape == (B, 2, 8)


def test_inputs_add_inputs():
    inputs = Inputs(schema={"feat_inputs": ValueInput(fields=("d",))})
    inputs2 = inputs.add_inputs(
        "emb_inputs", MultiIndicesEmbedding(embed_size=4, field_sizes=(5,), fields=("a",))
    )
    assert set(inputs2.schema) == {"feat_inputs", "emb_inputs"}
    assert set(inputs.schema) == {"feat_inputs"}


def test_collate_images_from_path_and_transform(tmp_path):
    """Image cells may be file paths (reference collate_fn.py:98-128) and a
    per-image transform hook applies after loading."""
    import numpy as np
    from PIL import Image

    from torecsys_tpu.data.collate import CollateFunction, FieldSpec

    arrs = []
    paths = []
    for i in range(3):
        a = (np.arange(8 * 8 * 3).reshape(8, 8, 3) * (i + 1) % 255).astype("uint8")
        pth = str(tmp_path / f"img{i}.png")
        Image.fromarray(a).save(pth)
        arrs.append(a.astype(np.float32) / 255.0)
        paths.append(pth)

    cf = CollateFunction({"image": FieldSpec(field_type="images")})
    batch = cf.to_batch([{"image": p} for p in paths])
    assert batch["image"].shape == (3, 8, 8, 3)
    np.testing.assert_allclose(batch["image"], np.stack(arrs), atol=1e-6)

    cf2 = CollateFunction({
        "image": FieldSpec(field_type="images", transform=lambda a: a[:4, :4])
    })
    batch2 = cf2.to_batch([{"image": p} for p in paths])
    assert batch2["image"].shape == (3, 4, 4, 3)

    # in-memory arrays still pass through
    batch3 = cf.to_batch([{"image": a} for a in arrs])
    np.testing.assert_allclose(batch3["image"], np.stack(arrs), atol=1e-6)


def test_pretrained_image_input_weights_path(tmp_path, rng):
    """weights_path: a saved tower's .npz drives a frozen backbone; only the
    new head trains (reference pretrained_image_inp.py:10-80 semantics)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from torecsys_tpu.inputs import PretrainedImageInput, save_tower_weights
    from torecsys_tpu.inputs.image import ImageInput

    imgs = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 8, 8, 3)).astype(np.float32)
    )
    tower = ImageInput(embed_size=6, in_channels=3)
    variables = tower.init(rng, {"image": imgs}, training=False)
    path = save_tower_weights(str(tmp_path / "tower.npz"), variables)

    module = PretrainedImageInput(embed_size=4, weights_path=path,
                                  backbone_embed_size=6)
    v2 = module.init(rng, {"image": imgs})
    out = module.apply(v2, {"image": imgs})
    assert out.shape == (2, 1, 4)
    # only the head is trainable; backbone weights are frozen constants
    from flax import traverse_util

    flat = traverse_util.flatten_dict(v2["params"], sep="/")
    assert all("head" in k for k in flat), sorted(flat)

    def loss(p):
        return jnp.sum(module.apply({"params": p}, {"image": imgs}) ** 2)

    g = jax.grad(loss)(v2["params"])
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree_util.tree_leaves(g))
