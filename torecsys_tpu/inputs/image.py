"""Image inputs: convolutional embedders for item images.

Parity with ``/root/reference/torecsys/inputs/base/``:

* :class:`ImageInput`           — ``image_inp.py:9-97`` (Conv2d stack +
  batch-norm/dropout + adaptive pooling + FC head)
* :class:`PretrainedImageInput` — ``pretrained_image_inp.py:10-80``
  (torchvision backbone with replaced head)

TPU design: NHWC layout (XLA's native conv layout on TPU), ``nn.Conv`` stacks
that tile onto the MXU. The pretrained variant accepts an injected backbone
``apply``-style callable (any flax module or function) instead of downloading
torchvision weights — this keeps the capability (swap in a frozen backbone,
replace the head) without a network dependency.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from torecsys_tpu.inputs.base import BaseInput, Batch


class ImageInput(BaseInput):
    """Conv tower over item images → ``(B, 1, E)``.

    Reference: ``image_inp.py:9-97`` — per conv stage: Conv2d → (BatchNorm) →
    activation → pooling; then global average pool + Dense head to
    ``embed_size``.  Images are NHWC ``(B, H, W, C)`` float arrays.
    """

    embed_size: int
    in_channels: int
    layers_size: Tuple[int, ...] = (32, 64)
    kernel_sizes: Tuple[int, ...] = (3, 3)
    strides: Tuple[int, ...] = (1, 1)
    pooling_sizes: Tuple[int, ...] = (2, 2)
    use_batchnorm: bool = True
    dropout_rate: float = 0.0
    fields: Tuple[str, ...] = ("image",)

    @nn.compact
    def __call__(self, batch: Batch, training: bool = False) -> jnp.ndarray:
        x = batch[self.fields[0]].astype(jnp.float32)
        if x.ndim != 4:
            raise ValueError(f"image field must be (B, H, W, C), got {x.shape}")
        for i, (feat, k, s, p) in enumerate(
            zip(self.layers_size, self.kernel_sizes, self.strides, self.pooling_sizes)
        ):
            x = nn.Conv(features=feat, kernel_size=(k, k), strides=(s, s), name=f"conv_{i}")(x)
            if self.use_batchnorm:
                x = nn.BatchNorm(use_running_average=not training, name=f"bn_{i}")(x)
            x = nn.relu(x)
            if self.dropout_rate > 0:
                x = nn.Dropout(self.dropout_rate, deterministic=not training)(x)
            if p > 1:
                x = nn.max_pool(x, window_shape=(p, p), strides=(p, p))
        # adaptive (global) average pool, matching AdaptiveAvgPool2d(1)
        x = jnp.mean(x, axis=(1, 2))  # (B, C)
        x = nn.Dense(self.embed_size, name="head")(x)
        return x[:, None, :]  # (B, 1, E)


class PretrainedImageInput(BaseInput):
    """Pretrained-backbone image embedder → ``(B, 1, E)``.

    Reference: ``pretrained_image_inp.py:10-80`` loads a torchvision model
    (network download) and replaces its classifier head.  Egress-free
    equivalents here, in priority order:

    1. ``weights_path``: a local ``.npz`` of pretrained tower variables
       (params + batch_stats, flat ``/``-joined paths — the format
       ``save_tower_weights`` writes) for the built-in :class:`ImageInput`
       tower.  The tower runs with those
       fixed weights (always frozen — they are constants, not params) and
       only the new ``head`` Dense trains.
    2. ``backbone``: a dependency-injected feature extractor
       (``backbone(images) -> (B, F)``); ``frozen=True`` stops gradients
       (parity with ``requires_grad=False``).
    3. neither: a plain trainable :class:`ImageInput` tower.
    """

    embed_size: int
    backbone: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None
    frozen: bool = True
    fields: Tuple[str, ...] = ("image",)
    weights_path: Optional[str] = None
    backbone_embed_size: int = 64

    @nn.compact
    def __call__(self, batch: Batch, training: bool = False) -> jnp.ndarray:
        import jax

        x = batch[self.fields[0]].astype(jnp.float32)
        if self.weights_path is not None:
            variables = _load_tower_weights(self.weights_path)
            tower = ImageInput(
                embed_size=self.backbone_embed_size,
                in_channels=x.shape[-1],
                fields=self.fields,
            )
            feats = tower.apply(
                variables, {self.fields[0]: x}, training=False
            )  # (B, 1, F) with FIXED pretrained weights
            feats = jax.lax.stop_gradient(feats.reshape(feats.shape[0], -1))
            out = nn.Dense(self.embed_size, name="head")(feats)
            return out[:, None, :]
        if self.backbone is not None:
            feats = self.backbone(x)
            if self.frozen:
                feats = jax.lax.stop_gradient(feats)
            if feats.ndim != 2:
                feats = feats.reshape(feats.shape[0], -1)
            out = nn.Dense(self.embed_size, name="head")(feats)
            return out[:, None, :]
        tower = ImageInput(
            embed_size=self.embed_size,
            in_channels=x.shape[-1],
            fields=self.fields,
            name="fallback_tower",
        )
        return tower(batch, training=training)


def save_tower_weights(path: str, variables) -> str:
    """Write an :class:`ImageInput` tower's VARIABLES (``params`` +
    ``batch_stats``) as a flat ``.npz`` — the
    ``PretrainedImageInput.weights_path`` format."""
    import numpy as np
    from flax import traverse_util

    flat = traverse_util.flatten_dict(variables, sep="/")
    np.savez(path, **{k: np.asarray(v) for k, v in flat.items()})
    return path


def _load_tower_weights(path: str):
    """Load (and cache) a flat ``.npz`` param file back into a pytree."""
    return _load_tower_weights_cached(path)


@functools.lru_cache(maxsize=8)
def _load_tower_weights_cached(path: str):
    import numpy as np
    from flax import traverse_util

    with np.load(path) as z:
        flat = {k: jnp.asarray(z[k]) for k in z.files}
    return traverse_util.unflatten_dict(flat, sep="/")
