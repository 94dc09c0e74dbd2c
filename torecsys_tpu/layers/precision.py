"""Mixed-precision compute for the dense towers (TPU MXU-native).

The reference trains everything in float32 (torch CPU/CUDA defaults).  On
TPU the MXU's native matmul dtype is bfloat16: running the dense-tower
matmuls in bf16 with f32 parameters and f32 loss is the standard
mixed-precision recipe and roughly halves tower time at CTR sizes, with
no measurable AUC effect (guarded by ``tests/test_convergence.py``).

Mechanics: ``Pipeline.set_compute_dtype('bfloat16')`` enters
:func:`use_compute_dtype` around jit-tracing (the same trace-time-context
pattern as ``ops.sparse.use_sparse_embedding_grads``); every dense/attention
layer built through :func:`Dense` / :func:`mha_dtype` then passes
``dtype=bfloat16`` to flax, which casts inputs AND params to bf16 for the
matmul while keeping the stored params f32 (``param_dtype``).  Model outputs
are cast back to f32 by ``Sequential`` so losses/metrics always accumulate
in f32.

Scope: ``nn.Dense`` sites and multi-head attention.  Embedding tables,
convs, and recurrent cells stay f32 (they are gather/bandwidth bound, not
MXU bound).
"""

from __future__ import annotations

import contextlib
import threading
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

_state = threading.local()


def compute_dtype():
    """Active compute dtype (None = full f32, flax default promotion)."""
    return getattr(_state, "dtype", None)


@contextlib.contextmanager
def use_compute_dtype(dtype: Optional[str]):
    """Trace-time context: dense/attention matmuls compute in ``dtype``.

    ``dtype``: 'bfloat16' | 'float32' | None (None/float32 = unchanged).
    Enter around ``jax.jit`` tracing — the choice is baked into the
    compiled program.
    """
    resolved = None
    if dtype is not None and str(dtype) not in ("float32", "f32"):
        resolved = jnp.dtype(dtype)
    prev = getattr(_state, "dtype", None)
    _state.dtype = resolved
    try:
        yield
    finally:
        _state.dtype = prev


def table_dtype():
    """Active embedding-table STORAGE dtype (None = float32)."""
    return getattr(_state, "table_dtype", None)


@contextlib.contextmanager
def use_table_dtype(dtype: Optional[str]):
    """Trace/init-time context: embedding tables are STORED in ``dtype``.

    For the DENSE training path, which is genuinely HBM-bandwidth-bound
    (34–59% of the v5e roofline at 8M–30M rows — SPEED.md): bf16 rows
    halve table+m+v traffic, measured 32.45 → 21.70 ms/step at 30M rows
    (−33%; the residual is the f32 dense cotangent buffer).  Lookup
    outputs are cast to f32 at the module boundary so all interaction/loss
    math is unchanged; optimizer slots follow the param dtype under optax.

    The sparse touched-rows path keeps f32 storage (its fused kernels and
    bitwise-parity contract are f32; it is issue-rate-bound, not
    byte-bound, so bf16 would buy ~nothing there) — ``Pipeline.finalize``
    rejects the combination loudly.
    """
    resolved = None
    if dtype is not None and str(dtype) not in ("float32", "f32"):
        resolved = jnp.dtype(dtype)
    prev = getattr(_state, "table_dtype", None)
    _state.table_dtype = resolved
    try:
        yield
    finally:
        _state.table_dtype = prev


@contextlib.contextmanager
def use_torch_linear_init():
    """Trace/init-time context: :func:`Dense` layers initialize like
    ``torch.nn.Linear`` (kaiming-uniform a=√5 kernel → U(±1/√fan_in), and
    U(±1/√fan_in) bias) instead of flax's lecun-normal kernel + zero bias.

    Exists for the parity harness (PARITY.md): the DeepFM AUC delta was
    attributed to this init difference in r4; this context turns that
    attribution into a falsifiable matched-init experiment.  Param names and
    shapes are identical to a plain ``nn.Dense``, so checkpoints interop.
    """
    prev = getattr(_state, "torch_init", False)
    _state.torch_init = True
    try:
        yield
    finally:
        _state.torch_init = prev


class _TorchInitDense(nn.Module):
    """``nn.Dense`` twin with torch.nn.Linear's default initialization.

    Torch draws W ~ U(±1/√fan_in) (kaiming-uniform with a=√5) and
    b ~ U(±1/√fan_in); flax's bias initializer cannot see fan_in, so the
    whole layer is spelled out here.  Same param collection layout
    (``kernel`` (fan_in, features), ``bias`` (features,)) as ``nn.Dense``.
    """

    features: int
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        import jax

        fan_in = x.shape[-1]
        bound = float(fan_in) ** -0.5

        def unif(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        kernel = self.param("kernel", unif, (fan_in, self.features))
        bias = self.param("bias", unif, (self.features,)) if self.use_bias else None
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
            bias = bias.astype(self.dtype) if bias is not None else None
        y = x @ kernel
        return y + bias if bias is not None else y


def Dense(features: int, name: Optional[str] = None, use_bias: bool = True):
    """``nn.Dense`` honoring the active compute dtype (param names, and so
    checkpoint layout, are identical to a plain ``nn.Dense``).  Under
    :func:`use_torch_linear_init` the torch-matched twin is built instead."""
    if getattr(_state, "torch_init", False):
        return _TorchInitDense(features, name=name, use_bias=use_bias,
                               dtype=compute_dtype())
    return nn.Dense(
        features, name=name, use_bias=use_bias,
        dtype=compute_dtype(), param_dtype=jnp.float32,
    )


def mha_dtype():
    """``dtype=`` kwarg value for ``nn.MultiHeadDotProductAttention``."""
    return compute_dtype()


__all__ = ["Dense", "compute_dtype", "mha_dtype", "table_dtype",
           "use_compute_dtype", "use_table_dtype", "use_torch_linear_init"]
