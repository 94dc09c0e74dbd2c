"""Developer-status decorators.

Parity: ``/root/reference/torecsys/utils/decorator.py:9-66``.  The
reference ships four decorators: ``in_development`` plus three torch-JIT
compatibility markers (``no_jit_experimental``,
``no_jit_experimental_by_named_tensor``, ``jit_experimental``).  The JIT
trio is torch-specific surface — it warns that named tensors break
``torch.jit.script`` — and has no meaning here: every module in this
package is built to be traced under ``jax.jit`` (that is the whole
execution model), so the honest TPU analogue is a single marker for the
opposite, exceptional case.

* :func:`in_development` — warn at construction that a component's API or
  behavior may change (the reference applies it to DSIN,
  ``deep_session_interest_network.py:10``; here ``models/ctr/session.py``
  documents the same status).
* :func:`deprecated` — warn that a component is scheduled for removal,
  naming its replacement.
* :func:`not_jittable` — mark a HOST-side helper that must not be called
  inside a ``jax.jit`` trace (e.g. vocab growers that mutate Python state);
  raises under tracing instead of silently baking one vocabulary state into
  the compiled program.
"""

from __future__ import annotations

import functools
import warnings

import jax


def in_development(reason: str = ""):
    """Mark a class/function as in development: warns once per process on
    first use (reference ``decorator.py:9``)."""

    def deco(obj):
        msg = (f"{getattr(obj, '__name__', obj)!s} is in development; its "
               f"API/behavior may change. {reason}".strip())
        if isinstance(obj, type):
            orig_init = obj.__init__

            @functools.wraps(orig_init)
            def __init__(self, *a, **k):
                warnings.warn(msg, FutureWarning, stacklevel=2)
                orig_init(self, *a, **k)

            obj.__init__ = __init__
            return obj

        @functools.wraps(obj)
        def wrapper(*a, **k):
            warnings.warn(msg, FutureWarning, stacklevel=2)
            return obj(*a, **k)

        return wrapper

    return deco


def deprecated(replacement: str = ""):
    """Mark a callable as deprecated, pointing at its replacement."""

    def deco(obj):
        msg = (f"{getattr(obj, '__name__', obj)!s} is deprecated"
               + (f"; use {replacement} instead" if replacement else "")
               + ".")

        @functools.wraps(obj)
        def wrapper(*a, **k):
            warnings.warn(msg, DeprecationWarning, stacklevel=2)
            return obj(*a, **k)

        return wrapper

    return deco


def not_jittable(fn):
    """Raise if ``fn`` is called under a ``jax.jit`` trace.

    For host-side helpers with Python side effects (vocabulary growth, file
    IO): calling them during tracing would silently freeze one snapshot of
    the side-effected state into the compiled program.
    """

    @functools.wraps(fn)
    def wrapper(*a, **k):
        # Public-API trace detection (r4 ADVICE: jax._src symbols move
        # between releases).  `jax.core.trace_state_clean` is the public
        # re-export today; degrade to a Tracer check on the arguments if a
        # future JAX drops it, and to a no-op check as the last resort.
        try:
            in_trace = not jax.core.trace_state_clean()
        except AttributeError:
            in_trace = any(
                isinstance(x, jax.core.Tracer)
                for x in jax.tree_util.tree_leaves((a, k))
            )
        if in_trace:
            raise RuntimeError(
                f"{fn.__name__} is host-side only (mutates Python state) and "
                "was called inside a jax trace; call it before jit."
            )
        return fn(*a, **k)

    return wrapper


__all__ = ["deprecated", "in_development", "not_jittable"]
