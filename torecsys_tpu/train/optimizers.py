"""Optimizer registry: name → optax transform.

Parity: the reference resolves optimizers via ``getattr(torch.optim, name)``
(``trainer/torecsys_pipeline.py:542``); here torch-style names map onto optax
equivalents (plus optax-native lowercase names), so reference configs like
``{"method": "AdamW", "lr": 1e-3}`` port verbatim.
"""

from __future__ import annotations

from typing import Any, Dict

import optax

_TORCH_TO_OPTAX = {
    "adadelta": optax.adadelta,
    "adagrad": optax.adagrad,
    "adam": optax.adam,
    "adamw": optax.adamw,
    "adamax": optax.adamax,
    "lamb": optax.lamb,
    "lars": optax.lars,
    "lion": optax.lion,
    "nadam": optax.nadam,
    "radam": optax.radam,
    "rmsprop": optax.rmsprop,
    "sgd": optax.sgd,
}


def get_optimizer(name: str = "Adam", lr: float = 1e-3, **kwargs: Any) -> optax.GradientTransformation:
    """Build an optax optimizer from a (torch-style or optax) name.

    ``lr`` may also be passed as ``learning_rate`` in kwargs.
    """
    lr = kwargs.pop("learning_rate", lr)
    key = name.lower()
    if key not in _TORCH_TO_OPTAX:
        factory = getattr(optax, key, None)
        if factory is None:
            raise KeyError(
                f"unknown optimizer {name!r}; available: {sorted(_TORCH_TO_OPTAX)}"
            )
    else:
        factory = _TORCH_TO_OPTAX[key]
    return factory(learning_rate=lr, **kwargs)


def available_optimizers() -> Dict[str, Any]:
    return dict(_TORCH_TO_OPTAX)
