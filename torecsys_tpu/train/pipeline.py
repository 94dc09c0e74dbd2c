"""Training pipeline: builder-pattern configuration of inputs / model /
criterion / optimizer / miner / regularizer per objective.

Parity: ``/root/reference/torecsys/trainer/torecsys_pipeline.py:20-929`` — the
``TorecsysPipeline`` builder setters (``set_objective:75``, ``set_inputs:131``,
``set_model:174``, ``set_sequential:225``, ``set_regularizer:287``,
``set_miner:344``, ``set_miner_target_field:400``, ``set_criterion:459``,
``set_optimizer:523``, ``set_target_fields:600``), the three objectives
(``ctr`` / ``emb`` / ``ltr``, ``:27-35``), ``build(**config):877`` and
``summary():828``.

Quirk fixed per SURVEY.md §7: the reference hard-codes Adam 1e-3 in
``configure_optimizers:562`` regardless of ``set_optimizer``; here the
configured optimizer is the one used.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Sequence

import flax.linen as nn

from torecsys_tpu.inputs import Inputs
from torecsys_tpu.layers.regularization import Regularizer
from torecsys_tpu.losses import BCEWithLogitsLoss, get_loss
from torecsys_tpu.miners import BaseMiner, get_miner
from torecsys_tpu.models import Sequential, get_model
from torecsys_tpu.train.optimizers import get_optimizer

OBJECTIVES = ("ctr", "emb", "ltr")


@dataclasses.dataclass
class Pipeline:
    """Mutable builder collecting every component of a training run.

    Use the ``set_*`` chainable setters or :meth:`build` from a JSON-style
    config; :class:`torecsys_tpu.train.Trainer` consumes the finished object.
    """

    objective: str = "ctr"
    inputs: Optional[Inputs] = None
    model: Optional[nn.Module] = None
    sequential: Optional[Sequential] = None
    criterion: Optional[Callable] = None
    optimizer: Any = None
    regularizer: Optional[Regularizer] = None
    miner: Optional[BaseMiner] = None
    miner_target_field: Optional[str] = None
    target_fields: str = "label"
    num_negs: int = 1
    # Sparse (touched-rows-only) embedding updates — see torecsys_tpu.ops.sparse.
    # None = auto: on for the 'ctr' objective when the optimizer (by name) has
    # a lazy row-wise formulation (Adam/AdamW/Adagrad/SGD); True forces it
    # (raises if unsupported); False forces the dense optax path.
    sparse_embeddings: Optional[bool] = None
    optimizer_spec: Optional[Dict[str, Any]] = None
    # Checkpoint to restore before training (the reference's ``load_from``
    # config key, ``torecsys_pipeline.py:897-898`` — planned there, dead
    # there, honored here by Trainer._maybe_restore).
    load_from: Optional[str] = None
    # Mixed-precision compute for the dense towers/attention
    # (layers/precision.py): None/'float32' = full f32 (reference
    # semantics); 'bfloat16' = MXU-native tower matmuls with f32 params and
    # f32 loss.  Convergence-guarded in tests/test_convergence.py.
    compute_dtype: Optional[str] = None
    table_dtype: Optional[str] = None

    # ---- builder setters (each returns self for chaining) ---------------

    def set_objective(self, objective: str) -> "Pipeline":
        if objective not in OBJECTIVES:
            raise ValueError(f"objective must be one of {OBJECTIVES}, got {objective!r}")
        self.objective = objective
        return self

    def set_inputs(self, inputs: Inputs) -> "Pipeline":
        self.inputs = inputs
        self._refresh_sequential()
        return self

    def set_model(self, model, **kwargs) -> "Pipeline":
        self.model = get_model(model, **kwargs)
        self._refresh_sequential()
        return self

    def set_sequential(self, inputs: Inputs, model) -> "Pipeline":
        self.inputs = inputs
        self.model = get_model(model)
        self._refresh_sequential()
        return self

    def set_regularizer(self, regularizer: Optional[Regularizer] = None, **kwargs) -> "Pipeline":
        self.regularizer = regularizer if regularizer is not None else Regularizer(**kwargs)
        return self

    def set_miner(self, miner, **kwargs) -> "Pipeline":
        self.miner = get_miner(miner, **kwargs)
        if hasattr(self.miner, "num_negs"):
            self.num_negs = self.miner.num_negs
        return self

    def set_miner_target_field(self, field: str) -> "Pipeline":
        self.miner_target_field = field
        return self

    def set_criterion(self, criterion, **kwargs) -> "Pipeline":
        self.criterion = get_loss(criterion, **kwargs)
        return self

    def set_optimizer(self, optimizer="Adam", **kwargs) -> "Pipeline":
        if isinstance(optimizer, str):
            self.optimizer = get_optimizer(optimizer, **kwargs)
            self.optimizer_spec = {"method": optimizer, **kwargs}
        else:
            self.optimizer = optimizer
            self.optimizer_spec = None  # opaque transform: no row-wise twin
        return self

    def set_sparse_embeddings(self, enabled: Optional[bool]) -> "Pipeline":
        self.sparse_embeddings = enabled
        return self

    def set_compute_dtype(self, dtype: Optional[str]) -> "Pipeline":
        """'bfloat16' runs dense-tower/attention matmuls in bf16 (f32
        params, f32 loss); None/'float32' keeps full f32."""
        self.compute_dtype = dtype
        return self

    def set_table_dtype(self, dtype: Optional[str]) -> "Pipeline":
        """Embedding-table STORAGE dtype ('bfloat16' | None/'float32').

        bf16 rows halve table + optimizer-slot HBM traffic and memory on
        the DENSE training path, which is bandwidth-bound (measured v5e:
        32.45 → 21.70 ms/step at 30M rows, SPEED.md); lookup outputs are
        cast to f32 at the module boundary so model/loss math is
        unchanged.  Incompatible with the sparse touched-rows path (f32
        kernel contract; issue-rate-bound anyway) — setting this keeps
        the pipeline on the dense path, and combining it with
        ``set_sparse_embeddings(True)`` fails loudly in ``finalize``.
        """
        self.table_dtype = dtype
        return self

    def row_optimizer(self):
        """Row-wise (lazy) optimizer for embedding tables, or None.

        None disables the sparse path and the train step falls back to dense
        optax updates over the full tables (the reference's semantics,
        ``torch.optim.Adam`` over ``nn.Embedding`` weights).
        """
        from torecsys_tpu.ops.sparse import get_row_optimizer

        if self.sparse_embeddings is False:
            return None
        if (
            self.table_dtype is not None
            and str(self.table_dtype) not in ("float32", "f32")
        ):
            # bf16 table storage is a dense-path feature (finalize rejects
            # the explicit-sparse combination; in auto mode the explicit
            # dtype choice wins)
            return None
        if self.objective != "ctr":
            if self.sparse_embeddings is True:
                raise ValueError(
                    "sparse_embeddings=True requires objective='ctr' "
                    f"(got {self.objective!r})"
                )
            return None
        if self.optimizer_spec is None:
            if self.sparse_embeddings is True:
                raise ValueError(
                    "sparse_embeddings=True requires a named optimizer "
                    "(set_optimizer('Adam', ...)), not an opaque transform"
                )
            return None
        spec = dict(self.optimizer_spec)
        row = get_row_optimizer(spec.pop("method", "Adam"), **spec)
        if row is None and self.sparse_embeddings is True:
            raise ValueError(
                f"optimizer {self.optimizer_spec!r} has no row-wise (lazy) "
                "formulation; supported: Adam, AdamW, Adagrad, SGD(plain)"
            )
        return row

    def set_target_fields(self, fields: str) -> "Pipeline":
        self.target_fields = fields
        return self

    # ---- assembly -------------------------------------------------------

    def _refresh_sequential(self) -> None:
        if self.inputs is not None and self.model is not None:
            self.sequential = Sequential(inputs=self.inputs, model=self.model)

    def finalize(self) -> "Pipeline":
        """Fill defaults and validate completeness (the reference's
        ``ModelValidationCallback.on_fit_start`` role,
        ``trainer/callbacks/model_validation.py:15``)."""
        if self.sequential is None:
            self._refresh_sequential()
        if self.sequential is None:
            raise ValueError("pipeline incomplete: set_inputs and set_model are required")
        if self.criterion is None:
            self.criterion = BCEWithLogitsLoss()
        if self.optimizer is None:
            self.optimizer = get_optimizer("Adam", lr=1e-3)
            self.optimizer_spec = {"method": "Adam", "lr": 1e-3}
        if self.objective in ("ltr", "emb"):
            if self.miner is None:
                self.miner = get_miner("UniformBatchMiner")
                self.num_negs = self.miner.num_negs
            if self.miner_target_field is None:
                raise ValueError(f"objective {self.objective!r} requires set_miner_target_field")
        if (
            self.table_dtype is not None
            and str(self.table_dtype) not in ("float32", "f32")
            and self.sparse_embeddings
        ):
            raise ValueError(
                f"table_dtype={self.table_dtype!r} requires the dense "
                "embedding path: the sparse touched-rows kernels store f32 "
                "rows (bitwise-parity contract) and the sparse path is "
                "issue-rate-bound, not byte-bound — bf16 storage buys it "
                "nothing.  Unset sparse_embeddings or table_dtype."
            )
        return self

    def summary(self) -> str:
        """Human-readable component table (reference ``summary():828``)."""
        rows = [
            ("objective", self.objective),
            ("inputs", type(self.inputs).__name__ if self.inputs else "-"),
            ("model", type(self.model).__name__ if self.model else "-"),
            ("criterion", type(self.criterion).__name__ if self.criterion else "-"),
            ("optimizer", "set" if self.optimizer is not None else "-"),
            ("regularizer", repr(self.regularizer) if self.regularizer else "-"),
            ("miner", type(self.miner).__name__ if self.miner else "-"),
            ("miner_target_field", self.miner_target_field or "-"),
            ("target_fields", self.target_fields),
            ("sparse_embeddings", {None: "auto", True: "on",
                                   False: "off"}[self.sparse_embeddings]),
            ("compute_dtype", self.compute_dtype or "float32"),
            ("table_dtype", self.table_dtype or "float32"),
        ]
        width = max(len(k) for k, _ in rows)
        return "\n".join(f"{k:{width}s} : {v}" for k, v in rows)

    # ---- config entry point --------------------------------------------

    @classmethod
    def build(cls, **config) -> "Pipeline":
        """Assemble a pipeline from a JSON-style config dict.

        Mirrors ``TorecsysPipeline.build`` (``torecsys_pipeline.py:877-928``):
        sub-configs are ``{"method": <registry name>, ...kwargs}`` dicts::

            Pipeline.build(
                objective='ctr',
                inputs_config=inputs_instance_or_none,
                model_config={'method': 'DeepFM', 'deep_layer_sizes': [64, 64]},
                criterion_config={'method': 'BCEWithLogitsLoss'},
                optimizer_config={'method': 'Adam', 'lr': 1e-3},
                regularizer_config={'weight_decay': 0.01},
                target_fields='label',
            )
        """
        p = cls()
        p.set_objective(config.get("objective", "ctr"))
        if config.get("inputs_config") is not None:
            p.set_inputs(config["inputs_config"])
        if config.get("model_config") is not None:
            mc = dict(config["model_config"])
            p.set_model(mc.pop("method"), **mc)
        if config.get("criterion_config") is not None:
            cc = dict(config["criterion_config"])
            p.set_criterion(cc.pop("method"), **cc)
        if config.get("optimizer_config") is not None:
            oc = dict(config["optimizer_config"])
            p.set_optimizer(oc.pop("method", "Adam"), **oc)
        if config.get("regularizer_config") is not None:
            p.set_regularizer(**config["regularizer_config"])
        if config.get("miner_config") is not None:
            mc = dict(config["miner_config"])
            p.set_miner(mc.pop("method", "UniformBatchMiner"), **mc)
        if config.get("miner_target_field") is not None:
            p.set_miner_target_field(config["miner_target_field"])
        if config.get("target_fields") is not None:
            p.set_target_fields(config["target_fields"])
        if "sparse_embeddings" in config:
            p.set_sparse_embeddings(config["sparse_embeddings"])
        if config.get("compute_dtype") is not None:
            p.set_compute_dtype(config["compute_dtype"])
        if config.get("table_dtype") is not None:
            p.set_table_dtype(config["table_dtype"])
        if config.get("load_from") is not None:
            p.load_from = config["load_from"]
        return p
