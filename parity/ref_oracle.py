"""Load the reference package (/root/reference, PyTorch) as a parity oracle.

BASELINE.md's protocol is "run each config, record AUC/logloss as parity
targets".  The build environment has **no network egress**, so the real
Criteo/MovieLens downloads are impossible; the strongest executable parity
evidence available is to train the *reference's own model implementations*
(black-box, unmodified) and ours on an identical bundled dataset and compare
metrics.  ``load_reference`` imports the reference with lightweight stubs
for its train-loop-only dependencies (pytorch-lightning / torchvision /
pytorch-metric-learning / torchmetrics / texttable); NOTE the reference's
*model code* still cannot execute on torch 2.13 (named tensors removed), so
the parity oracle models live in parity/torch_twin.py — this module supplies
the shared train/eval loop, metrics, and embedding front-ends.

Nothing here is shipped in the torecsys_tpu package; it is a measurement
harness only.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import torch

REFERENCE_PATH = "/root/reference"


def _stub(name: str) -> types.ModuleType:
    mod = sys.modules.get(name)
    if mod is None:
        import importlib.machinery

        mod = types.ModuleType(name)
        # torch._dynamo walks sys.modules and calls find_spec on them; a
        # None __spec__ raises there, so give stubs a real (loaderless) spec.
        mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
        sys.modules[name] = mod
    return mod


def load_reference():
    """Import and return the reference ``torecsys`` package (stubbed deps)."""
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)

    class _Texttable:
        BORDER, HEADER, HLINES, VLINES = 1, 2, 4, 8

        def __init__(self, *a, **k):
            pass

        def __getattr__(self, _):
            return lambda *a, **k: self

    pl = _stub("pytorch_lightning")
    pl.LightningModule = torch.nn.Module
    pl.Trainer = object
    pl.Callback = object
    pl_cb = _stub("pytorch_lightning.callbacks")
    pl_cb.Callback = object
    pl.callbacks = pl_cb

    pml = _stub("pytorch_metric_learning")
    pml_miners = _stub("pytorch_metric_learning.miners")
    pml_miners.BaseMiner = object
    pml.miners = pml_miners

    _stub("torchmetrics").Metric = torch.nn.Module
    _stub("texttable").Texttable = _Texttable
    tv = _stub("torchvision")
    tv.models = _stub("torchvision.models")
    tv.transforms = _stub("torchvision.transforms")
    tv.transforms.ToTensor = object
    _stub("nt")  # reference's data/sample_data/__init__.py:5 Windows-only bug
    _stub("tqdm").tqdm = lambda x, **k: x
    _stub("sklearn")
    _stub("sklearn.metrics").mean_squared_error = lambda *a, **k: 0.0
    sys.modules["sklearn"].metrics = sys.modules["sklearn.metrics"]

    import torecsys as ref  # noqa: E402

    return ref


def exact_auc_logloss(scores: np.ndarray, y: np.ndarray):
    """Exact AUC (rank statistic) + logloss for probability scores."""
    y = y.astype(np.float64)
    p = np.clip(scores.astype(np.float64), 1e-7, 1 - 1e-7)
    logloss = float(-(y * np.log(p) + (1 - y) * np.log(1 - p)).mean())
    order = np.argsort(p, kind="mergesort")
    ranks = np.empty_like(order, dtype=np.float64)
    ranks[order] = np.arange(1, len(p) + 1)
    npos = y.sum()
    nneg = len(y) - npos
    auc = float((ranks[y == 1].sum() - npos * (npos + 1) / 2) / (npos * nneg))
    return auc, logloss


def train_and_eval_reference(
    model: torch.nn.Module,
    build_inputs,                 # (index LongTensor,) -> model kwargs dict
    labels: np.ndarray,           # (R,)
    train_rows: int,
    extra_params=(),              # embedding tables etc. to optimize too
    batch_size: int = 1024,
    epochs: int = 3,
    lr: float = 1e-3,
    seed: int = 0,
):
    """Minimal Adam/BCE loop around a reference model (the role Lightning
    played in the reference), returning (val_auc, val_logloss) on the
    held-out tail rows.  ``build_inputs`` owns the embedding front-end so
    each config mirrors its reference input wiring exactly.
    """
    torch.manual_seed(seed)
    params = list(model.parameters()) + [p for m in extra_params for p in m.parameters()]
    opt = torch.optim.Adam(params, lr=lr)
    lossf = torch.nn.BCEWithLogitsLoss()
    y_t = torch.from_numpy(labels.astype(np.float32))

    model.train()
    gen = torch.Generator().manual_seed(seed)
    for _ in range(epochs):
        perm = torch.randperm(train_rows, generator=gen)
        for s in range(0, train_rows - batch_size + 1, batch_size):
            sl = perm[s:s + batch_size]
            opt.zero_grad()
            out = model(**build_inputs(sl)).reshape(-1)
            loss = lossf(out, y_t[sl])
            loss.backward()
            opt.step()

    model.eval()
    scores = []
    with torch.no_grad():
        for s in range(train_rows, len(y_t), batch_size):
            sl = torch.arange(s, min(s + batch_size, len(y_t)))
            out = model(**build_inputs(sl)).reshape(-1)
            scores.append(torch.sigmoid(out).numpy())
    scores = np.concatenate(scores)
    y_val = labels[train_rows:train_rows + len(scores)]
    return exact_auc_logloss(scores, y_val)


def fused_feat_table(vocab: int, seed: int = 0) -> torch.nn.Embedding:
    """1-dim first-order weight table (the reference's feat-inputs idiom)."""
    torch.manual_seed(seed + 1)
    t = torch.nn.Embedding(vocab, 1)
    torch.nn.init.normal_(t.weight, std=0.01)
    return t


def fused_emb_table(vocab: int, embed_size: int, seed: int = 0) -> torch.nn.Embedding:
    """Fused embedding table matching ``MultiIndicesEmbedding``'s init."""
    torch.manual_seed(seed + 2)
    t = torch.nn.Embedding(vocab, embed_size)
    torch.nn.init.normal_(t.weight, std=0.01)
    return t


def field_aware_tables(vocab: int, embed_size: int, n_fields: int, seed: int = 0):
    """N xavier-init tables matching ``MultiIndicesFieldAwareEmbedding``."""
    torch.manual_seed(seed + 3)
    tables = torch.nn.ModuleList(
        [torch.nn.Embedding(vocab, embed_size) for _ in range(n_fields)]
    )
    for t in tables:
        torch.nn.init.xavier_uniform_(t.weight)
    return tables
