"""Load the reference package (/root/reference, PyTorch) as a parity oracle.

BASELINE.md's protocol is "run each config, record AUC/logloss as parity
targets".  The build environment has **no network egress**, so the real
Criteo/MovieLens downloads are impossible; the strongest executable parity
evidence available is to train the *reference's own model implementations*
(black-box, unmodified) and ours on an identical bundled dataset and compare
metrics.  This module imports the reference with lightweight stubs for its
heavy, train-loop-only dependencies (pytorch-lightning / torchvision /
pytorch-metric-learning / torchmetrics / texttable) — none of which affect
the model math being compared — and provides a minimal torch train loop.

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
        mod = types.ModuleType(name)
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

    import torecsys as ref  # noqa: E402

    return ref


def train_reference_model(
    model: torch.nn.Module,
    feat: np.ndarray,      # (R, N, 1) first-order values
    emb_ids: np.ndarray,   # (R, N) offset ids into one fused vocab
    labels: np.ndarray,    # (R,)
    vocab: int,
    embed_size: int,
    train_rows: int,
    field_aware: bool = False,
    batch_size: int = 1024,
    epochs: int = 3,
    lr: float = 1e-3,
    seed: int = 0,
    needs_feat: bool = True,
):
    """Minimal Adam/BCE loop around a reference model (the role Lightning
    played), returning (val_auc, val_logloss) on the held-out tail.

    The embedding front-end mirrors the reference's ``MultiIndicesEmbedding``
    (one fused table, ids pre-offset) / ``MultiIndicesFieldAwareEmbedding``
    (N tables) so the comparison isolates the model math.
    """
    torch.manual_seed(seed)
    n_fields = emb_ids.shape[1]
    if field_aware:
        tables = torch.nn.ModuleList(
            [torch.nn.Embedding(vocab, embed_size) for _ in range(n_fields)]
        )
        for t in tables:
            torch.nn.init.xavier_uniform_(t.weight)
        params = list(tables.parameters()) + list(model.parameters())
    else:
        table = torch.nn.Embedding(vocab, embed_size)
        torch.nn.init.normal_(table.weight, std=0.01)
        params = list(table.parameters()) + list(model.parameters())
    opt = torch.optim.Adam(params, lr=lr)
    lossf = torch.nn.BCEWithLogitsLoss()

    ids_t = torch.from_numpy(emb_ids.astype(np.int64))
    feat_t = torch.from_numpy(feat.astype(np.float32))
    y_t = torch.from_numpy(labels.astype(np.float32))

    def model_inputs(sl):
        f = feat_t[sl].refine_names("B", "N", "E")
        if field_aware:
            embs = torch.cat([t(ids_t[sl]) for t in tables], dim=1)
            e = embs.refine_names("B", "N", "E")
            kwargs = {"field_emb_inputs": e}
        else:
            e = table(ids_t[sl]).refine_names("B", "N", "E")
            kwargs = {"emb_inputs": e}
        if needs_feat:
            kwargs["feat_inputs"] = f
        return kwargs

    model.train()
    for _ in range(epochs):
        perm = torch.randperm(train_rows)
        for s in range(0, train_rows - batch_size + 1, batch_size):
            sl = perm[s:s + batch_size]
            opt.zero_grad()
            out = model(**model_inputs(sl)).rename(None).reshape(-1)
            loss = lossf(out, y_t[sl])
            loss.backward()
            opt.step()

    model.eval()
    scores = []
    with torch.no_grad():
        for s in range(train_rows, len(y_t), batch_size):
            sl = torch.arange(s, min(s + batch_size, len(y_t)))
            out = model(**model_inputs(sl)).rename(None).reshape(-1)
            scores.append(torch.sigmoid(out).numpy())
    scores = np.concatenate(scores)
    y_val = labels[train_rows:train_rows + len(scores)].astype(np.float64)
    p = np.clip(scores.astype(np.float64), 1e-7, 1 - 1e-7)
    logloss = float(-(y_val * np.log(p) + (1 - y_val) * np.log(1 - p)).mean())
    # exact AUC via rank statistic
    order = np.argsort(p, kind="mergesort")
    ranks = np.empty_like(order, dtype=np.float64)
    ranks[order] = np.arange(1, len(p) + 1)
    npos = y_val.sum()
    nneg = len(y_val) - npos
    auc = float((ranks[y_val == 1].sum() - npos * (npos + 1) / 2) / (npos * nneg))
    return auc, logloss
