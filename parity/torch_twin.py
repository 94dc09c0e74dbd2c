"""PyTorch twin of the reference algorithms, used as the parity oracle.

Why a twin and not /root/reference directly: the reference is written
against torch named tensors (``refine_names`` / ``sum(dim='N')`` /
``names=`` factory kwargs — e.g. ``models/ctr/factorization_machine.py:58``)
which **torch 2.13 removed**, so the reference package cannot execute in
this environment at all.  These twins re-express the same model math —
PyTorch modules, Adam, BCE — in ~15 lines each, giving the parity runs a
reference-framework oracle trained on identical data.

Math sources (paper + reference behavior documented in SURVEY.md §2.3/2.4):
  LR      models/ctr/logistic_regression.py:19-62
  FM      models/ctr/factorization_machine.py:10-71 (bias + Σfeat + FM layer)
  FFM     models/ctr/field_aware_factorization_machine.py:10-81
  DeepFM  models/ctr/deep_fm.py:10-110 (FM + first-order + DNN, summed)
  NFM     models/ctr/neural_factorization_machine.py:10-95
  DCN     models/ctr/deep_and_cross_network.py:10-98 (true DCN recurrence —
          the reference's detach at cross_network.py:65 is a quirk; parity is
          judged on intended math, SURVEY.md §7)
  xDeepFM models/ctr/xdeep_fm.py:10-124 (CIN split-half + DNN + first-order)
  NCF     models/ctr/neural_collaborative_filtering.py:10-85 (GMF ∥ MLP)
"""

from __future__ import annotations

from typing import Sequence

import torch
import torch.nn as nn


def _mlp(in_size: int, layer_sizes: Sequence[int], out_size: int = 1) -> nn.Sequential:
    layers, prev = [], in_size
    for h in layer_sizes:
        layers += [nn.Linear(prev, h), nn.ReLU()]
        prev = h
    layers.append(nn.Linear(prev, out_size))
    return nn.Sequential(*layers)


def fm_pairwise(emb: torch.Tensor) -> torch.Tensor:
    """0.5·((Σv)² − Σv²) over the field dim: (B, N, E) → (B, E)."""
    s = emb.sum(dim=1)
    return 0.5 * (s * s - (emb * emb).sum(dim=1))


class LR(nn.Module):
    def __init__(self, inputs_size: int):
        super().__init__()
        self.linear = nn.Linear(inputs_size, 1)

    def forward(self, feat):  # (B, N, 1)
        return self.linear(feat.flatten(1))


class FM(nn.Module):
    def __init__(self):
        super().__init__()
        self.bias = nn.Parameter(torch.zeros(1, 1))

    def forward(self, feat, emb):
        first = feat.sum(dim=1)                       # (B, 1)
        second = fm_pairwise(emb).sum(dim=1, keepdim=True)
        return first + second + self.bias


class FFM(nn.Module):
    """Pairwise e_{i,fj} ⊙ e_{j,fi} interactions summed, + first order."""

    def __init__(self, num_fields: int):
        super().__init__()
        self.n = num_fields
        self.bias = nn.Parameter(torch.zeros(1, 1))

    def forward(self, feat, field_emb):  # field_emb: (B, N*N, E)
        b = field_emb.shape[0]
        e = field_emb.reshape(b, self.n, self.n, -1)  # [i][j] = field j in table i
        pair = 0.0
        for i in range(self.n - 1):
            for j in range(i + 1, self.n):
                pair = pair + (e[:, j, i, :] * e[:, i, j, :]).sum(dim=1)
        return feat.sum(dim=1) + pair.unsqueeze(-1) + self.bias


class DeepFM(nn.Module):
    def __init__(self, embed_size: int, num_fields: int, deep_layer_sizes):
        super().__init__()
        self.deep = _mlp(embed_size * num_fields, deep_layer_sizes)

    def forward(self, feat, emb):
        first = feat.sum(dim=1)
        second = fm_pairwise(emb).sum(dim=1, keepdim=True)
        deep = self.deep(emb.flatten(1))
        return first + second + deep


class NFM(nn.Module):
    def __init__(self, embed_size: int, deep_layer_sizes):
        super().__init__()
        self.deep = _mlp(embed_size, deep_layer_sizes)
        self.bias = nn.Parameter(torch.zeros(1, 1))

    def forward(self, feat, emb):
        first = feat.sum(dim=1)
        bi = fm_pairwise(emb)                          # (B, E)
        return first + self.deep(bi) + self.bias


class DCN(nn.Module):
    def __init__(self, inputs_size: int, num_fields: int, deep_output_size: int,
                 deep_layer_sizes, cross_num_layers: int):
        super().__init__()
        d = inputs_size * num_fields
        self.cross_w = nn.ParameterList(
            [nn.Parameter(torch.randn(d) * 0.01) for _ in range(cross_num_layers)]
        )
        self.cross_b = nn.ParameterList(
            [nn.Parameter(torch.zeros(d)) for _ in range(cross_num_layers)]
        )
        self.deep = _mlp(d, deep_layer_sizes, deep_output_size)
        self.out = nn.Linear(d + deep_output_size, 1)

    def forward(self, emb):  # (B, N, E)
        x0 = emb.flatten(1)
        x = x0
        for w, b in zip(self.cross_w, self.cross_b):
            x = x0 * (x @ w).unsqueeze(-1) + b + x     # x_{k+1} = x0·(w'x) + b + x
        deep = self.deep(x0)
        return self.out(torch.cat([x, deep], dim=1))


class CIN(nn.Module):
    """Compressed interaction network, split-half variant: each hidden
    layer's first half goes to the output pool, second half feeds forward
    (the last layer contributes entirely to the output)."""

    def __init__(self, num_fields: int, embed_size: int, layer_sizes,
                 use_batchnorm: bool = True):
        super().__init__()
        self.convs = nn.ModuleList()
        self.bns = nn.ModuleList()
        self._out_halves = []
        prev, self.out_size = num_fields, 0
        for i, h in enumerate(layer_sizes):
            self.convs.append(nn.Conv1d(num_fields * prev, h, 1))
            # reference default cin_use_batchnorm=True
            self.bns.append(nn.BatchNorm1d(h) if use_batchnorm else nn.Identity())
            out_half = h if i == len(layer_sizes) - 1 else h // 2
            self._out_halves.append(out_half)
            self.out_size += out_half
            prev = h - out_half

    def forward(self, x0):  # (B, N, E)
        b, n, e = x0.shape
        h = x0
        outs = []
        for conv, bn, out_half in zip(self.convs, self.bns, self._out_halves):
            inter = torch.einsum("bne,bme->bnme", x0, h).reshape(b, -1, e)
            z = torch.relu(bn(conv(inter)))             # (B, H, E)
            outs.append(z[:, :out_half])
            h = z[:, out_half:]
        return torch.cat(outs, dim=1).sum(dim=2)        # (B, out_size)


class XDeepFM(nn.Module):
    def __init__(self, embed_size: int, num_fields: int, cin_layer_sizes,
                 deep_layer_sizes, use_batchnorm: bool = True):
        super().__init__()
        self.cin = CIN(num_fields, embed_size, cin_layer_sizes, use_batchnorm)
        self.cin_out = nn.Linear(self.cin.out_size, 1)
        self.deep = _mlp(embed_size * num_fields, deep_layer_sizes)
        self.bias = nn.Parameter(torch.zeros(1, 1))

    def forward(self, feat, emb):
        first = feat.sum(dim=1)
        return (first + self.cin_out(self.cin(emb)) + self.deep(emb.flatten(1))
                + self.bias)


class NCF(nn.Module):
    def __init__(self, embed_size: int, deep_layer_sizes):
        super().__init__()
        self.deep = _mlp(2 * embed_size, deep_layer_sizes)

    def forward(self, emb):  # (B, 2, E)
        gmf = (emb[:, 0] * emb[:, 1]).sum(dim=1, keepdim=True)
        return gmf + self.deep(emb.flatten(1))
