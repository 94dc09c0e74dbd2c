"""Row-wise datasets over pandas / numpy containers.

Parity: ``/root/reference/torecsys/data/dataset/dataset.py``:
* :class:`DataFrameToDataset` — ``:12-59``
* :class:`NdarrayToDataset`   — ``:62-98``

These are plain indexable containers (no torch dependency): ``__getitem__``
returns a ``{column: value}`` dict row, ``__len__`` the row count — exactly
what :class:`torecsys_tpu.data.DataLoader` batches and
:class:`torecsys_tpu.data.CollateFunction` turns into fixed-shape arrays.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np


class DataFrameToDataset:
    """Dataset over a ``pandas.DataFrame``: row i → ``{col: value}``."""

    def __init__(self, dataframe, columns: Optional[Sequence[str]] = None):
        self.df = dataframe
        self.columns = list(columns) if columns is not None else list(dataframe.columns)

    def __len__(self) -> int:
        return len(self.df)

    def __getitem__(self, idx: int) -> Dict[str, object]:
        row = self.df.iloc[idx]
        return {c: row[c] for c in self.columns}


class NdarrayToDataset:
    """Dataset over a 2-D ``np.ndarray``: row i → ``{str(col_idx): value}``.

    Column names default to stringified column indices (matching the
    reference's positional access, ``dataset.py:62-98``); pass ``columns`` to
    name them.
    """

    def __init__(self, array: np.ndarray, columns: Optional[Sequence[str]] = None):
        array = np.asarray(array)
        if array.ndim != 2:
            raise ValueError(f"expected 2-D array, got {array.shape}")
        self.array = array
        self.columns = (
            list(columns) if columns is not None else [str(i) for i in range(array.shape[1])]
        )

    def __len__(self) -> int:
        return self.array.shape[0]

    def __getitem__(self, idx: int) -> Dict[str, object]:
        return {c: self.array[idx, j] for j, c in enumerate(self.columns)}
