"""Sample datasets: downloads, CSV loaders, and a bundled synthetic CTR
generator.

Parity: ``/root/reference/torecsys/data/sample_data/``:
* ``download_data.py`` — HTTP download + unzip of MovieLens (6 sizes),
  Criteo DAC, Book-Crossing, Jester (``request_download:25``,
  ``download_ml_data:72``, ``download_criteo_data:107``,
  ``download_bx_data:134``, ``download_jester_data:164``).  (The reference's
  ``import nt`` bug at ``sample_data/__init__.py:5`` — Windows-only — is not
  reproduced.)
* ``load_data.py`` — CSV → DataFrames (``load_ml_data:14``,
  ``load_criteo_data:66``, ``load_bx_data:97``).

Additions: :func:`make_synthetic_ctr` — a deterministic synthetic CTR dataset
with planted feature interactions so convergence tests and benchmarks run
without any network access (SURVEY.md §6 measurement protocol).
"""

from __future__ import annotations

import logging
import os
import zipfile
from typing import Dict, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

ML_URLS = {
    "20m": "https://files.grouplens.org/datasets/movielens/ml-20m.zip",
    "latest-small": "https://files.grouplens.org/datasets/movielens/ml-latest-small.zip",
    "latest": "https://files.grouplens.org/datasets/movielens/ml-latest.zip",
    "100k": "https://files.grouplens.org/datasets/movielens/ml-100k.zip",
    "1m": "https://files.grouplens.org/datasets/movielens/ml-1m.zip",
    "10m": "https://files.grouplens.org/datasets/movielens/ml-10m.zip",
}
CRITEO_URL = "https://go.criteo.net/criteo-research-kaggle-display-advertising-challenge-dataset.tar.gz"
BX_URL = "http://www2.informatik.uni-freiburg.de/~cziegler/BX/BX-CSV-Dump.zip"
JESTER_URLS = [
    "https://goldberg.berkeley.edu/jester-data/jester-data-1.zip",
    "https://goldberg.berkeley.edu/jester-data/jester-data-2.zip",
    "https://goldberg.berkeley.edu/jester-data/jester-data-3.zip",
]

CRITEO_COLUMNS = (
    ["label"]
    + [f"I{i}" for i in range(1, 14)]
    + [f"C{i}" for i in range(1, 27)]
)


def request_download(url: str, dest_dir: str, unzip: bool = True) -> str:
    """Download ``url`` into ``dest_dir`` (and unzip .zip archives).

    Reference: ``download_data.py:25-69``.  Requires network access —
    raises a clear RuntimeError when the fetch fails so offline use falls
    back to :func:`make_synthetic_ctr`.
    """
    try:
        import requests
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("request_download requires the 'requests' package") from e

    os.makedirs(dest_dir, exist_ok=True)
    fname = os.path.join(dest_dir, url.rsplit("/", 1)[-1])
    if not os.path.exists(fname):
        logger.info("downloading %s -> %s", url, fname)
        try:
            with requests.get(url, stream=True, timeout=60) as r:
                r.raise_for_status()
                with open(fname, "wb") as f:
                    for chunk in r.iter_content(chunk_size=1 << 20):
                        f.write(chunk)
        except Exception as e:
            raise RuntimeError(f"download of {url} failed: {e}") from e
    if unzip and fname.endswith(".zip"):
        with zipfile.ZipFile(fname) as z:
            z.extractall(dest_dir)
    return fname


def download_ml_data(size: str = "100k", directory: str = "./data") -> str:
    """MovieLens download (reference ``download_data.py:72-104``)."""
    if size not in ML_URLS:
        raise ValueError(f"unknown MovieLens size {size!r}; choose from {sorted(ML_URLS)}")
    return request_download(ML_URLS[size], directory)


def download_criteo_data(directory: str = "./data") -> str:
    """Criteo DAC download (reference ``download_data.py:107-131``)."""
    return request_download(CRITEO_URL, directory, unzip=False)


def download_bx_data(directory: str = "./data") -> str:
    """Book-Crossing download (reference ``download_data.py:134-161``)."""
    return request_download(BX_URL, directory)


def download_jester_data(directory: str = "./data") -> list:
    """Jester download (reference ``download_data.py:164-191``)."""
    return [request_download(u, directory) for u in JESTER_URLS]


def load_ml_data(directory: str, size: str = "100k"):
    """MovieLens ratings → DataFrame (reference ``load_data.py:14-63``)."""
    import pandas as pd

    if size == "100k":
        path = os.path.join(directory, "ml-100k", "u.data")
        return pd.read_csv(
            path, sep="\t", names=["user_id", "item_id", "rating", "timestamp"]
        )
    if size == "1m":
        path = os.path.join(directory, "ml-1m", "ratings.dat")
        return pd.read_csv(
            path, sep="::", engine="python",
            names=["user_id", "item_id", "rating", "timestamp"],
        )
    path = os.path.join(directory, f"ml-{size}", "ratings.csv")
    return pd.read_csv(path)


def load_criteo_data(path: str, nrows: Optional[int] = None):
    """Criteo DAC 39-column TSV → DataFrame (reference ``load_data.py:66-94``)."""
    import pandas as pd

    return pd.read_csv(path, sep="\t", names=CRITEO_COLUMNS, nrows=nrows)


def load_criteo_batches(
    path: str,
    hash_sizes: Optional[Tuple[int, ...]] = None,
    nrows: Optional[int] = None,
    num_threads: int = 0,
) -> Dict[str, np.ndarray]:
    """Criteo DAC TSV → fixed-shape hashed batch arrays via the native parser.

    The TPU-feeding fast path: the C++ parser
    (``torecsys_tpu/data/native/criteo_parser.cc``) hashes the 26 categorical
    fields (FNV-1a mod ``hash_sizes``) and log1p-transforms the 13 dense
    fields at >1.5M rows/s — vs ~20k rows/s for the per-row Python collate
    the reference uses (``data/dataloader/collate_fn.py:53-128``).

    Returns ``{"label": (R,) f32, "dense": (R, 13) f32, "cats": (R, 26) i32}``.
    """
    from torecsys_tpu.data.native import NUM_CATS, parse_criteo_tsv

    if hash_sizes is None:
        hash_sizes = (100_000,) * NUM_CATS
    with open(path, "rb") as f:
        data = f.read()
    return parse_criteo_tsv(data, hash_sizes, max_rows=nrows,
                            num_threads=num_threads)


def load_bx_data(directory: str):
    """Book-Crossing ratings → DataFrame (reference ``load_data.py:97-141``)."""
    import pandas as pd

    path = os.path.join(directory, "BX-Book-Ratings.csv")
    return pd.read_csv(path, sep=";", encoding="latin-1")


def make_synthetic_ctr(
    num_rows: int = 100_000,
    field_sizes: Tuple[int, ...] = (1000, 500, 200, 100, 50, 20),
    num_dense: int = 4,
    seed: int = 0,
    noise: float = 0.25,
    pair_scale: float = 1.0,
) -> Dict[str, np.ndarray]:
    """Deterministic synthetic CTR data with planted pairwise interactions.

    Each categorical field gets a latent 8-dim factor table; the true logit is
    a linear term + FM-style pairwise factor interactions + dense effects +
    Gaussian noise, so FM-family models can demonstrably beat logistic
    regression on held-out AUC (the convergence-test contract, SURVEY.md §4).

    Returns dict with ``cat_{i}`` int32 columns, ``dense_{j}`` float32
    columns, and float32 ``label``.
    """
    rng = np.random.default_rng(seed)
    k = 8
    cats, contrib = [], np.zeros(num_rows)
    factors = [rng.normal(0, 0.3, size=(v, k)) for v in field_sizes]
    weights = [rng.normal(0, 0.5, size=(v,)) for v in field_sizes]
    for v, f, w in zip(field_sizes, factors, weights):
        # Zipf-ish id distribution, the realistic CTR regime
        raw = rng.zipf(1.3, size=num_rows)
        ids = np.minimum(raw - 1, v - 1).astype(np.int32)
        cats.append(ids)
        contrib += w[ids]
    # FM pairwise: sum over i<j of <f_i[id_i], f_j[id_j]>
    latent = np.stack([f[ids] for f, ids in zip(factors, cats)], axis=1)  # (R, N, k)
    s = latent.sum(axis=1)
    pair = 0.5 * ((s**2).sum(-1) - (latent**2).sum(axis=(1, 2)))
    # pair_scale > 1 boosts the interaction share of the label variance —
    # used by the parity protocol so interaction models separate clearly
    # from plain LR (high-signal regime)
    contrib += pair_scale * pair

    dense = rng.normal(size=(num_rows, num_dense)).astype(np.float32)
    dense_w = rng.normal(0, 0.4, size=(num_dense,))
    contrib += dense @ dense_w

    logit = (contrib - contrib.mean()) / (contrib.std() + 1e-9)
    p = 1.0 / (1.0 + np.exp(-(logit + noise * rng.normal(size=num_rows))))
    label = (rng.uniform(size=num_rows) < p).astype(np.float32)

    out: Dict[str, np.ndarray] = {"label": label}
    for i, ids in enumerate(cats):
        out[f"cat_{i}"] = ids
    for j in range(num_dense):
        out[f"dense_{j}"] = dense[:, j].astype(np.float32)
    return out
