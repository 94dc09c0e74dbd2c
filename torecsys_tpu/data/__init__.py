"""Host-side data pipeline: datasets, vocab fields, schema-driven collation to
fixed-shape numpy batches, sample-data loaders, and sub-sampling.

Parity with ``/root/reference/torecsys/data/`` (SURVEY.md §2.1); everything
here runs on the host — device code only sees fixed-shape arrays.
"""

from torecsys_tpu.data.collate import CollateFunction, DataLoader, FieldSpec
from torecsys_tpu.data.dataset import DataFrameToDataset, NdarrayToDataset
from torecsys_tpu.data.fields import IndexField, SentenceField
from torecsys_tpu.data.sample_data import (
    download_bx_data,
    download_criteo_data,
    download_jester_data,
    download_ml_data,
    load_bx_data,
    load_criteo_batches,
    load_criteo_data,
    load_ml_data,
    make_synthetic_ctr,
    request_download,
)
from torecsys_tpu.data.sub_sampling import sub_sampling

__all__ = [
    "CollateFunction",
    "DataFrameToDataset",
    "DataLoader",
    "FieldSpec",
    "IndexField",
    "NdarrayToDataset",
    "SentenceField",
    "download_bx_data",
    "download_criteo_data",
    "download_jester_data",
    "download_ml_data",
    "load_bx_data",
    "load_criteo_batches",
    "load_criteo_data",
    "load_ml_data",
    "make_synthetic_ctr",
    "request_download",
    "sub_sampling",
]
