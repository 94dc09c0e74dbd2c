"""Real-format end-to-end: the committed Criteo-DAC-format shard flows
native parser → column loader → Trainer → held-out AUC, and the CLI
round-trips file → train → checkpoint → resume → evaluate.

Reference surface being matched: the Criteo load path
(``/root/reference/torecsys/data/sample_data/load_data.py:66-94``) feeding
the one end-to-end trainer test (``tests/test_trainer.py:16-101``)."""

import json
import os

import numpy as np
import pytest
from click.testing import CliRunner

from torecsys_tpu.cli import cli

SHARD = os.path.join(
    os.path.dirname(__file__), "..", "torecsys_tpu", "data", "sample",
    "criteo_sample.tsv",
)


@pytest.fixture(scope="module")
def columns():
    from torecsys_tpu.cli import _load_table

    return _load_table(SHARD, "criteo", "label", criteo_hash_size=2000)


def test_shard_parses_to_expected_shapes(columns):
    n = len(columns["label"])
    assert n == 4096
    assert sorted(k for k in columns if k.startswith("cat_")) == [
        f"cat_{i}" for i in sorted(range(26), key=str)
    ]
    assert sorted(k for k in columns if k.startswith("dense_")) == [
        f"dense_{j}" for j in sorted(range(13), key=str)
    ]
    for i in range(26):
        v = columns[f"cat_{i}"]
        assert v.dtype == np.int32 and v.min() >= 0 and v.max() < 2000
    labels = columns["label"]
    assert 0.05 < labels.mean() < 0.95  # both classes present


def test_parser_to_trainer_learns(columns):
    """parser → loader → Trainer → AUC: the signal planted by
    make_criteo_sample must be learnable through the whole pipeline."""
    from torecsys_tpu.cli import _batch_loader, _default_inputs
    from torecsys_tpu.train import Pipeline, Trainer

    inputs = _default_inputs(columns, "label", embed_size=8)
    p = Pipeline.build(
        objective="ctr",
        inputs_config=inputs,
        model_config={"method": "FM"},
        optimizer_config={"method": "Adam", "lr": 0.01},
        target_fields="label",
    )
    n = len(columns["label"])
    split = int(n * 0.8)
    tr = Trainer(p, log_every=10_000)
    m = tr.fit(
        _batch_loader(columns, 0, split, 256, True),
        val_loader=_batch_loader(columns, split, n, 256, False),
        max_epochs=6,
    )
    assert m["val_auc"] > 0.6, m


def test_cli_roundtrip_train_resume_evaluate(tmp_path):
    """CLI: --train_file → ckpt → auto-resume → evaluate, docstring-true."""
    runner = CliRunner()
    ckpt_dir = str(tmp_path / "ckpts")
    common = [
        "--model_config", '{"method": "FM"}',
        "--train_file", SHARD,
        "--batch_size", "512",
        "--embed_size", "4",
        "--criteo_hash_size", "500",
        "--checkpoint_dir", ckpt_dir,
        "--max_num_iterations", "4",
    ]
    r1 = runner.invoke(cli, ["train", *common], catch_exceptions=False)
    assert r1.exit_code == 0, r1.output
    ckpts = os.listdir(ckpt_dir)
    assert ckpts, "no checkpoint written"

    # second run auto-resumes (step counter continues past the first run's)
    r2 = runner.invoke(cli, ["train", *common], catch_exceptions=False)
    assert r2.exit_code == 0, r2.output
    steps = sorted(
        int(f.split("_")[1].split(".")[0]) for f in os.listdir(ckpt_dir)
    )
    assert steps[-1] > 4, f"auto-resume did not continue: {steps}"

    latest = os.path.join(ckpt_dir, f"ckpt_{steps[-1]}.msgpack")
    r3 = runner.invoke(cli, [
        "evaluate",
        "--model_config", '{"method": "FM"}',
        "--load_from", latest,
        "--eval_file", SHARD,
        "--batch_size", "512",
        "--embed_size", "4",
        "--criteo_hash_size", "500",
    ], catch_exceptions=False)
    assert r3.exit_code == 0, r3.output
    metrics = json.loads(r3.output.strip().splitlines()[-1])
    assert "val_auc" in metrics and 0.0 <= metrics["val_auc"] <= 1.0


def test_csv_train_file(tmp_path):
    """--train_file also takes a headered CSV (the docstring's claim)."""
    import pandas as pd

    rng = np.random.default_rng(0)
    n = 2048
    cat = rng.integers(0, 50, n).astype(np.int32)
    dense = rng.normal(size=n).astype(np.float32)
    label = ((cat % 7 == 0) | (dense > 1.0)).astype(np.float32)
    path = str(tmp_path / "toy.csv")
    pd.DataFrame({"user": cat, "score": dense, "label": label}).to_csv(
        path, index=False
    )
    runner = CliRunner()
    r = runner.invoke(cli, [
        "train",
        "--model_config", '{"method": "FM"}',
        "--train_file", path,
        "--batch_size", "256",
        "--embed_size", "4",
        "--max_num_iterations", "4",
    ], catch_exceptions=False)
    assert r.exit_code == 0, r.output


def test_cli_streaming_train(tmp_path):
    """--stream=on trains through the chunked iterator (no whole-file load):
    full CLI path with a small chunk via --stream_chunk_mb floor."""
    runner = CliRunner()
    r = runner.invoke(cli, [
        "train",
        "--model_config", '{"method": "FM"}',
        "--train_file", SHARD,
        "--stream", "on",
        "--stream_chunk_mb", "1",
        "--batch_size", "512",
        "--embed_size", "4",
        "--criteo_hash_size", "500",
        "--max_num_iterations", "4",
    ], catch_exceptions=False)
    assert r.exit_code == 0, r.output
    metrics = json.loads(r.output.strip().splitlines()[-1])
    assert np.isfinite(metrics["train_loss"]), metrics


def test_cli_stream_on_rejects_csv(tmp_path):
    import pandas as pd

    path = str(tmp_path / "t.csv")
    pd.DataFrame({"a": [1, 2], "label": [0.0, 1.0]}).to_csv(path, index=False)
    runner = CliRunner()
    r = runner.invoke(cli, [
        "train", "--model_config", '{"method": "FM"}',
        "--train_file", path, "--stream", "on",
    ])
    assert r.exit_code != 0
    assert "criteo" in r.output
