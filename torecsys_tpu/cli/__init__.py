"""Command-line interface.

Parity: ``/root/reference/torecsys/cli/__init__.py:20-126`` — a click group
with ``version`` and ``build`` commands where ``build`` parses JSON config
strings and assembles a pipeline (the reference's ``build`` only builds and
prints a summary; it never calls ``fit``, ``cli/__init__.py:73-120``).
Additions: a ``train`` command that actually runs ``Trainer.fit`` on the
bundled synthetic CTR data or a CSV, because a CLI that cannot train is a
demo, not a tool.
"""

from __future__ import annotations

import json
import sys
from typing import Optional

import click

import torecsys_tpu


@click.group()
def cli():
    """torecsys-tpu: TPU-native recommender-system framework."""


@cli.command()
def version():
    """Print the package version (reference ``cli/__init__.py:27-29``)."""
    click.echo(torecsys_tpu.__version__)


def _parse(cfg: Optional[str]):
    return json.loads(cfg) if cfg else None


@cli.command()
@click.option("--objective", default="ctr", help="ctr | emb | ltr")
@click.option("--inputs_config", default=None, help="JSON inputs config")
@click.option("--model_config", required=True, help='JSON, e.g. \'{"method":"DeepFM"}\'')
@click.option("--regularizer_config", default=None, help="JSON regularizer config")
@click.option("--criterion_config", default=None, help="JSON criterion config")
@click.option("--optimizer_config", default=None, help="JSON optimizer config")
@click.option("--miner_config", default=None, help="JSON miner config (ltr/emb)")
@click.option("--miner_target_field", default=None)
@click.option("--target_fields", default="label")
def build(objective, inputs_config, model_config, regularizer_config,
          criterion_config, optimizer_config, miner_config, miner_target_field,
          target_fields):
    """Assemble a pipeline from JSON configs and print its summary
    (reference ``build``, ``cli/__init__.py:32-121``)."""
    inputs = _build_inputs(_parse(inputs_config)) if inputs_config else None
    pipeline = torecsys_tpu.train.Pipeline.build(
        objective=objective,
        inputs_config=inputs,
        model_config=_parse(model_config),
        regularizer_config=_parse(regularizer_config),
        criterion_config=_parse(criterion_config),
        optimizer_config=_parse(optimizer_config),
        miner_config=_parse(miner_config),
        miner_target_field=miner_target_field,
        target_fields=target_fields,
    )
    click.echo(pipeline.summary())
    return pipeline


def _build_inputs(cfg: dict):
    """JSON → ``Inputs``: ``{arg_name: {method: <class>, ...kwargs}}``."""
    from torecsys_tpu import inputs as inputs_mod

    schema = {}
    for arg_name, spec in cfg.items():
        spec = dict(spec)
        cls = getattr(inputs_mod, spec.pop("method"))
        for key in ("fields", "field_sizes"):
            if key in spec and isinstance(spec[key], list):
                spec[key] = tuple(spec[key])
        schema[arg_name] = cls(**spec)
    return inputs_mod.Inputs(schema=schema)


@cli.command()
@click.option("--model_config", required=True, help='JSON, e.g. \'{"method":"DeepFM"}\'')
@click.option("--inputs_config", default=None,
              help="JSON inputs config; default = synthetic-CTR schema")
@click.option("--criterion_config", default=None)
@click.option("--optimizer_config", default=None)
@click.option("--regularizer_config", default=None)
@click.option("--target_fields", default="label")
@click.option("--batch_size", default=1024, type=int)
@click.option("--max_num_epochs", default=1, type=int)
@click.option("--max_num_iterations", default=None, type=int)
@click.option("--num_rows", default=100_000, type=int, help="synthetic dataset size")
@click.option("--embed_size", default=16, type=int)
@click.option("--checkpoint_dir", default=None)
def train(model_config, inputs_config, criterion_config, optimizer_config,
          regularizer_config, target_fields, batch_size, max_num_epochs,
          max_num_iterations, num_rows, embed_size, checkpoint_dir):
    """Train a model end-to-end on the bundled synthetic CTR data."""
    import logging

    import numpy as np

    from torecsys_tpu.data import make_synthetic_ctr
    from torecsys_tpu.inputs import Inputs, MultiIndicesEmbedding, ValueInput

    logging.basicConfig(level=logging.INFO, stream=sys.stderr,
                        format="%(asctime)s %(message)s")

    data = make_synthetic_ctr(num_rows=num_rows)
    cat_fields = tuple(sorted(k for k in data if k.startswith("cat_")))
    dense_fields = tuple(sorted(k for k in data if k.startswith("dense_")))
    field_sizes = tuple(int(data[f].max()) + 1 for f in cat_fields)

    if inputs_config:
        inputs = _build_inputs(_parse(inputs_config))
    else:
        inputs = Inputs(schema={
            "feat_inputs": ValueInput(fields=dense_fields),
            "emb_inputs": MultiIndicesEmbedding(
                embed_size=embed_size, field_sizes=field_sizes, fields=cat_fields
            ),
        })

    pipeline = torecsys_tpu.train.Pipeline.build(
        objective="ctr",
        inputs_config=inputs,
        model_config=_parse(model_config),
        criterion_config=_parse(criterion_config),
        optimizer_config=_parse(optimizer_config),
        regularizer_config=_parse(regularizer_config),
        target_fields=target_fields,
    )
    click.echo(pipeline.summary())

    n = num_rows
    split = int(n * 0.9)
    def loader(lo, hi, shuffle):
        idx = np.arange(lo, hi)
        def gen():
            order = np.random.default_rng(0).permutation(idx) if shuffle else idx
            stop = len(order) - (len(order) % batch_size)
            for s in range(0, stop, batch_size):
                sel = order[s:s + batch_size]
                yield {k: v[sel] for k, v in data.items()}
        return gen

    trainer = torecsys_tpu.train.Trainer(pipeline, checkpoint_dir=checkpoint_dir)
    metrics = trainer.fit(
        loader(0, split, True),
        val_loader=loader(split, n, False),
        max_epochs=max_num_epochs,
        max_steps=max_num_iterations,
    )
    click.echo(json.dumps(metrics))


def main():
    cli()


__all__ = ["cli", "main"]
