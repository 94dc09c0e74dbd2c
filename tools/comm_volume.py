"""Measure the collective traffic of the two sharded-lookup strategies.

Compiles both lookup paths over an 8-virtual-device ('data', 'table') mesh
and extracts every cross-device collective (all-reduce / all-to-all /
collective-permute / all-gather / reduce-scatter) with its operand bytes
from the optimized HLO — the measured companion to SPEED.md's analytic
comm-volume table.

Run: python tools/comm_volume.py   (CPU, ~1 min)
"""

from __future__ import annotations

import json
import os
import re
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from torecsys_tpu.ops.embedding import packed_shape  # noqa: E402
from torecsys_tpu.parallel import (  # noqa: E402
    LookupContext,
    make_mesh,
    sharded_packed_lookup,
    sharded_packed_lookup_alltoall,
)

B, K, E = 4096, 26, 16
V = 500_000

_DTYPE_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "s8": 1, "pred": 1,
                "f64": 8, "s64": 8, "u8": 1, "f16": 2}
_COLLECTIVES = ("all-reduce", "all-to-all", "all-gather", "reduce-scatter",
                "collective-permute")


def _shape_bytes(shape_str: str) -> int:
    # e.g. "f32[512,16]{1,0}" or "(f32[4,2], s32[8])"
    total = 0
    for m in re.finditer(r"(\w+)\[([\d,]*)\]", shape_str):
        dtype, dims = m.group(1), m.group(2)
        if dtype not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dtype]
    return total


def collective_bytes(fn, *args):
    """Per-device bytes moved by each collective kind in the compiled HLO."""
    txt = jax.jit(fn).lower(*args).compile().as_text()
    out = {}
    for line in txt.splitlines():
        line = line.strip()
        m = re.search(r"= (\([^)]*\)|\S+) ([a-z][\w-]*)\(", line)
        if not m:
            continue
        op = m.group(2)
        kind = next((c for c in _COLLECTIVES if op.startswith(c.replace("-", "_")) or op.startswith(c)), None)
        if kind is None:
            continue
        out[kind] = out.get(kind, 0) + _shape_bytes(m.group(1))
    out["total"] = sum(v for k, v in out.items())
    return out


def measure_shape(batch=B, fields=K, embed=E, vocab=V, table_shards=8,
                  capacity_factor=2.0):
    """Measured per-device collective bytes of both strategies at one shape.

    Returns ``{"shape": {...}, "psum": {...}, "alltoall": {...}}`` with
    forward and forward+backward per-collective byte counts from the
    optimized HLO.  Used standalone AND by the off-calibration model
    validation test (tests/test_parallel.py) — HLO byte counts depend only
    on shapes, so a virtual CPU mesh measures the real comm volume.
    """
    if 8 % table_shards:
        raise ValueError("table_shards must divide the 8 virtual devices")
    mesh = make_mesh(data=8 // table_shards, table=table_shards)
    vp, w = packed_shape(vocab, embed)
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(0, 0.01, (vp, w)).astype(np.float32))
    raw = rng.zipf(1.2, size=(batch, fields))
    ids = jnp.asarray(np.minimum(raw - 1, vocab - 1).astype(np.int32))

    results = {"shape": {"batch": batch, "fields": fields, "embed": embed,
                         "vocab": vocab, "table_shards": table_shards,
                         "capacity_factor": capacity_factor}}
    for name, ctx in (
        ("psum", LookupContext(mesh=mesh, min_rows_to_shard=0)),
        ("alltoall", LookupContext(mesh=mesh, min_rows_to_shard=0,
                                   strategy="alltoall",
                                   capacity_factor=capacity_factor)),
    ):
        fwd = (sharded_packed_lookup_alltoall if ctx.strategy == "alltoall"
               else sharded_packed_lookup)

        def f(t, i, fwd=fwd, ctx=ctx):
            return fwd(t, i, embed, ctx)

        def fwd_bwd(t, i, f=f):
            return jax.grad(lambda tt: jnp.sum(f(tt, i) ** 2))(t)

        results[name] = {
            "forward": collective_bytes(f, table, ids),
            "forward+backward": collective_bytes(fwd_bwd, table, ids),
        }
    return results


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--sweep", action="store_true",
                    help="measure the model-calibration shape set and write "
                         "COMM_VOLUME.json")
    args = ap.parse_args()
    if not args.sweep:
        print(json.dumps(measure_shape(), indent=2))
        return

    # Calibration + off-calibration shapes (VERDICT r4 ask #7): the anchor
    # shape, a wide-embedding variant, a small-table-axis variant, a fewer-
    # fields variant, and capacity extremes.
    shapes = [
        dict(),                                         # anchor (B4096 K26 E16 ts8 cap2)
        dict(embed=64),
        dict(table_shards=4),
        dict(fields=4, vocab=200_000),
        dict(capacity_factor=1.0),
        dict(capacity_factor=6.0),
        dict(embed=64, table_shards=4, capacity_factor=4.0),
    ]
    records = [measure_shape(**s) for s in shapes]
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "COMM_VOLUME.json")
    with open(out, "w") as fp:
        json.dump(records, fp, indent=1)
    for r in records:
        print(json.dumps({
            "shape": r["shape"],
            "psum_mb": round(r["psum"]["forward+backward"]["total"] / 1e6, 2),
            "a2a_mb": round(r["alltoall"]["forward+backward"]["total"] / 1e6, 2),
        }))
    print(f"wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
