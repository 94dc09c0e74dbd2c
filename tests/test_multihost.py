"""Multi-host plumbing tests (SURVEY.md §2.11 backend spec).

Real multi-host behavior is exercised with TWO separate OS processes running
``jax.distributed`` over the CPU backend — the closest CI-able analogue of a
2-host pod slice: per-process local data, a global mesh spanning both
processes, ``make_array_from_process_local_data`` assembly, and a global
psum whose result every process must agree on.
"""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

import jax

from torecsys_tpu.parallel import make_mesh
from torecsys_tpu.parallel.mesh import host_local_batch_to_global, initialize_distributed


def test_initialize_distributed_noop_single_host():
    """No cluster env, no coordinator → deliberate no-op, no swallow."""
    initialize_distributed()  # must not raise and must not initialize
    assert jax.process_count() == 1


def test_initialize_distributed_propagates_bad_coordinator():
    """An explicit-but-unreachable coordinator must RAISE, not silently
    fall back to single-host (that would train N independent copies)."""
    with pytest.raises(Exception):
        initialize_distributed(
            coordinator_address="127.0.0.1:1",  # reserved port, nothing listens
            num_processes=2,
            process_id=0,
            initialization_timeout=3,
        )


def test_host_local_batch_to_global_single_process():
    mesh = make_mesh(data=4, table=2, devices=jax.devices("cpu")[:8])
    batch = {"x": np.arange(16, dtype=np.float32).reshape(16, 1)}
    out = host_local_batch_to_global(batch, mesh)
    assert out["x"].shape == (16, 1)
    np.testing.assert_allclose(np.asarray(out["x"]), batch["x"])


_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("XLA_FLAGS", None)
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    pid = int(sys.argv[1]); port = sys.argv[2]
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2, jax.process_count()
    devs = jax.devices()  # one cpu device per process -> 2 global
    assert len(devs) == 2, devs

    sys.path.insert(0, os.getcwd())
    from torecsys_tpu.parallel.mesh import host_local_batch_to_global
    mesh = jax.sharding.Mesh(np.asarray(devs).reshape(2, 1), ("data", "table"))

    # each process holds ITS half of the global batch (per-host file shard)
    local = {"x": np.full((4, 2), float(pid), np.float32)}
    g = host_local_batch_to_global(local, mesh)
    assert g["x"].shape == (8, 2), g["x"].shape

    # a global computation over the assembled array: sum -> every process
    # must see 0*8 + 1*8 = 8
    out = jax.jit(
        lambda a: jax.numpy.sum(a),
        out_shardings=NamedSharding(mesh, P()),
    )(g["x"])
    total = float(np.asarray(out))
    assert abs(total - 8.0) < 1e-6, total

    # --- stacked multi-host dispatch (steps_per_execution > 1) ------------
    # Each process feeds its HOST-LOCAL half-batches; dispatch_stacked must
    # assemble (K, B/host, ...) stacks into global (K, B, ...) arrays sharded
    # P(None, 'data') — the r3 bug routed them through the single-host
    # shard_batch and mis-placed host-local data as the global batch.
    from torecsys_tpu.data import make_synthetic_ctr
    from torecsys_tpu.inputs import Inputs, MultiIndicesEmbedding, ValueInput
    from torecsys_tpu.train import Pipeline, Trainer

    sizes = (40, 20)
    data = make_synthetic_ctr(num_rows=512, field_sizes=sizes, num_dense=1,
                              seed=7)
    # deterministic per-process half of every batch
    half = {k: v[pid * 256:(pid + 1) * 256] for k, v in data.items()}

    def loader():
        for s in range(0, 256, 64):
            yield {k: v[s:s + 64] for k, v in half.items()}

    pipe = (Pipeline().set_objective("ctr")
            .set_inputs(Inputs(schema={
                "feat_inputs": ValueInput(fields=("dense_0",)),
                "emb_inputs": MultiIndicesEmbedding(
                    embed_size=4, field_sizes=sizes,
                    fields=("cat_0", "cat_1")),
            }))
            .set_model("FM").set_criterion("BCEWithLogitsLoss")
            .set_optimizer("Adam", lr=0.01).set_target_fields("label"))
    tr = Trainer(pipe, mesh=mesh, steps_per_execution=2, log_every=1000)
    metrics = tr.fit(loader, max_epochs=1)
    assert np.isfinite(metrics["train_loss"]), metrics
    # every process must agree on the trained params (SPMD consistency)
    leaves = jax.tree_util.tree_leaves(tr.state.params)
    digest = float(sum(np.asarray(jax.device_get(l)).sum() for l in leaves))
    print(f"proc{pid} digest {digest:.6f}")

    # --- multi-host STREAMING with synchronized step counts ----------------
    # (r4 ADVICE medium: strided chunk ownership gives hosts UNEQUAL batch
    # counts; without sync the hosts dispatch different numbers of SPMD
    # steps and the collectives hang.  sync_batches=True — the default —
    # truncates every host to the common minimum; completing this fit IS
    # the regression test.)
    from torecsys_tpu.data.streaming import CriteoFileIterable
    sample = os.path.join(os.getcwd(), "torecsys_tpu", "data", "sample",
                          "criteo_sample.tsv")
    stream = CriteoFileIterable(sample, hash_sizes=(50,) * 26, batch_size=64)
    stream.chunk_bytes = 1 << 14  # many tiny chunks -> uneven ownership
    assert stream.num_shards == 2 and stream.shard_index == pid
    counts = stream.shard_batch_counts()
    assert counts[0] != counts[1] or min(counts) >= 1, counts
    n_local = sum(1 for _ in iter(stream))
    assert n_local == min(counts), (n_local, counts)

    pipe_s = (Pipeline().set_objective("ctr")
              .set_inputs(Inputs(schema={
                  "feat_inputs": ValueInput(
                      fields=tuple(f"dense_{j}" for j in range(13))),
                  "emb_inputs": MultiIndicesEmbedding(
                      embed_size=4, field_sizes=(50,) * 26,
                      fields=tuple(f"cat_{i}" for i in range(26))),
              }))
              .set_model("FM").set_criterion("BCEWithLogitsLoss")
              .set_optimizer("Adam", lr=0.01).set_target_fields("label"))
    tr_s = Trainer(pipe_s, mesh=mesh, log_every=1000)
    m_s = tr_s.fit(stream, max_epochs=1)
    assert np.isfinite(m_s["train_loss"]), m_s
    print(f"proc{pid} stream_batches {min(counts)}")
    print(f"proc{pid} ok {total}")
    """
)


def test_two_process_distributed_smoke(tmp_path):
    """2 OS processes × 1 CPU device: jax.distributed bring-up, global array
    assembly from process-local shards, and an agreed global reduction."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), port],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            env=env, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=220)
        outs.append(out.decode())
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{pid} failed:\n{out}"
        assert f"proc{pid} ok" in out, out
    # both processes trained the SAME model: their param digests must agree
    digests = []
    for out in outs:
        line = [ln for ln in out.splitlines() if "digest" in ln][0]
        digests.append(float(line.split()[-1]))
    assert abs(digests[0] - digests[1]) < 1e-4, digests
