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
        out, _ = p.communicate(timeout=110)
        outs.append(out.decode())
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{pid} failed:\n{out}"
        assert f"proc{pid} ok" in out, out
