"""Real 2-process multi-host integration test on CPU: exercises
initialize_multihost (jax.distributed over a TCP coordinator — the DCN
analogue of the reference's NCCL/TCP rendezvous, utils.py:128-143),
host all-gather, metric reduction, and a global-mesh psum.

Each worker runs in its own subprocess with its own JAX runtime, as a
real multi-host deployment would."""
import os
import socket
import subprocess
import sys
import textwrap

import pytest

TESTS_DIR = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(TESTS_DIR)

WORKER = textwrap.dedent(
    """
    import os, sys
    sys.path.insert(0, os.environ["MVT_REPO"])
    import jax
    jax.config.update("jax_platforms", "cpu")

    from myrtle_vision_tpu.parallel.collectives import (
        all_gather_host,
        initialize_multihost,
        is_main_process,
        reduce_dict,
    )

    assert initialize_multihost()  # from MVT_COORDINATOR/... env
    pid = jax.process_index()
    assert jax.process_count() == 2

    # host-side gather of arbitrary python objects
    gathered = all_gather_host({"rank": pid, "blob": b"x" * (10 + pid)})
    assert [g["rank"] for g in gathered] == [0, 1]
    assert len(gathered[1]["blob"]) == 11

    # metric dict reduction (average across processes)
    reduced = reduce_dict({"loss": 1.0 + pid, "acc": 0.5})
    assert abs(reduced["loss"] - 1.5) < 1e-6, reduced
    assert abs(reduced["acc"] - 0.5) < 1e-6

    # device collective over the global mesh (1 cpu device per process)
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils

    total = multihost_utils.process_allgather(
        jnp.asarray([float(pid + 1)])
    ).sum()
    assert abs(float(total) - 3.0) < 1e-6

    if is_main_process():
        print("MULTIHOST_OK")
    """
)


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_multihost(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            MVT_REPO=REPO,
            MVT_COORDINATOR=f"127.0.0.1:{port}",
            MVT_NUM_PROCESSES="2",
            MVT_PROCESS_ID=str(pid),
            JAX_PLATFORMS="cpu",
        )
        env.pop("XLA_FLAGS", None)  # 1 device per process
        procs.append(
            subprocess.Popen(
                [sys.executable, str(worker)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost workers timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
    assert "MULTIHOST_OK" in outs[0]
