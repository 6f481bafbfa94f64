"""Multi-host (DCN) skeleton tests.

Real multi-host hardware is unavailable here; the skeleton is validated
the way JAX itself tests it — N local processes, each with a virtual
CPU device slice, rendezvousing through the coordination service with
Gloo cross-process collectives (mpx/parallel/distributed.py).
"""

import numpy as np
import pytest


def test_initialize_noop_without_env(monkeypatch):
    from mpx.parallel import distributed

    for var in ("MPX_COORDINATOR", "MPX_NUM_PROCESSES", "MPX_PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)
    assert distributed.initialize() is False
    # explicit single-process request is also a no-op
    assert distributed.initialize(num_processes=1) is False


def test_mesh_spans_processes_false_locally():
    from mpx.parallel import distributed

    mesh = distributed.global_mesh()
    assert distributed.mesh_spans_processes(mesh) is False


def test_two_process_job_sharded_profile():
    """End-to-end: 2 processes x 2 virtual CPU devices, job-sharded
    self-join over the process-spanning mesh, checked against the
    golden inside each process (__graft_entry__ multiprocess snippet)."""
    import __graft_entry__ as g

    g._dryrun_multiprocess(2, 2)
