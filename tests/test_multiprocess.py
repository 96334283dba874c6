"""Real 2-process jax.distributed parity test — the closest this
environment gets to actual multi-chip (SURVEY.md §4 fake-mesh note).

Spawns the benchmarks/multiprocess_sim.py launcher: 2 OS processes x 4
virtual CPU devices form one 8-device global mesh via jax.distributed,
then run

  * dp-sharded batched decode over the hybrid (host x data x seq) mesh
    with a cross-process psum checksum, and
  * sp (sequence-parallel) decode with the seq axis spanning BOTH
    processes — the seam ppermute at the device-3 -> device-4 boundary
    is a genuinely cross-process collective,

each asserting bit-exact parity in-worker (nonzero exit on any
mismatch).  Runs as subprocesses because jax.distributed cannot
initialize inside an already-initialized test process.
"""

import subprocess
import sys
from pathlib import Path

import pytest

SIM = Path(__file__).resolve().parent.parent / "benchmarks" / "multiprocess_sim.py"


@pytest.mark.slow
def test_two_process_distributed_dp_and_sp_parity():
    res = subprocess.run(
        [sys.executable, str(SIM)],
        capture_output=True, text=True, timeout=900,
    )
    assert res.returncode == 0, f"sim failed:\n{res.stdout}\n{res.stderr}"
    assert "multiprocess sim: OK" in res.stdout
    # both workers must report full parity incl. the sp leg
    assert res.stdout.count("parity=100%") >= 1, res.stdout
    assert "FAILED" not in res.stdout
