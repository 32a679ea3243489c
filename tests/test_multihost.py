"""Multi-process (DCN-style) mesh smoke — wraps scripts/multihost_smoke.py.

Validates parallel/mesh.py's topology-agnostic claim: the sharded prover
step runs over a 2-process ``jax.distributed`` mesh whose collectives
cross the process boundary (SURVEY.md §2.3 distributed-backend row).
Runs in subprocesses (jax.distributed cannot initialize inside the
already-initialized test process).
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_two_process_mesh_prove_step():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "multihost_smoke.py")],
        capture_output=True,
        text=True,
        timeout=580,
        env=dict(os.environ, PYTHONPATH=REPO, BPT_SMOKE_FULL="0"),
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "multihost smoke: OK" in proc.stdout


@pytest.mark.slow
def test_two_process_full_mesh_prove():
    """FULL 5-round MeshEngine prove + verify across 2 real processes,
    byte-equal vs the host oracle (SURVEY §2.3 DCN row; VERDICT r2 #7).
    XLA-CPU-compile-bound: ~45 min cold, minutes once the persistent
    compile cache (enabled by the workers) is warm.

    No skip guard: round 4's intermittent Gloo KV 30 s race was
    root-caused (per-worker compile-cache asymmetry + async dispatch)
    and fixed by expcache.ejit's AOT-compile -> coordination-service
    barrier -> execute-and-block sequence on each kernel's first
    multi-process execution; 5/5 consecutive green runs recorded
    2026-08-21 (PERFORMANCE.md round 5)."""
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "multihost_smoke.py")],
        capture_output=True,
        text=True,
        timeout=3700,
        env=dict(os.environ, PYTHONPATH=REPO, BPT_SMOKE_FULL="1"),
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "full 5-round MeshEngine prove over 2 processes OK" in proc.stdout
