"""CLI smoke test (parity surface with the reference's `cargo verify`)."""
import os
import subprocess
import sys


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
