"""Device SRS generation vs host chain; prove with a device-generated SRS."""
import pytest

from baby_plonk_tpu.fields import fr
from baby_plonk_tpu.ops import srs as dsrs
from baby_plonk_tpu.ops.engine import HostEngine
from baby_plonk_tpu.ops.tpu_engine import TpuEngine
from baby_plonk_tpu.protocol.program import Program
from baby_plonk_tpu.protocol.prover import Prover
from baby_plonk_tpu.protocol.setup import Setup
from baby_plonk_tpu.protocol.verifier import Verifier


@pytest.mark.slow
def test_device_srs_matches_host_chain():
    powers, tau = 12, 54321
    setup_host = Setup.generate_srs(powers, tau, cache=False)
    dev = dsrs.powers_of_tau_device(powers, tau)
    pts = dsrs.device_points_to_host(dev)
    assert pts == setup_host.powers_of_x


@pytest.mark.slow
def test_prove_with_device_srs():
    n = 8
    setup = Setup.generate_srs_device(n + 6, tau=101)
    program = Program.from_strs(["e public", "c <== a * b + b", "e <== c * d"], n)
    witness = {"a": 3, "b": 4, "c": 16, "d": 5, "e": 80}
    blinding = list(range(1, 12))
    proof = Prover(setup, program, engine=TpuEngine()).prove(witness, blinding=blinding)
    assert Verifier(setup, program, proof, engine=TpuEngine()).verify([80])
    # same bytes as a host-SRS host-engine proof
    setup_h = Setup.generate_srs(n + 6, tau=101, cache=False)
    proof_h = Prover(setup_h, program, engine=HostEngine()).prove(
        witness, blinding=blinding
    )
    assert proof.to_bytes() == proof_h.to_bytes()


def test_device_srs_chunked(monkeypatch):
    """Chunked generation (powers > SRS_CHUNK) must match the host chain."""
    from baby_plonk_tpu.ops import srs as dsrs

    monkeypatch.setattr(dsrs, "SRS_CHUNK", 8)
    powers, tau = 21, 13131  # 3 chunks, last one ragged
    setup_host = Setup.generate_srs(powers, tau, cache=False)
    dev = dsrs.powers_of_tau_device(powers, tau)
    pts = dsrs.device_points_to_host(dev)
    assert pts == setup_host.powers_of_x
