"""KZG trusted setup (toy: tau passed in) and polynomial commitment.

Functional equivalent of src/setup.rs. The SRS is
  powers_of_x = [G1, tau*G1, ..., tau^(powers-1)*G1],  x_2 = tau*G2
(setup.rs:12-31). Unlike the reference's serial 255-bit scalar-mul chain,
we compute the scalar powers tau^i first (cheap field muls) and do
independent fixed-base multiplications — and cache generated SRS to disk
(the reference regenerates per run; SURVEY.md §5 checkpoint/resume gap).

``commit`` asserts monomial basis (setup.rs:34) and multi-scalar-multiplies
the coefficients against the SRS.
"""
from __future__ import annotations

import hashlib
import os
import pickle

from ..fields import fr
from ..fields.tower import Fp2
from ..curves.g1 import G1
from ..curves.g2 import G2
from ..curves import msm_host
from .poly import Basis, Poly

def _cache_dir() -> str:
    from ..config import get_config

    return get_config().srs_cache_dir


class Setup:
    def __init__(self, powers_of_x: list[G1] | None, x_2: G2, n_powers: int | None = None):
        self.powers_of_x = powers_of_x
        self.x_2 = x_2
        self.n_powers = n_powers if n_powers is not None else len(powers_of_x or [])
        self._tpu_cache = None  # device-resident SRS, filled lazily by the TPU engine
        #: stable identity for derived-artifact caches (fixed-base tables);
        #: set by the generate_srs* constructors when caching is on
        self.cache_key: str | None = None

    def srs_len(self) -> int:
        return self.n_powers

    @staticmethod
    def generate_srs_device(powers: int, tau: int, cache: bool = True) -> "Setup":
        """SRS generated ON DEVICE: one batched fixed-base kernel instead of
        the reference's serial scalar-mul chain (setup.rs:12-31). The G1
        powers stay device-resident (no host point list at 2^20 scale);
        host-side access materializes lazily via ``materialize_host()``.
        Device arrays are cached to disk as .npz (SURVEY.md §5
        checkpoint/resume: the reference regenerates per run)."""
        import numpy as _np

        import jax as _jax
        import jax.numpy as _jnp

        from ..ops import g1_vec, srs as dsrs

        tau = tau % fr.Q
        path = None
        key = None
        if cache:
            key = hashlib.sha256(
                f"srs-dev-v2-{powers}-{tau}-r{g1_vec.FQ.radix}".encode()
            ).hexdigest()[:24]
            path = os.path.join(_cache_dir(), f"{key}.npz")
            if os.path.exists(path):
                data = _np.load(path)
                xb = data["x2"].tobytes()
                c = [int.from_bytes(xb[i * 48 : (i + 1) * 48], "little") for i in range(6)]
                setup = Setup(
                    None,
                    G2(Fp2(c[0], c[1]), Fp2(c[2], c[3]), Fp2(c[4], c[5])),
                    n_powers=powers,
                )
                setup._tpu_cache = tuple(
                    _jnp.asarray(data[k]) for k in ("px", "py", "pz")
                )
                setup.cache_key = key
                return setup
        setup = Setup(None, G2.generator() * tau, n_powers=powers)
        setup.cache_key = key
        setup._tpu_cache = dsrs.powers_of_tau_device(powers, tau)
        if cache and path is not None:
            os.makedirs(_cache_dir(), exist_ok=True)
            px, py, pz = (_np.asarray(_jax.device_get(c)) for c in setup._tpu_cache)
            x2 = setup.x_2
            x2arr = _np.frombuffer(
                b"".join(
                    int(v).to_bytes(48, "little")
                    for v in (x2.x.c0, x2.x.c1, x2.y.c0, x2.y.c1, x2.z.c0, x2.z.c1)
                ),
                dtype=_np.uint8,
            )
            tmp = path + ".tmp.npz"
            _np.savez(tmp, px=px, py=py, pz=pz, x2=x2arr)
            os.replace(tmp, path)
        return setup

    def materialize_host(self) -> None:
        """Fill ``powers_of_x`` from the device arrays (batch inversion)."""
        if self.powers_of_x is None:
            from ..ops import srs as dsrs

            self.powers_of_x = dsrs.device_points_to_host(self._tpu_cache)

    @staticmethod
    def generate_srs(powers: int, tau: int, cache: bool = True) -> "Setup":
        tau = tau % fr.Q
        key = None
        if cache:
            key = hashlib.sha256(f"srs-v1-{powers}-{tau}".encode()).hexdigest()[:24]
            path = os.path.join(_cache_dir(), f"{key}.pkl")
            if os.path.exists(path):
                with open(path, "rb") as f:
                    xs, x2 = pickle.load(f)
                setup = Setup(
                    [G1(*t) for t in xs],
                    G2(Fp2(*x2[0]), Fp2(*x2[1]), Fp2(*x2[2])),
                )
                setup.cache_key = key
                return setup
        g = G1.generator()
        # powers of tau in the field (cheap), then one fixed-base mul each
        cur = 1
        pows: list[G1] = []
        base = g
        for i in range(powers):
            pows.append(base * cur if i > 0 else base)
            cur = cur * tau % fr.Q
        x_2 = G2.generator() * tau
        setup = Setup(pows, x_2)
        setup.cache_key = key
        if cache and key is not None:
            os.makedirs(_cache_dir(), exist_ok=True)
            path = os.path.join(_cache_dir(), f"{key}.pkl")
            xs = [(p.x, p.y, p.z) for p in pows]
            x2s = [(x_2.x.c0, x_2.x.c1), (x_2.y.c0, x_2.y.c1), (x_2.z.c0, x_2.z.c1)]
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                pickle.dump((xs, x2s), f)
            os.replace(tmp, path)
        return setup

    def commit(self, polynomial: Poly) -> G1:
        """KZG commit: MSM of monomial coefficients against the SRS (setup.rs:32-37)."""
        assert polynomial.basis == Basis.MONOMIAL
        values = polynomial.values
        # the reference zip-truncates silently; we require the poly to fit
        nonzero_len = len(values)
        while nonzero_len and values[nonzero_len - 1] == 0:
            nonzero_len -= 1
        assert nonzero_len <= self.srs_len(), (
            f"polynomial degree {nonzero_len - 1} exceeds SRS size {self.srs_len()}"
        )
        if self.powers_of_x is None:
            self.materialize_host()
        return msm_host.msm(self.powers_of_x[:nonzero_len], values[:nonzero_len])
