"""host_oracle (numpy MD) vs the JAX ERI kernel on CPU.

The oracle exists to catch corrupt compiled executables (round-4
probe_floor finding: one bad (d|g) 2c2e artifact in the persistent axon
cache shifted SCF by 0.05 Ha), so it must agree with a HEALTHY kernel to
~1e-12 across classes, contractions and omega.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from cctpu.ints.two_electron import eri_quartet_kernel
from cctpu.ints.host_oracle import (eri_2c2e_np, eri_3c2e_np,
                                    eri_bra_ket_np)

pytestmark = pytest.mark.smoke

A = np.array([0.0, 0.1, -0.2])
B = np.array([0.9, -0.4, 0.3])
DUM_E = np.array([0.0])
DUM_C = np.array([1.0])


def _kernel(ls, eA, cA, RA, eB, cB, RB, eC, cC, RC, eD, cD, RD, omega=None):
    return np.asarray(eri_quartet_kernel(
        ls, jnp.asarray(eA), jnp.asarray(cA), jnp.asarray(RA),
        jnp.asarray(eB), jnp.asarray(cB), jnp.asarray(RB),
        jnp.asarray(eC), jnp.asarray(cC), jnp.asarray(RC),
        jnp.asarray(eD), jnp.asarray(cD), jnp.asarray(RD), omega=omega))


@pytest.mark.parametrize("lP,lQ", [(0, 0), (1, 2), (2, 4), (3, 3)])
def test_2c2e_matches_kernel(lP, lQ):
    eP, cP = np.array([1.3]), np.array([0.8])
    eQ, cQ = np.array([0.7]), np.array([1.1])
    ref = _kernel((lP, 0, lQ, 0), eP, cP, A, DUM_E, DUM_C, A,
                  eQ, cQ, B, DUM_E, DUM_C, B)[:, 0, :, 0]
    got = eri_2c2e_np(lP, eP, cP, A, lQ, eQ, cQ, B)
    assert np.abs(got - ref).max() < 1e-12 * max(1.0, np.abs(ref).max())


def test_2c2e_omega():
    eP, cP = np.array([0.9]), np.array([1.0])
    eQ, cQ = np.array([0.5]), np.array([0.7])
    ref = _kernel((2, 0, 1, 0), eP, cP, A, DUM_E, DUM_C, A,
                  eQ, cQ, B, DUM_E, DUM_C, B, omega=0.33)[:, 0, :, 0]
    got = eri_2c2e_np(2, eP, cP, A, 1, eQ, cQ, B, omega=0.33)
    assert np.abs(got - ref).max() < 1e-12


@pytest.mark.parametrize("lP,la,lb", [(0, 0, 0), (2, 1, 0), (3, 2, 1)])
def test_3c2e_matches_kernel(lP, la, lb):
    C = np.array([-0.3, 0.8, 0.1])
    eP, cP = np.array([1.1]), np.array([0.9])
    ea = np.array([3.0, 0.5])
    ca = np.array([0.4, 0.7])
    eb = np.array([0.8])
    cb = np.array([1.0])
    ref = _kernel((lP, 0, la, lb), eP, cP, A, DUM_E, DUM_C, A,
                  ea, ca, B, eb, cb, C)[:, 0]
    got = eri_3c2e_np(lP, eP, cP, A, la, ea, ca, B, lb, eb, cb, C)
    assert np.abs(got - ref).max() < 1e-12 * max(1.0, np.abs(ref).max())


def test_4c_contracted_matches_kernel():
    C = np.array([-0.3, 0.8, 0.1])
    D = np.array([0.2, -0.6, -0.5])
    eA_, cA_ = np.array([2.0, 0.6]), np.array([0.5, 0.6])
    eB_, cB_ = np.array([1.2]), np.array([1.0])
    eC_, cC_ = np.array([0.9, 0.3]), np.array([0.7, 0.4])
    eD_, cD_ = np.array([0.5]), np.array([1.0])
    ls = (1, 1, 2, 0)
    ref = _kernel(ls, eA_, cA_, A, eB_, cB_, B, eC_, cC_, C, eD_, cD_, D)
    got = eri_bra_ket_np(ls[0], ls[1], eA_, cA_, eB_, cB_, A, B,
                         ls[2], ls[3], eC_, cC_, eD_, cD_, C, D)
    assert np.abs(got - ref).max() < 1e-12 * max(1.0, np.abs(ref).max())
