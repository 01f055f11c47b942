"""Boys function accuracy across regimes and orders."""

import pytest

import math

import numpy as np
import scipy.special as ss
import jax.numpy as jnp

from cctpu.ints.boys import boys

pytestmark = pytest.mark.smoke


def _ref(m, T):
    if T < 1e-12:
        return 1.0 / (2 * m + 1) - T / (2 * m + 3)
    a = m + 0.5
    return math.gamma(a) * ss.gammainc(a, T) / (2 * T ** a)


def test_boys_all_regimes():
    Ts = np.array([0.0, 1e-14, 1e-3, 0.05, 0.0999, 0.1001, 0.5, 1.0, 5.0,
                   20.0, 35.0, 60.0, 129.9, 130.1, 200.0, 700.0])
    F = np.array(boys(jnp.array(Ts), 16))
    for j, T in enumerate(Ts):
        for m in range(17):
            ref = _ref(m, T)
            assert abs(F[m, j] - ref) <= 5e-13 * max(abs(ref), 1e-300), \
                (T, m, F[m, j], ref)


def test_boys_shape():
    F = boys(jnp.ones((3, 4)), 5)
    assert F.shape == (6, 3, 4)
