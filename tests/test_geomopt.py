"""Geometry-optimizer unit tests (geomeTRIC-equivalent driver,
cctpu/geomopt/optimizer.py; reference usage templates/opt-freq.py:374).
"""

import numpy as np
import pytest

from cctpu.core.molecule import Molecule
from cctpu.geomopt.optimizer import _project_tr, optimize


@pytest.mark.smoke
def test_project_tr_removes_rigid_components():
    rng = np.random.default_rng(0)
    coords = rng.normal(size=(4, 3))
    g = rng.normal(size=12)
    gp = _project_tr(g, coords)
    # net force vanishes
    assert np.abs(gp.reshape(4, 3).sum(axis=0)).max() < 1e-12
    # net torque about the COM vanishes
    rel = coords - coords.mean(axis=0)
    tau = np.cross(rel, gp.reshape(4, 3)).sum(axis=0)
    assert np.abs(tau).max() < 1e-12
    # projection is idempotent and never grows the gradient
    assert np.linalg.norm(_project_tr(gp, coords) - gp) < 1e-12
    assert np.linalg.norm(gp) <= np.linalg.norm(g) + 1e-12


@pytest.mark.smoke
def test_project_tr_keeps_internal_gradient():
    # a pure bond-stretch gradient of water has no rigid component at all
    coords = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, 1.8],
                       [0.0, 1.7, -0.6]])
    g = np.zeros((3, 3))
    g[0, 2] = 1.0
    g[1, 2] = -1.0                      # equal+opposite along the bond
    gp = _project_tr(g.ravel(), coords)
    assert np.linalg.norm(gp - g.ravel()) < 1e-12


def test_water_rhf_optimization():
    from cctpu.scf.hf import RHF
    mol = Molecule.from_atoms(
        "O 0 0 0; H 0 0 1.05; H 0 1.02 -0.3", basis="sto-3g")
    res = optimize(lambda m: RHF(m), mol, maxsteps=25)
    assert res.converged, res.nsteps
    c = res.mol.coords * 0.529177210903
    r1 = np.linalg.norm(c[1] - c[0])
    r2 = np.linalg.norm(c[2] - c[0])
    # RHF/STO-3G water: r(OH) = 0.989 A
    assert abs(r1 - 0.989) < 5e-3 and abs(r2 - 0.989) < 5e-3


@pytest.mark.slow
def test_pcm_optimization_converges():
    # the lab-frame cavity grid leaves a genuine net torque in the
    # Cartesian gradient; convergence must be judged TR-projected
    # (regression for the round-2 in-solvent --opt path)
    from cctpu.scf.hf import RHF
    from cctpu.solvent.pcm import PCM

    def factory(m):
        return PCM(RHF(m), solvent="water")

    mol = Molecule.from_atoms(
        "O 0 0 0; H 0 0 1.05; H 0 1.02 -0.3", basis="sto-3g")
    res = optimize(factory, mol, maxsteps=15)
    assert res.converged, res.nsteps
