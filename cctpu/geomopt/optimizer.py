"""Geometry optimization in redundant internal coordinates.

The geomeTRIC-equivalent driver (reference usage:
``optimize(mf, maxsteps=N)`` in 8 of 12 templates, e.g. reference
templates/opt-freq.py:374): host-side quasi-Newton loop (BFGS + RFO step +
trust radius) in redundant internals, calling the jitted JAX energy/gradient
at each step, with density-matrix warm starts carried between steps
(the reference's ``dm0`` idiom).

Convergence criteria follow geomeTRIC/Gaussian defaults:
  grad_max < 4.5e-4, grad_rms < 3e-4, step_max < 1.8e-3, step_rms < 1.2e-3,
  |dE| < 1e-6 (converged when gradients + (steps or dE) pass).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional

import numpy as np

from cctpu.core.molecule import Molecule
from cctpu.grad.scf_grad import gradient as scf_gradient


@dataclasses.dataclass
class OptResult:
    mol: Molecule
    e_tot: float
    converged: bool
    nsteps: int
    trajectory: List[Molecule]
    energies: List[float]
    mf: object = None


def _rfo_step(H, g, trust):
    """Rational-function-optimization step, capped at trust radius."""
    n = len(g)
    aug = np.zeros((n + 1, n + 1))
    aug[:n, :n] = H
    aug[:n, n] = g
    aug[n, :n] = g
    w, V = np.linalg.eigh(aug)
    v = V[:, 0]
    if abs(v[n]) < 1e-12:
        step = -np.linalg.pinv(H) @ g
    else:
        step = v[:n] / v[n]
    norm = np.linalg.norm(step)
    if norm > trust:
        step = step * (trust / norm)
    return step


def _project_tr(gx: np.ndarray, coords: np.ndarray) -> np.ndarray:
    """Remove rigid-body translation/rotation components of a Cartesian
    gradient [3N]. QC gradients have ~0 net force/torque already, but a
    lab-frame-discretized solvent cavity (PCM Lebedev grid orientations
    are fixed in space) leaves a genuine residual torque that internal
    coordinates rightly cannot relax — convergence must be judged on the
    projected gradient, as geomeTRIC does in its internal space."""
    natm = coords.shape[0]
    com = coords.mean(axis=0)
    basis = []
    for d in range(3):
        t = np.zeros((natm, 3))
        t[:, d] = 1.0
        basis.append(t.ravel())
    rel = coords - com
    for d in range(3):
        ax = np.zeros(3)
        ax[d] = 1.0
        basis.append(np.cross(rel, ax).ravel())
    A = np.stack(basis, axis=1)                      # [3N, 6]
    # SVD keeps only genuine rigid modes (linear molecules: 5, not 6)
    U, s, _ = np.linalg.svd(A, full_matrices=False)
    Q = U[:, s > 1e-8 * s.max()]
    return gx - Q @ (Q.T @ gx)


def optimize(mf_factory: Callable[[Molecule], object], mol: Molecule,
             maxsteps: int = 50, trust: float = 0.3,
             conv_e: float = 1e-6, conv_gmax: float = 4.5e-4,
             conv_grms: float = 3e-4, conv_dmax: float = 1.8e-3,
             conv_drms: float = 1.2e-3, verbose: int = 0,
             use_internals: bool = True,
             callback: Optional[Callable] = None) -> OptResult:
    """Minimize the SCF energy over geometry.

    mf_factory(mol) -> SCF object with .kernel(dm0=) and gradient support.
    """
    from cctpu.geomopt.internal import InternalCoords

    mol = mol.build() if mol._basis_set is None else mol
    Z = mol.charges
    coords = mol.coords.copy()
    ic = InternalCoords(Z, coords) if use_internals else None

    dm = None
    traj, energies = [], []
    e_last = None
    H = ic.guess_hessian() if ic else np.eye(coords.size) * 0.5
    q_last = g_last = None
    converged = False
    mf = None

    for step_i in range(maxsteps):
        m = mol.with_coords(coords)
        mf = mf_factory(m)
        e = mf.kernel(dm0=dm)
        dm = mf.make_rdm1()
        gx = np.array(scf_gradient(mf)).ravel()
        traj.append(m)
        energies.append(float(e))

        if ic is not None:
            B = ic.B(coords)                       # [nq, 3N]
            Binv = np.linalg.pinv(B, rcond=1e-8)   # [3N, nq]
            gq = Binv.T @ gx
            q_now = ic.q(coords)
        else:
            gq = gx
            q_now = coords.ravel().copy()

        gp = _project_tr(gx, coords)
        gmax = np.abs(gp).max()
        grms = np.sqrt(np.mean(gp ** 2))
        de = None if e_last is None else e - e_last
        if verbose:
            print(f"opt step {step_i:3d}  E = {e:.10f}  "
                  f"dE = {0.0 if de is None else de: .3e}  "
                  f"gmax = {gmax:.2e}  grms = {grms:.2e}  trust={trust:.3f}")
        if callback:
            callback(step_i, m, float(e), gx.reshape(-1, 3))

        if (gmax < conv_gmax and grms < conv_grms
                and de is not None and abs(de) < conv_e):
            converged = True
            break

        # BFGS update
        if q_last is not None:
            s = (ic.diff(q_now, q_last) if ic is not None
                 else q_now - q_last)
            y = gq - g_last
            sy = s @ y
            if sy > 1e-10:
                Hs = H @ s
                H = (H + np.outer(y, y) / sy
                     - np.outer(Hs, Hs) / (s @ Hs))
        # trust-radius heuristic on energy change
        if de is not None:
            if de < 0:
                trust = min(trust * 1.2, 0.5)
            else:
                trust = max(trust * 0.4, 0.02)
                # reject uphill step: restart from best point
        q_last, g_last, e_last = q_now, gq, e

        dq = _rfo_step(H, gq, trust)

        if ic is not None:
            # iterative backtransform dq -> dx
            x = coords.ravel().copy()
            q_target = q_now + dq
            for _ in range(20):
                B = ic.B(x.reshape(-1, 3))
                Binv = np.linalg.pinv(B, rcond=1e-8)
                dq_res = ic.diff(q_target, ic.q(x.reshape(-1, 3)))
                dx = Binv @ dq_res
                x = x + dx
                if np.linalg.norm(dx) < 1e-10:
                    break
            step_x = x - coords.ravel()
        else:
            step_x = dq

        coords = (coords.ravel() + step_x).reshape(-1, 3)

    result_mol = mol.with_coords(coords if not converged else traj[-1].coords)
    return OptResult(mol=result_mol, e_tot=float(energies[-1]),
                     converged=converged, nsteps=step_i + 1,
                     trajectory=traj, energies=energies, mf=mf)
