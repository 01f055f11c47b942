"""Hessians, harmonic frequencies, and IR intensities.

Replaces PySCF hessian.* + hessian.thermo.harmonic_analysis and the
reference's GPU-Hessian / numerical-IR machinery (reference opt-freq.py
hot loop #2, SURVEY.md §3.2): the Hessian is the finite difference of the
*analytic* AD gradient over 6N displaced geometries — exactly the batch of
independent SCF+gradient tasks that SURVEY.md §2.4 marks as the prime
TPU data-parallel target (each displacement is warm-started from the
reference density and can be sharded across a device mesh).

Dipole derivatives for IR intensities come from the same displaced SCF
solutions at zero extra cost (reference numerical_ir_intensities:186-301
does a *second* 6N sweep; we fuse the two).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional

import numpy as np

from cctpu.core.constants import (AMU2AU, BOHR, HARTREE2WAVENUMBER,
                                  IR_KM_MOL)
from cctpu.core.molecule import Molecule
from cctpu.grad.scf_grad import gradient as scf_gradient


@dataclasses.dataclass
class HarmonicResult:
    freq_wavenumber: np.ndarray      # [nmode] (imaginary as negative)
    modes: np.ndarray                # [nmode, natm, 3] mass-weighted-normalized
    hessian: np.ndarray              # [natm*3, natm*3] cartesian (Ha/Bohr^2)
    ir_intensity: Optional[np.ndarray] = None   # [nmode] km/mol
    n_imaginary: int = 0
    freq_au: Optional[np.ndarray] = None


def hessian_fd(mf_factory: Callable[[Molecule], object], mol: Molecule,
               dm0=None, step: float = 1e-3, with_dipole: bool = True,
               verbose: int = 0):
    """Cartesian Hessian by central differences of analytic gradients.

    Returns (H [3N,3N], dmu_dR [3N,3] or None). Each of the 6N displaced
    SCF solves is warm-started from dm0.
    """
    natm = mol.natm
    n3 = 3 * natm
    H = np.zeros((n3, n3))
    dmu = np.zeros((n3, 3)) if with_dipole else None

    for k in range(n3):
        ia, d = divmod(k, 3)
        gs = []
        mus = []
        for sgn in (+1, -1):
            c = mol.coords.copy()
            c[ia, d] += sgn * step
            mf = mf_factory(mol.with_coords(c))
            mf.opts.verbose = 0
            mf.kernel(dm0=dm0)
            gs.append(np.array(scf_gradient(mf)).ravel())
            if with_dipole:
                mus.append(mf.dip_moment(unit="au"))
        H[k] = (gs[0] - gs[1]) / (2 * step)
        if with_dipole:
            dmu[k] = (mus[0] - mus[1]) / (2 * step)
        if verbose:
            print(f"  hessian displacement {k + 1}/{n3} done")
    H = 0.5 * (H + H.T)
    return H, dmu


def harmonic_analysis(mol: Molecule, H: np.ndarray,
                      dmu_dR: Optional[np.ndarray] = None,
                      project_tr: bool = True) -> HarmonicResult:
    """Mass-weighted normal-mode analysis with translation/rotation
    projection; IR intensities from dipole derivatives if given.

    Matches PySCF hessian.thermo.harmonic_analysis semantics (frequencies in
    cm^-1, imaginary reported as negative values).
    """
    natm = mol.natm
    masses = mol.masses * AMU2AU              # electron-mass units
    sq = np.repeat(np.sqrt(masses), 3)
    Hmw = H / sq[:, None] / sq[None, :]

    # projection of translations+rotations
    if project_tr:
        coords = mol.coords - (mol.masses[:, None] * mol.coords).sum(0) \
            / mol.masses.sum()
        vecs = []
        for d in range(3):
            t = np.zeros((natm, 3))
            t[:, d] = np.sqrt(masses)
            vecs.append(t.ravel())
        for d in range(3):
            r = np.zeros((natm, 3))
            ax = np.zeros(3)
            ax[d] = 1.0
            r[:] = np.cross(np.tile(ax, (natm, 1)), coords)
            r *= np.sqrt(masses)[:, None]
            if np.linalg.norm(r) > 1e-10:
                vecs.append(r.ravel())
        V = np.stack(vecs, axis=1)
        Q, _ = np.linalg.qr(V)
        P = np.eye(3 * natm) - Q @ Q.T
        Hmw = P @ Hmw @ P

    w, U = np.linalg.eigh(Hmw)
    # drop the 5/6 smallest-|w| TR modes
    ntr = 5 if _is_linear(mol) else 6
    order = np.argsort(np.abs(w))
    keep = np.sort(order[ntr:])
    w = w[keep]
    U = U[:, keep]

    freq_au = np.sign(w) * np.sqrt(np.abs(w))
    freq_cm = freq_au * HARTREE2WAVENUMBER
    modes = (U / sq[:, None]).T.reshape(-1, natm, 3)

    ir = None
    if dmu_dR is not None:
        # dmu/dQ_k = sum_i dmu/dx_i * U_ik / sqrt(m_i)  (in e*bohr/(bohr*sqrt(me)))
        dmudq = np.einsum("id,ik->kd", dmu_dR, U / sq[:, None])
        # convert to (e*bohr/ (bohr*sqrt(amu))): multiply sqrt(AMU2AU)
        dmudq_amu = dmudq * np.sqrt(AMU2AU)
        ir = IR_KM_MOL * np.einsum("kd,kd->k", dmudq_amu, dmudq_amu)

    nimag = int((freq_cm < -5.0).sum())
    return HarmonicResult(freq_wavenumber=freq_cm, modes=modes, hessian=H,
                          ir_intensity=ir, n_imaginary=nimag,
                          freq_au=freq_au)


def _is_linear(mol: Molecule, tol: float = 1e-6) -> bool:
    if mol.natm < 3:
        return True
    c = mol.coords - mol.coords.mean(0)
    _, s, _ = np.linalg.svd(c)
    return s[1] < tol


def hessian_auto(mf, factory, mol, dm0=None, with_dipole: bool = True,
                 log=None, step: float = 1e-3):
    """Hessian ladder (reference opt-freq.py:390-417 GPU->CPU fallback
    analog): analytic AD-CPHF for RHF/RKS/UHF/UKS references (incl. RSH
    functionals since round 2), FD-of-gradients fallback for anything else
    (e.g. ROHF). Returns (H [3N,3N], dmu_dR [3N,3] or None)."""
    import numpy as _np
    if _np.asarray(mf.mo_coeff).ndim in (2, 3) and \
            type(mf).__name__ not in ("ROHF",):
        try:
            from cctpu.hessian.cphf import analytic_hessian
            if log:
                log("  Hessian: analytic (AD-native CPHF)")
            if with_dipole:
                return analytic_hessian(mf, with_dipole=True)
            return analytic_hessian(mf), None
        except Exception as exc:
            if log:
                log(f"  analytic Hessian unavailable ({exc}); using FD")
    return hessian_fd(factory, mol, dm0=dm0, step=step,
                      with_dipole=with_dipole)
