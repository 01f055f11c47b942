"""GIAO (gauge-including atomic orbital) integral machinery.

Replaces libcint's GIAO integral classes used by pyscf.prop.nmr
(reference templates/calculate_nmr.py:90-112; SURVEY.md §2.2) with a
TPU-native formulation built entirely from *bra-raised* McMurchie–Davidson
blocks: any moment integral <mu| r_c O |nu> equals

    blk_{la+1,lb}[raise(ii, c), jj] + A_c * blk_{la,lb}[ii, jj]

because r_c = (r - A)_c + A_c and (r-A)_c chi_mu is exactly the cartesian
component ii+e_c of the (la+1) shell with the same radial part. No new
E-table machinery is required; every existing cartesian block kernel
(overlap/kinetic, nuclear, W=<1/|r-R| d_beta>, ERI quartet) yields its
moment counterpart for free.

All B-linear quantities are kept in the real antisymmetric representation
X_phys = (i/2c) * Xtilde (complex128 is unsupported on the TPU backend).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from cctpu.core.basis import (BasisSet, cart2sph, cart_components, ncart,
                              nsph)
from cctpu.ints.magnetic import _EPS, _assemble_1e, w_block
from cctpu.ints.md import e_table_1d
from cctpu.ints.one_electron import (_nuclear_block, _overlap_kinetic_block)


@lru_cache(maxsize=None)
def _raise_map(l: int, c: int) -> np.ndarray:
    """Index map: component ii of shell l -> index of ii+e_c in shell l+1."""
    lo = cart_components(l)
    hi = {comp: k for k, comp in enumerate(cart_components(l + 1))}
    out = np.zeros(len(lo), dtype=np.int64)
    for k, (ax, ay, az) in enumerate(lo):
        key = tuple(v + (1 if d == c else 0)
                    for d, v in enumerate((ax, ay, az)))
        out[k] = hi[key]
    return out


def _moment_of(blk_hi, blk_lo, la: int, A):
    """Moment blocks [3, ..., ncart(la), ncB] from the raised-bra block.

    blk_hi: [..., ncart(la+1), ncB] evaluated with the la shell's
    (exps, coefs); blk_lo: [..., ncart(la), ncB]; A: bra center [3].
    """
    outs = []
    for c in range(3):
        rm = _raise_map(la, c)
        outs.append(blk_hi[..., rm, :] + A[c] * blk_lo)
    return jnp.stack(outs)


def ao_centers(basis: BasisSet, coords) -> np.ndarray:
    """[nao, 3] center coordinate of each (spherical) AO."""
    coords = np.asarray(coords)
    out = np.zeros((basis.nao, 3))
    for sh in basis.shells:
        out[sh.ao_start:sh.ao_start + nsph(sh.l)] = coords[sh.atom]
    return out


# ----------------------------------------------------------------------------
# One-electron moment integrals (assembled [3, nao, nao], eager)
# ----------------------------------------------------------------------------

def moment_st_integrals(basis: BasisSet, coords):
    """(mS, mT): <mu| r_c |nu> and <mu| r_c T |nu>, both [3, nao, nao].

    mS is the dipole integral about the origin (moment on the bra —
    identical by multiplicativity); mT has T acting on the ket only.
    """
    def block(la, lb, ea, ca, A, eb, cb, B):
        s_hi, t_hi = _overlap_kinetic_block(la + 1, lb, ea, ca, A, eb, cb, B)
        s_lo, t_lo = _overlap_kinetic_block(la, lb, ea, ca, A, eb, cb, B)
        mS = _moment_of(s_hi, s_lo, la, A)
        mT = _moment_of(t_hi, t_lo, la, A)
        return jnp.concatenate([mS, mT])          # [6, ncA, ncB]

    out = _assemble_1e(basis, coords, block, 6)
    return out[:3], out[3:]


def moment_v_integrals(basis: BasisSet, coords, charges):
    """<mu| r_c V |nu> [3, nao, nao] with V the full nuclear attraction."""
    charges = jnp.asarray(charges)

    def block(la, lb, ea, ca, A, eb, cb, B):
        v_hi = _nuclear_block(la + 1, lb, ea, ca, A, eb, cb, B,
                              coords, charges)
        v_lo = _nuclear_block(la, lb, ea, ca, A, eb, cb, B,
                              coords, charges)
        return _moment_of(v_hi, v_lo, la, A)

    return _assemble_1e(basis, coords, block, 3)


def nabla_integrals(basis: BasisSet, coords):
    """<mu| d/dr_c |nu> [3, nao, nao] (real; antisymmetric)."""
    import math

    def block(la, lb, ea, ca, A, eb, cb, B):
        a = ea[:, None]
        b = eb[None, :]
        p = a + b
        coef = ca[:, None] * cb[None, :]
        pref = (math.pi / p) ** 1.5 * coef
        E = [e_table_1d(la, lb + 1, a, b, A[d] - B[d]) for d in range(3)]

        def s1d(d, i, j):
            if j < 0:
                return 0.0
            return E[d][i][j][0]

        def d1d(d, i, j):
            out = -2.0 * b * s1d(d, i, j + 1)
            if j >= 1:
                out = out + j * s1d(d, i, j - 1)
            return out

        compsA = cart_components(la)
        compsB = cart_components(lb)
        mats = []
        for c in range(3):
            rows = []
            for ii in compsA:
                row = []
                for jj in compsB:
                    fac = [d1d(d, ii[d], jj[d]) if d == c
                           else s1d(d, ii[d], jj[d]) for d in range(3)]
                    row.append(jnp.sum(pref * fac[0] * fac[1] * fac[2]))
                rows.append(jnp.stack(row))
            mats.append(jnp.stack(rows))
        return jnp.stack(mats)

    return _assemble_1e(basis, coords, block, 3)


def moment_w_integrals(basis: BasisSet, coords, R):
    """<mu| r_d (1/|r-R|) d_beta |nu> [3(d), 3(beta), nao, nao].

    Traced in R so jacfwd gives the moment-h01 integrals.
    """
    def block(la, lb, ea, ca, A, eb, cb, B):
        w_hi = w_block(la + 1, lb, ea, ca, A, eb, cb, B, R)  # [3,ncA+,ncB]
        w_lo = w_block(la, lb, ea, ca, A, eb, cb, B, R)
        m = _moment_of(w_hi, w_lo, la, A)                    # [3,3,ncA,ncB]
        return m.reshape((9,) + m.shape[2:])

    out = _assemble_1e(basis, coords, block, 9)
    return out.reshape(3, 3, basis.nao, basis.nao)


def mh01_integrals(basis: BasisSet, coords, R):
    """<mu| r_d [(r-R) x grad]_g / |r-R|^3 |nu> [3(d), 3(g), nao, nao].

    Bra-raised counterpart of magnetic.h01_integrals (same jacfwd-over-R
    derivation of the 1/|r-R|^3 kernel from the 1/|r-R| W integrals).
    """
    JW = jax.jacfwd(lambda Rv: moment_w_integrals(basis, coords, Rv))(
        jnp.asarray(R))                 # [3(d), 3(beta), nao, nao, 3(alpha)]
    out = []
    for gamma in range(3):
        acc = 0.0
        for (al, be, sg) in _EPS[gamma]:
            acc = acc + sg * JW[:, be, :, :, al]
        out.append(acc)
    return jnp.stack(out, axis=1)       # [3(d), 3(gamma), nao, nao]


# ----------------------------------------------------------------------------
# Two-electron moment integrals
# ----------------------------------------------------------------------------

def _eri_quartet_cart(ls, eA, cA, A, eB, cB, B, eC, cC, C, eD, cD, D,
                      omega: Optional[float] = None):
    """Cartesian contracted ERI block [ncA,ncB,ncC,ncD] for one quartet."""
    import math
    from cctpu.ints.md import r_box as _r_box
    from cctpu.ints.two_electron import (_gather_idx, _hermite_3d, _sign_vec)

    la, lb, lc, ld = ls
    lab, lcd = la + lb, lc + ld
    ltot = lab + lcd

    p = eA[:, None] + eB[None, :]
    q = eC[:, None] + eD[None, :]
    wab = cA[:, None] * cB[None, :]
    wcd = cC[:, None] * cD[None, :]
    P = (eA[:, None, None] * A + eB[None, :, None] * B) / p[..., None]
    Q = (eC[:, None, None] * C + eD[None, :, None] * D) / q[..., None]

    Eb = _hermite_3d(la, lb, eA, eB, A, B, wab)
    Ek = _hermite_3d(lc, ld, eC, eD, C, D, wcd)
    Ek = Ek * jnp.asarray(_sign_vec(lcd))

    Kab, Kcd = Eb.shape[0], Ek.shape[0]
    pf, qf = p.reshape(Kab), q.reshape(Kcd)
    Pf, Qf = P.reshape(Kab, 3), Q.reshape(Kcd, 3)
    alpha = pf[:, None] * qf[None, :] / (pf[:, None] + qf[None, :])
    PQ = Pf[:, None, :] - Qf[None, :, :]
    pref = (2.0 * math.pi ** 2.5
            / (pf[:, None] * qf[None, :]
               * jnp.sqrt(pf[:, None] + qf[None, :])))
    if omega is not None:
        s = omega * omega / (alpha + omega * omega)
        Rb = _r_box(ltot, s * alpha, PQ) * (pref * jnp.sqrt(s))[..., None]
    else:
        Rb = _r_box(ltot, alpha, PQ) * pref[..., None]

    idx = jnp.asarray(_gather_idx(lab, lcd))
    Rbig = Rb[:, :, idx]
    tmp = jnp.einsum("kqxy,qcy->kxc", Rbig, Ek)
    cart = jnp.einsum("kax,kxc->ac", Eb, tmp)
    return cart.reshape(ncart(la), ncart(lb), ncart(lc), ncart(ld))


def moment_eri_quartet(ls, eA, cA, A, eB, cB, B, eC, cC, C, eD, cD, D,
                       omega: Optional[float] = None):
    """Spherical moment-ERI block [3, nsA,nsB,nsC,nsD]: (mu r_c nu|lm sg)
    with the moment on electron 1 (the bra pair)."""
    la, lb, lc, ld = ls
    hi = _eri_quartet_cart((la + 1, lb, lc, ld), eA, cA, A, eB, cB, B,
                           eC, cC, C, eD, cD, D, omega)
    lo = _eri_quartet_cart(ls, eA, cA, A, eB, cB, B, eC, cC, C, eD, cD, D,
                           omega)
    m = _moment_of(jnp.moveaxis(hi, 0, -2), jnp.moveaxis(lo, 0, -2),
                   la, A)                       # [3, ncB,ncC, ncA,ncD]
    m = jnp.moveaxis(m, -2, 1)                  # [3, ncA,ncB,ncC,ncD]
    Ts = [jnp.asarray(cart2sph(l)) for l in ls]
    return jnp.einsum("pa,qb,rc,sd,xabcd->xpqrs",
                      Ts[0], Ts[1], Ts[2], Ts[3], m)


@lru_cache(maxsize=None)
def _moment_quartet_vmapped(ls, omega):
    def kern(eA, cA, A, eB, cB, B, eC, cC, C, eD, cD, D):
        return moment_eri_quartet(ls, eA, cA, A, eB, cB, B,
                                  eC, cC, C, eD, cD, D, omega=omega)
    return jax.jit(jax.vmap(kern))


def build_moment_eri_incore(basis: BasisSet, coords,
                            omega: Optional[float] = None) -> np.ndarray:
    """(mu r_c nu | la sg) [3, nao, nao, nao, nao] (validation-size only).

    Symmetric within each pair (r_c multiplicative), NOT under pair swap.
    """
    from cctpu.ints.two_electron import _class_chunk, pair_classes

    coords = jnp.asarray(coords)
    nao = basis.nao
    out = np.zeros((3, nao, nao, nao, nao))
    pcs = pair_classes(basis)
    for p1 in pcs:                      # bra pair (moment side)
        for p2 in pcs:                  # ket pair
            q1, q2 = np.mgrid[0:p1.n, 0:p2.n]
            q1, q2 = q1.ravel(), q2.ravel()
            ls = (p1.la, p1.lb, p2.la, p2.lb)
            vkern = _moment_quartet_vmapped(ls, omega)
            chunk = _class_chunk((p1.la + 1, p1.lb, p2.la, p2.lb),
                                 p1.exps_a.shape[1], p1.exps_b.shape[1],
                                 p2.exps_a.shape[1], p2.exps_b.shape[1])
            nreal = len(q1)
            npad = (-nreal) % chunk
            q1 = np.concatenate([q1, np.zeros(npad, np.int64)])
            q2 = np.concatenate([q2, np.zeros(npad, np.int64)])
            sa, sb = nsph(p1.la), nsph(p1.lb)
            sc, sd = nsph(p2.la), nsph(p2.lb)
            for s in range(0, len(q1), chunk):
                sl1, sl2 = q1[s:s + chunk], q2[s:s + chunk]
                blocks = np.asarray(vkern(
                    jnp.asarray(p1.exps_a[sl1]), jnp.asarray(p1.coefs_a[sl1]),
                    coords[p1.atom_a[sl1]],
                    jnp.asarray(p1.exps_b[sl1]), jnp.asarray(p1.coefs_b[sl1]),
                    coords[p1.atom_b[sl1]],
                    jnp.asarray(p2.exps_a[sl2]), jnp.asarray(p2.coefs_a[sl2]),
                    coords[p2.atom_a[sl2]],
                    jnp.asarray(p2.exps_b[sl2]), jnp.asarray(p2.coefs_b[sl2]),
                    coords[p2.atom_b[sl2]],
                ))
                nq = min(chunk, nreal - s)
                if nq <= 0:
                    break
                for t in range(nq):
                    a0, b0 = p1.ao_a[sl1[t]], p1.ao_b[sl1[t]]
                    c0, d0 = p2.ao_a[sl2[t]], p2.ao_b[sl2[t]]
                    blk = blocks[t]
                    for (r0, r1, bt) in ((a0, b0, blk),
                                         (b0, a0, blk.transpose(0, 2, 1, 3, 4))):
                        out[:, r0:r0+bt.shape[1], r1:r1+bt.shape[2],
                            c0:c0+sc, d0:d0+sd] = bt
                        out[:, r0:r0+bt.shape[1], r1:r1+bt.shape[2],
                            d0:d0+sd, c0:c0+sc] = bt.transpose(0, 1, 2, 4, 3)
    return out


def build_moment_3c2e_eager(basis: BasisSet, aux: BasisSet, coords,
                            omega: Optional[float] = None) -> np.ndarray:
    """(P| mu r_c nu) [3, naux, nao, nao] (moment on the AO pair).

    Bra-raised variant of ints.df.build_3c2e_eager; the auxiliary function
    rides electron 1 with a dummy s partner, the AO pair is electron 2 —
    so the raise applies to the quartet's third slot and the moment-eri
    kernel is called with the pairs swapped (moment side first).
    """
    from cctpu.ints.df import _DUMMY_C, _DUMMY_E
    from cctpu.ints.two_electron import _class_chunk, pair_classes

    coords = jnp.asarray(coords)
    naux, nao = aux.nao, basis.nao
    out = np.zeros((3, naux, nao, nao))
    de = jnp.asarray(_DUMMY_E)
    dc = jnp.asarray(_DUMMY_C)
    pcs = pair_classes(basis)
    for lP in sorted(aux.groups):
        gP = aux.groups[lP]
        nP = len(gP.shell_idx)
        sP = nsph(lP)
        for pc in pcs:
            # moment pair first: (a r_c b | P 0)
            ls = (pc.la, pc.lb, lP, 0)
            vkern = _moment_quartet_vmapped(ls, omega)
            q1, q2 = np.mgrid[0:nP, 0:pc.n]
            q1, q2 = q1.ravel(), q2.ravel()
            chunk = _class_chunk((pc.la + 1, pc.lb, lP, 0),
                                 pc.exps_a.shape[1], pc.exps_b.shape[1],
                                 gP.exps.shape[1], 1)
            nreal = len(q1)
            npad = (-nreal) % chunk
            q1 = np.concatenate([q1, np.zeros(npad, np.int64)])
            q2 = np.concatenate([q2, np.zeros(npad, np.int64)])
            sa, sb = nsph(pc.la), nsph(pc.lb)
            for s in range(0, len(q1), chunk):
                s1, s2 = q1[s:s + chunk], q2[s:s + chunk]
                blocks = np.asarray(vkern(
                    jnp.asarray(pc.exps_a[s2]), jnp.asarray(pc.coefs_a[s2]),
                    coords[pc.atom_a[s2]],
                    jnp.asarray(pc.exps_b[s2]), jnp.asarray(pc.coefs_b[s2]),
                    coords[pc.atom_b[s2]],
                    jnp.asarray(gP.exps[s1]), jnp.asarray(gP.coefs[s1]),
                    coords[gP.atom_idx[s1]],
                    de[None, :].repeat(len(s1), 0),
                    dc[None, :].repeat(len(s1), 0),
                    coords[gP.atom_idx[s1]],
                ))                      # [chunk, 3, sa, sb, sP, 1]
                nq = min(chunk, nreal - s)
                if nq <= 0:
                    break
                for t in range(nq):
                    P0 = gP.ao_start[s1[t]]
                    a0, b0 = pc.ao_a[s2[t]], pc.ao_b[s2[t]]
                    blk = blocks[t][:, :, :, :, 0]       # [3, sa, sb, sP]
                    blk = np.moveaxis(blk, 3, 1)          # [3, sP, sa, sb]
                    out[:, P0:P0+sP, a0:a0+sa, b0:b0+sb] = blk
                    out[:, P0:P0+sP, b0:b0+sb, a0:a0+sa] = \
                        blk.transpose(0, 1, 3, 2)
    return out
