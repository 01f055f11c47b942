"""Magnetic one-electron integrals for NMR shielding (common gauge origin).

Replaces the GIAO integral classes of libcint used by pyscf.prop.nmr
(SURVEY.md §2.2) with a common-gauge-origin (CGO) formulation built from
three MD-level kernels, all validated against a one-electron
complex-diagonalization reference (tests/test_nmr.py):

 - angmom:    l[gamma,mu,nu]  = <mu| [(r-G) x grad]_gamma |nu>   (real,
              antisymmetric; the physical operator is -i*l)
 - W:         W[beta,mu,nu]   = <mu| (1/|r-R|) d/dr_beta |nu>
 - M:         M[alpha,mu,nu]  = <mu| (r-G)_alpha / |r-R| |nu>
from which h01 (paramagnetic nuclear) and the diamagnetic shielding
operator follow by jax.jacfwd w.r.t. the nuclear position R.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from cctpu.core.basis import cart2sph, cart_components, ncart, nsph
from cctpu.ints.md import e3_components, e_table_1d, r_box

_EPS = [[(1, 2, 1.0), (2, 1, -1.0)],     # (alpha, beta, sign) for L_x
        [(2, 0, 1.0), (0, 2, -1.0)],     # L_y
        [(0, 1, 1.0), (1, 0, -1.0)]]     # L_z


def _pair_tables(la, lb, ea, eb, A, B, extra=1):
    a = ea[:, None]
    b = eb[None, :]
    tabs = [e_table_1d(la, lb + extra, a, b, A[d] - B[d]) for d in range(3)]
    return a, b, tabs


def angmom_block(la, lb, ea, ca, A, eb, cb, B, G):
    """Cartesian block [3, ncA, ncB] of (r-G) x grad."""
    a, b, E = _pair_tables(la, lb, ea, eb, A, B, extra=2)
    p = a + b
    coef = ca[:, None] * cb[None, :]
    pref = (math.pi / p) ** 1.5 * coef
    P = (a[..., None] * A + b[..., None] * B) / p[..., None]

    def s1d(d, i, j):
        if j < 0:
            return 0.0
        return E[d][i][j][0]

    def m1d(d, i, j):
        e1 = E[d][i][j][1] if (i + j) >= 1 else 0.0
        return e1 + (P[..., d] - G[d]) * E[d][i][j][0]

    def d1d(d, i, j):
        out = -2.0 * b * s1d(d, i, j + 1)
        if j >= 1:
            out = out + j * s1d(d, i, j - 1)
        return out

    compsA = cart_components(la)
    compsB = cart_components(lb)
    out = []
    for gamma in range(3):
        mat = []
        for ii in compsA:
            row = []
            for jj in compsB:
                val = 0.0
                for (al, be, sg) in _EPS[gamma]:
                    fac = [None, None, None]
                    for d in range(3):
                        if d == al and d == be:
                            raise AssertionError
                    for d in range(3):
                        if d == al:
                            fac[d] = m1d(d, ii[d], jj[d])
                        elif d == be:
                            fac[d] = d1d(d, ii[d], jj[d])
                        else:
                            fac[d] = s1d(d, ii[d], jj[d])
                    val = val + sg * fac[0] * fac[1] * fac[2]
                row.append(jnp.sum(pref * val))
            mat.append(jnp.stack(row))
        out.append(jnp.stack(mat))
    return jnp.stack(out)


def _assemble_1e(basis, coords, block_fn, nout):
    """Generic [nout, nao, nao] assembler over shell-pair classes (no
    symmetry assumption — block_fn gives the (bra,ket) block)."""
    nao = basis.nao
    out = jnp.zeros((nout, nao + 1, nao + 1))
    ls = sorted(basis.groups)
    for la in ls:
        ga = basis.groups[la]
        for lb in ls:
            gb = basis.groups[lb]
            nA, nB = len(ga.shell_idx), len(gb.shell_idx)
            ia, ib = np.mgrid[0:nA, 0:nB]
            ia, ib = ia.ravel(), ib.ravel()
            npad = (-len(ia)) % 16
            pad = np.concatenate([np.zeros(len(ia), bool),
                                  np.ones(npad, bool)])
            ia = np.concatenate([ia, np.zeros(npad, np.int64)])
            ib = np.concatenate([ib, np.zeros(npad, np.int64)])

            def fn(ea, caf, A, ebx, cbf, B):
                blk = block_fn(la, lb, ea, caf, A, ebx, cbf, B)
                Ta = jnp.asarray(cart2sph(la))
                Tb = jnp.asarray(cart2sph(lb))
                return jnp.einsum("ac,xcd,bd->xab", Ta, blk, Tb)

            blks = jax.vmap(fn)(jnp.asarray(ga.exps[ia]),
                                jnp.asarray(ga.coefs[ia]),
                                coords[ga.atom_idx[ia]],
                                jnp.asarray(gb.exps[ib]),
                                jnp.asarray(gb.coefs[ib]),
                                coords[gb.atom_idx[ib]])
            rows = ga.ao_start[ia][:, None] + np.arange(nsph(la))
            cols = gb.ao_start[ib][:, None] + np.arange(nsph(lb))
            rows = np.where(pad[:, None], nao, rows)
            cols = np.where(pad[:, None], nao, cols)
            x_i = np.arange(nout)[None, :, None, None]
            r_i = rows[:, None, :, None]
            c_i = cols[:, None, None, :]
            out = out.at[x_i, r_i, c_i].set(blks)
    return out[:, :nao, :nao]


def angmom_integrals(basis, coords, gauge_origin):
    G = jnp.asarray(gauge_origin)
    return _assemble_1e(
        basis, coords,
        lambda la, lb, ea, ca, A, eb, cb, B:
            angmom_block(la, lb, ea, ca, A, eb, cb, B, G), 3)


def w_block(la, lb, ea, ca, A, eb, cb, B, R):
    """[3, ncA, ncB]: <mu| 1/|r-R| d_beta |nu> via derivative E-tables."""
    a = ea[:, None]
    b = eb[None, :]
    p = a + b
    coef = ca[:, None] * cb[None, :]
    P = (a[..., None] * A + b[..., None] * B) / p[..., None]
    ltot = la + lb + 1
    tabs = [e_table_1d(la, lb + 1, a, b, A[d] - B[d]) for d in range(3)]

    def E0(d, i, j, t):
        if j < 0 or t < 0 or t > i + j:
            return None
        return tabs[d][i][j][t]

    def dE(d, i, j, t):
        """E-coefficients of phi_mu * d_beta phi_nu along dim d."""
        out = 0.0
        v = E0(d, i, j + 1, t)
        if v is not None:
            out = out + (-2.0 * b) * v
        if j >= 1:
            v = E0(d, i, j - 1, t)
            if v is not None:
                out = out + j * v
        return out

    PC = P[:, :, None, :] - R[None, None, None, :]
    Rb = r_box(ltot, p[..., None], PC)[:, :, 0, :]     # [npA,npB,(ltot+1)^3]
    box = ltot + 1
    pref = (2.0 * math.pi / p) * coef
    compsA = cart_components(la)
    compsB = cart_components(lb)
    out = []
    for beta in range(3):
        mat = []
        for ii in compsA:
            row = []
            for jj in compsB:
                acc = 0.0
                for t in range(ii[0] + jj[0] + 2):
                    for u in range(ii[1] + jj[1] + 2):
                        for v in range(ii[2] + jj[2] + 2):
                            if t + u + v > ltot:
                                continue
                            fs = []
                            ok = True
                            for d, idx in ((0, t), (1, u), (2, v)):
                                if d == beta:
                                    val = dE(d, ii[d], jj[d], idx)
                                else:
                                    val = E0(d, ii[d], jj[d], idx)
                                    val = 0.0 if val is None else val
                                if val is None:
                                    ok = False
                                    break
                                fs.append(val)
                            if not ok:
                                continue
                            term = fs[0] * fs[1] * fs[2]
                            if isinstance(term, float) and term == 0.0:
                                continue
                            acc = acc + term * Rb[..., (t * box + u) * box + v]
                row.append(jnp.sum(pref * acc))
            mat.append(jnp.stack(row))
        out.append(jnp.stack(mat))
    return jnp.stack(out)


def m_block(la, lb, ea, ca, A, eb, cb, B, R, G):
    """[3, ncA, ncB]: <mu| (r-G)_alpha / |r-R| |nu> via the Hermite moment
    relation (x-P)Lam_t = Lam_{t+1}/(2p) + t Lam_{t-1}."""
    a = ea[:, None]
    b = eb[None, :]
    p = a + b
    coef = ca[:, None] * cb[None, :]
    P = (a[..., None] * A + b[..., None] * B) / p[..., None]
    ltot = la + lb + 1
    tabs = [e_table_1d(la, lb, a, b, A[d] - B[d]) for d in range(3)]

    def E0(d, i, j, t):
        if t < 0 or t > i + j:
            return None
        return tabs[d][i][j][t]

    PC = P[:, :, None, :] - R[None, None, None, :]
    Rb = r_box(ltot, p[..., None], PC)[:, :, 0, :]
    box = ltot + 1
    pref = (2.0 * math.pi / p) * coef
    compsA = cart_components(la)
    compsB = cart_components(lb)
    inv2p = 0.5 / p
    out = []
    for alpha in range(3):
        mat = []
        for ii in compsA:
            row = []
            for jj in compsB:
                acc = 0.0
                lmax_d = [ii[d] + jj[d] for d in range(3)]
                lmax_d[alpha] += 1
                for t in range(lmax_d[0] + 1):
                    for u in range(lmax_d[1] + 1):
                        for v in range(lmax_d[2] + 1):
                            if t + u + v > ltot:
                                continue
                            fs = []
                            for d, idx in ((0, t), (1, u), (2, v)):
                                if d == alpha:
                                    # moment-modified coefficient:
                                    # E'_t = (P-G) E_t + E_{t-1}/(2p)
                                    #        + (t+1) E_{t+1}
                                    val = 0.0
                                    e = E0(d, ii[d], jj[d], idx)
                                    if e is not None:
                                        val = val + (P[..., d] - G[d]) * e
                                    e = E0(d, ii[d], jj[d], idx - 1)
                                    if e is not None:
                                        val = val + inv2p * e
                                    e = E0(d, ii[d], jj[d], idx + 1)
                                    if e is not None:
                                        val = val + (idx + 1) * e
                                else:
                                    e = E0(d, ii[d], jj[d], idx)
                                    val = 0.0 if e is None else e
                                fs.append(val)
                            term = fs[0] * fs[1] * fs[2]
                            if isinstance(term, float) and term == 0.0:
                                continue
                            acc = acc + term * Rb[..., (t * box + u) * box + v]
                row.append(jnp.sum(pref * acc))
            mat.append(jnp.stack(row))
        out.append(jnp.stack(mat))
    return jnp.stack(out)


def w_integrals(basis, coords, R):
    """W[beta, nao, nao] at nuclear position R (traced in R for jacfwd)."""
    return _assemble_1e(
        basis, coords,
        lambda la, lb, ea, ca, A, eb, cb, B:
            w_block(la, lb, ea, ca, A, eb, cb, B, R), 3)


def m_integrals(basis, coords, R, G):
    G = jnp.asarray(G)
    return _assemble_1e(
        basis, coords,
        lambda la, lb, ea, ca, A, eb, cb, B:
            m_block(la, lb, ea, ca, A, eb, cb, B, R, G), 3)


def h01_integrals(basis, coords, R):
    """h01[gamma, nao, nao] = <mu| [(r-R) x grad]_gamma / |r-R|^3 |nu>
    (real antisymmetric part; physical operator is -i*h01)."""
    JW = jax.jacfwd(lambda Rv: w_integrals(basis, coords, Rv))(
        jnp.asarray(R))                      # [3(beta), nao, nao, 3(alpha)]
    out = []
    for gamma in range(3):
        acc = 0.0
        for (al, be, sg) in _EPS[gamma]:
            acc = acc + sg * JW[be, :, :, al]
        out.append(acc)
    return jnp.stack(out)


def dia_integrals(basis, coords, R, G):
    """dia[alpha, beta, nao, nao] =
    <mu| [(r-G).(r-R) d_ab - (r-R)_alpha (r-G)_beta]/|r-R|^3 |nu>."""
    JM = jax.jacfwd(lambda Rv: m_integrals(basis, coords, Rv, G))(
        jnp.asarray(R))                      # [3(alpha_m), nao,nao, 3(dR)]
    # <(r-G)_a (r-R)_b / r^3> = d/dR_b M_a
    trace = sum(JM[g, :, :, g] for g in range(3))
    out = jnp.zeros((3, 3) + JM.shape[1:3])
    for al in range(3):
        for be in range(3):
            v = -JM[be, :, :, al]            # -(r-R)_al (r-G)_be /r^3
            if al == be:
                v = v + trace
            out = out.at[al, be].set(v)
    return out
