"""Two-electron repulsion integrals (ERIs): 4-center, 3-center (DF), 2-center.

TPU-native McMurchie–Davidson formulation (replaces libcint's CINTgout2e and
gpu4pyscf's CUDA Rys kernels — SURVEY.md §2.2): shell quartets are grouped by
angular-momentum class so every kernel instance has fully static shapes, the
primitive dimension is padded per class, and the quartet batch axis is
``vmap``ed. The Hermite bra/ket expansion tensors hit the MXU through einsum
contractions; class batches are chunked to bound VMEM/HBM.

A 3c2e integral (P|ab) is the same kernel with a dummy s-function (exponent
0, coefficient 1) paired with the auxiliary shell — no special code path.

``omega`` support (erf-attenuated Coulomb for range-separated hybrids like
CAM-B3LYP/wB97X — reference templates/calculate_uv_spectrum.py methods) enters
through the Boys ladder: with rho = pq/(p+q) and s = w^2/(rho+w^2),
F_n(T) -> sqrt(s) * s^n * F_n(s*T), which is exactly the Hermite-consistent
long-range kernel.
"""

from __future__ import annotations

import math
import os
from functools import lru_cache, partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cctpu.core.basis import BasisSet, cart2sph, cart_components, ncart, nsph
from cctpu.ints.boys import boys
from cctpu.ints.md import e3_components, r_box as _r_box


def _hermite_3d(la: int, lb: int, ea, eb, A, B, coef):
    """Hermite expansion tensor E3[K, ncA*ncB, (lab+1)^3] for a shell pair.

    ea: [npA], eb: [npB], A,B: [3]; coef: [npA,npB] contraction product.
    K = npA*npB flattened primitive-pair axis.
    """
    a = ea[:, None]
    b = eb[None, :]
    E3 = e3_components(la, lb, a, b, A, B)          # [npA,npB,nc2,box^3]
    E3 = E3 * coef[:, :, None, None]
    K = E3.shape[0] * E3.shape[1]
    return E3.reshape(K, E3.shape[2], E3.shape[3])


@lru_cache(maxsize=None)
def _gather_idx(lab: int, lcd: int) -> np.ndarray:
    """IDX[(lab+1)^3, (lcd+1)^3] flat index into the (ltot+1)^3 R box."""
    ltot = lab + lcd
    b1, b2, bt = lab + 1, lcd + 1, ltot + 1
    idx = np.zeros((b1 ** 3, b2 ** 3), dtype=np.int32)
    for i1, (t, u, v) in enumerate(np.ndindex(b1, b1, b1)):
        for i2, (tt, uu, vv) in enumerate(np.ndindex(b2, b2, b2)):
            idx[i1, i2] = ((t + tt) * bt + (u + uu)) * bt + (v + vv)
    return idx


@lru_cache(maxsize=None)
def _sign_vec(lcd: int) -> np.ndarray:
    """(-1)^(t+u+v) over the ket Hermite box."""
    b = lcd + 1
    s = np.empty(b ** 3)
    for i, (t, u, v) in enumerate(np.ndindex(b, b, b)):
        s[i] = (-1.0) ** (t + u + v)
    return s




def eri_quartet_kernel(ls: Tuple[int, int, int, int],
                       eA, cA, A, eB, cB, B, eC, cC, C, eD, cD, D,
                       omega: Optional[float] = None,
                       split_dots: bool = False):
    """Contracted spherical ERI block [nsA,nsB,nsC,nsD] for one shell quartet.

    e*: [np*] exponents (padded with 1s), c*: [np*] coefficients (padded 0).

    split_dots=True routes every contraction through the bf16 3-slice
    error-compensated scheme (ops/splitdot.py): native MXU dots immune to
    backend f64-dot handling, f32-grade output. PRIMAL-ONLY — the eager
    superbatch builders (ints/df.py) use it; AD-traced paths must keep the
    default f64 einsums.
    """
    la, lb, lc, ld = ls
    lab, lcd = la + lb, lc + ld
    ltot = lab + lcd

    p = eA[:, None] + eB[None, :]
    q = eC[:, None] + eD[None, :]
    wab = cA[:, None] * cB[None, :]
    wcd = cC[:, None] * cD[None, :]
    P = (eA[:, None, None] * A + eB[None, :, None] * B) / p[..., None]
    Q = (eC[:, None, None] * C + eD[None, :, None] * D) / q[..., None]

    Eb = _hermite_3d(la, lb, eA, eB, A, B, wab)        # [Kab, nab, T1]
    Ek = _hermite_3d(lc, ld, eC, eD, C, D, wcd)        # [Kcd, ncd, T2]
    Ek = Ek * jnp.asarray(_sign_vec(lcd))

    Kab = Eb.shape[0]
    Kcd = Ek.shape[0]
    pf = p.reshape(Kab)
    qf = q.reshape(Kcd)
    Pf = P.reshape(Kab, 3)
    Qf = Q.reshape(Kcd, 3)

    alpha = pf[:, None] * qf[None, :] / (pf[:, None] + qf[None, :])
    PQ = Pf[:, None, :] - Qf[None, :, :]
    pref = (2.0 * math.pi ** 2.5
            / (pf[:, None] * qf[None, :]
               * jnp.sqrt(pf[:, None] + qf[None, :])))

    if omega is not None:
        s = omega * omega / (alpha + omega * omega)
        Rb = _r_box(ltot, s * alpha, PQ)
        Rb = Rb * (pref * jnp.sqrt(s))[..., None]
    else:
        Rb = _r_box(ltot, alpha, PQ)
        Rb = Rb * pref[..., None]

    idx = jnp.asarray(_gather_idx(lab, lcd))           # [T1, T2]
    Rbig = Rb[:, :, idx]                               # [Kab, Kcd, T1, T2]

    Ta = jnp.asarray(cart2sph(la))
    Tb = jnp.asarray(cart2sph(lb))
    Tc = jnp.asarray(cart2sph(lc))
    Td = jnp.asarray(cart2sph(ld))

    if split_dots:
        from cctpu.ops.splitdot import split_einsum
        tmp = split_einsum("kqxy,qcy->kxc", Rbig, Ek)   # [Kab, T1, ncd]
        cart = split_einsum("kax,kxc->ac", Eb, tmp)     # [nab, ncd]
        cart = cart.reshape(ncart(la), ncart(lb), ncart(lc), ncart(ld))
        x = split_einsum("pa,abcd->pbcd", Ta, cart)
        x = split_einsum("qb,pbcd->pqcd", Tb, x)
        x = split_einsum("rc,pqcd->pqrd", Tc, x)
        return split_einsum("sd,pqrd->pqrs", Td, x)

    # Contract: out[ab, cd] = sum_{Kab,Kcd,T1,T2} Eb*Rbig*Ek.
    # precision is pinned HIGHEST here (independent of the global default):
    # when the superbatch builders lax.map this kernel, XLA batches these
    # einsums into MXU dots, and on the axon TPU a default-precision f64
    # dot is only bf16-grade (micro_probe.py P4b) — that corrupted the
    # whole DF stack in round 2.
    _PH = jax.lax.Precision.HIGHEST
    tmp = jnp.einsum("kqxy,qcy->kxc", Rbig, Ek,
                     precision=_PH)                    # [Kab, T1, ncd]
    cart = jnp.einsum("kax,kxc->ac", Eb, tmp,
                      precision=_PH)                   # [nab, ncd]
    cart = cart.reshape(ncart(la), ncart(lb), ncart(lc), ncart(ld))

    out = jnp.einsum("pa,qb,rc,sd,abcd->pqrs", Ta, Tb, Tc, Td, cart,
                     precision=_PH)
    return out


def energy_2e_direct(basis: BasisSet, coords, dm, k_weight: float = 0.5,
                     omega: Optional[float] = None,
                     dm_k=None, omega_k: Optional[float] = None,
                     screen_qs=None, screen_tol: float = 1e-13):
    """E_2e = 1/2 sum D J(D) - k_weight/2 * sum D K(D), fully differentiable.

    Never materializes the nao^4 tensor: each unique shell quartet's block is
    contracted immediately with gathered density sub-blocks using the 8-fold
    symmetry multiplicities. This is both the gradient path (jax.grad w.r.t.
    coords gives the exact two-electron nuclear-gradient term) and the
    blueprint for the fused direct-Fock TPU kernel.

    dm: [nao, nao] total density (restricted) or [2, nao, nao] spin densities.
    k_weight: 0.5 for RHF-like exchange of the *total* density; for
    spin-resolved dm the exchange is summed per spin with weight 1.
    dm_k/omega_k: optionally use a different density / range separation for
    the exchange term (RSH support).
    """
    coords = jnp.asarray(coords)
    nao = basis.nao
    spin_resolved = dm.ndim == 3
    if dm_k is None:
        dm_k = dm
    # pad density with a zero row/col for padding quartets
    if spin_resolved:
        Dt = jnp.pad(dm[0] + dm[1], ((0, 1), (0, 1)))
        Dks = jnp.pad(dm_k, ((0, 0), (0, 1), (0, 1)))
    else:
        Dt = jnp.pad(dm, ((0, 1), (0, 1)))
        Dks = jnp.pad(dm_k, ((0, 1), (0, 1)))[None]

    pcs = pair_classes(basis)
    e_j = 0.0
    e_k = 0.0
    for i1, p1 in enumerate(pcs):
        for j2, p2 in enumerate(pcs[i1:]):
            same = p1 is p2
            q1, q2 = np.mgrid[0:p1.n, 0:p2.n]
            q1, q2 = q1.ravel(), q2.ravel()
            if same:
                keep = q1 <= q2
                q1, q2 = q1[keep], q2[keep]
            if screen_qs is not None:
                # Schwarz bound |(ab|cd)| <= Q_ab Q_cd — drop negligible
                # quartets (coords-independent mask from the reference
                # geometry, so the traced gradient path can use it too)
                keep = (screen_qs[i1][q1] * screen_qs[i1 + j2][q2]
                        > screen_tol)
                q1, q2 = q1[keep], q2[keep]
                if len(q1) == 0:
                    continue

            # multiplicities w1*w2*wbk (see derivation in grad tests)
            w1 = np.where(np.asarray(p1.ia)[q1] == np.asarray(p1.ib)[q1]
                          if p1.la == p1.lb else np.zeros(len(q1), bool),
                          1.0, 2.0)
            w2 = np.where(np.asarray(p2.ia)[q2] == np.asarray(p2.ib)[q2]
                          if p2.la == p2.lb else np.zeros(len(q2), bool),
                          1.0, 2.0)
            wbk = np.where(same & (q1 == q2), 1.0, 2.0)
            mult = w1 * w2 * wbk

            ls = (p1.la, p1.lb, p2.la, p2.lb)
            vkern = _quartet_vmapped_open(ls, omega)
            chunk = _class_chunk(ls, p1.exps_a.shape[1], p1.exps_b.shape[1],
                                 p2.exps_a.shape[1], p2.exps_b.shape[1])
            nreal = len(q1)
            npad = (-nreal) % chunk
            q1p = np.concatenate([q1, np.zeros(npad, np.int64)])
            q2p = np.concatenate([q2, np.zeros(npad, np.int64)])
            multp = np.concatenate([mult, np.zeros(npad)])
            padm = np.concatenate([np.zeros(nreal, bool), np.ones(npad, bool)])
            sa, sb = nsph(p1.la), nsph(p1.lb)
            sc, sd = nsph(p2.la), nsph(p2.lb)
            for s in range(0, len(q1p), chunk):
                sl1, sl2 = q1p[s:s+chunk], q2p[s:s+chunk]
                mu = jnp.asarray(multp[s:s+chunk])
                pm = padm[s:s+chunk]
                blocks = vkern(
                    jnp.asarray(p1.exps_a[sl1]), jnp.asarray(p1.coefs_a[sl1]),
                    coords[p1.atom_a[sl1]],
                    jnp.asarray(p1.exps_b[sl1]), jnp.asarray(p1.coefs_b[sl1]),
                    coords[p1.atom_b[sl1]],
                    jnp.asarray(p2.exps_a[sl2]), jnp.asarray(p2.coefs_a[sl2]),
                    coords[p2.atom_a[sl2]],
                    jnp.asarray(p2.exps_b[sl2]), jnp.asarray(p2.coefs_b[sl2]),
                    coords[p2.atom_b[sl2]],
                )
                A = np.where(pm[:, None], nao,
                             p1.ao_a[sl1][:, None] + np.arange(sa))
                B = np.where(pm[:, None], nao,
                             p1.ao_b[sl1][:, None] + np.arange(sb))
                C = np.where(pm[:, None], nao,
                             p2.ao_a[sl2][:, None] + np.arange(sc))
                Dx = np.where(pm[:, None], nao,
                              p2.ao_b[sl2][:, None] + np.arange(sd))
                Dab = Dt[A[:, :, None], B[:, None, :]]
                Dcd = Dt[C[:, :, None], Dx[:, None, :]]
                e_j = e_j + 0.5 * jnp.einsum(
                    "q,qabcd,qab,qcd->", mu, blocks, Dab, Dcd)
                if k_weight:
                    for Dk in Dks:
                        Dac = Dk[A[:, :, None], C[:, None, :]]
                        Dbd = Dk[B[:, :, None], Dx[:, None, :]]
                        Dad = Dk[A[:, :, None], Dx[:, None, :]]
                        Dbc = Dk[B[:, :, None], C[:, None, :]]
                        e_k = e_k + 0.125 * jnp.einsum(
                            "q,qabcd,qac,qbd->", mu, blocks, Dac, Dbd) \
                            + 0.125 * jnp.einsum(
                            "q,qabcd,qad,qbc->", mu, blocks, Dad, Dbc)
    kw = k_weight if not spin_resolved else 2.0 * k_weight
    return e_j - kw * e_k


def _quartet_vmapped_open(ls, omega):
    """Non-jitted vmapped quartet kernel for use inside outer jit traces."""
    return _quartet_vmapped(ls, omega)


@lru_cache(maxsize=None)
def _e2_chunk_grad_fn(ls: Tuple[int, int, int, int], spin_resolved: bool,
                      k_weight: float, omega):
    """Cached jitted gradient of one quartet-chunk's 2e energy w.r.t. the
    full coordinate array. Index arrays are runtime args, so one compile
    serves every chunk of the class — the eager TPU gradient path."""
    sa_ = None

    def chunk_energy(coords, Dt, Dks, mult,
                     eA, cA, iA, aoA, eB, cB, iB, aoB,
                     eC, cC, iC, aoC, eD, cD, iD, aoD):
        blocks = jax.vmap(partial(eri_quartet_kernel, ls, omega=omega))(
            eA, cA, coords[iA], eB, cB, coords[iB],
            eC, cC, coords[iC], eD, cD, coords[iD])
        sa, sb = nsph(ls[0]), nsph(ls[1])
        sc, sd = nsph(ls[2]), nsph(ls[3])
        ar = aoA[:, None] + jnp.arange(sa)[None, :]
        br = aoB[:, None] + jnp.arange(sb)[None, :]
        cr = aoC[:, None] + jnp.arange(sc)[None, :]
        dr = aoD[:, None] + jnp.arange(sd)[None, :]
        Dab = Dt[ar[:, :, None], br[:, None, :]]
        Dcd = Dt[cr[:, :, None], dr[:, None, :]]
        e_j = 0.5 * jnp.einsum("q,qabcd,qab,qcd->", mult, blocks, Dab, Dcd)
        e_k = 0.0
        if k_weight:
            for s in range(Dks.shape[0]):
                Dk = Dks[s]
                Dac = Dk[ar[:, :, None], cr[:, None, :]]
                Dbd = Dk[br[:, :, None], dr[:, None, :]]
                Dad = Dk[ar[:, :, None], dr[:, None, :]]
                Dbc = Dk[br[:, :, None], cr[:, None, :]]
                e_k = e_k + 0.125 * jnp.einsum(
                    "q,qabcd,qac,qbd->", mult, blocks, Dac, Dbd) \
                    + 0.125 * jnp.einsum(
                    "q,qabcd,qad,qbc->", mult, blocks, Dad, Dbc)
        kw = k_weight if not spin_resolved else 2.0 * k_weight
        return e_j - kw * e_k

    return jax.jit(jax.grad(chunk_energy, argnums=0))


def energy_2e_grad_eager(basis: BasisSet, coords, dm, k_weight: float = 1.0,
                         omega=None) -> np.ndarray:
    """d(E_2e)/dR accumulated chunk-by-chunk with cached per-class compiled
    gradients (serialized dispatch — TPU remote-compile friendly)."""
    coords = jnp.asarray(coords)
    nao = basis.nao
    spin_resolved = dm.ndim == 3
    if spin_resolved:
        Dt = jnp.pad(dm[0] + dm[1], ((0, 1), (0, 1)))
        Dks = jnp.pad(dm, ((0, 0), (0, 1), (0, 1)))
    else:
        Dt = jnp.pad(dm, ((0, 1), (0, 1)))
        Dks = jnp.pad(dm, ((0, 1), (0, 1)))[None]

    pcs = pair_classes(basis)
    qs = schwarz_q(pcs, coords)
    gtot = np.zeros(coords.shape)
    g_pending = []         # async dispatch waves (axon round-trip latency)
    for i1, p1 in enumerate(pcs):
        for j2, p2 in enumerate(pcs[i1:]):
            same = p1 is p2
            q1, q2 = np.mgrid[0:p1.n, 0:p2.n]
            q1, q2 = q1.ravel(), q2.ravel()
            if same:
                keep = q1 <= q2
                q1, q2 = q1[keep], q2[keep]
            keep = qs[i1][q1] * qs[i1 + j2][q2] > 1e-13
            q1, q2 = q1[keep], q2[keep]
            if len(q1) == 0:
                continue
            w1 = np.where(np.asarray(p1.ia)[q1] == np.asarray(p1.ib)[q1]
                          if p1.la == p1.lb else np.zeros(len(q1), bool),
                          1.0, 2.0)
            w2 = np.where(np.asarray(p2.ia)[q2] == np.asarray(p2.ib)[q2]
                          if p2.la == p2.lb else np.zeros(len(q2), bool),
                          1.0, 2.0)
            wbk = np.where(same & (q1 == q2), 1.0, 2.0)
            mult = w1 * w2 * wbk
            ls = (p1.la, p1.lb, p2.la, p2.lb)
            gfn = _e2_chunk_grad_fn(ls, spin_resolved, float(k_weight),
                                    omega)
            chunk = _class_chunk(ls, p1.exps_a.shape[1], p1.exps_b.shape[1],
                                 p2.exps_a.shape[1], p2.exps_b.shape[1])
            nreal = len(q1)
            npad = (-nreal) % chunk
            q1p = np.concatenate([q1, np.zeros(npad, np.int64)])
            q2p = np.concatenate([q2, np.zeros(npad, np.int64)])
            multp = np.concatenate([mult, np.zeros(npad)])
            padm = np.concatenate([np.zeros(nreal, bool),
                                   np.ones(npad, bool)])
            sa, sb = nsph(p1.la), nsph(p1.lb)
            sc, sd = nsph(p2.la), nsph(p2.lb)
            for s in range(0, len(q1p), chunk):
                sl1, sl2 = q1p[s:s+chunk], q2p[s:s+chunk]
                pm = padm[s:s+chunk]
                aoA = np.where(pm, nao, p1.ao_a[sl1])
                aoB = np.where(pm, nao, p1.ao_b[sl1])
                aoC = np.where(pm, nao, p2.ao_a[sl2])
                aoD = np.where(pm, nao, p2.ao_b[sl2])
                g = gfn(coords, Dt, Dks, jnp.asarray(multp[s:s+chunk]),
                        jnp.asarray(p1.exps_a[sl1]),
                        jnp.asarray(p1.coefs_a[sl1]),
                        jnp.asarray(p1.atom_a[sl1]), jnp.asarray(aoA),
                        jnp.asarray(p1.exps_b[sl1]),
                        jnp.asarray(p1.coefs_b[sl1]),
                        jnp.asarray(p1.atom_b[sl1]), jnp.asarray(aoB),
                        jnp.asarray(p2.exps_a[sl2]),
                        jnp.asarray(p2.coefs_a[sl2]),
                        jnp.asarray(p2.atom_a[sl2]), jnp.asarray(aoC),
                        jnp.asarray(p2.exps_b[sl2]),
                        jnp.asarray(p2.coefs_b[sl2]),
                        jnp.asarray(p2.atom_b[sl2]), jnp.asarray(aoD))
                g_pending.append(g)
                if len(g_pending) >= 64:
                    for gg in g_pending:
                        gtot += np.asarray(gg)
                    g_pending.clear()
    for gg in g_pending:
        gtot += np.asarray(gg)
    return gtot


@lru_cache(maxsize=None)
def _quartet_vmapped(ls: Tuple[int, int, int, int], omega: Optional[float]):
    """Cached jitted+vmapped quartet kernel — one compile per class/shape."""
    def kern(eA, cA, A, eB, cB, B, eC, cC, C, eD, cD, D):
        return eri_quartet_kernel(ls, eA, cA, A, eB, cB, B,
                                  eC, cC, C, eD, cD, D, omega=omega)
    return jax.jit(jax.vmap(kern))


# ----------------------------------------------------------------------------
# Pair/quartet bookkeeping (host side, numpy)
# ----------------------------------------------------------------------------

class PairClass:
    """All shell pairs of one (la, lb) class, la <= lb; i <= j when la==lb."""

    def __init__(self, basis: BasisSet, la: int, lb: int):
        ga, gb = basis.groups[la], basis.groups[lb]
        nA, nB = len(ga.shell_idx), len(gb.shell_idx)
        ia, ib = np.mgrid[0:nA, 0:nB]
        ia, ib = ia.ravel(), ib.ravel()
        if la == lb:
            keep = ia <= ib
            ia, ib = ia[keep], ib[keep]
        self.la, self.lb = la, lb
        self.ia, self.ib = ia, ib
        self.exps_a = ga.exps[ia]
        self.coefs_a = ga.coefs[ia]
        self.exps_b = gb.exps[ib]
        self.coefs_b = gb.coefs[ib]
        self.atom_a = ga.atom_idx[ia]
        self.atom_b = gb.atom_idx[ib]
        self.ao_a = ga.ao_start[ia]
        self.ao_b = gb.ao_start[ib]
        self.n = len(ia)


def pair_classes(basis: BasisSet) -> List[PairClass]:
    ls = sorted(basis.groups)
    out = []
    for i, la in enumerate(ls):
        for lb in ls[i:]:
            pc = PairClass(basis, la, lb)
            if pc.n:
                out.append(pc)
    return out


def schwarz_q(pcs: List[PairClass], coords) -> List[np.ndarray]:
    """Schwarz factors per pair class: Q[pair] = sqrt(max_ab |(ab|ab)|).

    |(ab|cd)| <= Q_ab * Q_cd (Cauchy–Schwarz on the ERI inner product), the
    standard CVHF-style screening bound (SURVEY.md §2.2 libcint row, §7.3
    item 1). Host-side, evaluated once per geometry."""
    coords = jnp.asarray(coords)
    out = []
    pending = []           # async dispatch, materialized in one wave

    def _args(pc, chunk):
        def f():
            sl = np.zeros(chunk, np.int64)
            return (jnp.asarray(pc.exps_a[sl]), jnp.asarray(pc.coefs_a[sl]),
                    coords[pc.atom_a[sl]],
                    jnp.asarray(pc.exps_b[sl]), jnp.asarray(pc.coefs_b[sl]),
                    coords[pc.atom_b[sl]]) * 2
        return f

    from cctpu.ints.df import _precompile

    def _sw_job(pc):
        ls = (pc.la, pc.lb, pc.la, pc.lb)
        chunk = _class_chunk(ls, pc.exps_a.shape[1], pc.exps_b.shape[1],
                             pc.exps_a.shape[1], pc.exps_b.shape[1])
        key = (f"sw {ls} c{chunk} "
               f"p{pc.exps_a.shape[1]},{pc.exps_b.shape[1]}")
        return (key, _quartet_vmapped(ls, None), _args(pc, chunk))

    _precompile([_sw_job(pc) for pc in pcs], "schwarz")
    for pc in pcs:
        ls = (pc.la, pc.lb, pc.la, pc.lb)
        vkern = _quartet_vmapped(ls, None)
        chunk = _class_chunk(ls, pc.exps_a.shape[1], pc.exps_b.shape[1],
                             pc.exps_a.shape[1], pc.exps_b.shape[1])
        q = np.zeros(pc.n)
        idx = np.arange(pc.n, dtype=np.int64)
        npad = (-pc.n) % chunk
        idxp = np.concatenate([idx, np.zeros(npad, np.int64)])
        for s in range(0, len(idxp), chunk):
            sl = idxp[s:s + chunk]
            blocks_dev = vkern(
                jnp.asarray(pc.exps_a[sl]), jnp.asarray(pc.coefs_a[sl]),
                coords[pc.atom_a[sl]],
                jnp.asarray(pc.exps_b[sl]), jnp.asarray(pc.coefs_b[sl]),
                coords[pc.atom_b[sl]],
                jnp.asarray(pc.exps_a[sl]), jnp.asarray(pc.coefs_a[sl]),
                coords[pc.atom_a[sl]],
                jnp.asarray(pc.exps_b[sl]), jnp.asarray(pc.coefs_b[sl]),
                coords[pc.atom_b[sl]])       # [chunk, sa, sb, sa, sb]
            nq = min(chunk, pc.n - s)

            def fill(blocks, q=q, s=s, nq=nq):
                if nq > 0:
                    diag = np.abs(np.einsum("qabab->qab", blocks))
                    q[s:s + nq] = np.sqrt(diag.max(axis=(1, 2)))[:nq]

            pending.append((blocks_dev, fill))
        out.append(q)
    for bdev, fill in pending:
        fill(np.asarray(bdev))
    return out


def _class_chunk(ls, npA, npB, npC, npD, budget: int = 32_000_000) -> int:
    """Fixed per-class chunk size bounding the dominant intermediate.

    The true per-quartet peak is the gathered Hermite outer product
    Rbig [Kab, Kcd, T1*T2] with Kab = npA*npB, Kcd = npC*npD (XLA's
    scheduler copies can multiply this by a small constant — seen as a
    19 GB alloc at chunk 8192 on the (0,2,0,2) Schwarz class when the old
    formula used max(T1,T2)). Budget 32M doubles with an 8192 cap: each
    chunk is one remote dispatch on the axon-tunneled TPU (~50-100 ms
    latency), so bigger chunks directly cut the latency-bound eager-build
    wall time (the 3c2e build at C16H34/6-31G* was ~6.5k dispatches)."""
    T1 = (ls[0] + ls[1] + 1) ** 3
    T2 = (ls[2] + ls[3] + 1) ** 3
    cost = max(npA * npB * npC * npD * T1 * T2,
               npA * npB * npC * npD * 16)
    cap = int(os.environ.get("CCTPU_CHUNK_CAP", "8192"))
    c = max(16, min(cap, budget // max(cost, 1)))
    # round to power of two for shape stability
    return 1 << (c.bit_length() - 1)


def build_eri_traced(basis: BasisSet, coords, omega: Optional[float] = None):
    """Fully-traced dense (ij|kl) build (differentiable / vmappable).

    Used by the task-batched SCF (parallel/task_batch.py) where a whole
    batch of geometries runs SCF under one jit sharded over the mesh —
    small-system path (the scatter-assembled trace compiles slowly for
    d-heavy bases; production single-geometry paths use the eager builder).
    """
    coords = jnp.asarray(coords)
    nao = basis.nao
    eri = jnp.zeros((nao + 1, nao + 1, nao + 1, nao + 1))
    pcs = pair_classes(basis)
    for i1, p1 in enumerate(pcs):
        for p2 in pcs[i1:]:
            same = p1 is p2
            q1, q2 = np.mgrid[0:p1.n, 0:p2.n]
            q1, q2 = q1.ravel(), q2.ravel()
            if same:
                keep = q1 <= q2
                q1, q2 = q1[keep], q2[keep]
            ls = (p1.la, p1.lb, p2.la, p2.lb)
            vkern = _quartet_vmapped(ls, omega)
            blocks = vkern(
                jnp.asarray(p1.exps_a[q1]), jnp.asarray(p1.coefs_a[q1]),
                coords[p1.atom_a[q1]],
                jnp.asarray(p1.exps_b[q1]), jnp.asarray(p1.coefs_b[q1]),
                coords[p1.atom_b[q1]],
                jnp.asarray(p2.exps_a[q2]), jnp.asarray(p2.coefs_a[q2]),
                coords[p2.atom_a[q2]],
                jnp.asarray(p2.exps_b[q2]), jnp.asarray(p2.coefs_b[q2]),
                coords[p2.atom_b[q2]],
            )
            shp = {"a": nsph(p1.la), "b": nsph(p1.lb),
                   "c": nsph(p2.la), "d": nsph(p2.lb)}
            base = {"a": p1.ao_a[q1][:, None] + np.arange(shp["a"]),
                    "b": p1.ao_b[q1][:, None] + np.arange(shp["b"]),
                    "c": p2.ao_a[q2][:, None] + np.arange(shp["c"]),
                    "d": p2.ao_b[q2][:, None] + np.arange(shp["d"])}
            vax = {"a": 1, "b": 2, "c": 3, "d": 4}

            def ix(name):
                arr = base[name]
                new = [arr.shape[0], 1, 1, 1, 1]
                new[vax[name]] = arr.shape[1]
                return arr.reshape(new)

            for order in [("a", "b", "c", "d"), ("b", "a", "c", "d"),
                          ("a", "b", "d", "c"), ("b", "a", "d", "c"),
                          ("c", "d", "a", "b"), ("d", "c", "a", "b"),
                          ("c", "d", "b", "a"), ("d", "c", "b", "a")]:
                eri = eri.at[ix(order[0]), ix(order[1]),
                             ix(order[2]), ix(order[3])].set(blocks)
    return eri[:nao, :nao, :nao, :nao]


def build_eri_incore(basis: BasisSet, coords, omega: Optional[float] = None):
    """Full (ij|kl) tensor [nao,nao,nao,nao] as a host numpy array.

    Validation / small-system path: the quartet kernels run jitted on device
    (cached per class/shape thanks to fixed-size chunk padding), but the
    8-fold-symmetry assembly happens in host numpy — XLA scatter compiles
    pathologically for this pattern and the full tensor is only used for
    reference checks, in-core SCF on small molecules, and MO transforms.
    Gradient-bearing paths use the density-fitted builders instead.
    """
    coords = jnp.asarray(coords)
    nao = basis.nao
    eri = np.zeros((nao, nao, nao, nao))
    pcs = pair_classes(basis)

    def _args(p1, p2, chunk):
        def f():
            sl = np.zeros(chunk, np.int64)
            return (jnp.asarray(p1.exps_a[sl]), jnp.asarray(p1.coefs_a[sl]),
                    coords[p1.atom_a[sl]],
                    jnp.asarray(p1.exps_b[sl]), jnp.asarray(p1.coefs_b[sl]),
                    coords[p1.atom_b[sl]],
                    jnp.asarray(p2.exps_a[sl]), jnp.asarray(p2.coefs_a[sl]),
                    coords[p2.atom_a[sl]],
                    jnp.asarray(p2.exps_b[sl]), jnp.asarray(p2.coefs_b[sl]),
                    coords[p2.atom_b[sl]])
        return f

    from cctpu.ints.df import _precompile

    def _ic_job(p1, p2):
        ls = (p1.la, p1.lb, p2.la, p2.lb)
        chunk = _class_chunk(ls, p1.exps_a.shape[1], p1.exps_b.shape[1],
                             p2.exps_a.shape[1], p2.exps_b.shape[1])
        key = (f"ic {ls} om{omega} c{chunk} p{p1.exps_a.shape[1]},"
               f"{p1.exps_b.shape[1]},{p2.exps_a.shape[1]},"
               f"{p2.exps_b.shape[1]}")
        return (key, _quartet_vmapped(ls, omega), _args(p1, p2, chunk))

    _precompile([_ic_job(p1, p2)
                 for i1, p1 in enumerate(pcs) for p2 in pcs[i1:]], "incore")
    for i1, p1 in enumerate(pcs):
        for p2 in pcs[i1:]:
            same = p1 is p2
            q1, q2 = np.mgrid[0:p1.n, 0:p2.n]
            q1, q2 = q1.ravel(), q2.ravel()
            if same:
                keep = q1 <= q2
                q1, q2 = q1[keep], q2[keep]

            ls = (p1.la, p1.lb, p2.la, p2.lb)
            vkern = _quartet_vmapped(ls, omega)
            chunk = _class_chunk(ls, p1.exps_a.shape[1], p1.exps_b.shape[1],
                                 p2.exps_a.shape[1], p2.exps_b.shape[1])
            nreal = len(q1)
            npad = (-nreal) % chunk
            q1 = np.concatenate([q1, np.zeros(npad, np.int64)])
            q2 = np.concatenate([q2, np.zeros(npad, np.int64)])
            for s in range(0, len(q1), chunk):
                sl1 = q1[s:s + chunk]
                sl2 = q2[s:s + chunk]
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
                sa, sb = nsph(p1.la), nsph(p1.lb)
                sc, sd = nsph(p2.la), nsph(p2.lb)
                for t in range(nq):
                    a0, b0 = p1.ao_a[sl1[t]], p1.ao_b[sl1[t]]
                    c0, d0 = p2.ao_a[sl2[t]], p2.ao_b[sl2[t]]
                    blk = blocks[t]
                    eri[a0:a0+sa, b0:b0+sb, c0:c0+sc, d0:d0+sd] = blk
                    eri[b0:b0+sb, a0:a0+sa, c0:c0+sc, d0:d0+sd] = \
                        blk.transpose(1, 0, 2, 3)
                    eri[a0:a0+sa, b0:b0+sb, d0:d0+sd, c0:c0+sc] = \
                        blk.transpose(0, 1, 3, 2)
                    eri[b0:b0+sb, a0:a0+sa, d0:d0+sd, c0:c0+sc] = \
                        blk.transpose(1, 0, 3, 2)
                    eri[c0:c0+sc, d0:d0+sd, a0:a0+sa, b0:b0+sb] = \
                        blk.transpose(2, 3, 0, 1)
                    eri[d0:d0+sd, c0:c0+sc, a0:a0+sa, b0:b0+sb] = \
                        blk.transpose(3, 2, 0, 1)
                    eri[c0:c0+sc, d0:d0+sd, b0:b0+sb, a0:a0+sa] = \
                        blk.transpose(2, 3, 1, 0)
                    eri[d0:d0+sd, c0:c0+sc, b0:b0+sb, a0:a0+sa] = \
                        blk.transpose(3, 2, 1, 0)
    return eri
