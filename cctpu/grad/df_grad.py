"""Eager per-class nuclear gradient of the density-fitted 2e energy.

The BASELINE north-star metric is SCF+GRADIENT s/iter at B3LYP/6-31G*
(50 heavy atoms): production SCF runs density-fitted J/K, so the
gradient must differentiate the DF energy — and on the axon TPU it must
be assembled class-by-class (the remote compiler cannot digest the
whole DF Lagrangian as one traced module; grad/scf_grad.py:41-54).

Math (robust-fit DF with M^+ = Linv^T Linv, B = Linv X, fitted ERIs
(ab|cd) = X^T M^+ X; identical to the SCF's own J/K energy):

  E_J = 1/2 u^T M^+ u,            u_P   = sum_ab X_P,ab D_ab
  E_K = -(ax/2) sum_s tr-chain,   t^s_PQ = Tr[X_P D_s X_Q D_s]

  dE_2 = sum_P,ab dX_P,ab W_P,ab + sum_PQ dM_PQ Z_PQ with
    W_P  = gamma_P D - ax sum_s (D_s Xt_P D_s),   gamma = M^+ u
    Z_PQ = -1/2 gamma_P gamma_Q
           + (ax/2) sum_s Tr[Xt_P D_s Xt_Q D_s],  Xt = M^+ X

(the pseudo-inverse's dropped near-null directions contribute only
fit-tolerance noise, the standard DF-gradient approximation — PySCF's
df.grad does the same; reference rides it via gpu4pyscf in
templates/opt-freq.py:369-377). gamma/W/Z come from the stored B32 and
Linv — X itself is never rebuilt. dX/dM contractions are AD-through-
the-quartet-kernel per angular-momentum class with runtime index
arrays, mirroring ints/two_electron.energy_2e_grad_eager.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from cctpu.core.basis import nsph
from cctpu.utils.deadline import check
from cctpu.ints.df import _DUMMY_C, _DUMMY_E, _aux_schwarz_max
from cctpu.ints.two_electron import (_class_chunk, eri_quartet_kernel,
                                     pair_classes, schwarz_q)


@lru_cache(maxsize=None)
def _wz_fn(ax: float):
    """jitted (Ws, Zs) assembly from (B, Linv, Dt, dms) — f32 HIGHEST on
    device (one [naux,k]x[k,nao^2] MXU matmul dominates); accuracy is
    validated against host f64 in tests/test_df_grad.py."""

    def fn(B, Linv, Dt, dms):
        with jax.default_matmul_precision("highest"):
            u = jnp.einsum("kij,ij->k", B, Dt)
            gam = Linv.T @ u                              # [naux]
            A = jnp.einsum("kij,sjl->skil", B, dms)       # B_k D_s
            W = gam[:, None, None] * Dt[None]
            Z = -0.5 * jnp.outer(gam, gam)
            if ax:
                G = jnp.einsum("sij,skjl->kil", dms, A)   # sum_s D_s B_k D_s
                W = W - ax * jnp.einsum("kp,kab->pab", Linv, G)
                T = jnp.einsum("skab,slba->kl", A, A)
                Z = Z + 0.5 * ax * (Linv.T @ (T @ Linv))
            Ws = W + W.transpose(0, 2, 1)
            Zs = Z + Z.T
        return Ws, Zs

    return jax.jit(fn)


def _pad3(Ws):
    """[naux, n, n] -> [naux+1, n+1, n+1] with zero dump row/col."""
    return jnp.pad(Ws, ((0, 1), (0, 1), (0, 1)))


class GradKernelCorrupt(RuntimeError):
    """A gradient-class executable disagrees with the host-f64 FD oracle
    after shape-perturbed recompiles. Propagated to the caller rather
    than silently shipping a corrupt nuclear gradient (VERDICT r4 #4)."""


# ---------------------------------------------------------------------------
# Build-time validation of the gradient-class executables (VERDICT r4 #4).
#
# The r4 lesson is that the axon backend miscompiles SPECIFIC executables;
# the DF build guards every dispatched integral class with a host-f64
# oracle (ints/df.py _dispatch_validated), but the g3/g2 gradient classes
# — a freshly compiled population of AD-of-the-quartet-kernel modules —
# shipped unchecked. Here each class's first chunk is spot-checked by a
# central difference against the same numpy-f64 McMurchie-Davidson oracle:
# the device computes grad of a masked sub-sum (<= _GVAL_MAX_Q quartets,
# SAME executable as production — only the mult weights differ), and the
# host recomputes that sub-sum at coords +/- h along the device gradient's
# largest component. Corruption shows at O(1e-1)+ relative; healthy
# device-vs-FD noise (f32 W contraction + FD truncation at h=1e-3 Bohr)
# measures ~1e-5. A mismatch retries with a DOUBLED chunk (a new shape key
# -> a new XLA executable, identical math); persistent success/bump is
# memoized next to the compile cache (same policy as the DF floor-bump
# memo: the executable IS the shared persistent-cache artifact).
# ---------------------------------------------------------------------------
_GVAL_MAX_Q = 96
_GVAL_TOL_REL = 5e-3
_GVAL_ON = None


def _gval_enabled() -> bool:
    global _GVAL_ON
    if _GVAL_ON is None:
        import os
        _GVAL_ON = os.environ.get("CCTPU_GRAD_VALIDATE", "1") == "1"
    return _GVAL_ON


_GVAL_OK: set = set()


def _gval_pick(gg: np.ndarray):
    """Largest-magnitude (atom, axis) of the device chunk gradient — the
    component a central difference can actually resolve."""
    a0, ax = np.unravel_index(int(np.abs(gg).argmax()), gg.shape)
    return int(a0), int(ax), float(abs(gg[a0, ax]))


def _gval_fd(e_at, coords_np, a0, ax, h=1e-3):
    cp = coords_np.copy()
    cp[a0, ax] += h
    cm = coords_np.copy()
    cm[a0, ax] -= h
    return (e_at(cp) - e_at(cm)) / (2.0 * h)


@lru_cache(maxsize=None)
def _g3c_chunk_fn(ls3, omega):
    """grad_R of sum_q mult_q * sum_{p,a,b} (P|ab)_q W[P,a,b] for one
    (aux-l, pair-class); index arrays are runtime args (one compile per
    class)."""
    lP, la, lb = ls3
    de = jnp.asarray(_DUMMY_E)
    dc = jnp.asarray(_DUMMY_C)

    def chunk_e(coords, Ws, mult,
                Pe, Pc, iP, aoP, Ae, Ac, iA, aoA, Be, Bc, iB, aoB):
        def one(Pe1, Pc1, RP, Ae1, Ac1, RA, Be1, Bc1, RB):
            blk = eri_quartet_kernel((lP, 0, la, lb), Pe1, Pc1, RP,
                                     de, dc, RP, Ae1, Ac1, RA,
                                     Be1, Bc1, RB, omega=omega)
            return blk[:, 0]                         # [sP, sa, sb]

        blocks = jax.vmap(one)(Pe, Pc, coords[iP], Ae, Ac, coords[iA],
                               Be, Bc, coords[iB])
        pr = aoP[:, None] + jnp.arange(nsph(lP))[None, :]
        ar = aoA[:, None] + jnp.arange(nsph(la))[None, :]
        br = aoB[:, None] + jnp.arange(nsph(lb))[None, :]
        Wblk = Ws[pr[:, :, None, None], ar[:, None, :, None],
                  br[:, None, None, :]]
        return jnp.einsum("q,qpab,qpab->", mult, blocks, Wblk)

    return jax.jit(jax.grad(chunk_e, argnums=0))


def _validate_3c_chunk(gfn, coords, coords_np, Ws_pad, gP, lP, pc, omega,
                       sl1, sl2, mult_c, padm_c, naux, nao):
    """Spot-check one g3 class executable: device grad of a masked
    sub-sum (same executable as production) vs host-f64 FD. Returns
    (ok, rel_err)."""
    idx = np.where(~np.asarray(padm_c))[0][:_GVAL_MAX_Q]
    if len(idx) == 0:
        return True, 0.0
    mask = np.zeros(len(mult_c))
    mask[idx] = mult_c[idx]
    aoP = np.where(padm_c, naux, gP.ao_start[sl1])
    aoA = np.where(padm_c, nao, pc.ao_a[sl2])
    aoB = np.where(padm_c, nao, pc.ao_b[sl2])
    gg = np.asarray(gfn(coords, Ws_pad, jnp.asarray(mask),
                        jnp.asarray(gP.exps[sl1]), jnp.asarray(gP.coefs[sl1]),
                        jnp.asarray(gP.atom_idx[sl1]), jnp.asarray(aoP),
                        jnp.asarray(pc.exps_a[sl2]),
                        jnp.asarray(pc.coefs_a[sl2]),
                        jnp.asarray(pc.atom_a[sl2]), jnp.asarray(aoA),
                        jnp.asarray(pc.exps_b[sl2]),
                        jnp.asarray(pc.coefs_b[sl2]),
                        jnp.asarray(pc.atom_b[sl2]), jnp.asarray(aoB)))
    if not np.isfinite(gg).all():
        return False, float("inf")
    a0, ax, mag = _gval_pick(gg)
    if mag < 1e-9:
        return True, 0.0            # nothing a FD could resolve
    from cctpu.ints.host_oracle import eri_3c2e_np

    # W blocks are coordinate-independent: fetch each quartet's slice once
    Wblk = {}
    for k in idx:
        i, j = int(sl1[k]), int(sl2[k])
        p0, A0, B0 = int(gP.ao_start[i]), int(pc.ao_a[j]), int(pc.ao_b[j])
        Wblk[int(k)] = np.asarray(
            Ws_pad[p0:p0 + nsph(lP), A0:A0 + nsph(pc.la),
                   B0:B0 + nsph(pc.lb)], dtype=np.float64)

    def e_at(c):
        tot = 0.0
        for k in idx:
            i, j = int(sl1[k]), int(sl2[k])
            blk = eri_3c2e_np(
                lP, gP.exps[i], gP.coefs[i], c[gP.atom_idx[i]],
                pc.la, pc.exps_a[j], pc.coefs_a[j], c[pc.atom_a[j]],
                pc.lb, pc.exps_b[j], pc.coefs_b[j], c[pc.atom_b[j]],
                omega=omega)
            tot += float(mult_c[k]) * float((blk * Wblk[int(k)]).sum())
        return tot

    fd = _gval_fd(e_at, coords_np, a0, ax)
    dev = float(gg[a0, ax])
    err = abs(dev - fd) / max(abs(fd), abs(dev))
    return err <= _GVAL_TOL_REL, err


def _validate_2c_chunk(gfn, coords, coords_np, Zs_pad, gP, lP, gQ, lQ,
                       omega, sl1, sl2, mult_c, padm_c, naux):
    idx = np.where(~np.asarray(padm_c))[0][:_GVAL_MAX_Q]
    if len(idx) == 0:
        return True, 0.0
    mask = np.zeros(len(mult_c))
    mask[idx] = mult_c[idx]
    aoP = np.where(padm_c, naux, gP.ao_start[sl1])
    aoQ = np.where(padm_c, naux, gQ.ao_start[sl2])
    gg = np.asarray(gfn(coords, Zs_pad, jnp.asarray(mask),
                        jnp.asarray(gP.exps[sl1]), jnp.asarray(gP.coefs[sl1]),
                        jnp.asarray(gP.atom_idx[sl1]), jnp.asarray(aoP),
                        jnp.asarray(gQ.exps[sl2]), jnp.asarray(gQ.coefs[sl2]),
                        jnp.asarray(gQ.atom_idx[sl2]), jnp.asarray(aoQ)))
    if not np.isfinite(gg).all():
        return False, float("inf")
    a0, ax, mag = _gval_pick(gg)
    if mag < 1e-9:
        return True, 0.0
    from cctpu.ints.host_oracle import eri_2c2e_np

    Zblk = {}
    for k in idx:
        i, j = int(sl1[k]), int(sl2[k])
        p0, q0 = int(gP.ao_start[i]), int(gQ.ao_start[j])
        Zblk[int(k)] = np.asarray(
            Zs_pad[p0:p0 + nsph(lP), q0:q0 + nsph(lQ)], dtype=np.float64)

    def e_at(c):
        tot = 0.0
        for k in idx:
            i, j = int(sl1[k]), int(sl2[k])
            blk = eri_2c2e_np(
                lP, gP.exps[i], gP.coefs[i], c[gP.atom_idx[i]],
                lQ, gQ.exps[j], gQ.coefs[j], c[gQ.atom_idx[j]],
                omega=omega)
            tot += float(mult_c[k]) * float((blk * Zblk[int(k)]).sum())
        return tot

    fd = _gval_fd(e_at, coords_np, a0, ax)
    dev = float(gg[a0, ax])
    err = abs(dev - fd) / max(abs(fd), abs(dev))
    return err <= _GVAL_TOL_REL, err


@lru_cache(maxsize=None)
def _g2c_chunk_fn(ls2, omega):
    """grad_R of sum_q mult_q * sum_{p,q'} (P|Q)_q Z[P,Q] per class."""
    lP, lQ = ls2
    de = jnp.asarray(_DUMMY_E)
    dc = jnp.asarray(_DUMMY_C)

    def chunk_e(coords, Zs, mult, Pe, Pc, iP, aoP, Qe, Qc, iQ, aoQ):
        def one(Pe1, Pc1, RP, Qe1, Qc1, RQ):
            blk = eri_quartet_kernel((lP, 0, lQ, 0), Pe1, Pc1, RP,
                                     de, dc, RP, Qe1, Qc1, RQ,
                                     de, dc, RQ, omega=omega)
            return blk[:, 0, :, 0]                   # [sP, sQ]

        blocks = jax.vmap(one)(Pe, Pc, coords[iP], Qe, Qc, coords[iQ])
        pr = aoP[:, None] + jnp.arange(nsph(lP))[None, :]
        qr = aoQ[:, None] + jnp.arange(nsph(lQ))[None, :]
        Zblk = Zs[pr[:, :, None], qr[:, None, :]]
        return jnp.einsum("q,qab,qab->", mult, blocks, Zblk)

    return jax.jit(jax.grad(chunk_e, argnums=0))


def _grad_3c(basis, aux, coords, Ws_pad, omega, screen_tol=1e-12,
             qs=None):
    """Accumulate sum dX*W over all classes (eager chunked dispatch)."""
    from cctpu.ints.df import _precompile

    from cctpu.ints.df import _bump_memo, _bump_memo_save

    coords = jnp.asarray(coords)
    coords_np = np.asarray(coords, dtype=np.float64)
    nao = basis.nao
    naux = aux.nao
    pcs = pair_classes(basis)
    if qs is None:
        qs = schwarz_q(pcs, coords)
    q_aux_max = _aux_schwarz_max(aux, coords)
    g = np.zeros(coords.shape)
    pending = []

    specs = []
    for lP in sorted(aux.groups):
        gP = aux.groups[lP]
        nP = len(gP.shell_idx)
        for ipc, pc in enumerate(pcs):
            pair_sel = np.arange(pc.n, dtype=np.int64)
            pair_sel = pair_sel[qs[ipc] * q_aux_max > screen_tol]
            if len(pair_sel) == 0:
                continue
            q1, q2 = np.mgrid[0:nP, 0:len(pair_sel)]
            q1 = q1.ravel()
            q2 = pair_sel[q2.ravel()]
            chunk0 = _class_chunk((lP, 0, pc.la, pc.lb), gP.exps.shape[1],
                                  1, pc.exps_a.shape[1], pc.exps_b.shape[1])
            # validated-executable memo (shares floor_bumps.json with the
            # DF build): value = chunk-doubling bump under which this
            # class last passed the FD oracle; presence = skip re-check
            key = (f"g3grad {(lP, pc.la, pc.lb)} om{omega} c{chunk0} "
                   f"p{gP.exps.shape[1]},{pc.exps_a.shape[1]},"
                   f"{pc.exps_b.shape[1]} na{coords.shape[0]},{naux},{nao}")
            bump0 = int(_bump_memo().get(key, 0))
            chunk = chunk0 << bump0
            specs.append((gP, lP, pc, q1, q2, chunk, key, bump0))

    def _aot_args(gP, pc, chunk):
        def f():
            z = np.zeros(chunk, np.int64)
            zi = jnp.zeros(chunk, jnp.int64)
            return (coords, Ws_pad, jnp.zeros(chunk),
                    jnp.asarray(gP.exps[z]), jnp.asarray(gP.coefs[z]),
                    jnp.asarray(gP.atom_idx[z]), zi,
                    jnp.asarray(pc.exps_a[z]), jnp.asarray(pc.coefs_a[z]),
                    jnp.asarray(pc.atom_a[z]), zi,
                    jnp.asarray(pc.exps_b[z]), jnp.asarray(pc.coefs_b[z]),
                    jnp.asarray(pc.atom_b[z]), zi)
        return f

    _precompile([(f"g3 {(lP, pc.la, pc.lb)} om{omega} c{chunk} "
                  f"na{coords.shape[0]},{naux},{nao} "
                  f"p{gP.exps.shape[1]},{pc.exps_a.shape[1]},"
                  f"{pc.exps_b.shape[1]}",
                  _g3c_chunk_fn((lP, pc.la, pc.lb), omega),
                  _aot_args(gP, pc, chunk))
                 for gP, lP, pc, q1, q2, chunk, key, bump0 in specs],
                "3c2e-grad")

    for gP, lP, pc, q1, q2, chunk0b, key, bump0 in specs:
            import sys
            same = (np.asarray(pc.ia)[q2] == np.asarray(pc.ib)[q2]) \
                if pc.la == pc.lb else np.zeros(len(q2), bool)
            mult = np.where(same, 0.5, 1.0)
            ls3 = (lP, pc.la, pc.lb)
            gfn = _g3c_chunk_fn(ls3, omega)
            nreal = len(q1)
            need_val = (_gval_enabled() and key not in _GVAL_OK
                        and key not in _bump_memo())
            for bump in range(bump0, bump0 + 3):
                chunk = (chunk0b >> bump0) << bump
                npad = (-nreal) % chunk
                q1p = np.concatenate([q1, np.zeros(npad, np.int64)])
                q2p = np.concatenate([q2, np.zeros(npad, np.int64)])
                multp = np.concatenate([mult, np.zeros(npad)])
                padm = np.concatenate([np.zeros(nreal, bool),
                                       np.ones(npad, bool)])
                if not need_val:
                    break
                check("df-grad validate")
                ok, verr = _validate_3c_chunk(
                    gfn, coords, coords_np, Ws_pad, gP, lP, pc, omega,
                    q1p[:chunk], q2p[:chunk], multp[:chunk], padm[:chunk],
                    naux, nao)
                if ok:
                    _GVAL_OK.add(key)
                    _bump_memo_save(key, bump)
                    break
                print(f"# cctpu: g3 {ls3}: device gradient chunk deviates "
                      f"from host FD oracle by {verr:.2e} rel — corrupt "
                      f"executable; retrying at chunk x2", file=sys.stderr,
                      flush=True)
            else:
                raise GradKernelCorrupt(
                    f"g3 class {ls3}: gradient executable disagrees with "
                    f"the host FD oracle after 2 chunk-doubled recompiles")
            for s in range(0, len(q1p), chunk):
                check("df-grad")   # cooperative deadline between dispatches
                sl1, sl2 = q1p[s:s + chunk], q2p[s:s + chunk]
                pm = padm[s:s + chunk]
                aoP = np.where(pm, naux, gP.ao_start[sl1])
                aoA = np.where(pm, nao, pc.ao_a[sl2])
                aoB = np.where(pm, nao, pc.ao_b[sl2])
                gg = gfn(coords, Ws_pad, jnp.asarray(multp[s:s + chunk]),
                         jnp.asarray(gP.exps[sl1]),
                         jnp.asarray(gP.coefs[sl1]),
                         jnp.asarray(gP.atom_idx[sl1]), jnp.asarray(aoP),
                         jnp.asarray(pc.exps_a[sl2]),
                         jnp.asarray(pc.coefs_a[sl2]),
                         jnp.asarray(pc.atom_a[sl2]), jnp.asarray(aoA),
                         jnp.asarray(pc.exps_b[sl2]),
                         jnp.asarray(pc.coefs_b[sl2]),
                         jnp.asarray(pc.atom_b[sl2]), jnp.asarray(aoB))
                pending.append(gg)
                if len(pending) >= 64:
                    for p in pending:
                        g += np.asarray(p)
                    pending.clear()
    for p in pending:
        g += np.asarray(p)
    return g


def _grad_2c(aux, coords, Zs_pad, omega):
    from cctpu.ints.df import _bump_memo, _bump_memo_save, _precompile

    coords = jnp.asarray(coords)
    coords_np = np.asarray(coords, dtype=np.float64)
    naux = aux.nao
    g = np.zeros(coords.shape)
    pending = []
    ls_sorted = sorted(aux.groups)

    specs = []
    for i, lP in enumerate(ls_sorted):
        gP = aux.groups[lP]
        for lQ in ls_sorted[i:]:
            gQ = aux.groups[lQ]
            nP, nQ = len(gP.shell_idx), len(gQ.shell_idx)
            q1, q2 = np.mgrid[0:nP, 0:nQ]
            q1, q2 = q1.ravel(), q2.ravel()
            if lP == lQ:
                keep = q1 <= q2
                q1, q2 = q1[keep], q2[keep]
                mult = np.where(q1 == q2, 0.5, 1.0)
            else:
                mult = np.ones(len(q1))
            chunk0 = _class_chunk((lP, 0, lQ, 0), gP.exps.shape[1], 1,
                                  gQ.exps.shape[1], 1)
            key = (f"g2grad {(lP, lQ)} om{omega} c{chunk0} "
                   f"p{gP.exps.shape[1]},{gQ.exps.shape[1]} "
                   f"na{coords.shape[0]},{naux}")
            bump0 = int(_bump_memo().get(key, 0))
            chunk = chunk0 << bump0
            specs.append((gP, lP, gQ, lQ, q1, q2, mult, chunk, key, bump0))

    def _aot_args(gP, gQ, chunk):
        def f():
            z = np.zeros(chunk, np.int64)
            zi = jnp.zeros(chunk, jnp.int64)
            return (coords, Zs_pad, jnp.zeros(chunk),
                    jnp.asarray(gP.exps[z]), jnp.asarray(gP.coefs[z]),
                    jnp.asarray(gP.atom_idx[z]), zi,
                    jnp.asarray(gQ.exps[z]), jnp.asarray(gQ.coefs[z]),
                    jnp.asarray(gQ.atom_idx[z]), zi)
        return f

    _precompile([(f"g2 {(lP, lQ)} om{omega} c{chunk} "
                  f"na{coords.shape[0]},{naux} "
                  f"p{gP.exps.shape[1]},{gQ.exps.shape[1]}",
                  _g2c_chunk_fn((lP, lQ), omega), _aot_args(gP, gQ, chunk))
                 for gP, lP, gQ, lQ, q1, q2, mult, chunk, key, bump0
                 in specs], "2c2e-grad")

    for gP, lP, gQ, lQ, q1, q2, mult, chunk0b, key, bump0 in specs:
            import sys
            gfn = _g2c_chunk_fn((lP, lQ), omega)
            nreal = len(q1)
            need_val = (_gval_enabled() and key not in _GVAL_OK
                        and key not in _bump_memo())
            for bump in range(bump0, bump0 + 3):
                chunk = (chunk0b >> bump0) << bump
                npad = (-nreal) % chunk
                q1p = np.concatenate([q1, np.zeros(npad, np.int64)])
                q2p = np.concatenate([q2, np.zeros(npad, np.int64)])
                multp = np.concatenate([mult, np.zeros(npad)])
                padm = np.concatenate([np.zeros(nreal, bool),
                                       np.ones(npad, bool)])
                if not need_val:
                    break
                check("df-grad validate")
                ok, verr = _validate_2c_chunk(
                    gfn, coords, coords_np, Zs_pad, gP, lP, gQ, lQ, omega,
                    q1p[:chunk], q2p[:chunk], multp[:chunk], padm[:chunk],
                    naux)
                if ok:
                    _GVAL_OK.add(key)
                    _bump_memo_save(key, bump)
                    break
                print(f"# cctpu: g2 {(lP, lQ)}: device gradient chunk "
                      f"deviates from host FD oracle by {verr:.2e} rel — "
                      f"corrupt executable; retrying at chunk x2",
                      file=sys.stderr, flush=True)
            else:
                raise GradKernelCorrupt(
                    f"g2 class {(lP, lQ)}: gradient executable disagrees "
                    f"with the host FD oracle after 2 chunk-doubled "
                    f"recompiles")
            for s in range(0, len(q1p), chunk):
                check("df-grad")   # cooperative deadline between dispatches
                sl1, sl2 = q1p[s:s + chunk], q2p[s:s + chunk]
                pm = padm[s:s + chunk]
                aoP = np.where(pm, naux, gP.ao_start[sl1])
                aoQ = np.where(pm, naux, gQ.ao_start[sl2])
                gg = gfn(coords, Zs_pad, jnp.asarray(multp[s:s + chunk]),
                         jnp.asarray(gP.exps[sl1]),
                         jnp.asarray(gP.coefs[sl1]),
                         jnp.asarray(gP.atom_idx[sl1]), jnp.asarray(aoP),
                         jnp.asarray(gQ.exps[sl2]),
                         jnp.asarray(gQ.coefs[sl2]),
                         jnp.asarray(gQ.atom_idx[sl2]), jnp.asarray(aoQ))
                pending.append(gg)
                if len(pending) >= 64:
                    for p in pending:
                        g += np.asarray(p)
                    pending.clear()
    for p in pending:
        g += np.asarray(p)
    return g


def w_anchor(mf, sample: int = 16, seed: int = 0) -> float:
    """Host-f64 spot check of the device-f32 (W, Z) assembly — the
    gradient's analog of the bench df_anchor.

    The W assembly contracts Linv^T (rows up to ~1/sqrt(lambda_min) for
    the ill-conditioned autoaux metric) against smooth G blocks — the
    exact structure whose f32 evaluation corrupted B in rounds 2-3. This
    recomputes ``sample`` random W rows and the Z diagonal block in
    numpy f64 from the stored host B/Linv and returns the max relative
    deviation of the device result. Cheap: O(k nao^3) for G + a few
    skinny dgemms."""
    jk = mf._jk
    Bh = getattr(jk, "_Bh", None)
    if Bh is None:
        raise ValueError("host f64 B not retained (beyond f64 budget)")
    Linv = np.asarray(jk._Linv)
    dm = np.asarray(mf.dm)
    spin = dm.ndim == 3
    Dt = dm.sum(0) if spin else dm
    dms = [dm[0], dm[1]] if spin else [dm / 2, dm / 2]
    func = getattr(mf, "func", None)
    ax = 1.0 if func is None else func.hyb

    u = np.einsum("kij,ij->k", Bh, Dt)
    gam = Linv.T @ u
    G = sum(np.matmul(np.matmul(d, Bh), d) for d in dms)   # [k, n, n]
    naux = Linv.shape[1]
    rng = np.random.default_rng(seed)
    P = rng.choice(naux, size=min(sample, naux), replace=False)
    W_host = gam[P][:, None, None] * Dt[None] - ax * np.tensordot(
        Linv[:, P], G, axes=(0, 0))
    Ws_host = W_host + W_host.transpose(0, 2, 1)

    f32 = jnp.float32
    Ws_dev, _ = _wz_fn(float(ax))(
        jk._B32, jnp.asarray(Linv.astype(np.float32)),
        jnp.asarray(Dt, f32), jnp.asarray(np.stack(dms), f32))
    Ws_dev_rows = np.asarray(Ws_dev[jnp.asarray(P)], dtype=np.float64)
    scale = max(float(np.abs(Ws_host).max()), 1e-30)
    return float(np.abs(Ws_dev_rows - Ws_host).max()) / scale


def df_e2_gradient_eager(mf) -> np.ndarray:
    """d(E_2e)/dR for a converged density-fitted SCF (dense DFJK),
    including RSH long-range exchange when the functional carries one.

    Weights (W, Z) are assembled on device in f32 HIGHEST from the
    stored B32/Linv; the dX/dM contractions run through per-class
    AD-of-the-quartet-kernel compiles (TPU remote-compiler friendly)."""
    jk = mf._jk
    mol = mf.mol
    basis = mol.basis_set
    dm = np.asarray(mf.dm)
    spin = dm.ndim == 3
    Dt = dm.sum(0) if spin else dm
    dms = np.stack([dm[0], dm[1]]) if spin else np.stack([dm / 2, dm / 2])
    func = getattr(mf, "func", None)
    ax = 1.0 if func is None else func.hyb

    Linv32 = jnp.asarray(np.asarray(jk._Linv, dtype=np.float32))
    f32 = jnp.float32

    def wz(B32, ax_):
        Ws, Zs = _wz_fn(float(ax_))(B32, Linv32, jnp.asarray(Dt, f32),
                                    jnp.asarray(dms, f32))
        return _pad3(Ws), jnp.pad(Zs, ((0, 1), (0, 1)))

    from cctpu.grad.scf_grad import _glog

    qs = getattr(jk, "_qs_grad", None)
    if qs is None:
        qs = schwarz_q(pair_classes(basis), mol.coords)
        jk._qs_grad = qs
    _glog("df schwarz done")

    Ws_pad, Zs_pad = wz(jk._B32, ax)
    Ws_pad.block_until_ready()
    _glog("df W/Z assembled")
    g = _grad_3c(basis, jk.aux, mol.coords, Ws_pad, None, qs=qs)
    _glog("df 3c done")
    g += _grad_2c(jk.aux, mol.coords, Zs_pad, None)
    _glog("df 2c done")

    if func is not None and func.rsh is not None:
        omega_r, _, beta_r = func.rsh
        jk.prepare_lr(omega_r)
        B_lr = jk._B_lr[omega_r]
        Linv_lr = getattr(jk, "_Linv_lr", {}).get(omega_r)
        if Linv_lr is None:
            raise NotImplementedError(
                "eager DF gradient needs the attenuated Linv; "
                "DFJK.prepare_lr must store _Linv_lr")
        Linv_lr32 = jnp.asarray(np.asarray(Linv_lr, dtype=np.float32))

        def wz_lr(ax_):
            Ws, Zs = _wz_fn(float(ax_))(
                B_lr.astype(f32), Linv_lr32, jnp.asarray(Dt, f32),
                jnp.asarray(dms, f32))
            return _pad3(Ws), jnp.pad(Zs, ((0, 1), (0, 1)))

        # K-only contribution (the J parts of the two wz calls cancel):
        # [J + beta*K_lr] - [J] with the attenuated integrals
        Wb, Zb = wz_lr(beta_r)
        W0, Z0 = wz_lr(0.0)
        g += _grad_3c(basis, jk.aux, mol.coords, Wb - W0, omega_r, qs=qs)
        g += _grad_2c(jk.aux, mol.coords, Zb - Z0, omega_r)
    return g
