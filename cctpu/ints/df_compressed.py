"""Pair-compressed density fitting: the big-molecule memory strategy.

The dense DF tensor B [naux, nao, nao] grows as O(naux * nao^2) — the
BASELINE.json north-star size (C40H82/6-31G*: nao=764, naux~15k) needs
~35 GB in f32, more than double a v5e's HBM, so round 2's bench self-gated
(VERDICT r2 missing #2). But (P|ab) is symmetric in (a,b) AND Schwarz-
sparse: for an extended molecule only O(nao) AO pairs survive
|(P|ab)| <= Q_ab * max_P Q_P. This module stores B over a COMPRESSED pair
axis — the Schwarz-surviving i<=j AO pairs only — and contracts J/K by
streaming naux-blocks through a dense unpack:

    J:  entirely in compressed form (two [nkeep, npair] MXU matvecs +
        one scatter) — never densified.
    K:  lax.scan over naux-blocks; each block unpacks to [TP, nao, nao]
        (bounded scratch) for the occupied-orbital MXU contractions.

This replaces gpu4pyscf's CUDA int3c2e+DF-JK memory management for the
reference's large-molecule workloads (templates/calculate_bde.py def2-TZVP
BDE sweeps ride it at this scale). Same duck interface as ints/df.DFJK, so
scf/dft drivers switch by size with no call-site changes.
"""

from __future__ import annotations

import os
from functools import lru_cache
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from cctpu.core.basis import BasisSet, nsph
from cctpu.ints.df import (_DUMMY_C, _DUMMY_E, _class_batch_fn, _pow2_rows,
                           _aux_schwarz_max, _dispatch_validated, _oracle_3c,
                           _precompile_3c, _superbatches, _tables_3c, autoaux,
                           build_2c2e_hostassemble, metric_factor)
from cctpu.ints.two_electron import _class_chunk, pair_classes, schwarz_q


class PairMap:
    """Host-side compressed-pair bookkeeping for one (basis, geometry).

    Attributes:
      pi, pj    [npair_pad] int32 — AO indices (i <= j) of each kept pair;
                pad slots point at the dump index ``nao``.
      w         [npair_pad] f32 — contraction weight (2 off-diagonal,
                1 diagonal, 0 padding): sum_ij X_ij = sum_p w_p X_p for
                symmetric X.
      slots     per pair-class [pc.n, sa*sb] int32 — compressed slot of
                each AO element of the shell-pair block (dump = npair_pad
                for dropped pairs and j<i duplicates of same-shell
                diagonal blocks).
      keep_mask per pair-class [pc.n] bool — shell pairs whose block holds
                at least one stored AO pair (Schwarz-kept).
    """

    def __init__(self, basis: BasisSet, coords, screen_tol: float = 1e-12):
        pcs = pair_classes(basis)
        qs = schwarz_q(pcs, coords)   # aux bound folded into screen_tol
        nao = basis.nao
        self.nao = nao
        self.pcs = pcs
        self.qs = qs
        pi_parts, pj_parts, slot_parts, keep_parts = [], [], [], []
        next_slot = 0
        for pc, q in zip(pcs, qs):
            sa, sb = nsph(pc.la), nsph(pc.lb)
            keep = q > screen_tol
            keep_parts.append(keep)
            # AO grids of every block of the class: [pc.n, sa, sb]
            A = pc.ao_a[:, None, None] + np.arange(sa)[None, :, None]
            B = pc.ao_b[:, None, None] + np.arange(sb)[None, None, :]
            lo = np.minimum(A, B)
            hi = np.maximum(A, B)
            # store each unordered AO pair once: for same-shell diagonal
            # blocks keep only i <= j (the mirrored element is identical
            # by (P|ab) symmetry)
            same_shell = (pc.la == pc.lb) & (pc.ia == pc.ib)
            store = keep[:, None, None] & (
                (A <= B) | ~same_shell[:, None, None])
            nstored = int(store.sum())
            slots = np.full((pc.n, sa, sb), -1, np.int64)
            slots[store] = next_slot + np.arange(nstored)
            pi_parts.append(lo[store])
            pj_parts.append(hi[store])
            slot_parts.append(slots.reshape(pc.n, sa * sb))
            next_slot += nstored
        self.npair = next_slot
        # pad the compressed axis to a lane multiple (plus 1 dump slot)
        self.npair_pad = -(-max(self.npair, 1) // 128) * 128
        pi = np.full(self.npair_pad, nao, np.int32)
        pj = np.full(self.npair_pad, nao, np.int32)
        pi[:self.npair] = np.concatenate(pi_parts)
        pj[:self.npair] = np.concatenate(pj_parts)
        self.pi, self.pj = pi, pj
        w = np.zeros(self.npair_pad, np.float32)
        w[:self.npair] = np.where(pi[:self.npair] == pj[:self.npair],
                                  1.0, 2.0)
        self.w = w
        self.slots = [np.where(s < 0, self.npair_pad, s).astype(np.int64)
                      for s in slot_parts]
        self.keep_masks = keep_parts


def _specs_3c_compressed(aux: BasisSet, pm: PairMap, omega, dtn):
    """[(gP, lP, pc, slots, ls, kern, q1, q2, chunk)] for a compressed
    3c2e build — the analog of ints/df._specs_3c with the Schwarz-kept
    pair selection coming from the PairMap."""
    specs = []
    for lP in sorted(aux.groups):
        gP = aux.groups[lP]
        nP = len(gP.shell_idx)
        for pc, keep, slots in zip(pm.pcs, pm.keep_masks, pm.slots):
            pair_sel = np.nonzero(keep)[0]
            if len(pair_sel) == 0:
                continue
            ls = (lP, 0, pc.la, pc.lb)
            kern = _class_batch_fn(ls, omega, dtn, False)
            q1, q2 = np.mgrid[0:nP, 0:len(pair_sel)]
            q1 = q1.ravel()
            q2 = pair_sel[q2.ravel()]
            chunk = _class_chunk(ls, gP.exps.shape[1], 1,
                                 pc.exps_a.shape[1], pc.exps_b.shape[1])
            specs.append((gP, lP, pc, slots, ls, kern, q1, q2, chunk))
    return specs


def build_3c2e_compressed(basis: BasisSet, aux: BasisSet, coords,
                          pm: PairMap, omega: Optional[float] = None,
                          dtype=jnp.float32, verbose: bool = False):
    """(P|ab) over the compressed pair axis: [naux, npair_pad] assembled
    on device. Reuses the SAME per-class super-batch kernels as the dense
    builder (ints/df.py build_3c2e_device — no new integral compiles);
    only the scatter target differs."""
    coords = jnp.asarray(coords)
    naux = aux.nao
    out = jnp.zeros((naux + 1, pm.npair_pad + 1), dtype=dtype)
    de = jnp.asarray(_DUMMY_E)
    dc = jnp.asarray(_DUMMY_C)
    dtn = jnp.dtype(dtype).name

    if verbose:
        import sys
        import time as _t
    coords_np = np.asarray(coords)
    specs = _specs_3c_compressed(aux, pm, omega, dtn)
    _precompile_3c([(gP, lP, pc, ls, kern, q1, q2, chunk)
                    for gP, lP, pc, _, ls, kern, q1, q2, chunk in specs],
                   coords, de, dc, dtn, omega)
    for gP, lP, pc, slots, ls, kern, q1, q2, chunk in specs:
            sP = nsph(lP)
            sa, sb = nsph(pc.la), nsph(pc.lb)
            if verbose:
                _tk = _t.time()
            batches = _dispatch_validated(
                kern, lambda b, gP=gP, pc=pc: _tables_3c(coords, gP, pc,
                                                         de, dc, b),
                q1, q2, chunk, _oracle_3c(coords_np, gP, lP, pc, omega),
                dtn, f"3c2e-c {ls}")
            for blocks, q1f, q2f, padm in batches:
                P_idx = np.where(padm[:, None], naux,
                                 gP.ao_start[q1f][:, None] + np.arange(sP))
                S_idx = np.where(padm[:, None], pm.npair_pad,
                                 slots[q2f])         # [N, sa*sb]
                scat = _scatter_c_fn(len(q1f), sP, sa * sb, naux + 1,
                                     pm.npair_pad + 1, dtn)
                out = scat(out, blocks.reshape(blocks.shape[0], sP, sa * sb),
                           jnp.asarray(P_idx.astype(np.int32)),
                           jnp.asarray(S_idx.astype(np.int32)))
            if verbose:
                out.block_until_ready()
                print(f"#   3c2e-c ls={ls} nq={len(q1)} chunk={chunk} "
                      f"{_t.time() - _tk:.1f}s", file=sys.stderr, flush=True)
    return out[:naux, :pm.npair_pad]


def build_3c2e_compressed_hostassemble(basis: BasisSet, aux: BasisSet,
                                       coords, pm: PairMap,
                                       omega: Optional[float] = None,
                                       verbose: bool = False) -> np.ndarray:
    """(P|ab) over the compressed pair axis, super-batch device KERNELS +
    HOST f64 assembly: returns numpy [naux, npair_pad]. Production path —
    the whitening B = Linv @ X must run on host in true f64 (the device
    has no f64-grade matmul; see ints/df.DFJK docstring), so X lands on
    host anyway; this skips the device scatter kernels entirely."""
    coords = jnp.asarray(coords)
    naux = aux.nao
    out = np.zeros((naux + 1, pm.npair_pad + 1))
    de = jnp.asarray(_DUMMY_E)
    dc = jnp.asarray(_DUMMY_C)
    if verbose:
        import sys
        import time as _t
    coords_np = np.asarray(coords)
    specs = _specs_3c_compressed(aux, pm, omega, "float64")
    _precompile_3c([(gP, lP, pc, ls, kern, q1, q2, chunk)
                    for gP, lP, pc, _, ls, kern, q1, q2, chunk in specs],
                   coords, de, dc, "float64", omega)
    for gP, lP, pc, slots, ls, kern, q1, q2, chunk in specs:
            sP = nsph(lP)
            sa, sb = nsph(pc.la), nsph(pc.lb)
            if verbose:
                _tk = _t.time()
            batches = _dispatch_validated(
                kern, lambda b, gP=gP, pc=pc: _tables_3c(coords, gP, pc,
                                                         de, dc, b),
                q1, q2, chunk, _oracle_3c(coords_np, gP, lP, pc, omega),
                "float64", f"3c2e-ch {ls}")
            for blocks_dev, q1f, q2f, padm in batches:
                blocks = np.asarray(blocks_dev)[~padm]
                q1f, q2f = q1f[~padm], q2f[~padm]
                P_idx = gP.ao_start[q1f][:, None] + np.arange(sP)
                S_idx = slots[q2f]                        # [N, sa*sb]
                out[P_idx[:, :, None],
                    S_idx[:, None, :]] = blocks.reshape(len(q1f), sP,
                                                        sa * sb)
            if verbose:
                print(f"#   3c2e-ch ls={ls} nq={len(q1)} chunk={chunk} "
                      f"{_t.time() - _tk:.1f}s", file=sys.stderr, flush=True)
    return out[:naux, :pm.npair_pad]


@lru_cache(maxsize=None)
def _scatter_c_fn(n, sP, sab, naux1, npair1, dtype_name):
    """Scatter one super-batch of [n, sP, sab] blocks into the padded
    compressed accumulator (DONATED; dump row/col absorbs padding and the
    j<i duplicates)."""
    del n, sP, sab, naux1, npair1, dtype_name  # shape-key only

    def fn(out, blocks, pidx, sidx):
        return out.at[pidx[:, :, None], sidx[:, None, :]].set(blocks)

    return jax.jit(fn, donate_argnums=0)


@lru_cache(maxsize=None)
def _whiten_c_fn(dtype_name):
    """B_c = Linv @ X_c (one MXU matmul at HIGHEST precision)."""
    dtype = jnp.dtype(dtype_name)

    def fn(Linv, X):
        with jax.default_matmul_precision("highest"):
            return Linv.astype(dtype) @ X.astype(dtype)

    return jax.jit(fn)


# aux-block rows unpacked per scan step of the K build; the dense scratch
# is TP * (nao+1)^2 * 4 bytes (c40: 128 * 765^2 * 4 = 300 MB)
_K_BLOCK_ROWS = int(os.environ.get("CCTPU_CDF_K_BLOCK", 128))


@lru_cache(maxsize=None)
def _jk_c_fn(with_k: bool, spin_shape: int, dtype_name):
    """jitted compressed J/K: J fully compressed; K streams naux-blocks
    through a dense unpack + occupied-orbital MXU contractions."""
    del dtype_name   # shapes key the compile; dtype rides the operands

    def fn(B, pi, pj, w, dm, coccs):
        nao = dm.shape[-1]
        nb = B.shape[0]

        def gather_pairs(M):                     # [..., nao, nao] -> pairs
            return M[..., pi, pj]

        with jax.default_matmul_precision("highest"):
            d_c = gather_pairs(dm) * w           # [..., npair_pad]
            jp = jnp.einsum("pc,...c->...p", B, d_c)
            jc = jnp.einsum("...p,pc->...c", jp, B)
            Jp = jnp.zeros(dm.shape[:-2] + (nao + 1, nao + 1), B.dtype)
            Jp = Jp.at[..., pi, pj].set(jc).at[..., pj, pi].set(jc)
            J = Jp[..., :nao, :nao]
            if not with_k:
                return J, None

            tp = _K_BLOCK_ROWS
            nb_pad = -(-nb // tp) * tp
            Bb = jnp.pad(B, ((0, nb_pad - nb), (0, 0)))
            Bb = Bb.reshape(nb_pad // tp, tp, -1)

            def k_one(C):
                def body(K, Bblk):
                    dense = jnp.zeros((tp, nao + 1, nao + 1), B.dtype)
                    dense = dense.at[:, pi, pj].set(Bblk)
                    dense = dense.at[:, pj, pi].set(Bblk)
                    dense = dense[:, :nao, :nao]
                    W = jnp.einsum("pik,ka->pia", dense, C)
                    return K + jnp.einsum("pia,pja->ij", W, W), None
                K, _ = jax.lax.scan(
                    body, jnp.zeros((nao, nao), B.dtype), Bb)
                return K

            K = jnp.stack([k_one(c) for c in coccs]) \
                if spin_shape > 1 else k_one(coccs[0])
        return J, K

    return jax.jit(fn)


class CompressedDFJK:
    """Density-fitted J/K over the Schwarz-compressed pair axis.

    Same call contract as ints/df.DFJK (``__call__(dm, with_k, cocc)``,
    ``consts``/``prepare_dtype`` threading, ``prepare_lr``/``k_lr`` for
    RSH) — scf/hf.py and dft/rks.py drive it unchanged. Selected
    automatically by SCFBase.get_jk_builder when the dense f32 B would
    exceed the HBM budget."""

    _consts_override = None
    _aux_mesh = None
    # GSPMD partitioning of the scan-over-blocks K build is future work;
    # get_jk_builder skips shard_jk_over_aux for this builder
    supports_aux_sharding = False

    def __init__(self, mol, coords=None, beta: float = 1.8,
                 extra_l: int = 2, lmax_cap: int = 4,
                 screen_tol: float = 1e-12):
        basis = mol.basis_set
        self.aux = autoaux(basis, beta=beta, extra_l=extra_l,
                           lmax_cap=lmax_cap)
        c = jnp.asarray(mol.coords if coords is None else coords)
        q_aux = _aux_schwarz_max(self.aux, c)
        self.pm = PairMap(basis, c, screen_tol=screen_tol / max(q_aux, 1e-30))
        M = build_2c2e_hostassemble(self.aux, c)
        Linv = np.asarray(metric_factor(M))
        self._Linv = Linv       # for the eager DF gradient (grad/df_grad.py)
        X = build_3c2e_compressed_hostassemble(basis, self.aux, c, self.pm)
        # HOST f64 dgemm: the device has no f64-grade matmul and the
        # ill-conditioned Linv turns an f32-grade whitening into ~1e-2
        # B error (ints/df.DFJK docstring; rounds 2-3 postmortem)
        self._B32 = jnp.asarray((Linv @ X).astype(np.float32))
        self._B32.block_until_ready()
        del X
        self._pi = jnp.asarray(self.pm.pi)
        self._pj = jnp.asarray(self.pm.pj)
        self._w32 = jnp.asarray(self.pm.w)
        self._mol = mol
        self._coords = c
        self._B_lr = {}
        self.f64_exact = False      # f32 storage only at this scale

    # -- dtype handling ------------------------------------------------------
    def prepare_dtype(self, dtype):
        if jnp.dtype(dtype) != jnp.float32:
            cached = getattr(self, "_B_cast", None)
            if cached is None or cached.dtype != dtype:
                self._B_cast = self._B32.astype(dtype)

    def _tensors(self, dtype):
        ov = self._consts_override
        if ov is not None:
            return ov["B"], ov["pi"], ov["pj"], ov["w"]
        if jnp.dtype(dtype) == jnp.float32:
            B = self._B32
        else:
            cached = getattr(self, "_B_cast", None)
            B = cached if (cached is not None and cached.dtype == dtype) \
                else self._B32.astype(dtype)
        return B, self._pi, self._pj, self._w32.astype(dtype)

    def consts(self, dtype):
        self.prepare_dtype(dtype)
        B, pi, pj, w = self._tensors(dtype)
        out = {"B": B, "pi": pi, "pj": pj, "w": w}
        if self._B_lr:
            cache = self.__dict__.setdefault("_B_lr_cast", {})
            out["B_lr"] = {}
            for om, b in self._B_lr.items():
                key = (om, jnp.dtype(dtype).name)
                if b.dtype != dtype and key not in cache:
                    cache[key] = b.astype(dtype)
                out["B_lr"][om] = b if b.dtype == dtype else cache[key]
        return out

    # -- contractions --------------------------------------------------------
    def __call__(self, dm, with_k: bool = True, cocc=None):
        B, pi, pj, w = self._tensors(dm.dtype)
        coccs, nspin = self._norm_cocc(dm, cocc)
        J, K = _jk_c_fn(with_k, nspin, jnp.dtype(dm.dtype).name)(
            B, pi, pj, w, dm, coccs)
        if K is not None and dm.ndim == 3 and K.ndim == 2:
            K = jnp.stack([K, K])
        return J, K

    def _norm_cocc(self, dm, cocc):
        """K needs the occupied-orbital form; a plain dm is factored on
        the fly (host callers always pass cocc in the hot loop)."""
        if cocc is None:
            def fact(d, n):
                e, U = jnp.linalg.eigh(d)
                e = jnp.clip(e[::-1], 0.0, None)
                U = U[:, ::-1]
                return U[:, :n] * jnp.sqrt(e[None, :n])
            if dm.ndim == 3:
                n = dm.shape[-1]
                return (fact(dm[0], n), fact(dm[1], n)), 2
            return (fact(dm, dm.shape[-1]),), 1
        if isinstance(cocc, (tuple, list)):
            return tuple(cocc), len(cocc)
        return (cocc,), 1

    # -- RSH long-range exchange ----------------------------------------------
    def prepare_lr(self, omega: float):
        if omega not in self._B_lr:
            X = build_3c2e_compressed_hostassemble(
                self._mol.basis_set, self.aux, self._coords, self.pm,
                omega=omega)
            M = build_2c2e_hostassemble(self.aux, self._coords,
                                        omega=omega)
            Linv = np.asarray(metric_factor(M, rcond=1e-10))
            self._B_lr[omega] = jnp.asarray(
                (Linv @ X).astype(np.float32))

    def k_lr(self, dm, omega: float, cocc=None):
        ov = self._consts_override
        if ov is not None and omega in ov.get("B_lr", {}):
            B = ov["B_lr"][omega]
            pi, pj, w = ov["pi"], ov["pj"], ov["w"]
        else:
            self.prepare_lr(omega)
            B = self._B_lr[omega].astype(dm.dtype)
            pi, pj, w = self._pi, self._pj, self._w32.astype(dm.dtype)
        coccs, nspin = self._norm_cocc(dm, cocc)
        _, K = _jk_c_fn(True, nspin, jnp.dtype(dm.dtype).name)(
            B, pi, pj, w, dm, coccs)
        if dm.ndim == 3 and K.ndim == 2:
            K = jnp.stack([K, K])
        return K

    # -- dense view for small-system consumers (MP2/response/CASSCF) ----------
    @property
    def B(self):
        """Densified f64 factor [nkeep, nao, nao] — only for consumers
        that genuinely need the dense layout; guarded against silently
        materializing tens of GB."""
        nao = self._mol.nao
        nbytes = self._B32.shape[0] * nao * nao * 8
        if nbytes > float(os.environ.get("CCTPU_CDF_DENSIFY_MAX", 4e9)):
            raise MemoryError(
                f"dense B would be {nbytes / 1e9:.1f} GB; the compressed "
                f"builder serves J/K directly — use those, or raise "
                f"CCTPU_CDF_DENSIFY_MAX")
        Bc = self._B32.astype(jnp.float64)
        D = jnp.zeros((Bc.shape[0], nao + 1, nao + 1))
        D = D.at[:, self._pi, self._pj].set(Bc)
        D = D.at[:, self._pj, self._pi].set(Bc)
        return D[:, :nao, :nao]
