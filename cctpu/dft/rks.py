"""Kohn–Sham DFT: RKS / UKS.

Replaces PySCF dft.RKS/UKS + gpu4pyscf's CUDA XC integration (reference call
stack SURVEY.md §3.1). Design:
 - grid AO values are evaluated once per geometry and chunked; the XC energy
   is a lax.scan over fixed-size grid chunks (bounded memory, one compile);
 - the XC Fock matrix is jax.grad of E_xc[D] — machine-exact potentials with
   zero hand-written derivative code, including meta-GGAs;
 - hybrids mix DF/in-core exact exchange through the same J/K builders as HF.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from cctpu.dft.grids import Grids
from cctpu.dft.numint import eval_ao
from cctpu.dft.xc import get_functional
from cctpu.scf.hf import RHF, UHF, SCFBase


def _chunk_pts(pts, w, chunk: int):
    """Pad and reshape grid points/weights into fixed-size chunks (padding
    points go to a far-away location with zero weight)."""
    npts = pts.shape[0]
    npad = (-npts) % chunk
    pts = jnp.pad(pts, ((0, npad), (0, 0)), constant_values=1e6)
    w = jnp.pad(w, (0, npad))
    return pts.reshape(-1, chunk, 3), w.reshape(-1, chunk)


class _XCMixin:
    """Shared XC machinery for RKS/UKS. Set self.xc before kernel()."""

    xc: str = "lda"
    grid_level: int = 3
    grid_chunk: int = 8192

    def _setup_xc(self):
        self.func = get_functional(self.xc)
        if self.func.xctype == "HF":
            return
        grids = Grids(self.mol, level=self.grid_level)
        pts, w = grids.build(self.coords)
        self.grids = grids
        self._pts_chunks, self._w_chunks = _chunk_pts(pts, w,
                                                      self.grid_chunk)

    def _prepare_xc_f32(self):
        """Eager f32 copies of the grid chunks (outside any trace), plus a
        per-geometry AO-value cache: grid AOs are dm-independent, so the
        f32 SCF phase shouldn't re-run the basis evaluation every cycle."""
        if self.func.xctype != "HF" and not hasattr(self, "_pts_chunks32"):
            self._pts_chunks32 = self._pts_chunks.astype(jnp.float32)
            self._w_chunks32 = self._w_chunks.astype(jnp.float32)
            self._coords32 = self.coords.astype(jnp.float32)
            nchunk, chunk = self._w_chunks.shape
            est_bytes = nchunk * 4 * chunk * self.mol.nao * 4
            if est_bytes <= 3e9:        # cache gate: HBM headroom
                ev = jax.jit(lambda p: eval_ao(
                    self.mol.basis_set, self._coords32, p,
                    deriv=1).astype(jnp.float32))
                self._ao_chunks32 = jnp.stack(
                    [ev(self._pts_chunks32[k]) for k in range(nchunk)])

    def _prepare_xc_f64(self):
        """Per-geometry f64 AO-value cache (mirror of _prepare_xc_f32):
        without it every f64 polish cycle re-evaluates the whole grid
        basis in emulated f64 — measured 2.2 s/cycle at phenol/6-31G*
        where the cached-AO f32 cycle is 0.02 s."""
        if self.func.xctype != "HF" and not hasattr(self, "_ao_chunks64"):
            nchunk, chunk = self._w_chunks.shape
            est_bytes = nchunk * 4 * chunk * self.mol.nao * 8
            if est_bytes <= 3e9:        # cache gate: HBM headroom
                ev = jax.jit(lambda p: eval_ao(
                    self.mol.basis_set, self.coords, p, deriv=1))
                self._ao_chunks64 = jnp.stack(
                    [ev(self._pts_chunks[k]) for k in range(nchunk)])

    _xc_override = None   # bound pytree of jit arguments (SCFBase._bind_consts)

    def _xc_consts(self, dtype):
        """Geometry-constant grid tensors for argument-threading through the
        jitted SCF step. Dict KEYS are static pytree structure, so _exc_total
        can branch on them at trace time: {"ao": (ao_chunks, w)} when the AO
        cache fits HBM, else {"pts": (coords, pts_chunks, w)}."""
        if self.func.xctype == "HF":
            return None
        if dtype == jnp.float32:
            self._prepare_xc_f32()
            if hasattr(self, "_ao_chunks32"):
                return {"ao": (self._ao_chunks32, self._w_chunks32)}
            return {"pts": (self._coords32, self._pts_chunks32,
                            self._w_chunks32)}
        self._prepare_xc_f64()
        if hasattr(self, "_ao_chunks64"):
            return {"ao": (self._ao_chunks64, self._w_chunks)}
        return {"pts": (self.coords, self._pts_chunks, self._w_chunks)}

    def _exc_total(self, dm):
        """E_xc[D] on the cached grid (fixed geometry; follows dm dtype)."""
        ov = self._xc_override
        if ov is not None:
            if "ao" in ov:
                return self._exc_cached(dm, *ov["ao"])
            return self._exc_with(dm, *ov["pts"])
        if dm.dtype == jnp.float32:
            if hasattr(self, "_ao_chunks32"):
                return self._exc_cached(dm, self._ao_chunks32,
                                        self._w_chunks32)
            if not hasattr(self, "_pts_chunks32"):
                # inside-trace safe: no attribute assignment
                return self._exc_with(dm, self.coords.astype(jnp.float32),
                                      self._pts_chunks.astype(jnp.float32),
                                      self._w_chunks.astype(jnp.float32))
            return self._exc_with(dm, self._coords32, self._pts_chunks32,
                                  self._w_chunks32)
        if hasattr(self, "_ao_chunks64"):
            return self._exc_cached(dm, self._ao_chunks64, self._w_chunks)
        return self._exc_with(dm, self.coords, self._pts_chunks,
                              self._w_chunks)

    def _exc_cached(self, dm, ao_chunks, w_chunks):
        """E_xc[D] from precomputed AO chunks [nchunk, 4, chunk, nao]."""
        func = self.func
        restricted = dm.ndim == 2

        def body(acc, chunk):
            ao, w = chunk
            return acc + self._chunk_exc_from_ao(func, restricted, dm, ao,
                                                 w), None

        total, _ = jax.lax.scan(body, jnp.asarray(0.0, dm.dtype),
                                (ao_chunks, w_chunks))
        return total

    def exc_of_coords(self, coords, dm):
        """E_xc[D] rebuilt at arbitrary coords (differentiable — used by
        the nuclear-gradient path; includes grid-weight derivatives)."""
        pts, w = self.grids.build(coords)
        pts_c, w_c = _chunk_pts(pts, w, self.grid_chunk)
        return self._exc_with(dm, coords, pts_c, w_c)

    @staticmethod
    def _chunk_exc_from_ao(func, restricted, dm, ao, w):
        """Integrated XC energy of one grid chunk given AO values
        ao [4, chunk, nao] (value + 3 gradients)."""
        a0 = ao[0]
        if restricted:
            Dh = 0.5 * dm
            da = jnp.einsum("ij,pj->pi", Dh, a0)
            ra = jnp.einsum("pi,pi->p", a0, da)
            rb = ra
            ga = jnp.stack([2 * jnp.einsum("pi,pi->p", ao[1 + d], da)
                            for d in range(3)], -1)
            gb = ga
        else:
            da = jnp.einsum("ij,pj->pi", dm[0], a0)
            db = jnp.einsum("ij,pj->pi", dm[1], a0)
            ra = jnp.einsum("pi,pi->p", a0, da)
            rb = jnp.einsum("pi,pi->p", a0, db)
            ga = jnp.stack([2 * jnp.einsum("pi,pi->p", ao[1 + d], da)
                            for d in range(3)], -1)
            gb = jnp.stack([2 * jnp.einsum("pi,pi->p", ao[1 + d], db)
                            for d in range(3)], -1)
        saa = jnp.einsum("pd,pd->p", ga, ga)
        sab = jnp.einsum("pd,pd->p", ga, gb)
        sbb = jnp.einsum("pd,pd->p", gb, gb)
        if func.xctype == "MGGA":
            if restricted:
                ta = 0.25 * sum(
                    jnp.einsum("pi,ij,pj->p", ao[1 + d], dm, ao[1 + d])
                    for d in range(3))
                tb = ta
            else:
                ta = 0.5 * sum(
                    jnp.einsum("pi,ij,pj->p", ao[1 + d], dm[0], ao[1 + d])
                    for d in range(3))
                tb = 0.5 * sum(
                    jnp.einsum("pi,ij,pj->p", ao[1 + d], dm[1], ao[1 + d])
                    for d in range(3))
        else:
            ta = tb = jnp.zeros_like(ra)
        e = func.exc(ra, rb, saa, sab, sbb, ta, tb)
        return jnp.sum(w * e)

    def _exc_with(self, dm, coords, pts_chunks, w_chunks):
        func = self.func
        basis = self.mol.basis_set
        restricted = dm.ndim == 2

        def body(acc, chunk):
            pts, w = chunk

            # rematerialize per chunk: under jax.grad(exc_of_coords) the
            # scan backward otherwise stores every chunk's eval_ao
            # primitive intermediates — RESOURCE_EXHAUSTED on the 16 GB
            # v5e at phenol (r5 gradient probe). Recompute-in-backward
            # trades ~2x XC-gradient FLOPs for O(1-chunk) memory — the
            # standard jax.checkpoint pattern for grid sweeps.
            def one(coords_, dm_):
                ao = eval_ao(basis, coords_, pts, deriv=1)
                return self._chunk_exc_from_ao(func, restricted, dm_, ao,
                                               w)

            return acc + jax.checkpoint(one)(coords, dm), None

        total, _ = jax.lax.scan(body, 0.0, (pts_chunks, w_chunks))
        return total


class RKS(_XCMixin, RHF):
    def __init__(self, mol, xc: str = "lda", **opts):
        super().__init__(mol, **opts)
        self.xc = xc
        self.grid_level = opts.get("grid_level", 3)
        self._setup_xc()

    def get_veff(self, dm, cocc=None):
        func = self.func
        J, K = self._jk(dm, with_k=bool(func.hyb), cocc=cocc)
        ecoul = 0.5 * jnp.einsum("ij,ij->", dm, J)
        veff = J
        e2 = ecoul
        if func.hyb:
            veff = veff - 0.5 * func.hyb * K
            e2 = e2 - 0.25 * func.hyb * jnp.einsum("ij,ij->", dm, K)
        if func.rsh is not None:
            omega, _, beta = func.rsh
            Klr = self._jk.k_lr(dm, omega, cocc=cocc)
            veff = veff - 0.5 * beta * Klr
            e2 = e2 - 0.25 * beta * jnp.einsum("ij,ij->", dm, Klr)
        if func.exc is not None:
            # one fused pass for E_xc and its dm-gradient (was two)
            exc, vxc = jax.value_and_grad(self._exc_total)(dm)
            # project onto symmetric matrices: D is constrained symmetric,
            # and the GGA terms make the raw AD gradient asymmetric
            vxc = 0.5 * (vxc + vxc.T)
            veff = veff + vxc
            e2 = e2 + exc
        return veff, e2


class UKS(_XCMixin, UHF):
    def __init__(self, mol, xc: str = "lda", **opts):
        super().__init__(mol, **opts)
        self.xc = xc
        self.grid_level = opts.get("grid_level", 3)
        self._setup_xc()

    def get_veff(self, dm, cocc=None):
        func = self.func
        J, K = self._jk(dm, with_k=bool(func.hyb), cocc=cocc)
        Jtot = J[0] + J[1]
        ecoul = 0.5 * jnp.einsum("sij,ij->", dm, Jtot)
        veff = jnp.stack([Jtot, Jtot])
        e2 = ecoul
        if func.hyb:
            veff = veff - func.hyb * K
            e2 = e2 - 0.5 * func.hyb * jnp.einsum("sij,sij->", dm, K)
        if func.rsh is not None:
            omega, _, beta = func.rsh
            Klr = self._jk.k_lr(dm, omega, cocc=cocc)
            veff = veff - beta * Klr
            e2 = e2 - 0.5 * beta * jnp.einsum("sij,sij->", dm, Klr)
        if func.exc is not None:
            exc, vxc = jax.value_and_grad(self._exc_total)(dm)
            vxc = 0.5 * (vxc + jnp.swapaxes(vxc, -1, -2))
            veff = veff + vxc
            e2 = e2 + exc
        return veff, e2
