"""Reproduce + decompose the SAD-anchor NaN (NOTES_r04 residual #1).

The r4 bench decomposition showed: dm finite, e1 finite, veff NON-finite
in the f64 SAD Fock build at phenol/6-31G* B3LYP. Suspected emulated-f64
underflow in an XC branch on the raw (non-idempotent) SAD density.

This probe isolates the non-finite component on device: J, K, exc forward,
vxc = grad(exc), and — if vxc is the culprit — bisects over grid chunks
and functional terms.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import PHENOL
from cctpu.core.molecule import Molecule
from cctpu.dft.rks import RKS

t0 = time.time()


def log(m):
    print(f"[{time.time() - t0:6.1f}s] {m}", flush=True)


mol = Molecule.from_atoms(PHENOL, basis="6-31g*")
mf = RKS(mol, xc="b3lyp", density_fit=True, max_cycle=45,
         conv_tol=1e-7, conv_tol_grad=1e-6, precision="mixed")
mf.grid_level = 2
mf._setup_xc()
log("grids ready")
mf.get_jk_builder()
log(f"B built naux={mf._jk._B32.shape[0]}")

dm = mf.init_guess_dm()
log(f"dm finite={bool(jnp.isfinite(dm).all())} "
    f"tr(D S)... dm dtype={dm.dtype}")
dm64 = dm.astype(jnp.float64)
cocc = mf._factor_cocc(dm)
log(f"cocc finite={bool(jnp.isfinite(cocc).all())}")

J, K = mf._jk(dm64, with_k=True, cocc=cocc)
log(f"J finite={bool(jnp.isfinite(J).all())} "
    f"K finite={bool(jnp.isfinite(K).all()) if K is not None else None}")

exc = mf._exc_total(dm64)
log(f"exc forward = {float(exc)} finite={bool(jnp.isfinite(exc))}")

exc_v, vxc = jax.value_and_grad(mf._exc_total)(dm64)
vxc_fin = bool(jnp.isfinite(vxc).all())
log(f"vxc finite={vxc_fin} exc={float(exc_v)}")

if not vxc_fin or not bool(jnp.isfinite(exc)):
    # bisect over grid chunks with the f64 cached-AO path
    mf._prepare_xc_f64()
    have_ao = hasattr(mf, "_ao_chunks64")
    log(f"ao cache64 present={have_ao}")
    if have_ao:
        nchunk = mf._ao_chunks64.shape[0]

        def exc_one(dm_, k):
            return mf._chunk_exc_from_ao(mf.func, True, dm_,
                                         mf._ao_chunks64[k],
                                         mf._w_chunks[k])
        bad = []
        for k in range(nchunk):
            e_k, g_k = jax.value_and_grad(exc_one)(dm64, k)
            ef, gf = bool(jnp.isfinite(e_k)), bool(jnp.isfinite(g_k).all())
            if not (ef and gf):
                bad.append(k)
                log(f"chunk {k}: exc={float(e_k)} finite={ef} grad_fin={gf}")
        log(f"bad chunks: {bad} / {nchunk}")
        if bad:
            # decompose one bad chunk: rho stats on that chunk
            k = bad[0]
            ao = mf._ao_chunks64[k]          # [4, chunk, nao]
            rho = jnp.einsum("pi,ij,pj->p", ao[0], dm64, ao[0])
            drho = 2 * jnp.einsum("dpi,ij,pj->dp", ao[1:4], dm64, ao[0])
            sigma = (drho ** 2).sum(0)
            log(f"chunk {k}: rho min={float(rho.min()):.3e} "
                f"max={float(rho.max()):.3e} "
                f"#neg={int((rho < 0).sum())} "
                f"#tiny={int((jnp.abs(rho) < 1e-11).sum())}")
            log(f"sigma min={float(sigma.min()):.3e} "
                f"max={float(sigma.max()):.3e}")
            # per-term: which functional component NaNs?
            from cctpu.dft import xc as xcmod
            for nm in ("slater", "b88", "lyp", "vwn3"):
                try:
                    f = xcmod.get_functional(nm)
                except Exception as e:
                    log(f"{nm}: no functional ({e})")
                    continue

                def one_term(dm_):
                    return mf._chunk_exc_from_ao(f, True, dm_, ao,
                                                 mf._w_chunks[k])
                e_t, g_t = jax.value_and_grad(one_term)(dm64)
                log(f"{nm}: e={float(e_t):.6e} "
                    f"finite={bool(jnp.isfinite(e_t))} "
                    f"grad_fin={bool(jnp.isfinite(g_t).all())}")
log("done")
