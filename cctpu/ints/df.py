"""Density fitting: automatic auxiliary basis, 3c2e/2c2e integrals, DF-J/K.

This is the production Fock path (SURVEY.md §7.1 layer 2, §7.3 item 1): with
B[P,i,j] = sum_Q (P|Q)^{-1/2} (Q|ij), the SCF hot loop becomes pure MXU
matmuls — J = B^T (B·D), K from occupied orbitals — replacing gpu4pyscf's
CUDA DF kernels with XLA/TPU-native contractions.

The auxiliary basis is generated automatically (even-tempered products in
the spirit of Stoychev/Auer/Neese "AutoAux", JCTC 13, 554 (2017)): no
tabulated JKFIT data is needed, which matters in this zero-egress build.
Accuracy knob: `beta` (series ratio); 2.0 gives ~1e-5 Ha Coulomb-fitting
errors on organic molecules (validated in tests against in-core ERIs).
"""

from __future__ import annotations

import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from functools import lru_cache

from cctpu.core.basis import (BasisSet, Shell, normalize_contraction, nsph)
from cctpu.ints.two_electron import (PairClass, _class_chunk,
                                     _quartet_vmapped, eri_quartet_kernel,
                                     pair_classes)


def _pow2_rows(a: np.ndarray, floor: Optional[int] = None) -> np.ndarray:
    """Pad axis 0 to max(floor, next power of two), repeating row 0.

    The gather kernels specialize on table SHAPES; a per-molecule shape
    meant a full recompile of the class family per molecule (~45 s per
    kernel on the remote TPU compiler). A fixed floor puts every system
    up to ~C24-alkane size in ONE bucket per class (the padding is a few
    MB of device memory; gathers only ever touch real rows)."""
    if floor is None:
        floor = _PAIR_FLOOR
    a = np.asarray(a)
    n = a.shape[0]
    m = max(floor, 1 << max(0, n - 1).bit_length())
    if m == n:
        return a
    return np.concatenate([a, np.repeat(a[:1], m - n, axis=0)])


@lru_cache(maxsize=None)
def _3c2e_chunk_fn(ls, omega):
    """Per-class 3c2e chunk kernel with IN-JIT gather: the class's full
    (exps, coefs, centers) tables are device-resident arguments and each
    chunk dispatch ships only two small index vectors. On the
    axon-tunneled TPU the old path's 12 host->device transfers per chunk
    made the eager B build latency-bound (~6.5k round trips at
    C16H34/6-31G*)."""
    def fn(Pe, Pc, Pxyz, de, dc, Ae, Ac, Axyz, Be, Bc, Bxyz, i1, i2):
        def one(j1, j2):
            return eri_quartet_kernel(
                ls, Pe[j1], Pc[j1], Pxyz[j1], de, dc, Pxyz[j1],
                Ae[j2], Ac[j2], Axyz[j2], Be[j2], Bc[j2], Bxyz[j2],
                omega=omega)
        return jax.vmap(one)(i1, i2)
    return jax.jit(fn)


def autoaux(basis: BasisSet, beta: float = 1.8, extra_l: int = 2,
            lmax_cap: int = 4) -> BasisSet:
    """Even-tempered auto-generated auxiliary basis for Coulomb/exchange
    fitting, built per atom from the products of orbital primitives.

    ``extra_l`` channels beyond 2*l_max(orbital) are essential for fitting
    *off-center* pair densities (e.g. H-H and O-H products when H carries
    only s functions — the same reason def2-universal-JKFIT puts p/d sets on
    hydrogen). With beta=1.8, extra_l=2 the maximum |(ij|kl)_DF - (ij|kl)|
    on the water/STO-3G validation case is ~8e-7 (see tests/test_df.py).
    """
    per_atom = {}
    for sh in basis.shells:
        d = per_atom.setdefault(sh.atom, {})
        d.setdefault(sh.l, []).extend([float(e) for e in sh.exps])

    aux_shells = []
    for atom, ldata in sorted(per_atom.items()):
        lmax_orb = max(ldata)
        for laux in range(min(2 * lmax_orb + extra_l, lmax_cap) + 1):
            lreq = min(laux, 2 * lmax_orb)
            prods = [a + b
                     for l1, e1 in ldata.items()
                     for l2, e2 in ldata.items() if l1 + l2 >= lreq
                     for a in e1 for b in e2]
            if not prods:
                continue
            amin = min(prods) / beta
            amax = max(prods)
            if laux > 0:
                # high-l fitting channels don't need core-steep exponents
                amax = min(amax, max(60.0, 30.0 * amin))
            n = max(1, int(math.ceil(math.log(amax / amin) / math.log(beta))))
            for k in range(n + 1):
                earr = np.array([amin * beta ** k])
                carr = normalize_contraction(laux, earr, np.array([1.0]))
                aux_shells.append(Shell(atom=atom, l=laux, exps=earr,
                                        coefs=carr))
    aux_shells.sort(key=lambda s: (s.atom, s.l))
    natm = max(sh.atom for sh in basis.shells) + 1
    atom_coords = np.zeros((natm, 3))
    for l, g in basis.groups.items():
        atom_coords[g.atom_idx] = g.centers
    return BasisSet(aux_shells, atom_coords)


_DUMMY_E = np.array([0.0])
_DUMMY_C = np.array([1.0])


def _pow2(n: int, floor: int = 1) -> int:
    return max(floor, 1 << max(0, int(n) - 1).bit_length())


# Quartets per super-batch dispatch. Every kernel/scatter jit below sees
# index arrays of EXACTLY this many quartets (reshaped to [SB, chunk] for
# the lax.map), so the expensive remote compiles are keyed only on the
# class — one compile EVER per (ls, chunk, dtype), reused across molecules
# and rounds through the persistent cache. Small classes pay at most one
# padded dispatch of wasted compute. Env-overridable: the CPU test lane
# (tests/conftest.py) shrinks these — executing TPU-sized padding for
# ~50-quartet test molecules made the fast lane unusable (VERDICT r3 #6).
_NBATCH = int(os.environ.get("CCTPU_NBATCH", "65536"))
_NBATCH_SMALL = int(os.environ.get("CCTPU_NBATCH_SMALL", "8192"))

# Gather-table padding floors (rows). Fixed floors put every system up to
# ~C24 in ONE shape bucket per class (one compile ever); smaller floors
# for the CPU test lane.
_AUX_FLOOR = int(os.environ.get("CCTPU_AUX_FLOOR", "2048"))
_PAIR_FLOOR = int(os.environ.get("CCTPU_PAIR_FLOOR", "32768"))


def _split_default() -> bool:
    """Opt-in (CCTPU_SPLIT_DOTS=1): route superbatch kernels through the
    bf16 3-slice compensated dots (ops/splitdot.py). Measured on axon
    (probe_bisect 2026-08-20): the 3-slice scheme is NOT accurate enough
    for ERI contractions — Hermite/cart2sph sums cancel by ~1e4, so the
    f32 accumulator floor leaves ~3e-3 relative error (bf16-grade).
    Meanwhile the f64 HIGHEST einsums measured EXACT (1e-14) in the same
    lax.map superbatch context at fresh shapes — the round-3 "HIGHEST
    doesn't hold under lax.map" diagnosis was wrong; the corruption
    tracks the compiled-executable identity (padding-floor shape), see
    scripts/probe_floor.py."""
    return os.environ.get("CCTPU_SPLIT_DOTS", "0") == "1"


@lru_cache(maxsize=None)
def _class_batch_fn(ls, omega, dtype_name, with_aux_right, split=None):
    """One jitted super-batch: lax.map over [SB, chunk] index arrays
    computes _NBATCH quartet blocks of the class; the stacked result stays
    on device. Nothing crosses the host link (round 1 shipped every block
    over the ~30 MB/s axon tunnel: 318 s/645 s DF-build wall time).

    with_aux_right=False: 3c2e (P 0 | a b), returns [N, sP, sa, sb].
    with_aux_right=True:  2c2e (P 0 | Q 0), returns [N, sP, sQ].
    """
    dtype = jnp.dtype(dtype_name)
    if split is None:
        split = _split_default()

    def fn(Pe, Pc, Pxyz, de, dc, Ae, Ac, Axyz, Be, Bc, Bxyz, i1, i2):
        def one(j1, j2):
            if with_aux_right:      # (P 0 | Q 0): dummy s on both right slots
                blk = eri_quartet_kernel(
                    ls, Pe[j1], Pc[j1], Pxyz[j1], de, dc, Pxyz[j1],
                    Ae[j2], Ac[j2], Axyz[j2], de, dc, Axyz[j2],
                    omega=omega, split_dots=split)
                return blk[:, 0, :, 0]
            blk = eri_quartet_kernel(
                ls, Pe[j1], Pc[j1], Pxyz[j1], de, dc, Pxyz[j1],
                Ae[j2], Ac[j2], Axyz[j2], Be[j2], Bc[j2], Bxyz[j2],
                omega=omega, split_dots=split)
            return blk[:, 0]

        def one_chunk(idx):
            j1, j2 = idx
            return jax.vmap(one)(j1, j2).astype(dtype)

        out = jax.lax.map(one_chunk, (i1, i2))     # [SB, chunk, ...]
        return out.reshape((-1,) + out.shape[2:])

    return jax.jit(fn)


@lru_cache(maxsize=None)
def _scatter3_fn(n, sP, sa, sb, naux1, nao1, dtype_name):
    """Fused (ab + ba-mirror) scatter of one super-batch of blocks into
    the padded (P|ab) accumulator. The accumulator is DONATED, so the
    update is in-place; padding quartets land on the dump row/col."""
    del n, sP, sa, sb, naux1, nao1, dtype_name   # shape-key only

    def fn(out, blocks, pi, ai, bi):
        out = out.at[pi[:, :, None, None], ai[:, None, :, None],
                     bi[:, None, None, :]].set(blocks)
        return out.at[pi[:, :, None, None], bi[:, None, :, None],
                      ai[:, None, None, :]].set(blocks.swapaxes(2, 3))

    return jax.jit(fn, donate_argnums=0)


@lru_cache(maxsize=None)
def _scatter2_fn(n, sP, sQ, naux1, dtype_name):
    """2c2e analog of _scatter3_fn (PQ + QP-mirror)."""
    del n, sP, sQ, naux1, dtype_name

    def fn(out, blocks, pi, qi):
        out = out.at[pi[:, :, None], qi[:, None, :]].set(blocks)
        return out.at[qi[:, :, None], pi[:, None, :]].set(
            blocks.swapaxes(1, 2))

    return jax.jit(fn, donate_argnums=0)


# Build-time integral validation: spot-check this many quartets of every
# dispatched angular-momentum class against the independent numpy oracle
# (ints/host_oracle.py). Round-4 probe_floor finding: the persistent axon
# compile cache served ONE corrupt (d|g) executable — all sibling classes
# bit-exact — silently shifting SCF by 0.05 Ha for two rounds. A corrupt
# EXECUTABLE can't be caught by precision pins or anchors downstream, only
# by an independent reference at build time. 0 disables (not recommended).
_SPOT_N = int(os.environ.get("CCTPU_SPOT_CHECK_N", "4"))


def _spot_tol(scale: float, dtype_name: str) -> float:
    if dtype_name == "float32":
        return 1e-8 + 3e-5 * scale
    return 1e-10 + 1e-8 * scale


def _validate_batch(blocks_dev, q1f, q2f, padm, oracle_blk):
    """max|dev - oracle| and oracle scale over a spread of real quartets."""
    real = np.where(~padm)[0]
    if _SPOT_N <= 0 or len(real) == 0:
        return 0.0, 1.0
    sel = real[np.unique(np.linspace(0, len(real) - 1,
                                     min(_SPOT_N, len(real))).astype(int))]
    worst, scale = 0.0, 0.0
    for k in sel:
        got = np.asarray(blocks_dev[int(k)], dtype=np.float64)
        ref = oracle_blk(int(q1f[k]), int(q2f[k]))
        worst = max(worst, float(np.abs(got - ref).max()))
        scale = max(scale, float(np.abs(ref).max()))
    return worst, scale


def _dispatch_class(kern, tables, q1, q2, chunk):
    """All superbatches of one class -> [(blocks_dev, q1f, q2f, padm)].

    tables is the full 11-slot argument tuple of _class_batch_fn's fn
    (Pe, Pc, Pxyz, de, dc, Ae, Ac, Axyz, Be, Bc, Bxyz)."""
    out = []
    for i1, i2, padm in _superbatches(q1, q2, chunk):
        blocks = kern(*tables, jnp.asarray(i1), jnp.asarray(i2))
        out.append((blocks, i1.ravel(), i2.ravel(), padm))
    return out


def _bump_memo_path():
    try:
        from cctpu import _cache_dir
        return os.path.join(_cache_dir, "floor_bumps.json")
    except Exception:
        return None


@lru_cache(maxsize=1)
def _bump_memo() -> dict:
    """Known-good padding-floor bumps per class, persisted alongside the
    compile cache (same lifetime as the corrupt artifacts they dodge).
    The axon miscompile is DETERMINISTIC per (class, shape): starting at
    the remembered bump skips recompiling the corrupt executable on
    every fresh build (~30-100 s per affected class)."""
    path = _bump_memo_path()
    if path and os.path.exists(path):
        try:
            import json
            with open(path) as f:
                return json.load(f)
        except Exception:
            pass
    return {}


def _atomic_json_save(path: str, merge, data):
    """Atomic read-merge-write (tmp + os.replace): concurrent builders
    (bench + a probe) must not clobber each other's memo entries
    (ADVICE r4 low)."""
    import json
    try:
        if os.path.exists(path):
            with open(path) as f:
                on_disk = json.load(f)
        else:
            on_disk = None
        data = merge(on_disk, data)
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(data, f)
        os.replace(tmp, path)
    except Exception:
        pass


def _bump_memo_save(key: str, bump: int):
    memo = _bump_memo()
    memo[key] = bump
    path = _bump_memo_path()
    if path:
        def merge(on_disk, data):
            if isinstance(on_disk, dict):
                on_disk.update(data)
                return on_disk
            return data
        _atomic_json_save(path, merge, memo)


def _bump_key(tag: str, chunk: int, dtn: str) -> str:
    """Canonical memo key: builder-variant-independent (the 'h'/'c'
    assembly suffixes share one executable per (class, shapes, dtype)).
    Includes the padding floors: the corrupt-executable dodge is per
    (class, SHAPE), and CPU-lane runs override the floors via env
    (ADVICE r4 low) — a bump memoized under production floors must not
    be replayed under test floors."""
    parts = tag.split(" ", 1)
    base = parts[0]
    for b in ("3c2e", "2c2e"):
        if base.startswith(b):
            base = b
    rest = parts[1] if len(parts) > 1 else ""
    return (f"{base} {rest} chunk{chunk} {dtn} "
            f"f{_AUX_FLOOR},{_PAIR_FLOOR}")


_PHASE_LOG = os.environ.get("CCTPU_PHASE_LOG", "0") == "1"


def _plog(tag, phase, t0):
    if _PHASE_LOG:
        import sys
        import time as _t
        print(f"# cctpu-phase: {tag} {phase} {_t.time() - t0:6.2f}s",
              file=sys.stderr, flush=True)


def _dispatch_validated(kern, tables_fn, q1, q2, chunk,
                        oracle_blk, dtn, tag):
    """Dispatch a class; on oracle mismatch retry through a differently
    shaped (hence differently compiled) executable, then hard-fail.

    tables_fn(bump) must return the device tables with every padding
    floor multiplied by 2**bump — a new shape key selects a new XLA
    executable, sidestepping a corrupt persistent-cache artifact."""
    import sys
    import time as _t
    key = _bump_key(tag, chunk, dtn)
    start = int(_bump_memo().get(key, 0))
    err = scale = float("nan")
    for bump in range(max(start, 0), 3 if start >= 0 else 0):
        t0 = _t.time()
        tables = tables_fn(bump)
        _plog(tag, "tables", t0)
        t0 = _t.time()
        batches = _dispatch_class(kern, tables, q1, q2, chunk)
        if _PHASE_LOG:
            batches[0][0].block_until_ready()
        _plog(tag, "dispatch", t0)
        t0 = _t.time()
        err, scale = _validate_batch(*batches[0], oracle_blk)
        _plog(tag, "validate", t0)
        if err <= _spot_tol(scale, dtn):
            if bump:
                print(f"# cctpu: {tag}: ok at floor bump x{2**bump}"
                      f" (err {err:.2e})", file=sys.stderr, flush=True)
            if bump != start:
                _bump_memo_save(key, bump)
            return batches
        print(f"# cctpu: {tag}: device blocks deviate from host oracle by "
              f"{err:.2e} (scale {scale:.1e}) — corrupt compiled executable;"
              f" retrying with bumped padding floors", file=sys.stderr,
              flush=True)
    # bump ladder exhausted: compute this class ON HOST with the same
    # numpy-f64 oracle that flagged it. Bulletproof and cheap for small
    # classes (the only observed victims are aux-metric classes with a
    # few hundred quartets); large classes still hard-fail loudly rather
    # than silently spend minutes per quartet on host.
    nreal = len(q1)
    if nreal <= int(os.environ.get("CCTPU_HOST_FALLBACK_MAX_Q", "20000")):
        print(f"# cctpu: {tag}: computing {nreal} quartets with the "
              f"HOST oracle (device executable unusable after 2 "
              f"shape-perturbed recompiles, err {err:.2e})",
              file=sys.stderr, flush=True)
        if start != -1:
            _bump_memo_save(key, -1)     # skip the ladder next build
        batches = []
        for i1, i2, padm in _superbatches(q1, q2, chunk):
            q1f, q2f = i1.ravel(), i2.ravel()
            blk0 = oracle_blk(int(q1f[0]), int(q2f[0]))
            blocks = np.zeros((len(q1f),) + blk0.shape)
            for k in np.where(~padm)[0]:
                blocks[k] = oracle_blk(int(q1f[k]), int(q2f[k]))
            batches.append((blocks, q1f, q2f, padm))
        return batches
    raise RuntimeError(
        f"integral class {tag}: device kernel disagrees with the host "
        f"oracle by {err:.2e} after 2 shape-perturbed recompiles")


def _superbatches(q1: np.ndarray, q2: np.ndarray, chunk: int):
    """Split quartet index lists into fixed-size super-batches
    [(i1 [SB, chunk], i2 [SB, chunk], padm [N])]. N is _NBATCH, except a
    lone small batch for classes under _NBATCH_SMALL quartets.

    Every builder calls this once per class, right before dispatching the
    class kernel — the one host-side point each ~30-110 s remote compile
    passes through — so the cooperative bench deadline lives here (SIGALRM
    cannot interrupt the blocked foreign call; utils/deadline.py)."""
    from cctpu.utils.deadline import check
    check("integral class dispatch")
    nreal = len(q1)
    N = _NBATCH if nreal > _NBATCH_SMALL else _NBATCH_SMALL
    N = max(N, chunk)
    nb = -(-nreal // N)
    npad = nb * N - nreal
    q1 = np.concatenate([q1, np.zeros(npad, np.int32)]).astype(np.int32)
    q2 = np.concatenate([q2, np.zeros(npad, np.int32)]).astype(np.int32)
    padm = np.zeros(nb * N, bool)
    padm[nreal:] = True
    sb = N // chunk
    return [(q1[s:s + N].reshape(sb, chunk), q2[s:s + N].reshape(sb, chunk),
             padm[s:s + N]) for s in range(0, nb * N, N)]


def _tables_3c(coords, gP, pc, de, dc, bump: int):
    """Device tables for a (P|ab) class: aux floor _AUX_FLOOR << bump,
    AO-pair floor _PAIR_FLOOR << bump."""
    fP = _AUX_FLOOR << bump
    fAB = _PAIR_FLOOR << bump
    Pe = jnp.asarray(_pow2_rows(gP.exps, floor=fP))
    Pc = jnp.asarray(_pow2_rows(gP.coefs, floor=fP))
    Pxyz = coords[jnp.asarray(_pow2_rows(gP.atom_idx, floor=fP))]
    Ae = jnp.asarray(_pow2_rows(pc.exps_a, floor=fAB))
    Ac = jnp.asarray(_pow2_rows(pc.coefs_a, floor=fAB))
    Axyz = coords[jnp.asarray(_pow2_rows(pc.atom_a, floor=fAB))]
    Be = jnp.asarray(_pow2_rows(pc.exps_b, floor=fAB))
    Bc = jnp.asarray(_pow2_rows(pc.coefs_b, floor=fAB))
    Bxyz = coords[jnp.asarray(_pow2_rows(pc.atom_b, floor=fAB))]
    return (Pe, Pc, Pxyz, de, dc, Ae, Ac, Axyz, Be, Bc, Bxyz)


def _oracle_3c(coords_np, gP, lP, pc, omega):
    from cctpu.ints.host_oracle import eri_3c2e_np

    def blk(i, j):
        return eri_3c2e_np(
            lP, gP.exps[i], gP.coefs[i], coords_np[gP.atom_idx[i]],
            pc.la, pc.exps_a[j], pc.coefs_a[j], coords_np[pc.atom_a[j]],
            pc.lb, pc.exps_b[j], pc.coefs_b[j], coords_np[pc.atom_b[j]],
            omega=omega)
    return blk


_COMPILE_THREADS = int(os.environ.get("CCTPU_COMPILE_THREADS", "4"))


def _specs_3c(basis: BasisSet, aux: BasisSet, coords, omega, dtn,
              screen_tol):
    """Enumerate every dispatched (aux-l-group, AO-pair-class) of a 3c2e
    build: [(gP, lP, pc, ls, kern, q1, q2, chunk)]. Shared by the device
    and host-assembled builders and by the AOT precompile pass so the
    three can never drift apart."""
    from cctpu.ints.two_electron import schwarz_q

    pcs = pair_classes(basis)
    qs = schwarz_q(pcs, coords) if screen_tol > 0 else None
    q_aux_max = _aux_schwarz_max(aux, coords) if screen_tol > 0 else 1.0
    specs = []
    for lP in sorted(aux.groups):
        gP = aux.groups[lP]
        nP = len(gP.shell_idx)
        for ipc, pc in enumerate(pcs):
            pair_sel = np.arange(pc.n, dtype=np.int64)
            if qs is not None:
                pair_sel = pair_sel[qs[ipc] * q_aux_max > screen_tol]
                if len(pair_sel) == 0:
                    continue
            ls = (lP, 0, pc.la, pc.lb)
            kern = _class_batch_fn(ls, omega, dtn, False)
            q1, q2 = np.mgrid[0:nP, 0:len(pair_sel)]
            q1 = q1.ravel()
            q2 = pair_sel[q2.ravel()]
            chunk = _class_chunk(ls, gP.exps.shape[1], 1,
                                 pc.exps_a.shape[1], pc.exps_b.shape[1])
            specs.append((gP, lP, pc, ls, kern, q1, q2, chunk))
    return specs


def _specs_2c(aux: BasisSet, omega, dtn):
    """[(gP, lP, gQ, lQ, ls, kern, q1, q2, chunk)] for a 2c2e build."""
    specs = []
    ls_sorted = sorted(aux.groups)
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
            ls = (lP, 0, lQ, 0)
            kern = _class_batch_fn(ls, omega, dtn, True)
            chunk = _class_chunk(ls, gP.exps.shape[1], 1,
                                 gQ.exps.shape[1], 1)
            specs.append((gP, lP, gQ, lQ, ls, kern, q1, q2, chunk))
    return specs


@lru_cache(maxsize=1)
def _precompiled_memo() -> set:
    """Keys of kernels already AOT-compiled into the persistent cache.

    Even a WARM precompile pass costs ~10-20 s per kernel in host-side
    lowering + cache probing on this 1-CPU box (measured: 565 s for a
    fully-cached 30-kernel family), so successful AOT compiles are
    recorded next to the compile cache and skipped wholesale."""
    path = _bump_memo_path()
    if path:
        p = path.replace("floor_bumps", "precompiled")
        if os.path.exists(p):
            try:
                import json
                with open(p) as f:
                    return set(json.load(f))
            except Exception:
                pass
    return set()


def _precompiled_save(keys):
    memo = _precompiled_memo()
    memo.update(keys)
    path = _bump_memo_path()
    if path:
        def merge(on_disk, data):
            if isinstance(on_disk, list):
                return sorted(set(on_disk) | set(data))
            return data
        _atomic_json_save(path.replace("floor_bumps", "precompiled"),
                          merge, sorted(memo))


def _precompile(jobs, tag: str):
    """Best-effort concurrent AOT compile of class kernels (bump-0 shapes).

    Remote axon compiles mostly serialize server-side (scripts/
    probe_parallel_compile.py: 4 threads -> ~1.3x throughput, 2 can even
    regress), but the overlap still trims a cold family build; warm
    builds skip recorded keys entirely. jobs: [(key, kern, args_fn)]
    with args_fn() building the concrete argument tuple; key=None means
    always compile."""
    if _COMPILE_THREADS <= 1:
        return
    done = _precompiled_memo()
    jobs = [j for j in jobs if j[0] is None or j[0] not in done]
    if not jobs:
        return
    import sys
    import time as _t
    from concurrent.futures import ThreadPoolExecutor
    from cctpu.utils.deadline import check

    t0 = _t.time()
    ok_keys = []
    aborted = []                     # deadline flag shared across workers

    def one(job):
        key, kern, args_fn = job
        if aborted:
            return
        try:
            check("precompile")
        except TimeoutError:
            # past the cooperative deadline: stop the whole pass instead
            # of paying 10-20 s host-side per remaining job (ADVICE r4
            # low) — dispatch still compiles on demand if anyone asks
            aborted.append(True)
            return
        try:
            kern.lower(*args_fn()).compile()
            if key is not None:
                ok_keys.append(key)
        except Exception:
            pass                     # dispatch will surface any real error

    with ThreadPoolExecutor(_COMPILE_THREADS) as ex:
        list(ex.map(one, jobs))
    if ok_keys:
        _precompiled_save(ok_keys)
    dt = _t.time() - t0
    if dt > 5:
        print(f"# cctpu: precompiled {len(jobs)} {tag} class kernels in "
              f"{dt:.0f}s (threads={_COMPILE_THREADS})", file=sys.stderr,
              flush=True)


def _sb_n(nq: int, chunk: int) -> int:
    """The _superbatches N bucket for nq quartets (shape key)."""
    return max(_NBATCH if nq > _NBATCH_SMALL else _NBATCH_SMALL, chunk)


def _precompile_3c(specs, coords, de, dc, dtn="float64", omega=None):
    def args_fn(gP, pc, ls, q1, q2, chunk):
        # start at the memoized good bump so the known-corrupt bump-0
        # executable of an affected class is never compiled again
        b = max(int(_bump_memo().get(_bump_key(f"3c2e {ls}", chunk, dtn), 0)), 0)

        def f():
            i1, i2, _ = _superbatches(q1.astype(np.int32),
                                      q2.astype(np.int32), chunk)[0]
            return _tables_3c(coords, gP, pc, de, dc, b) + (
                jnp.asarray(i1), jnp.asarray(i2))
        return f

    def key(gP, pc, ls, q1, chunk):
        b = max(int(_bump_memo().get(_bump_key(f"3c2e {ls}", chunk, dtn), 0)), 0)
        return (f"3c {ls} om{omega} {dtn} c{chunk} n{_sb_n(len(q1), chunk)}"
                f" b{b} p{gP.exps.shape[1]},{pc.exps_a.shape[1]},"
                f"{pc.exps_b.shape[1]} f{_AUX_FLOOR},{_PAIR_FLOOR}")

    _precompile([(key(gP, pc, ls, q1, chunk),
                  kern, args_fn(gP, pc, ls, q1, q2, chunk))
                 for gP, lP, pc, ls, kern, q1, q2, chunk in specs], "3c2e")


def _precompile_2c(specs, coords, de, dc, dtn="float64", omega=None):
    def args_fn(gP, gQ, ls, q1, q2, chunk):
        b = max(int(_bump_memo().get(_bump_key(f"2c2e {ls}", chunk, dtn), 0)), 0)

        def f():
            i1, i2, _ = _superbatches(q1.astype(np.int32),
                                      q2.astype(np.int32), chunk)[0]
            return _tables_2c(coords, gP, gQ, de, dc, b) + (
                jnp.asarray(i1), jnp.asarray(i2))
        return f

    def key(gP, gQ, ls, q1, chunk):
        b = max(int(_bump_memo().get(_bump_key(f"2c2e {ls}", chunk, dtn), 0)), 0)
        return (f"2c {ls} om{omega} {dtn} c{chunk} n{_sb_n(len(q1), chunk)}"
                f" b{b} p{gP.exps.shape[1]},{gQ.exps.shape[1]}"
                f" f{_AUX_FLOOR}")

    _precompile([(key(gP, gQ, ls, q1, chunk),
                  kern, args_fn(gP, gQ, ls, q1, q2, chunk))
                 for gP, lP, gQ, lQ, ls, kern, q1, q2, chunk in specs],
                "2c2e")


def build_3c2e_device(basis: BasisSet, aux: BasisSet, coords,
                      omega: Optional[float] = None,
                      screen_tol: float = 1e-12,
                      dtype=jnp.float64, verbose: bool = False):
    """(P|ab) tensor [naux, nao, nao] assembled entirely on device.

    Per (aux-l-group, AO-pair-class): one lax.map dispatch computes all
    Schwarz-surviving quartets; two eager advanced-index scatters place the
    blocks (and their ab<->ba mirrors) into a device-resident accumulator
    whose padding row/col absorbs chunk padding. No integral data ever
    crosses the host link. Replaces gpu4pyscf's CUDA int3c2e fill
    (reference templates ride it via `density_fit()` —
    /root/reference/templates/calculate_energy.py:151-156)."""
    coords = jnp.asarray(coords)
    naux, nao = aux.nao, basis.nao
    out = jnp.zeros((naux + 1, nao + 1, nao + 1), dtype=dtype)
    de = jnp.asarray(_DUMMY_E)
    dc = jnp.asarray(_DUMMY_C)
    dtn = jnp.dtype(dtype).name

    coords_np = np.asarray(coords)
    if verbose:
        import sys
        import time as _t
    specs = _specs_3c(basis, aux, coords, omega, dtn, screen_tol)
    _precompile_3c(specs, coords, de, dc, dtn, omega)
    for gP, lP, pc, ls, kern, q1, q2, chunk in specs:
            sP = nsph(lP)
            sa, sb = nsph(pc.la), nsph(pc.lb)
            if verbose:
                _tk = _t.time()
            batches = _dispatch_validated(
                kern, lambda b, gP=gP, pc=pc: _tables_3c(coords, gP, pc,
                                                         de, dc, b),
                q1, q2, chunk, _oracle_3c(coords_np, gP, lP, pc, omega),
                dtn, f"3c2e {ls}")
            for blocks, q1f, q2f, padm in batches:
                P_idx = np.where(padm[:, None], naux,
                                 gP.ao_start[q1f][:, None] + np.arange(sP))
                A_idx = np.where(padm[:, None], nao,
                                 pc.ao_a[q2f][:, None] + np.arange(sa))
                B_idx = np.where(padm[:, None], nao,
                                 pc.ao_b[q2f][:, None] + np.arange(sb))
                scat = _scatter3_fn(len(q1f), sP, sa, sb, naux + 1,
                                    nao + 1, dtn)
                out = scat(out, blocks,
                           jnp.asarray(P_idx.astype(np.int32)),
                           jnp.asarray(A_idx.astype(np.int32)),
                           jnp.asarray(B_idx.astype(np.int32)))
            if verbose:
                out.block_until_ready()
                print(f"#   3c2e ls={ls} nq={len(q1)} chunk={chunk} "
                      f"{_t.time() - _tk:.1f}s", file=sys.stderr, flush=True)
    return out[:naux, :nao, :nao]


def build_3c2e_hostassemble(basis: BasisSet, aux: BasisSet, coords,
                            omega: Optional[float] = None,
                            screen_tol: float = 1e-12,
                            dtype=jnp.float64, verbose: bool = False):
    """(P|ab) via super-batched device KERNELS + HOST numpy assembly.

    Returns a HOST numpy array [naux, nao, nao]. This is the production
    X builder: the DF pipeline whitens B = Linv @ X on host in TRUE f64
    (the accelerator has no f64-grade matmul at any precision setting —
    micro_probe P4/P4b measured bf16-grade at default and f32-grade at
    HIGHEST — and the autoaux Linv has rows of norm ~1/sqrt(lambda_min)
    ~2.6e4, so an f32-grade whitening contraction corrupts B by ~1e-2:
    the 0.052 Ha phenol failure of rounds 2-3). Keeping X on host costs
    nothing extra here since the kernels' super-batches are pulled to
    host anyway; only the whitened B is uploaded.
    """
    coords = jnp.asarray(coords)
    naux, nao = aux.nao, basis.nao
    np_dt = np.dtype(jnp.dtype(dtype).name)
    out = np.zeros((naux, nao, nao), dtype=np_dt)
    de = jnp.asarray(_DUMMY_E)
    dc = jnp.asarray(_DUMMY_C)
    dtn = jnp.dtype(dtype).name

    coords_np = np.asarray(coords)
    if verbose:
        import sys
        import time as _t
    specs = _specs_3c(basis, aux, coords, omega, dtn, screen_tol)
    _precompile_3c(specs, coords, de, dc, dtn, omega)

    def _assemble(gP, pc, sP, sa, sb, pending):
        for blocks_dev, q1f, q2f, padm in pending:
            blocks = np.asarray(blocks_dev)[~padm]
            q1r, q2r = q1f[~padm], q2f[~padm]
            P_idx = gP.ao_start[q1r][:, None] + np.arange(sP)
            A_idx = pc.ao_a[q2r][:, None] + np.arange(sa)
            B_idx = pc.ao_b[q2r][:, None] + np.arange(sb)
            out[P_idx[:, :, None, None], A_idx[:, None, :, None],
                B_idx[:, None, None, :]] = blocks
            out[P_idx[:, :, None, None], B_idx[:, None, :, None],
                A_idx[:, None, None, :]] = blocks.swapaxes(2, 3)

    # one-class-deep pull/assemble pipeline: start the device->host
    # copies of class k asynchronously, dispatch class k+1, and only
    # then materialize k — the tunnel transfer of one class overlaps
    # the next class's kernel execution (r5 warm-path audit: pulls +
    # host assembly were a large share of the ~600 s warm build)
    deferred = None
    for gP, lP, pc, ls, kern, q1, q2, chunk in specs:
            sP = nsph(lP)
            sa, sb = nsph(pc.la), nsph(pc.lb)
            if verbose:
                _tk = _t.time()
            pending = _dispatch_validated(
                kern, lambda b, gP=gP, pc=pc: _tables_3c(coords, gP, pc,
                                                         de, dc, b),
                q1, q2, chunk, _oracle_3c(coords_np, gP, lP, pc, omega),
                dtn, f"3c2e-h {ls}")
            for blocks_dev, _, _, _ in pending:
                try:
                    blocks_dev.copy_to_host_async()
                except Exception:
                    pass             # async copy is a hint, not required
            if deferred is not None:
                _assemble(*deferred)
            deferred = (gP, pc, sP, sa, sb, pending)
            if verbose:
                print(f"#   3c2e-h ls={ls} nq={len(q1)} chunk={chunk} "
                      f"{_t.time() - _tk:.1f}s", file=sys.stderr, flush=True)
    if deferred is not None:
        _assemble(*deferred)
    return out


def build_2c2e_hostassemble(aux: BasisSet, coords,
                            omega: Optional[float] = None) -> jnp.ndarray:
    """(P|Q) metric via super-batched device kernels + host assembly
    (see build_3c2e_hostassemble for why)."""
    coords = jnp.asarray(coords)
    coords_np = np.asarray(coords)
    naux = aux.nao
    out = np.zeros((naux, naux))
    de = jnp.asarray(_DUMMY_E)
    dc = jnp.asarray(_DUMMY_C)
    specs = _specs_2c(aux, omega, "float64")
    _precompile_2c(specs, coords, de, dc, "float64", omega)
    for gP, lP, gQ, lQ, ls, kern, q1, q2, chunk in specs:
            sP, sQ = nsph(lP), nsph(lQ)
            batches = _dispatch_validated(
                kern, lambda b, gP=gP, gQ=gQ: _tables_2c(coords, gP, gQ,
                                                         de, dc, b),
                q1, q2, chunk,
                _oracle_2c(coords_np, gP, lP, gQ, lQ, omega),
                "float64", f"2c2e-h {ls}")
            for blocks_dev, q1f, q2f, padm in batches:
                blocks = np.asarray(blocks_dev)[~padm]
                q1r, q2r = q1f[~padm], q2f[~padm]
                P_idx = gP.ao_start[q1r][:, None] + np.arange(sP)
                Q_idx = gQ.ao_start[q2r][:, None] + np.arange(sQ)
                out[P_idx[:, :, None], Q_idx[:, None, :]] = blocks
                out[Q_idx[:, :, None], P_idx[:, None, :]] = \
                    blocks.swapaxes(1, 2)
    return out


def _tables_2c(coords, gP, gQ, de, dc, bump: int):
    """Device tables for a (P|Q) class at floor _AUX_FLOOR << bump."""
    f = _AUX_FLOOR << bump
    Pe = jnp.asarray(_pow2_rows(gP.exps, floor=f))
    Pc = jnp.asarray(_pow2_rows(gP.coefs, floor=f))
    Pxyz = coords[jnp.asarray(_pow2_rows(gP.atom_idx, floor=f))]
    Qe = jnp.asarray(_pow2_rows(gQ.exps, floor=f))
    Qc = jnp.asarray(_pow2_rows(gQ.coefs, floor=f))
    Qxyz = coords[jnp.asarray(_pow2_rows(gQ.atom_idx, floor=f))]
    return (Pe, Pc, Pxyz, de, dc, Qe, Qc, Qxyz, de, dc, Qxyz)


def _oracle_2c(coords_np, gP, lP, gQ, lQ, omega):
    from cctpu.ints.host_oracle import eri_2c2e_np

    def blk(i, j):
        return eri_2c2e_np(
            lP, gP.exps[i], gP.coefs[i], coords_np[gP.atom_idx[i]],
            lQ, gQ.exps[j], gQ.coefs[j], coords_np[gQ.atom_idx[j]],
            omega=omega)
    return blk


def build_2c2e_device(aux: BasisSet, coords,
                      omega: Optional[float] = None,
                      dtype=jnp.float64):
    """(P|Q) Coulomb metric [naux, naux], device-resident assembly,
    every class spot-checked against the host oracle (see _SPOT_N)."""
    coords = jnp.asarray(coords)
    coords_np = np.asarray(coords)
    naux = aux.nao
    out = jnp.zeros((naux + 1, naux + 1), dtype=dtype)
    de = jnp.asarray(_DUMMY_E)
    dc = jnp.asarray(_DUMMY_C)
    dtn = jnp.dtype(dtype).name
    specs = _specs_2c(aux, omega, dtn)
    _precompile_2c(specs, coords, de, dc, dtn, omega)
    for gP, lP, gQ, lQ, ls, kern, q1, q2, chunk in specs:
            sP, sQ = nsph(lP), nsph(lQ)
            batches = _dispatch_validated(
                kern, lambda b, gP=gP, gQ=gQ: _tables_2c(coords, gP, gQ,
                                                         de, dc, b),
                q1, q2, chunk,
                _oracle_2c(coords_np, gP, lP, gQ, lQ, omega),
                dtn, f"2c2e {ls}")
            for blocks, q1f, q2f, padm in batches:
                P_idx = np.where(padm[:, None], naux,
                                 gP.ao_start[q1f][:, None] + np.arange(sP))
                Q_idx = np.where(padm[:, None], naux,
                                 gQ.ao_start[q2f][:, None] + np.arange(sQ))
                scat = _scatter2_fn(len(q1f), sP, sQ, naux + 1, dtn)
                out = scat(out, blocks,
                           jnp.asarray(P_idx.astype(np.int32)),
                           jnp.asarray(Q_idx.astype(np.int32)))
    return out[:naux, :naux]


# naux above which the host whitening switches from eigh (O(9 n^3)) to
# pivoted-Cholesky subset selection (O(n^3/3)); both are exact-f64 host
# paths, the subset path additionally SHRINKS B to the kept rank.
_EIGH_NAUX_MAX = int(os.environ.get("CCTPU_METRIC_EIGH_MAX", 3072))


def metric_factor(M, rcond: float = 1e-11, method: str = "auto"):
    """Whitening factor Linv of the Coulomb metric, HOST f64 always:
    M^{+} = Linv^T Linv (pseudo-inverse on the well-conditioned subspace).
    Linv may be RECTANGULAR [nkeep, naux] — near-null directions are
    dropped, so the whitened B shrinks to nkeep rows.

    Why host: the autoaux metric is severely ill-conditioned (phenol
    6-31G*: cond ~5e10 with ~24 eigenvalues under 1e-9*max). Under the
    TPU's EMULATED f64 (~1e-9 relative noise, ~50x the smallest
    eigenvalue here) any on-device factorization silently corrupts the
    near-null subspace WITHOUT producing NaNs — round 2 shipped exactly
    that bug (device B3LYP energy off by 0.074 Ha, BENCH_r02). The metric
    is only O(naux^2) bytes (25 MB at phenol), so the host round trip is
    trivially cheap next to the 3c2e build; the factorization itself runs
    in true hardware f64.

    Both paths filter on the diagonally-preconditioned metric
    M' = D^{-1/2} M D^{-1/2}, D = diag(M) — scale-invariant across the
    ~6-orders spread between steep core and diffuse valence aux functions:

    - ``eigh`` (default for naux <= _EIGH_NAUX_MAX): spectral-filtered
      pinv-sqrt, keep eigenvalues > rcond * max.
    - ``pivot`` (larger systems): LAPACK dpstrf pivoted Cholesky SELECTS
      a well-conditioned aux subset (rank r where the Schur-complement
      diagonal falls below rcond), then whitens exactly on that subset —
      ~27x fewer host flops than eigh and B shrinks to r rows.
    """
    Mh = np.asarray(M, dtype=np.float64)
    naux = Mh.shape[0]
    d = np.sqrt(np.clip(np.diagonal(Mh).copy(), 1e-300, None))
    Mp = Mh / d[:, None] / d[None, :]
    if method == "auto":
        method = "eigh" if naux <= _EIGH_NAUX_MAX else "pivot"
    if method == "pivot":
        from scipy.linalg import solve_triangular
        from scipy.linalg.lapack import dpstrf
        _, piv, rank, info = dpstrf(Mp, tol=rcond, lower=1)
        if info >= 0 and 0 < rank <= naux:
            piv = np.asarray(piv[:rank]) - 1          # LAPACK is 1-based
            Msub = Mp[np.ix_(piv, piv)]
            try:
                L = np.linalg.cholesky(Msub)
            except np.linalg.LinAlgError:
                L = None                # kept subset still too dependent
            if L is not None:
                Linv_sub = solve_triangular(L, np.eye(rank), lower=True,
                                            check_finite=False)
                Linv = np.zeros((rank, naux))
                Linv[:, piv] = Linv_sub
                return jnp.asarray(Linv / d[None, :])
        # dpstrf/Cholesky breakdown (shouldn't happen for PSD) -> eigh
    w, V = np.linalg.eigh(Mp)
    keep = w > rcond * w[-1]
    inv_sqrt = 1.0 / np.sqrt(w[keep])
    Linv = (V[:, keep] * inv_sqrt[None, :]).T
    return jnp.asarray(Linv / d[None, :])


def build_3c2e(basis: BasisSet, aux: BasisSet, coords,
               omega: Optional[float] = None):
    """(P|ab) tensor [naux, nao, nao], differentiable w.r.t. coords."""
    coords = jnp.asarray(coords)
    naux, nao = aux.nao, basis.nao
    out = jnp.zeros((naux + 1, nao + 1, nao + 1))
    de = jnp.asarray(_DUMMY_E)
    dc = jnp.asarray(_DUMMY_C)

    pcs = pair_classes(basis)
    for lP in sorted(aux.groups):
        gP = aux.groups[lP]
        nP = len(gP.shell_idx)
        for pc in pcs:
            ls = (lP, 0, pc.la, pc.lb)
            vkern = _quartet_vmapped(ls, omega)
            q1, q2 = np.mgrid[0:nP, 0:pc.n]
            q1, q2 = q1.ravel(), q2.ravel()
            chunk = _class_chunk(ls, gP.exps.shape[1], 1,
                                 pc.exps_a.shape[1], pc.exps_b.shape[1])
            npad = (-len(q1)) % chunk
            pad = np.concatenate([np.zeros(len(q1), bool),
                                  np.ones(npad, bool)])
            q1 = np.concatenate([q1, np.zeros(npad, np.int64)])
            q2 = np.concatenate([q2, np.zeros(npad, np.int64)])
            for s in range(0, len(q1), chunk):
                s1, s2, pm = q1[s:s+chunk], q2[s:s+chunk], pad[s:s+chunk]
                blocks = vkern(
                    jnp.asarray(gP.exps[s1]), jnp.asarray(gP.coefs[s1]),
                    coords[gP.atom_idx[s1]],
                    de[None, :].repeat(len(s1), 0), dc[None, :].repeat(len(s1), 0),
                    coords[gP.atom_idx[s1]],
                    jnp.asarray(pc.exps_a[s2]), jnp.asarray(pc.coefs_a[s2]),
                    coords[pc.atom_a[s2]],
                    jnp.asarray(pc.exps_b[s2]), jnp.asarray(pc.coefs_b[s2]),
                    coords[pc.atom_b[s2]],
                )                                   # [chunk, sP, 1, sa, sb]
                blocks = blocks[:, :, 0, :, :]
                sP, sa, sb = nsph(lP), nsph(pc.la), nsph(pc.lb)
                P_idx = gP.ao_start[s1][:, None] + np.arange(sP)
                A_idx = pc.ao_a[s2][:, None] + np.arange(sa)
                B_idx = pc.ao_b[s2][:, None] + np.arange(sb)
                P_idx = np.where(pm[:, None], naux, P_idx)
                A_idx = np.where(pm[:, None], nao, A_idx)
                B_idx = np.where(pm[:, None], nao, B_idx)
                pi = P_idx[:, :, None, None]
                ai = A_idx[:, None, :, None]
                bi = B_idx[:, None, None, :]
                out = out.at[pi, ai, bi].set(blocks)
                out = out.at[pi, bi, ai].set(blocks)
    return out[:naux, :nao, :nao]


def build_2c2e(aux: BasisSet, coords, omega: Optional[float] = None):
    """(P|Q) metric [naux, naux], differentiable w.r.t. coords."""
    coords = jnp.asarray(coords)
    naux = aux.nao
    out = jnp.zeros((naux + 1, naux + 1))
    de = jnp.asarray(_DUMMY_E)
    dc = jnp.asarray(_DUMMY_C)
    ls_sorted = sorted(aux.groups)
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
            ls = (lP, 0, lQ, 0)
            vkern = _quartet_vmapped(ls, omega)
            chunk = _class_chunk(ls, gP.exps.shape[1], 1, gQ.exps.shape[1], 1)
            npad = (-len(q1)) % chunk
            pad = np.concatenate([np.zeros(len(q1), bool),
                                  np.ones(npad, bool)])
            q1 = np.concatenate([q1, np.zeros(npad, np.int64)])
            q2 = np.concatenate([q2, np.zeros(npad, np.int64)])
            for s in range(0, len(q1), chunk):
                s1, s2, pm = q1[s:s+chunk], q2[s:s+chunk], pad[s:s+chunk]
                blocks = vkern(
                    jnp.asarray(gP.exps[s1]), jnp.asarray(gP.coefs[s1]),
                    coords[gP.atom_idx[s1]],
                    de[None, :].repeat(len(s1), 0), dc[None, :].repeat(len(s1), 0),
                    coords[gP.atom_idx[s1]],
                    jnp.asarray(gQ.exps[s2]), jnp.asarray(gQ.coefs[s2]),
                    coords[gQ.atom_idx[s2]],
                    de[None, :].repeat(len(s2), 0), dc[None, :].repeat(len(s2), 0),
                    coords[gQ.atom_idx[s2]],
                )                                   # [chunk, sP, 1, sQ, 1]
                blocks = blocks[:, :, 0, :, 0]
                sP, sQ = nsph(lP), nsph(lQ)
                P_idx = gP.ao_start[s1][:, None] + np.arange(sP)
                Q_idx = gQ.ao_start[s2][:, None] + np.arange(sQ)
                P_idx = np.where(pm[:, None], naux, P_idx)
                Q_idx = np.where(pm[:, None], naux, Q_idx)
                pi = P_idx[:, :, None]
                qi = Q_idx[:, None, :]
                out = out.at[pi, qi].set(blocks)
                out = out.at[qi.swapaxes(1, 2), pi.swapaxes(1, 2)].set(
                    jnp.swapaxes(blocks, 1, 2))
    return out[:naux, :naux]


def _aux_schwarz_max(aux: BasisSet, coords) -> float:
    """max_P sqrt((P|P)) over the auxiliary set (screening bound)."""
    coords = jnp.asarray(coords)
    de = jnp.asarray(_DUMMY_E)
    dc = jnp.asarray(_DUMMY_C)
    q_aux_max = 1e-30
    for lP in sorted(aux.groups):
        gP = aux.groups[lP]
        ls = (lP, 0, lP, 0)
        vkern = _quartet_vmapped(ls, None)
        n = len(gP.shell_idx)
        for s in range(0, n, 256):
            # pad the tail chunk to a fixed 256 (a fresh slice length
            # would be a fresh remote compile)
            sl = np.arange(s, min(s + 256, n))
            nreal_q = len(sl)
            if nreal_q < 256:
                sl = np.concatenate(
                    [sl, np.zeros(256 - nreal_q, np.int64)])
            blk = np.asarray(vkern(
                jnp.asarray(gP.exps[sl]), jnp.asarray(gP.coefs[sl]),
                coords[gP.atom_idx[sl]],
                de[None, :].repeat(len(sl), 0),
                dc[None, :].repeat(len(sl), 0),
                coords[gP.atom_idx[sl]],
                jnp.asarray(gP.exps[sl]), jnp.asarray(gP.coefs[sl]),
                coords[gP.atom_idx[sl]],
                de[None, :].repeat(len(sl), 0),
                dc[None, :].repeat(len(sl), 0),
                coords[gP.atom_idx[sl]],
            ))[:, :, 0, :, 0]                 # [n, sP, sP]
            diag = np.abs(np.einsum("qaa->qa", blk))
            q_aux_max = max(q_aux_max, float(np.sqrt(diag.max())))
    return q_aux_max


def build_3c2e_eager(basis: BasisSet, aux: BasisSet, coords,
                     omega: Optional[float] = None,
                     screen_tol: float = 1e-12) -> np.ndarray:
    """(P|ab) as host numpy, using the cached per-class jitted kernels.

    Schwarz screening: AO pairs with Q_ab * max_P Q_P below screen_tol are
    skipped entirely (|(P|ab)| <= Q_P Q_ab); assembly is a vectorized fancy-
    index scatter (the per-quartet python loop was the round-1 wall-clock
    bottleneck at north-star sizes)."""
    from cctpu.ints.two_electron import schwarz_q

    coords = jnp.asarray(coords)
    naux, nao = aux.nao, basis.nao
    # one padding row/col absorbs the chunk-padding scatter
    out = np.zeros((naux + 1, nao + 1, nao + 1))
    de = jnp.asarray(_DUMMY_E)
    dc = jnp.asarray(_DUMMY_C)
    pcs = pair_classes(basis)
    qs = schwarz_q(pcs, coords) if screen_tol > 0 else None
    q_aux_max = _aux_schwarz_max(aux, coords) if screen_tol > 0 else 1.0
    # Two-phase assembly: dispatch every chunk's kernel WITHOUT forcing the
    # result (JAX dispatch is async), materialize + scatter in waves. On the
    # axon-tunneled TPU each forced result is a full round trip; serialized
    # per-chunk sync made the B build latency-bound at production sizes.
    pending = []

    def _flush():
        for blocks_dev, scatter in pending:
            scatter(np.asarray(blocks_dev))
        pending.clear()

    for lP in sorted(aux.groups):
        gP = aux.groups[lP]
        nP = len(gP.shell_idx)
        sP = nsph(lP)
        # class tables -> device once (in-jit gather; see _3c2e_chunk_fn).
        # Row counts are padded to powers of two: the jitted kernel
        # specializes on table SHAPES, and without bucketing every new
        # molecule recompiled the whole class family (~45 s per kernel
        # on the remote TPU compiler).
        Pe = jnp.asarray(_pow2_rows(gP.exps, floor=2048))
        Pc = jnp.asarray(_pow2_rows(gP.coefs, floor=2048))
        Pxyz = coords[jnp.asarray(_pow2_rows(gP.atom_idx, floor=2048))]
        for ipc, pc in enumerate(pcs):
            pair_sel = np.arange(pc.n, dtype=np.int64)
            if qs is not None:
                pair_sel = pair_sel[qs[ipc] * q_aux_max > screen_tol]
                if len(pair_sel) == 0:
                    continue
            ls = (lP, 0, pc.la, pc.lb)
            ckern = _3c2e_chunk_fn(ls, omega)
            Ae = jnp.asarray(_pow2_rows(pc.exps_a))
            Ac = jnp.asarray(_pow2_rows(pc.coefs_a))
            Axyz = coords[jnp.asarray(_pow2_rows(pc.atom_a))]
            Be = jnp.asarray(_pow2_rows(pc.exps_b))
            Bc = jnp.asarray(_pow2_rows(pc.coefs_b))
            Bxyz = coords[jnp.asarray(_pow2_rows(pc.atom_b))]
            q1, q2 = np.mgrid[0:nP, 0:len(pair_sel)]
            q1 = q1.ravel()
            q2 = pair_sel[q2.ravel()]
            chunk = _class_chunk(ls, gP.exps.shape[1], 1,
                                 pc.exps_a.shape[1], pc.exps_b.shape[1])
            nreal = len(q1)
            npad = (-nreal) % chunk
            q1 = np.concatenate([q1, np.zeros(npad, np.int64)])
            q2 = np.concatenate([q2, np.zeros(npad, np.int64)])
            padm = np.concatenate([np.zeros(nreal, bool),
                                   np.ones(npad, bool)])
            q1_dev = jnp.asarray(q1)
            q2_dev = jnp.asarray(q2)
            sa, sb = nsph(pc.la), nsph(pc.lb)
            for s in range(0, len(q1), chunk):
                s1, s2, pm = q1[s:s+chunk], q2[s:s+chunk], padm[s:s+chunk]
                blocks_dev = ckern(Pe, Pc, Pxyz, de, dc, Ae, Ac, Axyz,
                                   Be, Bc, Bxyz, q1_dev[s:s+chunk],
                                   q2_dev[s:s+chunk])
                P_idx = np.where(pm[:, None], naux,
                                 gP.ao_start[s1][:, None] + np.arange(sP))
                A_idx = np.where(pm[:, None], nao,
                                 pc.ao_a[s2][:, None] + np.arange(sa))
                B_idx = np.where(pm[:, None], nao,
                                 pc.ao_b[s2][:, None] + np.arange(sb))
                pi = P_idx[:, :, None, None]
                ai = A_idx[:, None, :, None]
                bi = B_idx[:, None, None, :]

                def scatter(blocks, pi=pi, ai=ai, bi=bi):
                    blocks = blocks[:, :, 0, :, :]  # [chunk, sP, sa, sb]
                    out[pi, ai, bi] = blocks
                    out[pi, bi.swapaxes(2, 3), ai.swapaxes(2, 3)] = \
                        blocks.swapaxes(2, 3)

                pending.append((blocks_dev, scatter))
                if len(pending) >= 64:
                    _flush()
    _flush()
    return out[:naux, :nao, :nao]


def build_2c2e_eager(aux: BasisSet, coords,
                     omega: Optional[float] = None) -> np.ndarray:
    coords = jnp.asarray(coords)
    naux = aux.nao
    out = np.zeros((naux, naux))
    de = jnp.asarray(_DUMMY_E)
    dc = jnp.asarray(_DUMMY_C)
    ls_sorted = sorted(aux.groups)
    pending = []           # async-dispatch waves (see build_3c2e_eager)
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
            ls = (lP, 0, lQ, 0)
            vkern = _quartet_vmapped(ls, omega)
            chunk = _class_chunk(ls, gP.exps.shape[1], 1,
                                 gQ.exps.shape[1], 1)
            nreal = len(q1)
            npad = (-nreal) % chunk
            q1 = np.concatenate([q1, np.zeros(npad, np.int64)])
            q2 = np.concatenate([q2, np.zeros(npad, np.int64)])
            sP, sQ = nsph(lP), nsph(lQ)
            for s in range(0, len(q1), chunk):
                s1, s2 = q1[s:s + chunk], q2[s:s + chunk]
                blocks_dev = vkern(
                    jnp.asarray(gP.exps[s1]), jnp.asarray(gP.coefs[s1]),
                    coords[gP.atom_idx[s1]],
                    de[None, :].repeat(len(s1), 0),
                    dc[None, :].repeat(len(s1), 0),
                    coords[gP.atom_idx[s1]],
                    jnp.asarray(gQ.exps[s2]), jnp.asarray(gQ.coefs[s2]),
                    coords[gQ.atom_idx[s2]],
                    de[None, :].repeat(len(s2), 0),
                    dc[None, :].repeat(len(s2), 0),
                    coords[gQ.atom_idx[s2]],
                )
                nq = min(chunk, nreal - s)

                def scatter(blocks, s1=s1, s2=s2, nq=nq, gP=gP, gQ=gQ,
                            sP=sP, sQ=sQ):
                    blocks = blocks[:, :, 0, :, 0]
                    for t in range(max(nq, 0)):
                        P0 = gP.ao_start[s1[t]]
                        Q0 = gQ.ao_start[s2[t]]
                        out[P0:P0+sP, Q0:Q0+sQ] = blocks[t]
                        out[Q0:Q0+sQ, P0:P0+sP] = blocks[t].T

                pending.append((blocks_dev, scatter))
                if len(pending) >= 64:
                    for bdev, sc in pending:
                        sc(np.asarray(bdev))
                    pending.clear()
    for bdev, sc in pending:
        sc(np.asarray(bdev))
    return out


def cholesky_B(mol, coords=None, tol: float = 1e-9) -> np.ndarray:
    """Pivoted (Beebe–Linderberg) Cholesky decomposition of the ERI
    supermatrix: (ij|kl) = sum_P B[P,i,j] B[P,k,l] with residual diagonal
    below ``tol`` — so |E_DF - E_incore| is bounded by ~tol by
    construction, unlike basis-set density fitting whose even-tempered /
    JKFIT error floor is ~1e-6 Ha (measured in tests/test_df_accuracy.py).

    In-core variant: O(nao^4) memory — the tight-accuracy mode for small
    and medium systems (the BASELINE.json 1e-8 contract); production-scale
    runs use the autoaux DF above.
    """
    from cctpu.ints.two_electron import build_eri_incore

    c = np.asarray(mol.coords if coords is None else coords)
    eri = np.asarray(build_eri_incore(mol.basis_set, c))
    n = eri.shape[0]
    M = eri.reshape(n * n, n * n)
    diag = np.diagonal(M).copy()
    order = []
    vecs = []
    for _ in range(n * n):
        p = int(np.argmax(diag))
        dmax = diag[p]
        if dmax < tol:
            break
        col = M[:, p].copy()
        for v in vecs:
            col -= v * v[p]
        v = col / np.sqrt(dmax)
        vecs.append(v)
        diag -= v * v
        diag = np.maximum(diag, 0.0)
        order.append(p)
    B = np.stack(vecs).reshape(len(vecs), n, n)
    # symmetrize (numerical asymmetry from pivoting on the full square)
    return 0.5 * (B + B.transpose(0, 2, 1))


class _BContractions:
    """Shared J/K contractions over a factor tensor B [naux, nao, nao]
    ((ij|kl) ~= sum_P B[P,i,j] B[P,k,l]) — used by both basis-set DF and
    pivoted-Cholesky builders. Pallas TPU kernels in f32."""

    # When set (see SCFBase._bind_consts), B / B_lr come from this pytree of
    # jit ARGUMENTS instead of closure constants. Closure arrays get inlined
    # into the serialized HLO: at nao>~100 that overflows the axon
    # remote-compile request (HTTP 413), and it keys the compile cache on the
    # geometry so every new geometry recompiles the step.
    _consts_override = None
    # set by parallel/shard_jk.shard_jk_over_aux: B's aux axis lives
    # sharded over this mesh (multi-chip single-molecule scale-out)
    _aux_mesh = None

    def prepare_dtype(self, dtype):
        """Eagerly cache the cast B (must run OUTSIDE any jit trace —
        assigning inside a trace would leak a tracer)."""
        if dtype != self.B.dtype:
            cached = getattr(self, "_B_cast", None)
            if cached is None or cached.dtype != dtype:
                self._B_cast = self.B.astype(dtype)

    def consts(self, dtype):
        """Geometry-constant tensors for argument-threading through a
        jitted step: B (cast to ``dtype``) + any prepared LR variants."""
        self.prepare_dtype(dtype)
        out = {"B": self._cast_B(dtype)}
        lr = getattr(self, "_B_lr", None)
        if lr:
            cache = self.__dict__.setdefault("_B_lr_cast", {})
            blr = {}
            for om, b in lr.items():
                if b.dtype == dtype:
                    blr[om] = b
                else:
                    key = (om, jnp.dtype(dtype).name)
                    if key not in cache:
                        cache[key] = b.astype(dtype)
                    blr[om] = cache[key]
            out["B_lr"] = blr
        return out

    def _cast_B(self, dtype):
        ov = self._consts_override
        if ov is not None:
            return ov["B"]
        if dtype == self.B.dtype:
            return self.B
        cached = getattr(self, "_B_cast", None)
        if cached is not None and cached.dtype == dtype:
            return cached
        return self.B.astype(dtype)   # inside-trace: constant-folded

    def _use_pallas(self, dtype) -> bool:
        # a pallas_call cannot be partitioned by GSPMD: with an
        # aux-sharded B the einsum path (per-device partials + psum)
        # is the multi-chip fast path, so the single-chip kernels are
        # bypassed while sharded
        if self._aux_mesh is not None:
            return False
        from cctpu.ops.df_jk_pallas import _on_tpu
        return dtype == jnp.float32 and _on_tpu()

    def _k_of(self, B, dm, cocc):
        """Exchange via B: occupied-orbital form when cocc is given
        (exact for dm = C C^T; C columns carry sqrt(occupation)), else
        the dm contraction. Pallas kernels on TPU in f32."""
        if cocc is None:
            return jnp.einsum("pik,...kl,pjl->...ij", B, dm, B)
        if isinstance(cocc, (tuple, list)):          # spin-resolved
            return jnp.stack([self._k_of(B, None, c) for c in cocc])
        if self._use_pallas(cocc.dtype):
            from cctpu.ops.df_jk_pallas import df_k_fast
            return df_k_fast(B, cocc)
        W = jnp.einsum("pik,ka->pia", B, cocc)
        return jnp.einsum("pia,pja->ij", W, W)

    def __call__(self, dm, with_k: bool = True, cocc=None):
        B = self._cast_B(dm.dtype)
        if dm.ndim == 2 and self._use_pallas(dm.dtype):
            from cctpu.ops.df_jk_pallas import (df_j_fast, df_jk_fused,
                                                fused_jk_supported)
            if with_k and cocc is not None \
                    and not isinstance(cocc, (tuple, list)) \
                    and fused_jk_supported():
                # fused single-pass kernel: B streamed through VMEM once
                # for J AND K (the split kernels read it three times)
                return df_jk_fused(B, dm, cocc)
            J = df_j_fast(B, dm)
        else:
            Jp = jnp.einsum("pij,...ij->...p", B, dm)
            J = jnp.einsum("...p,pij->...ij", Jp, B)
        K = self._k_of(B, dm, cocc) if with_k else None
        return J, K


class CholeskyJK(_BContractions):
    """J/K builder backed by pivoted-Cholesky vectors (exact to ``tol``).

    Same call contract as DFJK, so every SCF/response path (incl. the
    Pallas f32 kernels) works unchanged.
    """

    def __init__(self, mol, coords=None, tol: float = 1e-9):
        self.B = jnp.asarray(cholesky_B(mol, coords, tol=tol))
        self._mol = mol
        self._coords = jnp.asarray(mol.coords if coords is None else coords)
        self._eri_lr = {}

    def k_lr(self, dm, omega: float, cocc=None):
        ov = self._consts_override
        if ov is not None and omega in ov.get("eri_lr", {}):
            return jnp.einsum("ikjl,...kl->...ij", ov["eri_lr"][omega], dm)
        if omega not in self._eri_lr:
            # LR exchange via the attenuated in-core ERI (exact)
            from cctpu.ints.two_electron import build_eri_incore
            self._eri_lr[omega] = jnp.asarray(build_eri_incore(
                self._mol.basis_set, np.asarray(self._coords), omega=omega))
        eri = self._eri_lr[omega]
        eri = eri.astype(dm.dtype if dm is not None else jnp.float64)
        return jnp.einsum("ikjl,...kl->...ij", eri, dm)

    def prepare_lr(self, omega: float):
        if omega not in self._eri_lr:
            self.k_lr(jnp.zeros((self._mol.nao, self._mol.nao)), omega)

    def consts(self, dtype):
        out = super().consts(dtype)
        if self._eri_lr:
            cache = self.__dict__.setdefault("_eri_lr_cast", {})
            out["eri_lr"] = {}
            for om, e in self._eri_lr.items():
                key = (om, jnp.dtype(dtype).name)
                if e.dtype != dtype and key not in cache:
                    cache[key] = e.astype(dtype)
                out["eri_lr"][om] = e if e.dtype == dtype else cache[key]
        return out


# HBM budget for keeping the f64 (P|ab) tensor resident alongside the f32
# B (v5e has 16 GB; leave room for grids/DIIS/workspaces). Beyond it the
# build drops to f32 storage: the f32 hot loop is unaffected, but the f64
# polish is then only f32-B accurate (DFJK.f64_exact flags it).
_X64_BUDGET_BYTES = float(os.environ.get("CCTPU_DF_F64_BUDGET", 5.0e9))


@lru_cache(maxsize=None)
def _whiten_fn(dtype_name):
    """jit'ed B = Linv @ X over the flattened AO-pair axis. In f32 this is
    one MXU matmul (~2.3 TF/s measured on the axon v5e vs ~33 GFLOP/s for
    the emulated-f64 path), run at HIGHEST precision (6-pass bf16)."""
    dtype = jnp.dtype(dtype_name)

    def fn(Linv, X):
        naux = X.shape[0]
        with jax.default_matmul_precision("highest"):
            B = Linv.astype(dtype) @ X.reshape(naux, -1).astype(dtype)
        # Linv is rectangular [nkeep, naux] (metric_factor drops the
        # metric's near-null directions), so B has nkeep rows
        return B.reshape((Linv.shape[0],) + X.shape[1:])

    return jax.jit(fn)


class DFJK(_BContractions):
    """Density-fitted J/K builder.

    B[P,i,j] = sum_Q L^{-1}[P,Q] (Q|ij) with (P|Q) = L L^T, so
      J(D)  = einsum('pij,ij->p', B, D) contracted back,
      K(D)  = einsum('pik,kl,pjl->ij', B, D, B).

    Build pipeline (kernels on device, assembly + whitening on HOST):
      1. (P|Q) and (P|ab) super-batch KERNELS run on device; blocks are
         assembled host-side in f64 (build_*_hostassemble),
      2. Linv from a HOST true-f64 factorization (metric_factor — the
         device's emulated f64 cannot factor the cond~5e10 autoaux
         metric; round-2 postmortem),
      3. B = Linv @ X as a HOST f64 dgemm. This placement is forced by
         hardware: the accelerator has NO f64-grade matmul (HIGHEST is
         f32-grade, micro_probe P4), and with ||Linv_rows|| up to
         1/sqrt(lambda_min) ~ 2.6e4 an f32-grade whitening contraction
         loses ~4 digits to cancellation — the 0.052 Ha phenol failure
         of rounds 2-3 (BENCH_r02/r03 postmortem). Only the finished
         B32 (+ B64 when small enough) is uploaded.
      4. the f64 B uploaded LAZILY (first `.B` access) so pure-f32
         consumers (mixed-precision SCF, the bench loop) skip the bytes.
    """

    def __init__(self, mol, coords=None, beta: float = 1.8,
                 extra_l: int = 2, lmax_cap: int = 4):
        basis = mol.basis_set
        self.aux = autoaux(basis, beta=beta, extra_l=extra_l,
                           lmax_cap=lmax_cap)
        c = jnp.asarray(mol.coords if coords is None else coords)
        naux, nao = self.aux.nao, basis.nao
        self.f64_exact = naux * nao * nao * 8 <= _X64_BUDGET_BYTES
        M = build_2c2e_hostassemble(self.aux, c)
        Linv = np.asarray(metric_factor(M))
        # kept for the eager DF nuclear gradient (grad/df_grad.py): the
        # 3-index and 2-index derivative weights need M^+ = Linv^T Linv
        self._Linv = Linv
        X = build_3c2e_hostassemble(basis, self.aux, c)
        Bh = Linv @ X.reshape(naux, -1)              # host f64 dgemm
        del X
        self._Bh = Bh.reshape(Linv.shape[0], nao, nao)
        self._B32 = jnp.asarray(self._Bh.astype(np.float32))
        self._B32.block_until_ready()
        if not self.f64_exact:
            self._Bh = None          # too big to keep/upload in f64
        self._B64 = None
        self._mol = mol
        self._coords = c
        self._B_lr = {}

    @property
    def B(self):
        """f64 factor tensor (MP2/CASSCF/response consumers). Lazy: the
        host-whitened f64 B uploads on first access so f32-only runs skip
        the bytes. Beyond the f64 budget it is the f32 B widened (those
        consumers run compressed/smaller systems in practice)."""
        if self._B64 is None:
            if self.f64_exact:
                self._B64 = jnp.asarray(self._Bh)
            else:
                self._B64 = self._B32.astype(jnp.float64)
            self._B64 = self._place_aux(self._B64)
        return self._B64

    def _place_aux(self, B):
        """If shard_jk_over_aux already ran, lazily-formed factor tensors
        must land on the mesh too (memory scaling for tensors as large as
        B itself — B_lr, the f64 B)."""
        sh = getattr(self, "_aux_sharding", None)
        if sh is None:
            return B
        from cctpu.parallel.shard_jk import place_aux
        return place_aux(B, sharding=sh, ndev=self._aux_ndev)

    @B.setter
    def B(self, value):      # parallel/shard_jk.py re-places B on a mesh
        self._B64 = value

    def prepare_dtype(self, dtype):
        if jnp.dtype(dtype) == jnp.float32:
            return           # _B32 is built eagerly in __init__
        super().prepare_dtype(dtype)

    def _cast_B(self, dtype):
        ov = self._consts_override
        if ov is None and jnp.dtype(dtype) == jnp.float32:
            return self._B32
        return super()._cast_B(dtype)


    def _build_B(self, basis, coords):
        X = build_3c2e(basis, self.aux, coords)
        M = build_2c2e(self.aux, coords)
        # The generated aux set can be near-linearly-dependent; use a
        # pseudo-inverse square root of the Coulomb metric (spectral filter)
        # rather than Cholesky.
        w, V = jnp.linalg.eigh(M)
        wmax = jnp.max(w)
        keep = w > 1e-12 * wmax
        inv_sqrt = jnp.where(keep, 1.0 / jnp.sqrt(jnp.where(keep, w, 1.0)),
                             0.0)
        naux, nao = X.shape[0], X.shape[1]
        B = (V * inv_sqrt[None, :]).T @ X.reshape(naux, nao * nao)
        return B.reshape(naux, nao, nao)

    def prepare_lr(self, omega: float):
        self._ensure_lr(omega)

    def k_lr(self, dm, omega: float, cocc=None):
        """Long-range exchange via attenuated-metric DF:
        K_lr ~ X_lr M_lr^{-1} X_lr with both factors erf-attenuated."""
        ov = self._consts_override
        if ov is not None and omega in ov.get("B_lr", {}):
            B = ov["B_lr"][omega]
            return self._k_of(B, dm, cocc) if cocc is not None else \
                jnp.einsum("pik,...kl,pjl->...ij", B, dm, B)
        self._ensure_lr(omega)
        B = self._B_lr[omega].astype(dm.dtype if dm is not None
                                     else jnp.float64)
        if cocc is not None:
            if not isinstance(cocc, (tuple, list)):
                B = B.astype(cocc.dtype)
            else:
                B = B.astype(cocc[0].dtype)
            return self._k_of(B, dm, cocc)
        return jnp.einsum("pik,...kl,pjl->...ij", B, dm, B)

    def _ensure_lr(self, omega: float):
        if omega not in self._B_lr:
            basis = self._mol.basis_set
            naux = self.aux.nao
            X = build_3c2e_hostassemble(basis, self.aux, self._coords,
                                        omega=omega)
            M = build_2c2e_hostassemble(self.aux, self._coords,
                                        omega=omega)
            Linv = np.asarray(metric_factor(M, rcond=1e-10))
            self.__dict__.setdefault("_Linv_lr", {})[omega] = Linv
            Bh = Linv @ X.reshape(naux, -1)          # host f64 dgemm
            del X
            xdt = np.float64 if self.f64_exact else np.float32
            self._B_lr[omega] = self._place_aux(jnp.asarray(
                Bh.reshape(Linv.shape[0], *self._B32.shape[1:])
                .astype(xdt)))
