"""Redundant internal coordinates with AD-generated B-matrices.

The geomeTRIC replacement (SURVEY.md §2.2, §7.3 item 6) takes the TPU-native
shortcut: internal coordinates q(x) are written once as a JAX function
(bonds/angles/dihedrals) and the Wilson B-matrix is jax.jacfwd(q) — no
hand-coded derivative geometry. Coordinate *selection* (bond perception,
fragment linking) is host-side numpy, as in the reference's geomeTRIC
(CPU-side optimizer driving accelerator E/grad — reference opt-freq.py:372).
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cctpu.core import elements as elem
from cctpu.core.constants import ANG2BOHR


def detect_bonds(Z: np.ndarray, coords: np.ndarray, scale: float = 1.3):
    """Bond list from covalent radii; guarantees a connected graph by
    linking nearest fragments."""
    natm = len(Z)
    rad = np.array([elem.COVALENT_RADII[int(z)] if z > 0 else 0.3
                    for z in Z]) * ANG2BOHR
    d = np.linalg.norm(coords[:, None] - coords[None, :], axis=-1)
    cut = scale * (rad[:, None] + rad[None, :])
    bonds = [(i, j) for i in range(natm) for j in range(i + 1, natm)
             if d[i, j] < cut[i, j]]
    # union-find to connect fragments
    parent = list(range(natm))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for i, j in bonds:
        parent[find(i)] = find(j)
    while True:
        roots = {find(i) for i in range(natm)}
        if len(roots) <= 1:
            break
        # link closest pair across two fragments
        best = None
        for i in range(natm):
            for j in range(i + 1, natm):
                if find(i) != find(j):
                    if best is None or d[i, j] < best[0]:
                        best = (d[i, j], i, j)
        _, i, j = best
        bonds.append((i, j))
        parent[find(i)] = find(j)
    return sorted(bonds)


def build_internals(Z: np.ndarray, coords: np.ndarray):
    """Return (bonds, angles, dihedrals) index lists."""
    natm = len(Z)
    bonds = detect_bonds(Z, coords)
    nbrs = [[] for _ in range(natm)]
    for i, j in bonds:
        nbrs[i].append(j)
        nbrs[j].append(i)

    def ang_value(i, j, k):
        v1 = coords[i] - coords[j]
        v2 = coords[k] - coords[j]
        c = v1 @ v2 / (np.linalg.norm(v1) * np.linalg.norm(v2))
        return np.degrees(np.arccos(np.clip(c, -1, 1)))

    angles = []
    for j in range(natm):
        ns = sorted(nbrs[j])
        for a in range(len(ns)):
            for b in range(a + 1, len(ns)):
                i, k = ns[a], ns[b]
                if ang_value(i, j, k) < 175.0:   # skip near-linear
                    angles.append((i, j, k))

    dihedrals = []
    for (j, k) in bonds:
        for i in nbrs[j]:
            if i == k:
                continue
            if ang_value(i, j, k) > 175.0 or ang_value(i, j, k) < 5:
                continue
            for l in nbrs[k]:
                if l == j or l == i:
                    continue
                if ang_value(j, k, l) > 175.0 or ang_value(j, k, l) < 5:
                    continue
                dihedrals.append((i, j, k, l))
    return bonds, angles, dihedrals


class InternalCoords:
    """q(x) in JAX; B = jacobian via AD; diagonal model Hessian guess."""

    def __init__(self, Z: np.ndarray, coords: np.ndarray):
        self.bonds, self.angles, self.dihedrals = build_internals(Z, coords)
        self.n_bond = len(self.bonds)
        self.n_ang = len(self.angles)
        self.n_dih = len(self.dihedrals)
        self.nq = self.n_bond + self.n_ang + self.n_dih
        self._jac = jax.jit(jax.jacfwd(self.q_of_flat))
        self._qjit = jax.jit(self.q_of_flat)

    def q_of_flat(self, xflat):
        x = xflat.reshape(-1, 3)
        vals = []
        for (i, j) in self.bonds:
            vals.append(jnp.linalg.norm(x[i] - x[j]))
        for (i, j, k) in self.angles:
            v1 = x[i] - x[j]
            v2 = x[k] - x[j]
            c = jnp.dot(v1, v2) / jnp.sqrt(jnp.dot(v1, v1) * jnp.dot(v2, v2))
            vals.append(jnp.arccos(jnp.clip(c, -1 + 1e-10, 1 - 1e-10)))
        for (i, j, k, l) in self.dihedrals:
            b1 = x[j] - x[i]
            b2 = x[k] - x[j]
            b3 = x[l] - x[k]
            n1 = jnp.cross(b1, b2)
            n2 = jnp.cross(b2, b3)
            m1 = jnp.cross(n1, b2 / jnp.linalg.norm(b2))
            xx = jnp.dot(n1, n2)
            yy = jnp.dot(m1, n2)
            vals.append(jnp.arctan2(yy, xx))
        return jnp.stack(vals)

    def q(self, coords):
        return np.array(self._qjit(jnp.asarray(coords).ravel()))

    def B(self, coords):
        return np.array(self._jac(jnp.asarray(coords).ravel()))

    def diff(self, q1, q0):
        """q1 - q0 with dihedral 2π wrapping."""
        d = q1 - q0
        s = self.n_bond + self.n_ang
        dih = d[s:]
        dih = (dih + np.pi) % (2 * np.pi) - np.pi
        d[s:] = dih
        return d

    def guess_hessian(self) -> np.ndarray:
        h = ([0.5] * self.n_bond + [0.2] * self.n_ang + [0.1] * self.n_dih)
        return np.diag(np.array(h))
