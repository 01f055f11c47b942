"""Block Davidson eigensolver for symmetric operators given as matvecs.

Host-level subspace management around a jitted matvec (the same split the
SCF driver uses): the matvec — an orbital-Hessian contraction, SURVEY.md
§3.3 hot loop — runs batched on device; the small subspace eigenproblem is
O(subspace^2) on host.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np


def davidson(matvec: Callable, diag: np.ndarray, nroots: int,
             x0: Optional[np.ndarray] = None, tol: float = 1e-6,
             max_cycle: int = 60, max_space: Optional[int] = None,
             verbose: int = 0) -> Tuple[np.ndarray, np.ndarray, bool]:
    """Lowest eigenpairs of a symmetric operator.

    matvec: (n, k) -> (n, k) batched; diag: [n] diagonal approximation.
    Returns (eigenvalues [nroots], eigenvectors [n, nroots], converged).
    """
    n = diag.shape[0]
    nroots = min(nroots, n)
    max_space = max_space or max(6 * nroots, 24)

    if x0 is None:
        order = np.argsort(diag)
        x0 = np.zeros((n, nroots))
        for i in range(nroots):
            x0[order[i], i] = 1.0
    V = np.array(x0, dtype=np.float64)
    V, _ = np.linalg.qr(V)
    AV = np.asarray(matvec(V))

    conv = False
    theta = np.zeros(nroots)
    for it in range(max_cycle):
        H = V.T @ AV
        H = 0.5 * (H + H.T)
        w, U = np.linalg.eigh(H)
        theta = w[:nroots]
        Y = V @ U[:, :nroots]
        AY = AV @ U[:, :nroots]
        R = AY - Y * theta[None, :]
        rnorm = np.linalg.norm(R, axis=0)
        if verbose:
            print(f"davidson it {it}: theta={theta} |r|={rnorm}")
        if (rnorm < tol).all():
            conv = True
            break
        # preconditioned new directions
        news = []
        for k in range(nroots):
            if rnorm[k] < tol:
                continue
            denom = diag - theta[k]
            denom = np.where(np.abs(denom) < 1e-8,
                             np.sign(denom + 1e-30) * 1e-8, denom)
            t = R[:, k] / denom
            t = t - V @ (V.T @ t)
            nrm = np.linalg.norm(t)
            if nrm > 1e-6:
                news.append(t / nrm)
        if not news:
            conv = True
            break
        T = np.stack(news, axis=1)
        # re-orthogonalize against V
        T = T - V @ (V.T @ T)
        T, _ = np.linalg.qr(T)
        if V.shape[1] + T.shape[1] > max_space:
            # collapse to current Ritz vectors
            V = Y
            AV = AY
            V, rmat = np.linalg.qr(V)
            AV = AV @ np.linalg.inv(rmat)
            T = T - V @ (V.T @ T)
            T, _ = np.linalg.qr(T)
        AT = np.asarray(matvec(T))
        V = np.concatenate([V, T], axis=1)
        AV = np.concatenate([AV, AT], axis=1)

    return theta, Y, conv
