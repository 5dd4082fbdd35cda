"""Real spherical harmonics and Wigner-3j (Clebsch-Gordan) tables.

This is the SO(3)/O(3) math core that replaces what the reference gets from
e3nn inside compiled NequIP/Allegro libtorch models (the reference plugin never
computes this itself; it lives in the model artifact — see
/root/reference/SURVEY context and pair_nequip_allegro.cpp:425 where the model
is a black box).  Built from scratch, TPU-first:

* ``spherical_harmonics`` — real solid/spherical harmonics up to arbitrary
  ``lmax`` via pure Cartesian polynomial recurrences (no trig, no division,
  pole-free, differentiable everywhere; XLA fuses it into surrounding math).
* ``real_wigner_3j`` — real Wigner-3j coefficient blocks, derived numerically
  as the (unique, by Schur) rotation intertwiner from sampled Wigner-D
  matrices, which are themselves derived from the spherical harmonics.  All
  conventions are therefore self-consistent by construction and verified by
  equivariance tests (tests/test_so3.py).

Conventions (matching e3nn so future weight import is a permutation-free map):
* m ordering is ``-l..l``; for l=1 the components are ``(y, z, x)``.
* ``component`` normalization: ``|Y_l(n)|^2 = 2l+1`` on unit vectors ``n``.
* 3j blocks are Frobenius-normalized to 1.
"""

from __future__ import annotations

import functools
import math

import jax.numpy as jnp
import numpy as np

__all__ = [
    "spherical_harmonics",
    "spherical_harmonics_np",
    "wigner_D_np",
    "real_wigner_3j",
    "sh_dim",
    "sh_slice",
]


def sh_dim(lmax: int) -> int:
    """Total length of concatenated SH components for l = 0..lmax."""
    return (lmax + 1) ** 2


def sh_slice(l: int) -> slice:  # noqa: E741
    """Slice of the l-block inside a 0..lmax concatenated SH vector."""
    return slice(l * l, (l + 1) * (l + 1))


def _sh_norm_consts(lmax: int) -> list[list[float]]:
    """norm[l][|m|]: component-normalization constants for the Cartesian
    recurrences used below (Condon-Shortley phase dropped).

    Orthonormal real SH: N = sqrt((2l+1)/(4pi) * (l-|m|)!/(l+|m|)!) with an
    extra sqrt(2) for m != 0; 'component' multiplies by sqrt(4pi).
    """
    out = []
    for l in range(lmax + 1):  # noqa: E741
        row = []
        for m in range(l + 1):
            n = math.sqrt((2 * l + 1) * math.factorial(l - m) / math.factorial(l + m))
            if m != 0:
                n *= math.sqrt(2.0)
            row.append(n)
        out.append(row)
    return out


def _sh_impl(x, y, z, lmax: int, xp):
    """Shared jnp/np implementation. x,y,z are unit-vector components."""
    norms = _sh_norm_consts(lmax)
    # Azimuthal polynomials: C_m = rho^m cos(m phi), S_m = rho^m sin(m phi)
    C = [xp.ones_like(x)]
    S = [xp.zeros_like(x)]
    for m in range(1, lmax + 1):
        C.append(x * C[m - 1] - y * S[m - 1])
        S.append(x * S[m - 1] + y * C[m - 1])
    # Associated Legendre with the rho^m factor absorbed into C_m/S_m:
    # P[m][m] = (2m-1)!!, P[l][m] via standard recurrence (r^2 = 1 assumed).
    P: dict = {}
    P[(0, 0)] = xp.ones_like(z)
    for m in range(0, lmax + 1):
        if m > 0:
            P[(m, m)] = (2 * m - 1) * P[(m - 1, m - 1)]
        if m + 1 <= lmax:
            P[(m + 1, m)] = (2 * m + 1) * z * P[(m, m)]
        for l in range(m + 2, lmax + 1):  # noqa: E741
            P[(l, m)] = ((2 * l - 1) * z * P[(l - 1, m)] - (l - 1 + m) * P[(l - 2, m)]) / (l - m)

    comps = []
    for l in range(lmax + 1):  # noqa: E741
        for m in range(-l, l + 1):
            am = abs(m)
            n = norms[l][am]
            if m < 0:
                comps.append(n * P[(l, am)] * S[am])
            elif m == 0:
                comps.append(n * P[(l, 0)])
            else:
                comps.append(n * P[(l, am)] * C[am])
    return xp.stack(comps, axis=-1)


def spherical_harmonics(vecs, lmax: int, normalize: bool = True, eps: float = 1e-30):
    """Real spherical harmonics, component normalization, l = 0..lmax.

    Args:
      vecs: (..., 3) Cartesian vectors (x, y, z).
      lmax: maximum angular momentum.
      normalize: divide by |r| first (guarded against r=0; Y(0) is Y(ẑ=0
        direction-free garbage but finite — callers mask padded edges).

    Returns:
      (..., (lmax+1)^2) array, blocks ordered l=0..lmax, m=-l..l.
    """
    x, y, z = vecs[..., 0], vecs[..., 1], vecs[..., 2]
    if normalize:
        r2 = x * x + y * y + z * z
        rinv = jnp.where(r2 > eps, 1.0 / jnp.sqrt(jnp.maximum(r2, eps)), 0.0)
        x, y, z = x * rinv, y * rinv, z * rinv
    return _sh_impl(x, y, z, lmax, jnp)


def spherical_harmonics_np(vecs: np.ndarray, lmax: int) -> np.ndarray:
    """NumPy float64 twin of :func:`spherical_harmonics` (assumes unit input);
    used to build Wigner-D and 3j tables deterministically at trace time."""
    v = np.asarray(vecs, dtype=np.float64)
    n = np.linalg.norm(v, axis=-1, keepdims=True)
    v = v / np.where(n > 0, n, 1.0)
    return _sh_impl(v[..., 0], v[..., 1], v[..., 2], lmax, np)


def _rotation_matrix(angles: np.ndarray) -> np.ndarray:
    """Proper rotation from three Euler-ish angles (only used for sampling)."""
    a, b, c = angles

    def rz(t):
        return np.array(
            [[math.cos(t), -math.sin(t), 0.0], [math.sin(t), math.cos(t), 0.0], [0.0, 0.0, 1.0]]
        )

    def ry(t):
        return np.array(
            [[math.cos(t), 0.0, math.sin(t)], [0.0, 1.0, 0.0], [-math.sin(t), 0.0, math.cos(t)]]
        )

    return rz(a) @ ry(b) @ rz(c)


@functools.lru_cache(maxsize=None)
def _sample_points(lmax: int) -> np.ndarray:
    rng = np.random.RandomState(12345)
    k = 4 * (lmax + 1) ** 2 + 8
    pts = rng.randn(k, 3)
    return pts / np.linalg.norm(pts, axis=-1, keepdims=True)


def wigner_D_np(l: int, R: np.ndarray) -> np.ndarray:  # noqa: E741
    """Real Wigner-D matrix for rotation R: Y_l(R x) = D_l(R) @ Y_l(x).

    Solved exactly (least squares over an over-determined sample of unit
    vectors); residual is ~1e-13 — asserted in tests.  Float64 NumPy.
    """
    pts = _sample_points(l)
    A = spherical_harmonics_np(pts, l)[:, sh_slice(l)]  # (K, 2l+1)
    B = spherical_harmonics_np(pts @ R.T, l)[:, sh_slice(l)]  # (K, 2l+1)
    D, *_ = np.linalg.lstsq(A, B, rcond=None)
    return D.T  # B^T = D @ A^T


@functools.lru_cache(maxsize=None)
def _intertwiner_rotations() -> tuple:
    rng = np.random.RandomState(54321)
    return tuple(_rotation_matrix(rng.uniform(0.1, 2.8, size=3)) for _ in range(3))


@functools.lru_cache(maxsize=None)
def real_wigner_3j(l1: int, l2: int, l3: int) -> np.ndarray:
    """Real Wigner-3j block C of shape (2l1+1, 2l2+1, 2l3+1).

    Defined as the unique (up to sign/scale) intertwiner with
    ``einsum('ia,jb,ijk->abk', D1, D2, C) == einsum('kc,abc->abk', D3, C)``
    for all rotations; found as the SVD nullspace of that linear condition
    stacked over 3 generic rotations.  Frobenius-normalized to 1, sign fixed
    deterministically.  Returns zeros when the triangle rule fails.
    """
    n1, n2, n3 = 2 * l1 + 1, 2 * l2 + 1, 2 * l3 + 1
    if not (abs(l1 - l2) <= l3 <= l1 + l2):
        return np.zeros((n1, n2, n3))
    rows = []
    eye1, eye2, eye3 = np.eye(n1), np.eye(n2), np.eye(n3)
    for R in _intertwiner_rotations():
        D1 = wigner_D_np(l1, R)
        D2 = wigner_D_np(l2, R)
        D3 = wigner_D_np(l3, R)
        # M[(a,b,k),(i,j,c)] = D1[i,a] D2[j,b] d_{ck} - d_{ia} d_{jb} D3[k,c]
        lhs = np.einsum("ia,jb,ck->abkijc", D1, D2, eye3)
        rhs = np.einsum("ia,jb,kc->abkijc", eye1, eye2, D3)
        rows.append((lhs - rhs).reshape(n1 * n2 * n3, n1 * n2 * n3))
    M = np.concatenate(rows, axis=0)
    _, s, vt = np.linalg.svd(M)
    if len(s) > 1 and s[-2] < 1e-6:  # pragma: no cover - valid SO(3) triples are multiplicity-1
        raise RuntimeError(f"3j nullspace not unique for ({l1},{l2},{l3})")
    if s[-1] > 1e-8:  # pragma: no cover
        raise RuntimeError(f"no 3j intertwiner for ({l1},{l2},{l3}): sigma={s[-1]}")
    C = vt[-1].reshape(n1, n2, n3)
    # Deterministic sign: largest-|.| component positive.
    flat = C.ravel()
    C = C * np.sign(flat[np.argmax(np.abs(flat))])
    # Clean tiny numerical dust so exact zeros stay zero (sparser constants).
    C[np.abs(C) < 1e-12] = 0.0
    return C
