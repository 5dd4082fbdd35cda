"""Small closed-form 3x3 cell algebra.

XLA:TPU has no f64 LU kernels and a 3x3 LU is overkill anyway; these are
branch-free, fusible, differentiable, and dtype-generic.  Used for cell
inversion (fractional coords, the get_cell/cell_inv analog of
/root/reference/pair_nequip_allegro.cpp:604-618) and volumes."""

from __future__ import annotations

import jax.numpy as jnp


def det3x3(m):
    return (
        m[0, 0] * (m[1, 1] * m[2, 2] - m[1, 2] * m[2, 1])
        - m[0, 1] * (m[1, 0] * m[2, 2] - m[1, 2] * m[2, 0])
        + m[0, 2] * (m[1, 0] * m[2, 1] - m[1, 1] * m[2, 0])
    )


def inv3x3(m):
    a, b, c = m[0, 0], m[0, 1], m[0, 2]
    d, e, f = m[1, 0], m[1, 1], m[1, 2]
    g, h, i = m[2, 0], m[2, 1], m[2, 2]
    A = e * i - f * h
    B = c * h - b * i
    C = b * f - c * e
    D = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    H = b * g - a * h
    I = a * e - b * d  # noqa: E741
    det = a * A + b * D + c * G
    adj = jnp.array([[A, B, C], [D, E, F], [G, H, I]], dtype=m.dtype)
    return adj / det


def volume(cell):
    return jnp.abs(det3x3(cell))
