"""Matmul precision policy.

TPU MXUs execute f32 matmuls with bf16 inputs by default (~4e-3 relative
error) — unacceptable for forces that must match a CPU/f64 oracle to 1e-4
(the reference's f32 parity tier, /root/reference/tests/conftest.py:113).
All matmuls/einsums in this package therefore route through this policy:
``highest`` (default) gives true-f32 MXU passes; set ``default`` for
bf16-dtype speed runs where the inputs are already bf16.
"""

from __future__ import annotations

import contextlib

_PRECISION = "highest"


def get_precision_policy() -> str:
    """The raw policy: 'highest' | 'high' | 'default' | 'mixed'.

    'mixed' runs XLA-level matmuls (MLPs, embeddings — small contributions
    to the force error) at 'high' (bf16x3) while the Pallas kernels stay
    exact-f32 (ops/pallas_tp._kernel_precision maps 'mixed' to HIGHEST) —
    an accuracy/speed point between 'highest' and 'high'."""
    return _PRECISION


def get_matmul_precision() -> str:
    """The XLA-facing precision value (always a valid jax precision string);
    'mixed' policy surfaces as 'high' here."""
    return "high" if _PRECISION == "mixed" else _PRECISION


def matmul_precision_for(dtype) -> str:
    """Per-dtype precision: bf16 operands use the native MXU pass —
    'highest' would force multi-pass upcasts and defeat the fast tier."""
    import jax.numpy as jnp

    if dtype == jnp.bfloat16:
        return "default"
    return get_matmul_precision()


def set_matmul_precision(p: str) -> None:
    global _PRECISION
    _PRECISION = p


@contextlib.contextmanager
def matmul_precision(p: str):
    global _PRECISION
    old = _PRECISION
    _PRECISION = p
    try:
        yield
    finally:
        _PRECISION = old
