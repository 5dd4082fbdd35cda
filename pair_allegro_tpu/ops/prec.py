"""Matmul precision policy.

TPU MXUs execute f32 matmuls with bf16 inputs by default (~4e-3 relative
error) — unacceptable for forces that must match a CPU/f64 oracle to 1e-4
(the reference's f32 parity tier, /root/reference/tests/conftest.py:113).
All matmuls/einsums in this package therefore route through this policy.

``kernel_high`` (default): XLA-level matmuls exact-f32 (HIGHEST), in-kernel
Pallas dots bf16x3 (3 passes instead of 6).  Measured round 3 at the
5,324-atom bench: 74.6 -> 71.8 ms/step with max|dF| vs the f64 oracle
UNCHANGED (1.27e-5 vs 1.21e-5 eV/Å at 500 atoms) — the accurate tier's
error floor lives in the XLA-level MLPs and f32 summation, not the kernel
dots.  ``highest`` forces exact-f32 everywhere (the conservative tier);
``default`` is for bf16-dtype speed runs where the inputs are already bf16.
"""

from __future__ import annotations

import contextlib

_PRECISION = "kernel_high"


def get_precision_policy() -> str:
    """The raw policy: 'highest' | 'high' | 'default' | 'mixed' | 'kernel_high'.

    'mixed' runs XLA-level matmuls (MLPs, embeddings — small contributions
    to the force error) at 'high' (bf16x3) while the Pallas kernels stay
    exact-f32 (ops/pallas_tp._kernel_precision maps 'mixed' to HIGHEST) —
    an accuracy/speed point between 'highest' and 'high'.

    'kernel_high' is the CONVERSE of 'mixed': XLA matmuls stay exact-f32
    (the 'high'-tier error was measured to live in the XLA-level MLPs, see
    BASELINE.md round 3) while the IN-KERNEL mix/latent dots run bf16x3 —
    halving the dominant 6-pass HIGHEST cost inside the fused kernels."""
    return _PRECISION


def get_matmul_precision() -> str:
    """The XLA-facing precision value (always a valid jax precision string);
    'mixed' policy surfaces as 'high' here, 'kernel_high' as 'highest'."""
    if _PRECISION == "mixed":
        return "high"
    if _PRECISION == "kernel_high":
        return "highest"
    return _PRECISION


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
