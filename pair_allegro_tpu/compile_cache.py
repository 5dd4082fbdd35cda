"""Persistent XLA compilation cache — the AOT-artifact analog.

The reference's deployment contract is "compile once offline, load
instantly at MD time": ``nequip-compile`` produces a TorchScript/AOTInductor
package that the pair style merely loads
(/root/reference/pair_nequip_allegro.cpp:197-247, README.md:60-76 "AOT
Inductor ... significant performance gains").  The JAX-native equivalent of
that artifact is the persistent compilation cache: the first run traces and
compiles the jitted MD step (20-150 s on a TPU host), every later process
with the same config/shapes deserializes the compiled executable from disk
in ~1 s.  Unlike the reference's artifact there is no separate offline
compile CLI step — the cache is written as a side effect of the first run —
but `pair_allegro_tpu.cli run --steps 0`-style warmups give the same
"precompile on the build box" workflow.

Activation (either):
  * YAML: ``compile_cache: /path/to/cache`` in a `cli run` config,
  * env:  ``PAT_COMPILE_CACHE=/path/to/cache`` (honored by the CLI, the ASE
    calculator, and bench.py).
"""

from __future__ import annotations

import os

_ENABLED: str | None = None


def enable_compile_cache(path: str) -> None:
    """Point JAX's persistent compilation cache at ``path`` (idempotent).

    Must run before the first jit compilation to cover it; later calls with
    the same path are no-ops, a different path raises (the cache dir is a
    process-global).
    """
    global _ENABLED
    path = os.path.abspath(os.path.expanduser(path))
    if _ENABLED is not None:
        if _ENABLED != path:
            raise ValueError(
                f"compilation cache already enabled at {_ENABLED!r}; "
                f"cannot move it to {path!r} in the same process"
            )
        return
    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache every executable, not just slow-to-compile ones: MD runs are
    # dominated by ONE big step executable but the neighbor-rebuild and
    # thermo jits also pay trace+compile on restart
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _ENABLED = path


def maybe_enable_from_env() -> bool:
    """Honor ``PAT_COMPILE_CACHE`` if set; returns whether a cache is on."""
    path = os.environ.get("PAT_COMPILE_CACHE")
    if path:
        enable_compile_cache(path)
    return _ENABLED is not None
