"""Force-accuracy harness: TPU f32 forces under a precision tier / env-mm
mode vs the CPU f64 oracle, at the 500-atom flagship config.

Two-process protocol (f64 requires the CPU backend with x64 on, which the
Mosaic kernels reject in-process):

  # once (CPU, f64) — writes /tmp/pat_acc_oracle.npz
  JAX_PLATFORMS=cpu python benchmarks/accuracy.py oracle
  # per tier (TPU)
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/accuracy.py tpu \
      [tier] [env_mm]          # e.g. `tpu kernel_high split2`

Prints max|dF| / rms|dF| (eV/Å) and dE/atom vs the oracle.  The acceptance
bar is the reference's f32 parity tier: 1e-4 eV/Å
(/root/reference/tests/conftest.py:113).
"""

from __future__ import annotations

import os
import sys

import numpy as np

ORACLE = "/tmp/pat_acc_oracle.npz"
N_REP = 5  # 5^3 * 4 = 500 atoms


def _setup(dtype, cfg_over=()):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _fcc_cu
    from pair_allegro_tpu.engine import AllegroEngine
    from pair_allegro_tpu.models.allegro import AllegroConfig, allegro_init
    from pair_allegro_tpu.system import System

    pos, cell = _fcc_cu(N_REP)
    n = pos.shape[0]
    rng = np.random.RandomState(7)
    pos = pos + rng.randn(*pos.shape) * 0.05  # break lattice symmetry
    cfg_kw = dict(
        type_names=("Cu",),
        r_max=4.5,
        l_max=2,
        num_layers=3,
        num_scalar_features=64,
        num_tensor_features=32,
        avg_num_neighbors=12.0,
    )
    for kv in cfg_over:
        k, _, v = kv.partition("=")
        cfg_kw[k] = bool(int(v)) if v in ("0", "1") else v
    cfg = AllegroConfig(**cfg_kw)
    params = allegro_init(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    if dtype == jnp.float64:
        params = jax.tree.map(lambda a: a.astype(jnp.float64), params)
    system = System.create(
        pos, np.zeros(n, np.int32), cell=cell, masses=np.full(n, 63.546),
        dtype=dtype,
    )
    eng = AllegroEngine(cfg, params, system, skin=0.4)
    out = eng.force_fn(system, eng.rebuild_fn(system, None))
    return (
        np.asarray(out.total_energy, np.float64),
        np.asarray(out.forces, np.float64),
        n,
    )


def _setup_nequip(dtype):
    """NequIP config of record (l_max=1, parity, 3 MP layers, 64 feat) at
    the same 500-atom perturbed-FCC fixture — the oracle for the NequIP
    precision tiers (fused-conv bf16x3 dots, split2 aggregation, and the
    PAT_NEQUIP_HJ=bf16 gather-boundary fast tier)."""
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _fcc_cu
    from pair_allegro_tpu.engine import NequIPEngine
    from pair_allegro_tpu.models.nequip import NequIPConfig, nequip_init
    from pair_allegro_tpu.system import System

    pos, cell = _fcc_cu(N_REP)
    n = pos.shape[0]
    rng = np.random.RandomState(7)
    pos = pos + rng.randn(*pos.shape) * 0.05
    cfg = NequIPConfig(
        type_names=("Cu",), r_max=4.5, l_max=1, num_layers=3,
        num_features=64, radial_mlp_depth=2, radial_mlp_width=32,
        avg_num_neighbors=12.0, parity=True,
    )
    params = nequip_init(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    if dtype == jnp.float64:
        params = jax.tree.map(lambda a: a.astype(jnp.float64), params)
    system = System.create(
        pos, np.zeros(n, np.int32), cell=cell, masses=np.full(n, 63.546),
        dtype=dtype,
    )
    eng = NequIPEngine(cfg, params, system, skin=0.4)
    out = eng.force_fn(system, eng.rebuild_fn(system, None))
    return (
        np.asarray(out.total_energy, np.float64),
        np.asarray(out.forces, np.float64),
        n,
    )


NEQUIP_ORACLE = "/tmp/pat_acc_oracle_nequip.npz"


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "tpu"
    if which == "nequip-oracle":
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
        import jax.numpy as jnp

        e, f, n = _setup_nequip(jnp.float64)
        np.savez(NEQUIP_ORACLE, e=e, f=f)
        print(f"nequip oracle written: {n} atoms, E={float(np.sum(e)):.9f} eV")
        return
    if which == "nequip":
        # env knobs (PAT_NEQUIP_HJ / PAT_NEQUIP_AGG_MM) come from the caller
        tier = sys.argv[2] if len(sys.argv) > 2 else None
        if tier:
            from pair_allegro_tpu.ops.prec import set_matmul_precision

            set_matmul_precision(tier)
        import jax.numpy as jnp

        e, f, n = _setup_nequip(jnp.float32)
        ref = np.load(NEQUIP_ORACLE)
        df = np.abs(f - ref["f"])
        de = abs(float(np.sum(e)) - float(np.sum(ref["e"]))) / n
        print(
            f"nequip tier={tier or 'default'} "
            f"hj={os.environ.get('PAT_NEQUIP_HJ') or 'f32'} "
            f"agg={os.environ.get('PAT_NEQUIP_AGG_MM') or 'split2'}: "
            f"max|dF|={df.max():.3e} rms|dF|={np.sqrt((df**2).mean()):.3e} "
            f"eV/A  dE/atom={de:.3e} eV  "
            f"({'PASS' if df.max() < 1e-4 else 'FAIL'} 1e-4 bar)"
        )
        return
    if which == "oracle":
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
        import jax.numpy as jnp

        e, f, n = _setup(jnp.float64)
        np.savez(ORACLE, e=e, f=f)
        print(f"oracle written: {n} atoms, E={float(np.sum(e)):.9f} eV")
        return

    tier = sys.argv[2] if len(sys.argv) > 2 else None
    env_mm = sys.argv[3] if len(sys.argv) > 3 else None
    cfg_over = sys.argv[4].split(",") if len(sys.argv) > 4 else ()
    if env_mm and env_mm != "default":
        os.environ["PAT_ENV_MM"] = env_mm
    from pair_allegro_tpu.ops.prec import set_matmul_precision

    if tier:
        set_matmul_precision(tier)
    import jax.numpy as jnp

    e, f, n = _setup(jnp.float32, cfg_over)
    ref = np.load(ORACLE)
    df = np.abs(f - ref["f"])
    de = abs(float(np.sum(e)) - float(np.sum(ref["e"]))) / n
    print(
        f"tier={tier or 'default'} env_mm={env_mm or 'default'} "
        f"cfg={','.join(cfg_over) or '-'}: "
        f"max|dF|={df.max():.3e} rms|dF|={np.sqrt((df**2).mean()):.3e} eV/A  "
        f"dE/atom={de:.3e} eV  ({'PASS' if df.max() < 1e-4 else 'FAIL'} 1e-4 bar)"
    )


if __name__ == "__main__":
    main()
