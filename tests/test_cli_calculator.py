"""CLI runner and Calculator surface tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pair_allegro_tpu.calculator import Calculator
from pair_allegro_tpu.models.allegro import AllegroConfig, allegro_init


def test_calculator_single_point(rng):
    cfg = AllegroConfig(type_names=("Cu",), r_max=4.0, l_max=1, num_layers=2,
                        num_scalar_features=8, num_tensor_features=4,
                        avg_num_neighbors=12.0)
    params = allegro_init(jax.random.PRNGKey(0), cfg, dtype=jnp.float64)
    a0 = 3.61
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]]) * a0
    pos = np.concatenate([base + np.array([i, j, k]) * a0
                          for i in range(2) for j in range(2) for k in range(2)])
    pos += 0.02 * rng.randn(*pos.shape)
    cell = np.eye(3) * a0 * 2
    calc = Calculator(cfg, params, dtype=jnp.float64)
    out = calc.calculate(pos, symbols=["Cu"] * 32, cell=cell)
    assert np.isfinite(out["energy"])
    assert out["forces"].shape == (32, 3)
    # energy = sum of per-atom energies (the reference invariant,
    # test_python_repro_allegro.py:321)
    np.testing.assert_allclose(out["energy"], out["energies"].sum(), rtol=1e-12)
    # forces sum to ~zero (translation invariance)
    np.testing.assert_allclose(out["forces"].sum(0), 0.0, atol=1e-9)
    assert out["stress"].shape == (6,)
    # stress symmetric part matches virial convention: P = tr(virial)/3V
    vol = np.linalg.det(cell)
    np.testing.assert_allclose(
        -(out["stress"][:3].sum() / 3.0), np.trace(out["virial"]) / 3.0 / vol, rtol=1e-10
    )
    # unknown species is a hard error (pair_nequip_allegro.cpp:287-292)
    with pytest.raises(KeyError, match="Zr"):
        calc.calculate(pos, symbols=["Zr"] * 32, cell=cell)


def test_calculator_cell_change_rebinds_engine(rng):
    """A cell change that re-bins/flips the neighbor strategy gets a fresh
    engine (cache key includes the bin grid), and results match a cold
    calculator — reuse across very different densities must not lean on the
    overflow/regrow loop with a stale grid."""
    cfg = AllegroConfig(type_names=("Cu",), r_max=4.0, l_max=1, num_layers=2,
                        num_scalar_features=8, num_tensor_features=4,
                        avg_num_neighbors=12.0)
    params = allegro_init(jax.random.PRNGKey(0), cfg, dtype=jnp.float64)
    a0 = 3.61
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]]) * a0
    reps = 4  # 256 atoms: big enough for the cell-list regime at 4x4x4
    pos = np.concatenate([base + np.array([i, j, k]) * a0
                          for i in range(reps) for j in range(reps) for k in range(reps)])
    pos += 0.02 * rng.randn(*pos.shape)
    n = pos.shape[0]
    cell = np.eye(3) * a0 * reps
    calc = Calculator(cfg, params, dtype=jnp.float64)
    out_a = calc.calculate(pos, symbols=["Cu"] * n, cell=cell)
    eng_a = calc._engine
    # compress 20%: denser box, different bin grid -> engine must rebind
    s = 0.8
    out_b = calc.calculate(pos * s, symbols=["Cu"] * n, cell=cell * s)
    assert calc._engine is not eng_a
    cold = Calculator(cfg, params, dtype=jnp.float64)
    ref_b = cold.calculate(pos * s, symbols=["Cu"] * n, cell=cell * s)
    np.testing.assert_allclose(out_b["energy"], ref_b["energy"], rtol=1e-12)
    np.testing.assert_allclose(out_b["forces"], ref_b["forces"], atol=1e-12)
    # going back re-binds again and reproduces the first answer exactly
    out_a2 = calc.calculate(pos, symbols=["Cu"] * n, cell=cell)
    np.testing.assert_allclose(out_a2["energy"], out_a["energy"], rtol=1e-12)


def test_cli_run_and_info(tmp_path, capsys):
    import yaml
    from pair_allegro_tpu import checkpoint as ckpt
    from pair_allegro_tpu.cli import main
    from pair_allegro_tpu.io.extxyz import write_extxyz

    rng = np.random.RandomState(0)
    a0 = 3.61
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]]) * a0
    pos = np.concatenate([base + np.array([i, j, k]) * a0
                          for i in range(2) for j in range(2) for k in range(2)])
    pos += 0.02 * rng.randn(*pos.shape)
    xyz = str(tmp_path / "cu.xyz")
    write_extxyz(xyz, {"symbols": np.array(["Cu"] * 32), "positions": pos,
                       "cell": np.eye(3) * a0 * 2, "pbc": (True,) * 3, "info": {}})

    cfg = AllegroConfig(type_names=("Cu",), r_max=4.0, l_max=1, num_layers=1,
                        num_scalar_features=8, num_tensor_features=4,
                        avg_num_neighbors=12.0)
    params = allegro_init(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    model = str(tmp_path / "model.npz")
    ckpt.save_params(model, params, cfg, family="allegro")

    conf = {
        "data": xyz,
        "model": {"checkpoint": model},
        "type_names": ["Cu"],
        "masses": {"Cu": 63.546},
        "integrator": "nve",
        "dt_fs": 1.0,
        "steps": 4,
        "temp_K": 20.0,
        "log_every": 2,
        "dump": {"path": str(tmp_path / "traj.dump"), "every": 2},
        "restart": {"path": str(tmp_path / "state.npz")},
    }
    cpath = str(tmp_path / "run.yaml")
    with open(cpath, "w") as f:
        yaml.dump(conf, f)
    assert main(["run", cpath]) == 0
    out = capsys.readouterr().out
    assert "etotal" in out and "ns/day" in out
    assert (tmp_path / "traj.dump").exists()
    sys1, step, _, _ = ckpt.load_state(str(tmp_path / "state.npz"))
    assert step == 4 and sys1.n_atoms == 32

    assert main(["info", model]) == 0
    out = capsys.readouterr().out
    assert "allegro" in out and "r_max" in out


def test_cli_restart_resume_bitwise(tmp_path, capsys):
    """read_restart parity: stop at step 4 + resume for 4 must reproduce the
    uninterrupted 8-step f64 trajectory bit-for-bit across the chunk
    boundary (SURVEY §2.7/§5.4)."""
    import yaml
    from pair_allegro_tpu import checkpoint as ckpt
    from pair_allegro_tpu.cli import main
    from pair_allegro_tpu.io.extxyz import write_extxyz

    rng = np.random.RandomState(0)
    a0 = 3.61
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]]) * a0
    pos = np.concatenate([base + np.array([i, j, k]) * a0
                          for i in range(2) for j in range(2) for k in range(2)])
    pos += 0.02 * rng.randn(*pos.shape)
    xyz = str(tmp_path / "cu.xyz")
    write_extxyz(xyz, {"symbols": np.array(["Cu"] * 32), "positions": pos,
                       "cell": np.eye(3) * a0 * 2, "pbc": (True,) * 3})
    cfg = AllegroConfig(type_names=("Cu",), r_max=4.0, l_max=1, num_layers=1,
                        num_scalar_features=8, num_tensor_features=4,
                        avg_num_neighbors=12.0)
    params = allegro_init(jax.random.PRNGKey(0), cfg, dtype=jnp.float64)
    model = str(tmp_path / "model.npz")
    ckpt.save_params(model, params, cfg, family="allegro")

    # NVT exercises thermostat-state restore (xi/xi_int) on top of pos/vel
    common = {
        "data": xyz, "model": {"checkpoint": model}, "type_names": ["Cu"],
        "masses": {"Cu": 63.546}, "integrator": "nvt", "tdamp_ps": 0.05,
        "dt_fs": 1.0, "temp_K": 50.0, "log_every": 4, "dtype": "float64",
    }

    def run(conf, name):
        p = str(tmp_path / name)
        with open(p, "w") as f:
            yaml.dump(conf, f)
        assert main(["run", p]) == 0

    run({**common, "steps": 8,
         "restart": {"path": str(tmp_path / "a.npz")}}, "a.yaml")
    run({**common, "steps": 4,
         "restart": {"path": str(tmp_path / "b.npz")}}, "b.yaml")
    run({**common, "steps": 4, "restart_from": str(tmp_path / "b.npz"),
         "restart": {"path": str(tmp_path / "c.npz")}}, "c.yaml")
    capsys.readouterr()

    sys_a, step_a, th_a, _ = ckpt.load_state(str(tmp_path / "a.npz"))
    sys_c, step_c, th_c, _ = ckpt.load_state(str(tmp_path / "c.npz"))
    assert step_a == step_c == 8
    assert np.array_equal(np.asarray(sys_a.positions), np.asarray(sys_c.positions))
    assert np.array_equal(np.asarray(sys_a.velocities), np.asarray(sys_c.velocities))
    for k in th_a:
        assert np.array_equal(np.asarray(th_a[k]), np.asarray(th_c[k])), k


def test_cli_sharded_run(tmp_path, capsys):
    """`sharding:` YAML key runs the ShardedAllegroEngine over the virtual
    mesh — the CLI face of the reference's `mpirun -np N` matrix
    (test_python_repro_allegro.py:153-157)."""
    import yaml
    from pair_allegro_tpu import checkpoint as ckpt
    from pair_allegro_tpu.cli import main
    from pair_allegro_tpu.io.extxyz import write_extxyz

    rng = np.random.RandomState(0)
    a0 = 3.61
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]]) * a0
    pos = np.concatenate([base + np.array([i, j, k]) * a0
                          for i in range(2) for j in range(2) for k in range(2)])
    pos += 0.02 * rng.randn(*pos.shape)
    xyz = str(tmp_path / "cu.xyz")
    write_extxyz(xyz, {"symbols": np.array(["Cu"] * 32), "positions": pos,
                       "cell": np.eye(3) * a0 * 2, "pbc": (True,) * 3})
    cfg = AllegroConfig(type_names=("Cu",), r_max=4.0, l_max=1, num_layers=1,
                        num_scalar_features=8, num_tensor_features=4,
                        avg_num_neighbors=12.0)
    params = allegro_init(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    model = str(tmp_path / "model.npz")
    ckpt.save_params(model, params, cfg, family="allegro")
    conf = {
        "data": xyz, "model": {"checkpoint": model}, "type_names": ["Cu"],
        "masses": {"Cu": 63.546}, "integrator": "nve", "dt_fs": 1.0,
        "steps": 2, "log_every": 2, "temp_K": 20.0,
        "sharding": {"n_devices": 8},
    }
    cpath = str(tmp_path / "run.yaml")
    with open(cpath, "w") as f:
        yaml.dump(conf, f)
    assert main(["run", cpath]) == 0
    out = capsys.readouterr().out
    assert "etotal" in out and "ns/day" in out


def _small_fcc_xyz(tmp_path, n_rep=4):
    from pair_allegro_tpu.io.extxyz import write_extxyz

    rng = np.random.RandomState(0)
    a0 = 3.61
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]]) * a0
    pos = np.concatenate([base + np.array([i, j, k]) * a0
                          for i in range(n_rep) for j in range(n_rep)
                          for k in range(n_rep)])
    pos += 0.02 * rng.randn(*pos.shape)
    xyz = str(tmp_path / "cu.xyz")
    write_extxyz(xyz, {"symbols": np.array(["Cu"] * len(pos)), "positions": pos,
                       "cell": np.eye(3) * a0 * n_rep, "pbc": (True,) * 3})
    return xyz


def test_cli_halo_sharded_run(tmp_path, capsys):
    """`sharding: {mode: halo}` runs the ppermute ghost-exchange engine end
    to end through the CLI."""
    import yaml
    from pair_allegro_tpu import checkpoint as ckpt
    from pair_allegro_tpu.cli import main

    xyz = _small_fcc_xyz(tmp_path, n_rep=5)  # 500 atoms: slabs >= cutoff at h<=3
    cfg = AllegroConfig(type_names=("Cu",), r_max=4.0, l_max=1, num_layers=1,
                        num_scalar_features=8, num_tensor_features=4,
                        avg_num_neighbors=12.0)
    params = allegro_init(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    model = str(tmp_path / "model.npz")
    ckpt.save_params(model, params, cfg, family="allegro")
    conf = {
        "data": xyz, "model": {"checkpoint": model}, "type_names": ["Cu"],
        "masses": {"Cu": 63.546}, "integrator": "nve", "dt_fs": 1.0,
        "steps": 2, "log_every": 2, "temp_K": 20.0,
        "sharding": {"n_devices": 8, "mode": "halo"},
    }
    cpath = str(tmp_path / "run.yaml")
    with open(cpath, "w") as f:
        yaml.dump(conf, f)
    assert main(["run", cpath]) == 0
    out = capsys.readouterr().out
    assert "etotal" in out and "ns/day" in out


def test_cli_sharded_nequip_run(tmp_path, capsys):
    """Sharded NequIP through the CLI — the run the reference hard-errors on
    at >1 rank (pair_nequip_allegro.cpp:86-89)."""
    import yaml
    from pair_allegro_tpu import checkpoint as ckpt
    from pair_allegro_tpu.cli import main
    from pair_allegro_tpu.models.nequip import NequIPConfig, nequip_init

    xyz = _small_fcc_xyz(tmp_path, n_rep=5)
    cfg = NequIPConfig(type_names=("Cu",), r_max=4.0, l_max=1, num_layers=2,
                       num_features=8, avg_num_neighbors=12.0)
    params = nequip_init(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    model = str(tmp_path / "model.npz")
    ckpt.save_params(model, params, cfg, family="nequip")
    conf = {
        "data": xyz, "model": {"checkpoint": model}, "type_names": ["Cu"],
        "masses": {"Cu": 63.546}, "integrator": "nve", "dt_fs": 1.0,
        "steps": 2, "log_every": 2, "temp_K": 20.0,
        "sharding": {"n_devices": 8},
    }
    cpath = str(tmp_path / "run.yaml")
    with open(cpath, "w") as f:
        yaml.dump(conf, f)
    assert main(["run", cpath]) == 0
    out = capsys.readouterr().out
    assert "etotal" in out


def test_cli_compile_cache_roundtrip(tmp_path):
    """The AOT-artifact analog (pair_nequip_allegro.cpp:197-247): with
    ``compile_cache:`` set, the first CLI run populates a persistent XLA
    executable cache and an identical second PROCESS compiles nothing new —
    every executable deserializes from disk (the reference's 'compile once
    offline, load at MD time' contract)."""
    import os
    import subprocess
    import sys

    import yaml
    from pair_allegro_tpu import checkpoint as ckpt
    from pair_allegro_tpu.io.extxyz import write_extxyz

    rng = np.random.RandomState(0)
    a0 = 3.61
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]]) * a0
    pos = np.concatenate([base + np.array([i, j, k]) * a0
                          for i in range(2) for j in range(2) for k in range(2)])
    pos += 0.02 * rng.randn(*pos.shape)
    xyz = str(tmp_path / "cu.xyz")
    write_extxyz(xyz, {"symbols": np.array(["Cu"] * 32), "positions": pos,
                       "cell": np.eye(3) * a0 * 2, "pbc": (True,) * 3, "info": {}})
    cfg = AllegroConfig(type_names=("Cu",), r_max=4.0, l_max=1, num_layers=1,
                        num_scalar_features=8, num_tensor_features=4,
                        avg_num_neighbors=12.0)
    params = allegro_init(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    model = str(tmp_path / "model.npz")
    ckpt.save_params(model, params, cfg, family="allegro")
    cache = tmp_path / "xla_cache"
    conf = {
        "data": xyz,
        "model": {"checkpoint": model},
        "type_names": ["Cu"],
        "masses": {"Cu": 63.546},
        "integrator": "nve",
        "dt_fs": 1.0,
        "steps": 2,
        "temp_K": 20.0,
        "log_every": 2,
        "compile_cache": str(cache),
    }
    cpath = str(tmp_path / "run.yaml")
    with open(cpath, "w") as f:
        yaml.dump(conf, f)

    # fresh processes: the cache is a process-global jax config, and the
    # point is surviving process restarts (conftest's platform forcing is
    # reproduced inline)
    code = ("import jax; jax.config.update('jax_platforms', 'cpu'); "
            "from pair_allegro_tpu.cli import main; "
            f"raise SystemExit(main(['run', {cpath!r}]))")
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(__file__))
    subprocess.run([sys.executable, "-c", code], env=env, check=True,
                   capture_output=True)
    entries1 = set(os.listdir(cache))
    assert entries1, "first run wrote no cache entries"
    subprocess.run([sys.executable, "-c", code], env=env, check=True,
                   capture_output=True)
    entries2 = set(os.listdir(cache))
    assert entries2 == entries1, (
        f"second process missed the cache: {sorted(entries2 - entries1)}"
    )


def test_cli_train_end_to_end(tmp_path, capsys):
    """`cli train` — the nequip-train analog: trains a tiny Allegro on the
    reference's own CuPd dataset, writes a checkpoint that `cli info` reads
    and an MD engine can consume, and the val metric improves vs the first
    epoch (descent through the jitted batched update)."""
    import re

    import yaml
    from pair_allegro_tpu import checkpoint as ckpt
    from pair_allegro_tpu.cli import main

    out = str(tmp_path / "cupd.npz")
    conf = {
        "model": {
            "family": "allegro",
            "config": {
                "type_names": ["Cu", "Pd"], "r_max": 3.0, "l_max": 1,
                "num_layers": 1, "num_scalar_features": 8,
                "num_tensor_features": 4, "two_body_mlp_width": 8,
                "allegro_mlp_hidden_layers_width": 8,
                "readout_mlp_hidden_layers_width": 8,
                "avg_num_neighbors": 12.0, "remat": False,
            },
        },
        "dataset": "/root/reference/tests/test_data/CuPd-cubic-big.xyz",
        "val_fraction": 0.2,
        "optimizer": {"name": "adam", "lr": 5.0e-3},
        "ema_decay": 0.9,
        "batch_size": 4,
        "epochs": 6,
        "log_every": 1,
        "seed": 0,
        "out": out,
    }
    cpath = str(tmp_path / "train.yaml")
    with open(cpath, "w") as f:
        yaml.safe_dump(conf, f)
    assert main(["train", cpath]) == 0
    text = capsys.readouterr().out
    rmses = [float(m) for m in re.findall(r"epoch\s+\d+.*val rmse_F (\S+)", text)]
    assert len(rmses) == 6
    assert rmses[-1] < rmses[0], rmses  # descent on held-out frames
    # the artifact round-trips: info reads it, params load with config
    assert main(["info", out]) == 0
    info = capsys.readouterr().out
    assert "family: allegro" in info
    params, cfg_dict, family = ckpt.load_params(out)
    assert family == "allegro" and cfg_dict["r_max"] == 3.0
    assert all(np.all(np.isfinite(np.asarray(x)))
               for x in jax.tree.leaves(params))
    # ... and the trained artifact RUNS MD — the full nequip-train ->
    # nequip-compile -> pair_coeff pipeline analog
    # (/root/reference/tests/conftest.py:131-171): `cli run` on a frame of
    # the SAME dataset with the trained checkpoint, etotal finite + dump
    # written (round-4 review item #5b)
    from pair_allegro_tpu.data import load_frames
    from pair_allegro_tpu.io.extxyz import read_extxyz, write_extxyz

    frames = read_extxyz("/root/reference/tests/test_data/CuPd-cubic-big.xyz")
    fr = frames[0]
    xyz = str(tmp_path / "cupd0.xyz")
    write_extxyz(xyz, {"symbols": fr["symbols"], "positions": fr["positions"],
                       "cell": fr["cell"], "pbc": (True,) * 3})
    run_conf = {
        "data": xyz, "model": {"checkpoint": out},
        "type_names": ["Cu", "Pd"],
        "masses": {"Cu": 63.546, "Pd": 106.42},
        "integrator": "nve", "dt_fs": 1.0, "steps": 3, "log_every": 1,
        "temp_K": 50.0,
    }
    rpath = str(tmp_path / "run.yaml")
    with open(rpath, "w") as f:
        yaml.safe_dump(run_conf, f)
    assert main(["run", rpath]) == 0
    run_out = capsys.readouterr().out
    assert "etotal" in run_out and "nan" not in run_out.lower()


def test_cli_run_shrinks_spiked_capacity(tmp_path, capsys, monkeypatch):
    """The CLI wires Simulation's shrink_fn: an engine whose K was inflated
    by a (simulated) density-spike grow returns to the baseline capacity
    during a `cli run` — the Kokkos shrink half of the realloc hysteresis
    (pair_nequip_allegro_kokkos.cpp:218-229) reachable from production runs,
    not just the Python API."""
    import yaml
    from pair_allegro_tpu import checkpoint as ckpt
    from pair_allegro_tpu.cli import main
    from pair_allegro_tpu.md import integrate as integrate_mod
    from pair_allegro_tpu.md.integrate import Simulation

    # 500 atoms: the cell-list regime (n > 256), where maybe_shrink applies
    xyz = _small_fcc_xyz(tmp_path, n_rep=5)
    cfg = AllegroConfig(type_names=("Cu",), r_max=4.0, l_max=1, num_layers=1,
                        num_scalar_features=8, num_tensor_features=4,
                        avg_num_neighbors=12.0)
    params = allegro_init(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    model = str(tmp_path / "model.npz")
    ckpt.save_params(model, params, cfg, family="allegro")

    captured = {}

    class SpikeSim(Simulation):
        def __init__(self, system, force_fn, rebuild_fn, **kw):
            assert kw.get("shrink_fn") is not None, "cli did not wire shrink_fn"
            eng = kw["shrink_fn"].__self__
            captured["eng"] = eng
            captured["k0"] = eng.spec.max_neighbors
            # simulated spike: the overflow-regrow path would leave the
            # engine at the inflated capacity exactly like this
            rebuild_fn = kw["grow_fn"](2.0)
            captured["k_spiked"] = eng.spec.max_neighbors
            kw["shrink_every"] = 1
            super().__init__(system, force_fn, rebuild_fn, **kw)

    # cli imports Simulation from the integrate module at call time
    monkeypatch.setattr(integrate_mod, "Simulation", SpikeSim)
    conf = {
        "data": xyz, "model": {"checkpoint": model}, "type_names": ["Cu"],
        "masses": {"Cu": 63.546}, "integrator": "nve", "dt_fs": 1.0,
        "steps": 2, "log_every": 1, "temp_K": 20.0,
    }
    cpath = str(tmp_path / "run.yaml")
    with open(cpath, "w") as f:
        yaml.dump(conf, f)
    assert main(["run", cpath]) == 0
    capsys.readouterr()
    eng = captured["eng"]
    assert eng.spec.strategy == "cell_list"
    assert captured["k_spiked"] > captured["k0"]
    assert eng.spec.max_neighbors == captured["k0"]
