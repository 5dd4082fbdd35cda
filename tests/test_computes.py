"""compute allegro / compute allegro/atom equivalents."""

import numpy as np
import jax.numpy as jnp
import pytest

from pair_allegro_tpu.computes import GlobalCompute, PerAtomCompute
from pair_allegro_tpu.potential import make_potential
from pair_allegro_tpu.system import System


def _toy_potential():
    """Pair potential emitting custom outputs: per-atom 'charges' (extensive
    sum -> global) and per-atom 3-vector 'dipole'."""

    def energy_fn(positions, types, edge_index, *, cell=None, edge_shifts=None,
                  atom_mask=None, edge_mask=None):
        i, j = edge_index[0], edge_index[1]
        r2 = jnp.sum((positions[j] - positions[i]) ** 2, axis=-1)
        e_edge = jnp.where(edge_mask, r2, 0.0) if edge_mask is not None else r2
        e_atom = jnp.zeros(positions.shape[0]).at[i].add(e_edge)
        q = positions[:, 0] * 0.1
        return {
            "total_energy": jnp.sum(e_atom),
            "atomic_energy": e_atom,
            "charges": q[:, None],
            "dipole": positions * q[:, None],
        }

    return make_potential(energy_fn)


def _setup(rng):
    pos = rng.rand(6, 3) * 4
    system = System.create(pos, np.zeros(6, np.int32), cell=np.eye(3) * 4, dtype=jnp.float64)
    ei = np.asarray([[0, 1, 2, 3], [1, 0, 3, 2]], np.int32)
    pot = _toy_potential()
    out = pot(system.positions, system.types, jnp.asarray(ei), compute_virial=False)
    return system, out, pos


def test_global_compute_extensive_sum(rng):
    system, out, pos = _setup(rng)
    c = GlobalCompute("charges", 1)
    np.testing.assert_allclose(float(c(out)[0]), pos[:, 0].sum() * 0.1, rtol=1e-12)
    c3 = GlobalCompute("dipole", 3)
    np.testing.assert_allclose(np.asarray(c3(out)), (pos * (pos[:, [0]] * 0.1)).sum(0), rtol=1e-12)


def test_global_compute_wrong_length(rng):
    system, out, _ = _setup(rng)
    with pytest.raises(ValueError, match="length"):
        GlobalCompute("dipole", 5)(out)


def test_missing_quantity_is_hard_error(rng):
    system, out, _ = _setup(rng)
    with pytest.raises(KeyError, match="polarization"):
        GlobalCompute("polarization", 3)(out)


def test_allegro_charge_head_extras(rng):
    """The built-in extra-output head (output_charges=True): the model emits
    'charges' per atom and an extensive 'dipole' == sum q_i r_i — the
    polarization-style custom output of compute/README.md:7-13."""
    import jax

    from pair_allegro_tpu.models.allegro import AllegroConfig, allegro_energy, allegro_init
    from pair_allegro_tpu.neighbors.naive import neighbor_list_np

    cfg = AllegroConfig(
        type_names=("A",), r_max=3.5, l_max=1, num_layers=2,
        num_scalar_features=8, num_tensor_features=4, avg_num_neighbors=6.0,
        output_charges=True,
    )
    params = allegro_init(jax.random.PRNGKey(1), cfg, dtype=jnp.float64)
    pos = rng.rand(8, 3) * 5
    cell = np.eye(3) * 5
    ei, sh = neighbor_list_np(pos, cell, (True,) * 3, cfg.r_max)
    pot = make_potential(
        lambda p, t, e, **kw: allegro_energy(params, cfg, p, t, e, **kw)
    )
    out = pot(jnp.asarray(pos), jnp.zeros(8, jnp.int32), jnp.asarray(ei),
              cell=jnp.asarray(cell), edge_shifts=jnp.asarray(sh))
    q = np.asarray(out.extras["charges"])
    assert q.shape == (8,) and np.any(q != 0.0)
    np.testing.assert_allclose(
        np.asarray(out.extras["dipole"]), (q[:, None] * pos).sum(0), rtol=1e-10
    )
    # through the compute API
    np.testing.assert_allclose(
        np.asarray(GlobalCompute("dipole", 3)(out)),
        np.asarray(out.extras["dipole"]), rtol=1e-12,
    )
    pa = np.asarray(PerAtomCompute("charges", 1)(out, _sys_of(pos)))
    np.testing.assert_allclose(pa[:, 0], q, rtol=1e-12)


def _sys_of(pos):
    return System.create(
        pos, np.zeros(len(pos), np.int32), cell=np.eye(3) * 5, dtype=jnp.float64
    )


def test_cli_computes_columns(tmp_path, capsys, rng):
    """YAML `computes:` -> thermo column (global) + dump column (per-atom),
    matching the library-level values — the CLI face of compute allegro
    (/root/reference/compute/compute_allegro.cpp:43-64)."""
    import jax
    import yaml

    from pair_allegro_tpu import checkpoint as ckpt
    from pair_allegro_tpu.cli import main
    from pair_allegro_tpu.io.extxyz import write_extxyz
    from pair_allegro_tpu.models.allegro import AllegroConfig, allegro_init

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
                        avg_num_neighbors=12.0, output_charges=True)
    params = allegro_init(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    model = str(tmp_path / "model.npz")
    ckpt.save_params(model, params, cfg, family="allegro")
    conf = {
        "data": xyz, "model": {"checkpoint": model}, "type_names": ["Cu"],
        "masses": {"Cu": 63.546}, "integrator": "nve", "dt_fs": 1.0,
        "steps": 2, "log_every": 2,
        "computes": [
            {"name": "dip", "quantity": "dipole", "style": "global", "length": 3},
            {"name": "q", "quantity": "charges", "style": "atom", "ncols": 1},
        ],
        "dump": {"path": str(tmp_path / "traj.dump"), "every": 2},
    }
    cpath = str(tmp_path / "run.yaml")
    with open(cpath, "w") as f:
        yaml.dump(conf, f)
    assert main(["run", cpath]) == 0
    out = capsys.readouterr().out
    header = next(l for l in out.splitlines() if "c_dip[1]" in l)
    assert "c_dip[2]" in header and "c_dip[3]" in header
    # per-atom compute lands in the dump as a c_q column
    dump_text = (tmp_path / "traj.dump").read_text()
    assert "c_q" in dump_text
    pos = rng.rand(6, 3) * 4
    system = System.create(
        pos, np.zeros(6, np.int32), cell=np.eye(3) * 4, dtype=jnp.float64, pad_to=8
    )
    ei = np.asarray([[0, 1], [1, 0]], np.int32)
    pot = _toy_potential()
    out = pot(system.positions, system.types, jnp.asarray(ei), compute_virial=False)
    arr = np.asarray(PerAtomCompute("dipole", 3)(out, system))
    assert arr.shape == (8, 3)
    assert np.all(arr[6:] == 0.0)  # padded rows zeroed
    np.testing.assert_allclose(arr[:6], pos * (pos[:, [0]] * 0.1), rtol=1e-12)
