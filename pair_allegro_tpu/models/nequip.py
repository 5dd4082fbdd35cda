"""NequIP: equivariant message-passing interatomic potential, TPU-native.

Re-implements the capability of the NequIP architecture (consumed by the
reference as a compiled libtorch artifact via ``pair_style nequip``;
hyperparameters of record in
/root/reference/tests/test_data/test_repro_nequip.yaml:83-100 — l_max=1,
3 message-passing layers, 64 features, radial MLP 2x32).

Unlike Allegro, information propagates ``num_layers`` hops: each layer sends
messages from ALL atoms to ALL atoms within one cutoff, so per-atom energies
depend on neighbors up to num_layers*r_max away.  That is exactly why the
reference forbids MPI parallelism for this pair style
(/root/reference/pair_nequip_allegro.cpp:86-89): one ghost exchange per step
is not enough.  Here the model runs single-device (or with replicated node
state under pjit); the strictly-local Allegro model is the scale-out path.

Uniform irreps layout as in ops/tp.py: node features are (N, C, D) with
D=(l_max+1)^2, every channel carrying one copy of each l.  Message = TP of
neighbor features with edge spherical harmonics, weighted per (channel, path)
by a radial MLP of the edge length (the e3nn "uvu" convolution); update =
species-dependent self-connection + aggregated messages, gated nonlinearity.

Inputs follow the nequip-mode tensor contract (SURVEY §2.8): positions may be
wrapped coordinates with ``edge_cell_shift`` integer lattice offsets and a
``cell`` (pair_nequip_allegro.cpp:604-618,637-649).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from pair_allegro_tpu.ops.mlp import mlp_apply, mlp_dims, mlp_init, silu_norm_const
from pair_allegro_tpu.ops.prec import get_matmul_precision
from pair_allegro_tpu.ops.radial import bessel_basis, polynomial_cutoff
from pair_allegro_tpu.ops.scatter import segment_sum
from pair_allegro_tpu.ops.so3 import sh_dim, sh_slice, spherical_harmonics
from pair_allegro_tpu.ops.tp import paths_to_l, uniform_tp


@dataclasses.dataclass(frozen=True)
class NequIPConfig:
    """Hyperparameters; names follow the nequip training YAML
    (/root/reference/tests/test_data/test_repro_nequip.yaml:83-100)."""

    type_names: tuple[str, ...]
    r_max: float
    l_max: int = 1
    num_layers: int = 3
    num_features: int = 64
    num_bessels: int = 8
    polynomial_cutoff_p: int = 6
    radial_mlp_depth: int = 2
    radial_mlp_width: int = 32
    readout_mlp_depth: int = 1
    readout_mlp_width: int = 32
    avg_num_neighbors: float = 1.0
    remat: bool = True
    per_edge_type_cutoff: tuple | None = None

    @property
    def num_types(self) -> int:
        return len(self.type_names)

    @property
    def feature_dim(self) -> int:
        return sh_dim(self.l_max)

    def cutoff_matrix(self) -> np.ndarray:
        if self.per_edge_type_cutoff is None:
            return np.full((self.num_types, self.num_types), self.r_max)
        m = np.asarray(self.per_edge_type_cutoff, dtype=np.float64)
        assert m.shape == (self.num_types, self.num_types)
        return m


def _num_paths(l_max: int) -> int:
    return sum(len(paths_to_l(l_max, l_max, l3)) for l3 in range(l_max + 1))


def nequip_init(key, cfg: NequIPConfig, dtype=jnp.float32) -> dict:
    nt, C, lmax = cfg.num_types, cfg.num_features, cfg.l_max
    p_total = _num_paths(lmax)
    keys = jax.random.split(key, 4 + (2 * lmax + 8) * cfg.num_layers)
    ki = iter(keys)

    params: dict = {"chem_embed": jax.random.normal(next(ki), (nt, C), dtype=dtype)}
    layers = []
    for _ in range(cfg.num_layers):
        layer = {
            "radial_mlp": mlp_init(
                next(ki),
                mlp_dims(cfg.num_bessels, cfg.radial_mlp_width, cfg.radial_mlp_depth, C * p_total),
                dtype,
            ),
            # species-dependent self-connection (e3nn FullyConnectedTensorProduct
            # of features with the one-hot node attrs), one (nt, C, C) per l
            "self_w": [
                jax.random.normal(next(ki), (nt, C, C), dtype=dtype) for _ in range(lmax + 1)
            ],
            # linear mix of the aggregated message per l
            "mix_w": [
                jax.random.normal(next(ki), (C, C), dtype=dtype) for _ in range(lmax + 1)
            ],
            # gate scalars for the l>0 blocks, from the scalar channels
            "gate_w": jax.random.normal(next(ki), (C, C * max(lmax, 1)), dtype=dtype),
        }
        layers.append(layer)
    params["layers"] = layers
    params["readout_mlp"] = mlp_init(
        next(ki), mlp_dims(C, cfg.readout_mlp_width, cfg.readout_mlp_depth, 1), dtype
    )
    params["per_type_shift"] = jnp.zeros((nt,), dtype=dtype)
    params["per_type_scale"] = jnp.ones((nt,), dtype=dtype)
    return params


def nequip_energy(
    params: dict,
    cfg: NequIPConfig,
    positions,
    types,
    edge_index,
    *,
    cell=None,
    edge_shifts=None,
    atom_mask=None,
    edge_mask=None,
):
    """Per-atom energies under the AtomicDataDict contract (SURVEY §2.8).

    Same signature as ``allegro_energy`` (no center window: message passing
    is global, the reason for the reference's single-rank restriction).
    Edge layouts as in allegro_energy: FLAT (2, E) or TABLE (N, K) j-table
    with center i implicit in the row — the table must cover ALL atoms
    (rows == n_atoms) since messages update every node."""
    n_atoms = positions.shape[0]
    dtype = positions.dtype
    C, lmax = cfg.num_features, cfg.l_max
    table = not (edge_index.ndim == 2 and edge_index.shape[0] == 2)
    if table:
        if edge_index.shape[0] != n_atoms:
            raise ValueError(
                f"nequip table layout needs rows == n_atoms, got "
                f"{edge_index.shape[0]} != {n_atoms}"
            )
        j_idx = edge_index  # (N, K)
        vec = positions[j_idx] - positions[:, None, :]
        t_i, t_j = types[:, None], types[j_idx]

        def agg_edges(e):  # (N, K, ...) -> (N, ...)
            return jnp.sum(e, axis=1)

    else:
        i_idx, j_idx = edge_index[0], edge_index[1]
        vec = positions[j_idx] - positions[i_idx]
        t_i, t_j = types[i_idx], types[j_idx]

        def agg_edges(e):
            return segment_sum(e, i_idx, n_atoms)

    if edge_shifts is not None and cell is not None:
        vec = vec + jnp.dot(
            edge_shifts.astype(dtype), cell.astype(dtype), precision=get_matmul_precision()
        )
    r = jnp.sqrt(jnp.maximum(jnp.sum(vec * vec, axis=-1), 1e-32))

    cut_mat = jnp.asarray(cfg.cutoff_matrix(), dtype=dtype)
    u = polynomial_cutoff(r, cut_mat[t_i, t_j], cfg.polynomial_cutoff_p)
    if edge_mask is not None:
        u = u * edge_mask.astype(dtype)

    Y = spherical_harmonics(vec, lmax)  # (..., D)
    bessel = bessel_basis(r, cfg.r_max, cfg.num_bessels) * u[..., None]

    # initial node features: chemical embedding in the scalar slot
    h = jnp.zeros((n_atoms, C, cfg.feature_dim), dtype)
    h = h.at[:, :, 0].set(params["chem_embed"].astype(dtype)[types])

    inv_sqrt_avg_n = 1.0 / math.sqrt(max(cfg.avg_num_neighbors, 1e-6))
    p_total = _num_paths(lmax)
    act_c = silu_norm_const()

    def layer_fn(layer, h, Y, u, bessel):
        # per-(channel, path) radial weights, envelope-killed on padded edges
        w = mlp_apply(layer["radial_mlp"], bessel) * u[..., None]  # (..., C*P)
        w = w.reshape(*u.shape, C, p_total)
        # message: TP(h_j, Y_ij) with radial weights, per output l
        tp_out = uniform_tp(h[j_idx], Y, lmax)  # list of (..., C, P_l, 2l+1)
        msg_blocks = []
        p_off = 0
        for l3, t in enumerate(tp_out):
            p_l = t.shape[-2]
            w_l = w[..., :, p_off : p_off + p_l]  # (..., C, P_l)
            p_off += p_l
            msg_blocks.append(
                jnp.einsum("...cpk,...cp->...ck", t, w_l, precision=get_matmul_precision())
                * (1.0 / math.sqrt(p_l))
            )
        msg = jnp.concatenate(msg_blocks, axis=-1)  # (..., C, D)
        agg = agg_edges(msg) * inv_sqrt_avg_n  # (N, C, D)

        # species-dependent self-connection + linear mix per l, then gate
        new_blocks = []
        for l3 in range(lmax + 1):
            sl = sh_slice(l3)
            self_w = layer["self_w"][l3].astype(dtype)[types]  # (N, C, C)
            sc = jnp.einsum(
                "ncd,nce->ned", h[:, :, sl], self_w, precision=get_matmul_precision()
            ) * (1.0 / math.sqrt(C))
            mixed = jnp.einsum(
                "ncd,ce->ned", agg[:, :, sl], layer["mix_w"][l3].astype(dtype),
                precision=get_matmul_precision(),
            ) * (1.0 / math.sqrt(C))
            new_blocks.append(sc + mixed)

        scalars = new_blocks[0][:, :, 0]  # (N, C)
        out = jnp.zeros_like(h)
        out = out.at[:, :, 0].set(jax.nn.silu(scalars) * act_c)
        if lmax > 0:
            gates = jax.nn.sigmoid(
                jnp.dot(
                    jax.nn.silu(scalars) * act_c,
                    layer["gate_w"].astype(dtype),
                    precision=get_matmul_precision(),
                )
                * (1.0 / math.sqrt(C))
            ).reshape(-1, C, lmax)  # (N, C, lmax)
            for l3 in range(1, lmax + 1):
                out = out.at[:, :, sh_slice(l3)].set(
                    new_blocks[l3] * gates[:, :, l3 - 1 : l3]
                )
        return out

    if cfg.remat:
        layer_fn = jax.checkpoint(layer_fn)
    for layer in params["layers"]:
        h = layer_fn(layer, h, Y, u, bessel)

    e_atom = mlp_apply(params["readout_mlp"], h[:, :, 0])[:, 0]  # (N,)
    scale = params["per_type_scale"].astype(dtype)[types]
    shift = params["per_type_shift"].astype(dtype)[types]
    e_atom = scale * e_atom + shift
    if atom_mask is not None:
        e_atom = e_atom * atom_mask.astype(dtype)
    return {
        "atomic_energy": e_atom,
        "total_energy": jnp.sum(e_atom),
    }
