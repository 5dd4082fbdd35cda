"""Torch twin of the Allegro model — the trained-checkpoint oracle.

The reference's ground truth is the *Python* nequip model evaluated through
ASE (`NequIPCalculator`, /root/reference/tests/conftest.py:196-201); LAMMPS
must reproduce it.  This module plays the same role for the TPU framework:
an independent torch implementation of the Allegro architecture whose
``state_dict`` follows the upstream naming shape (Lightning ``state_dict``
nesting, ``model.`` prefix, dotted ``nn.Module`` paths, ``nn.Linear``
(out, in) weight orientation).  It exists so that

* the torch-checkpoint importer (`pair_allegro_tpu.import_torch`) is
  exercised against a REAL torch ``nn.Module`` checkpoint, not hand-rolled
  tensor dicts — every mechanism a trained upstream artifact would hit
  (prefix stripping, dotted paths, transposes, per-layer numbering) is on
  the test path;
* layer-by-layer activation parity (two-body latent, per-layer latents and
  invariants, per-edge readout, per-atom energies) and end-to-end
  energy/force parity (torch autograd vs jax autodiff) can be asserted at
  f64, the activation-parity harness SURVEY §7 calls for.

torch is an OFFLINE dependency: nothing in the MD runtime imports this
module (mirrors the reference pipeline where nequip-compile runs offline,
/root/reference/tests/conftest.py:141-171).

Math parity contract: every formula matches ``models/allegro.py`` —
run-time 1/sqrt(fan_in) weight scaling and the silu variance constant
(`ops/mlp.py`), component-normalized real spherical harmonics and
numerically-derived real Wigner-3j blocks (`ops/so3.py`), the packed
all-paths tensor product (`ops/tp.py`).  The Wigner/packed-TP constant
tables are shared with the JAX side (they are plain numpy) so conventions
cannot drift.
"""

from __future__ import annotations

import math

import numpy as np

from pair_allegro_tpu.ops.mlp import silu_norm_const
from pair_allegro_tpu.ops.so3 import sh_dim
from pair_allegro_tpu.ops.tp import packed_tp_table, paths_to_l


def _torch():
    try:
        import torch
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "pair_allegro_tpu.torch_ref requires torch (offline/test use only)"
        ) from e
    return torch


def _sh_torch(vecs, lmax: int):
    """Real spherical harmonics (component norm) — torch port of
    ops/so3._sh_impl on normalized vectors."""
    torch = _torch()
    from pair_allegro_tpu.ops.so3 import _sh_norm_consts

    r = torch.sqrt(torch.clamp((vecs * vecs).sum(-1), min=1e-30))
    v = vecs / r[..., None]
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    norms = _sh_norm_consts(lmax)
    C = [torch.ones_like(x)]
    S = [torch.zeros_like(x)]
    for m in range(1, lmax + 1):
        C.append(x * C[m - 1] - y * S[m - 1])
        S.append(x * S[m - 1] + y * C[m - 1])
    P = {(0, 0): torch.ones_like(z)}
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
            comps.append(n * P[(l, am)] * (S[am] if m < 0 else C[am] if m > 0 else 1.0))
    return torch.stack(
        [c if isinstance(c, type(x)) else c * torch.ones_like(x) for c in comps], dim=-1
    )


def build_torch_allegro(cfg, dtype=None, seed: int = 0):
    """Construct the torch twin for an AllegroConfig.  Returns an nn.Module
    whose ``state_dict`` keys follow the upstream shape (see module doc and
    ``import_torch.upstream_allegro_key_map``)."""
    torch = _torch()
    nn = torch.nn
    dtype = dtype or torch.float64
    torch.manual_seed(seed)

    nt, ns, C = cfg.num_types, cfg.num_scalar_features, cfg.num_tensor_features
    lmax = cfg.l_max
    D = sh_dim(lmax)
    W3_np, layout = packed_tp_table(lmax, lmax, lmax, getattr(cfg, "parity", False))
    p0 = layout[0][1]

    def linear(i, o):
        return nn.Linear(i, o, bias=False, dtype=dtype)

    def mlp(dims):
        m = nn.Module()
        m.layers = nn.ModuleList([linear(dims[i], dims[i + 1]) for i in range(len(dims) - 1)])
        return m

    def mlp_forward(m, x):
        n = len(m.layers)
        for i, lin in enumerate(m.layers):
            x = lin(x) * (1.0 / math.sqrt(lin.in_features))
            if i < n - 1:
                x = torch.nn.functional.silu(x) * silu_norm_const()
        return x

    class TorchAllegro(nn.Module):
        def __init__(self):
            super().__init__()
            from pair_allegro_tpu.ops.mlp import mlp_dims

            embed = nn.Module()
            embed.two_body_mlp = mlp(
                mlp_dims(2 * nt + cfg.num_bessels, cfg.two_body_mlp_width,
                         cfg.two_body_mlp_depth, ns)
            )
            self.radial_chemical_embed = embed
            self.tensor_embed = linear(ns, C)
            self.layers = nn.ModuleList()
            for _ in range(cfg.num_layers):
                layer = nn.Module()
                layer.env_embed = linear(ns, C)
                layer.latent_mlp = mlp(
                    mlp_dims(ns + C * p0, cfg.allegro_mlp_hidden_layers_width,
                             cfg.allegro_mlp_hidden_layers_depth, ns)
                )
                tp_mix = nn.Module()
                for l3, (_, p) in enumerate(layout):
                    setattr(tp_mix, f"l{l3}", linear(C * p, C))
                layer.tp_mix = tp_mix
                self.layers.append(layer)
            self.readout_mlp = mlp(
                mlp_dims(ns, cfg.readout_mlp_hidden_layers_width,
                         cfg.readout_mlp_hidden_layers_depth, 1)
            )
            self.per_type_energy_shifts = nn.Parameter(torch.zeros(nt, dtype=dtype))
            self.per_type_energy_scales = nn.Parameter(torch.ones(nt, dtype=dtype))
            self.register_buffer("w3j_packed", torch.as_tensor(W3_np, dtype=dtype))
            self.register_buffer(
                "cutoff_matrix", torch.as_tensor(cfg.cutoff_matrix(), dtype=dtype)
            )

        def forward(self, positions, types, edge_index, cell=None, edge_shifts=None,
                    capture: dict | None = None):
            """Per-atom energies; mirrors allegro_energy's FLAT (2, E) path.

            Returns dict with atomic_energy (N,), total_energy (), plus — when
            `capture` is a dict — the named intermediates for the
            layer-by-layer parity harness.
            """
            i_idx, j_idx = edge_index[0], edge_index[1]
            n_atoms = positions.shape[0]
            vec = positions[j_idx] - positions[i_idx]
            if edge_shifts is not None and cell is not None:
                vec = vec + edge_shifts.to(positions.dtype) @ cell.to(positions.dtype)
            r = torch.sqrt(torch.clamp((vec * vec).sum(-1), min=1e-32))
            t_i, t_j = types[i_idx], types[j_idx]

            # per-edge-type polynomial cutoff (pair_nequip_allegro.cpp:303-328)
            p = cfg.polynomial_cutoff_p
            x_c = torch.clamp(r / self.cutoff_matrix[t_i, t_j], 0.0, 1.0)
            xp = x_c**p
            u = torch.where(
                x_c < 1.0,
                1.0 - 0.5 * (p + 1.0) * (p + 2.0) * xp + p * (p + 2.0) * xp * x_c
                - 0.5 * p * (p + 1.0) * xp * x_c**2,
                torch.zeros_like(x_c),
            )
            Y = _sh_torch(vec, lmax)
            n_b = torch.arange(1, cfg.num_bessels + 1, dtype=r.dtype)
            r_safe = torch.clamp(r, min=1e-8)[..., None]
            bessel = (
                math.sqrt(2.0 / cfg.r_max)
                * torch.sin(n_b * (math.pi / cfg.r_max) * r_safe) / r_safe
            ) * u[..., None]

            onehot = torch.eye(nt, dtype=r.dtype)
            x = mlp_forward(
                self.radial_chemical_embed.two_body_mlp,
                torch.cat([onehot[t_i], onehot[t_j], bessel], dim=-1),
            ) * u[..., None]
            if capture is not None:
                capture["two_body_latent"] = x

            p_embed = self.tensor_embed(x) * (1.0 / math.sqrt(ns))
            V = p_embed[..., :, None] * Y[..., None, :]  # (E, C, D)

            inv_sqrt_avg_n = 1.0 / math.sqrt(max(cfg.avg_num_neighbors, 1e-6))
            for k, layer in enumerate(self.layers):
                w_env = layer.env_embed(x) * (1.0 / math.sqrt(ns)) * u[..., None]
                env_edges = w_env[..., :, None] * Y[..., None, :]
                env = torch.zeros(n_atoms, C, D, dtype=r.dtype)
                env.index_add_(0, i_idx, env_edges)
                env = env * inv_sqrt_avg_n
                env_e = env[i_idx]
                # all-paths channelwise TP as one packed matmul (ops/tp.py)
                outer = (V[..., :, None] * env_e[..., None, :]).reshape(-1, C, D * D)
                T = outer @ self.w3j_packed  # (E, C, OUT) packed l3-major
                inv = T[..., :p0].reshape(-1, C * p0)
                pieces = []
                for l3, (off, pl) in enumerate(layout):
                    k3 = 2 * l3 + 1
                    t = T[..., off : off + pl * k3].reshape(-1, C, pl, k3)
                    t = t.movedim(-1, -3).reshape(-1, k3, C * pl)
                    lin = getattr(layer.tp_mix, f"l{l3}")
                    m = lin(t) * (1.0 / math.sqrt(C * pl))
                    pieces.append(m.movedim(-1, -2))
                V = torch.cat(pieces, dim=-1)
                x_new = mlp_forward(layer.latent_mlp, torch.cat([x, inv], dim=-1))
                x = (x + x_new * u[..., None]) * (1.0 / math.sqrt(2.0))
                if capture is not None:
                    capture[f"layer{k}/invariants"] = inv
                    capture[f"layer{k}/latent"] = x

            e_edge = mlp_forward(self.readout_mlp, x)[..., 0] * u
            e_atom = torch.zeros(n_atoms, dtype=r.dtype)
            e_atom.index_add_(0, i_idx, e_edge)
            e_atom = self.per_type_energy_scales[types] * e_atom \
                + self.per_type_energy_shifts[types]
            if capture is not None:
                capture["edge_energy"] = e_edge
                capture["atomic_energy"] = e_atom
            return {"atomic_energy": e_atom, "total_energy": e_atom.sum()}

    return TorchAllegro()


def torch_forces(model, positions, types, edge_index, cell=None, edge_shifts=None):
    """(energy, forces) via torch autograd — the oracle's force path (the
    reference model embeds the same autograd,
    /root/reference/pair_nequip_allegro.cpp:358-363)."""
    torch = _torch()
    pos = positions.clone().requires_grad_(True)
    out = model(pos, types, edge_index, cell=cell, edge_shifts=edge_shifts)
    (grad,) = torch.autograd.grad(out["total_energy"], pos)
    return out["total_energy"].detach(), -grad


def save_lightning_checkpoint(model, path: str, epoch: int = 7) -> None:
    """Write the Lightning-shaped training checkpoint the upstream pipeline
    produces (`last.ckpt`: {'state_dict': {'model.<module path>': tensor}},
    /root/reference/tests/conftest.py:139)."""
    torch = _torch()
    sd = {"model." + k: v for k, v in model.state_dict().items()}
    torch.save({"state_dict": sd, "epoch": epoch, "global_step": 123}, path)


def e3nn_pack_allegro_state(model, cfg) -> dict:
    """Repack the standard twin's weights into e3nn-STYLE storage layout —
    the adversarial second import fixture (see
    ``import_torch.e3nn_allegro_key_map`` for the layout contract and the
    documented remaining unknowns).

    The returned dict is a real torch state dict whose tensors are packed the
    way e3nn modules store theirs:

    * every MLP layer key is a bare ``Sequential`` index
      (``...two_body_mlp.0.weight``) holding the (h_in, h_out)-oriented
      weight — ``e3nn.nn.FullyConnectedNet``'s ``_Layer`` convention, the
      TRANSPOSE of ``torch.nn.Linear``;
    * ``tensor_embed`` / ``env_embed`` are flat 1-D (in·out,) tensors —
      single-instruction ``e3nn.o3.Linear`` flat weights;
    * each layer's per-l tp-mix matrices concatenate into ONE flat
      ``layers.{k}.tp_mix.weight`` — the multi-instruction irreps-block
      concatenation of ``e3nn.o3.Linear``.

    The ORACLE for an import through this layout is ``model`` itself: the
    packing is lossless, so the imported JAX params must reproduce the
    standard twin's activations/forces exactly (tests/test_torch_parity.py).
    """
    torch = _torch()
    sd = model.state_dict()
    out: dict = {}

    def _mlp(theirs_std: str, theirs_e3nn: str, n_linear: int):
        for i in range(n_linear):
            w = sd[f"{theirs_std}.layers.{i}.weight"]  # (out, in)
            out[f"{theirs_e3nn}.{i}.weight"] = w.t().contiguous()

    _mlp("radial_chemical_embed.two_body_mlp",
         "radial_chemical_embed.two_body_mlp", cfg.two_body_mlp_depth + 1)
    out["tensor_embed.weight"] = sd["tensor_embed.weight"].t().reshape(-1) \
        .contiguous()
    for k in range(cfg.num_layers):
        out[f"layers.{k}.env_embed.weight"] = (
            sd[f"layers.{k}.env_embed.weight"].t().reshape(-1).contiguous()
        )
        _mlp(f"layers.{k}.latent_mlp", f"layers.{k}.latent_mlp",
             cfg.allegro_mlp_hidden_layers_depth + 1)
        blocks = []
        for l3 in range(cfg.l_max + 1):
            w = sd[f"layers.{k}.tp_mix.l{l3}.weight"]  # (C, C*pl)
            blocks.append(w.t().reshape(-1))  # (C*pl, C) flattened row-major
        out[f"layers.{k}.tp_mix.weight"] = torch.cat(blocks).contiguous()
    _mlp("readout_mlp", "readout_mlp",
         cfg.readout_mlp_hidden_layers_depth + 1)
    out["per_type_energy_shifts"] = sd["per_type_energy_shifts"]
    out["per_type_energy_scales"] = sd["per_type_energy_scales"]
    return out


def save_e3nn_style_checkpoint(model, cfg, path: str) -> None:
    """Lightning-shaped checkpoint with e3nn-style packed weights (the
    adversarial layout of ``e3nn_pack_allegro_state``)."""
    torch = _torch()
    sd = {"model." + k: v for k, v in e3nn_pack_allegro_state(model, cfg).items()}
    torch.save({"state_dict": sd, "epoch": 7, "global_step": 123}, path)


def e3nn_pack_nequip_state(model, cfg) -> dict:
    """Repack the NequIP twin's weights into e3nn-STYLE storage layout — the
    adversarial import fixture for ``pair_style nequip`` checkpoints (see
    ``import_torch.e3nn_nequip_key_map`` for the layout contract; mirrors
    ``e3nn_pack_allegro_state`` for Allegro).

    The packed dict is a real torch state dict laid out the way e3nn modules
    store NequIP weights:

    * the radial MLP is an indexed ``Sequential`` (``...radial_mlp.{i}.weight``)
      of (h_in, h_out)-oriented layers — ``e3nn.nn.FullyConnectedNet``'s
      convention, the TRANSPOSE of ``torch.nn.Linear``;
    * each layer's per-irrep linears concatenate into ONE flat
      ``layers.{k}.linear.weight`` — multi-instruction ``e3nn.o3.Linear``,
      per-l (C_in, C_out) blocks in irrep order (l-major, even track then odd);
    * the per-type self-connection packs as a flat
      ``layers.{k}.self_interaction.weight`` of per-instruction
      (mul_in1=C, mul_in2=num_types, mul_out=C) blocks — e3nn's
      ``FullyConnectedTensorProduct`` axis order, a PERMUTATION of the twin's
      (num_types, C, C) storage, same l-major/even-odd instruction order;
    * the gate linear is a single-instruction scalar ``o3.Linear``: one flat
      (C · C·max(l_max,1)·n_tracks,) tensor in (in, out) orientation.

    The ORACLE is ``model`` itself — the packing is lossless, so the import
    must reproduce the twin's activations and autograd forces exactly
    (tests/test_torch_parity.py::test_e3nn_packed_nequip_import_parity).
    """
    torch = _torch()
    sd = model.state_dict()
    out: dict = {}
    lmax = cfg.l_max
    parity = bool(getattr(cfg, "parity", False))

    def _mlp(theirs_std: str, theirs_e3nn: str, n_linear: int):
        for i in range(n_linear):
            w = sd[f"{theirs_std}.layers.{i}.weight"]  # (out, in)
            out[f"{theirs_e3nn}.{i}.weight"] = w.t().contiguous()

    out["chemical_embedding"] = sd["chemical_embedding"]
    for k in range(cfg.num_layers):
        _mlp(f"layers.{k}.radial_mlp", f"layers.{k}.radial_mlp",
             cfg.radial_mlp_depth + 1)
        lin_blocks, self_blocks = [], []
        for l3 in range(lmax + 1):
            # even track, then the odd twin of the same l (instruction order)
            lin_blocks.append(sd[f"layers.{k}.linear.{l3}.weight"].t().reshape(-1))
            self_blocks.append(
                sd[f"layers.{k}.self_interaction.{l3}"]
                .permute(1, 0, 2).reshape(-1)  # (nt,C,C) -> (C,nt,C) flat
            )
            if parity:
                lin_blocks.append(
                    sd[f"layers.{k}.linear_o.{l3}.weight"].t().reshape(-1)
                )
                self_blocks.append(
                    sd[f"layers.{k}.self_interaction_o.{l3}"]
                    .permute(1, 0, 2).reshape(-1)
                )
        out[f"layers.{k}.linear.weight"] = torch.cat(lin_blocks).contiguous()
        out[f"layers.{k}.self_interaction.weight"] = (
            torch.cat(self_blocks).contiguous()
        )
        out[f"layers.{k}.gate.weight"] = (
            sd[f"layers.{k}.gate.weight"].t().reshape(-1).contiguous()
        )
    _mlp("readout_mlp", "readout_mlp", cfg.readout_mlp_depth + 1)
    out["per_type_energy_shifts"] = sd["per_type_energy_shifts"]
    out["per_type_energy_scales"] = sd["per_type_energy_scales"]
    return out


def save_e3nn_style_nequip_checkpoint(model, cfg, path: str) -> None:
    """Lightning-shaped checkpoint with e3nn-style packed NequIP weights
    (the adversarial layout of ``e3nn_pack_nequip_state``)."""
    torch = _torch()
    sd = {"model." + k: v for k, v in e3nn_pack_nequip_state(model, cfg).items()}
    torch.save({"state_dict": sd, "epoch": 7, "global_step": 123}, path)


def build_torch_nequip(cfg, dtype=None, seed: int = 0):
    """Torch twin of the NequIP model (models/nequip.py) with upstream-shaped
    ``state_dict`` naming — the trained-checkpoint oracle for
    ``pair_style nequip`` imports (see ``import_torch.upstream_nequip_key_map``)."""
    torch = _torch()
    nn = torch.nn
    dtype = dtype or torch.float64
    torch.manual_seed(seed)

    nt, C, lmax = cfg.num_types, cfg.num_features, cfg.l_max
    D = sh_dim(lmax)
    p_per_l = [len(paths_to_l(lmax, lmax, l3)) for l3 in range(lmax + 1)]
    p_total = sum(p_per_l)
    parity = bool(getattr(cfg, "parity", False))
    n_tracks = 2 if parity else 1

    def linear(i, o):
        return nn.Linear(i, o, bias=False, dtype=dtype)

    def mlp(dims):
        m = nn.Module()
        m.layers = nn.ModuleList(
            [linear(dims[i], dims[i + 1]) for i in range(len(dims) - 1)]
        )
        return m

    def mlp_forward(m, x):
        n = len(m.layers)
        for i, lin in enumerate(m.layers):
            x = lin(x) * (1.0 / math.sqrt(lin.in_features))
            if i < n - 1:
                x = torch.nn.functional.silu(x) * silu_norm_const()
        return x

    from pair_allegro_tpu.ops.mlp import mlp_dims
    from pair_allegro_tpu.ops.so3 import sh_slice
    from pair_allegro_tpu.ops.tp import real_wigner_3j  # noqa: F401  (via so3)

    class TorchNequIP(nn.Module):
        def __init__(self):
            super().__init__()
            self.chemical_embedding = nn.Parameter(
                torch.randn(nt, C, dtype=dtype)
            )
            self.layers = nn.ModuleList()
            for _ in range(cfg.num_layers):
                layer = nn.Module()
                layer.radial_mlp = mlp(
                    mlp_dims(cfg.num_bessels, cfg.radial_mlp_width,
                             cfg.radial_mlp_depth, C * p_total * n_tracks)
                )
                layer.self_interaction = nn.ParameterList(
                    [nn.Parameter(torch.randn(nt, C, C, dtype=dtype))
                     for _ in range(lmax + 1)]
                )
                layer.linear = nn.ModuleList(
                    [linear(C, C) for _ in range(lmax + 1)]
                )
                layer.gate = linear(C, C * max(lmax, 1) * n_tracks)
                if parity:
                    layer.self_interaction_o = nn.ParameterList(
                        [nn.Parameter(torch.randn(nt, C, C, dtype=dtype))
                         for _ in range(lmax + 1)]
                    )
                    layer.linear_o = nn.ModuleList(
                        [linear(C, C) for _ in range(lmax + 1)]
                    )
                self.layers.append(layer)
            self.readout_mlp = mlp(
                mlp_dims(C, cfg.readout_mlp_width, cfg.readout_mlp_depth, 1)
            )
            self.per_type_energy_shifts = nn.Parameter(torch.zeros(nt, dtype=dtype))
            self.per_type_energy_scales = nn.Parameter(torch.ones(nt, dtype=dtype))
            self.register_buffer(
                "cutoff_matrix", torch.as_tensor(cfg.cutoff_matrix(), dtype=dtype)
            )

        def forward(self, positions, types, edge_index, cell=None, edge_shifts=None):
            from pair_allegro_tpu.ops.so3 import real_wigner_3j

            i_idx, j_idx = edge_index[0], edge_index[1]
            n_atoms = positions.shape[0]
            vec = positions[j_idx] - positions[i_idx]
            if edge_shifts is not None and cell is not None:
                vec = vec + edge_shifts.to(positions.dtype) @ cell.to(positions.dtype)
            r = torch.sqrt(torch.clamp((vec * vec).sum(-1), min=1e-32))
            t_i, t_j = types[i_idx], types[j_idx]
            p = cfg.polynomial_cutoff_p
            x_c = torch.clamp(r / self.cutoff_matrix[t_i, t_j], 0.0, 1.0)
            xp = x_c**p
            u = torch.where(
                x_c < 1.0,
                1.0 - 0.5 * (p + 1.0) * (p + 2.0) * xp + p * (p + 2.0) * xp * x_c
                - 0.5 * p * (p + 1.0) * xp * x_c**2,
                torch.zeros_like(x_c),
            )
            Y = _sh_torch(vec, lmax)
            n_b = torch.arange(1, cfg.num_bessels + 1, dtype=r.dtype)
            r_safe = torch.clamp(r, min=1e-8)[..., None]
            bessel = (
                math.sqrt(2.0 / cfg.r_max)
                * torch.sin(n_b * (math.pi / cfg.r_max) * r_safe) / r_safe
            ) * u[..., None]

            inv_avg = 1.0 / math.sqrt(max(cfg.avg_num_neighbors, 1e-6))
            act_c = silu_norm_const()
            if parity:
                return self._forward_parity(
                    n_atoms, types, i_idx, j_idx, r, u, Y, bessel, inv_avg, act_c
                )
            h = torch.zeros(n_atoms, C, D, dtype=r.dtype)
            h[:, :, 0] = self.chemical_embedding[types]

            for layer in self.layers:
                w = mlp_forward(layer.radial_mlp, bessel) * u[..., None]
                w = w.reshape(-1, C, p_total)
                hj = h[j_idx]
                msg_blocks = []
                p_off = 0
                for l3 in range(lmax + 1):
                    paths = paths_to_l(lmax, lmax, l3)
                    blocks = []
                    for (l1, l2) in paths:
                        C3 = torch.as_tensor(
                            real_wigner_3j(l1, l2, l3), dtype=r.dtype
                        )
                        blocks.append(torch.einsum(
                            "eci,ej,ijk->eck",
                            hj[..., sh_slice(l1)], Y[..., sh_slice(l2)], C3,
                        ))
                    t = torch.stack(blocks, dim=-2)  # (E, C, P_l, 2l+1)
                    w_l = w[..., p_off : p_off + len(paths)]
                    p_off += len(paths)
                    msg_blocks.append(
                        torch.einsum("ecpk,ecp->eck", t, w_l)
                        * (1.0 / math.sqrt(len(paths)))
                    )
                msg = torch.cat(msg_blocks, dim=-1)  # (E, C, D)
                agg = torch.zeros(n_atoms, C, D, dtype=r.dtype)
                agg.index_add_(0, i_idx, msg)
                agg = agg * inv_avg

                new_blocks = []
                for l3 in range(lmax + 1):
                    sl = sh_slice(l3)
                    self_w = layer.self_interaction[l3][types]  # (N, C, C)
                    sc = torch.einsum("ncd,nce->ned", h[:, :, sl], self_w) * (
                        1.0 / math.sqrt(C)
                    )
                    mixed = torch.einsum(
                        "ncd,ec->ned", agg[:, :, sl], layer.linear[l3].weight
                    ) * (1.0 / math.sqrt(C))
                    new_blocks.append(sc + mixed)
                scalars = new_blocks[0][:, :, 0]
                out = torch.zeros_like(h)
                out[:, :, 0] = torch.nn.functional.silu(scalars) * act_c
                if lmax > 0:
                    gates = torch.sigmoid(
                        (torch.nn.functional.silu(scalars) * act_c)
                        @ layer.gate.weight.T * (1.0 / math.sqrt(C))
                    ).reshape(-1, C, lmax)
                    for l3 in range(1, lmax + 1):
                        out[:, :, sh_slice(l3)] = (
                            new_blocks[l3] * gates[:, :, l3 - 1 : l3]
                        )
                h = out

            e_atom = mlp_forward(self.readout_mlp, h[:, :, 0])[:, 0]
            e_atom = self.per_type_energy_scales[types] * e_atom \
                + self.per_type_energy_shifts[types]
            return {"atomic_energy": e_atom, "total_energy": e_atom.sum()}

        def _forward_parity(self, n_atoms, types, i_idx, j_idx, r, u, Y,
                            bessel, inv_avg, act_c):
            """Two-track (e/o) layers — math parity contract: mirrors
            models/nequip.py layer_fn_parity exactly (routing
            pi XOR (l2 mod 2), per-track self/mix, even-scalar gates,
            normalized tanh odd scalars)."""
            from pair_allegro_tpu.ops.so3 import real_wigner_3j
            from pair_allegro_tpu.models.nequip import _ParityRouting

            torch_ = torch
            tanh_c = 1.5926
            routing = _ParityRouting.build(lmax)
            h = torch_.zeros(n_atoms, C, D, 2, dtype=r.dtype)
            h[:, :, 0, 0] = self.chemical_embedding[types]
            for layer in self.layers:
                w = mlp_forward(layer.radial_mlp, bessel) * u[..., None]
                w = w.reshape(-1, C, 2, p_total)
                hj = h[j_idx]  # (E, C, D, 2)
                tp = []
                for pi in (0, 1):
                    per_l = []
                    for l3 in range(lmax + 1):
                        blocks = []
                        for (l1, l2) in paths_to_l(lmax, lmax, l3):
                            C3 = torch_.as_tensor(
                                real_wigner_3j(l1, l2, l3), dtype=r.dtype
                            )
                            blocks.append(torch_.einsum(
                                "eci,ej,ijk->eck",
                                hj[..., sh_slice(l1), pi], Y[..., sh_slice(l2)],
                                C3,
                            ))
                        per_l.append(torch_.stack(blocks, dim=-2))
                    tp.append(per_l)
                p_off = 0
                msg_tracks = [[], []]
                for l3 in range(lmax + 1):
                    p_l = len(paths_to_l(lmax, lmax, l3))
                    for tau in (0, 1):
                        contribs = routing.table[l3][tau]
                        norm = 1.0 / math.sqrt(max(len(contribs), 1))
                        acc = None
                        for pi in (0, 1):
                            sel = [p for (q, p) in contribs if q == pi]
                            if not sel:
                                continue
                            t = tp[pi][l3][..., :, sel, :]
                            w_sel = w[..., :, pi, [p_off + p for p in sel]]
                            term = torch_.einsum("ecpk,ecp->eck", t, w_sel)
                            acc = term if acc is None else acc + term
                        msg_tracks[tau].append(acc * norm)
                    p_off += p_l
                msg = torch_.stack(
                    [torch_.cat(b, dim=-1) for b in msg_tracks], dim=-1
                )  # (E, C, D, 2)
                agg = torch_.zeros(n_atoms, C, D, 2, dtype=r.dtype)
                agg.index_add_(0, i_idx, msg)
                agg = agg * inv_avg

                new_blocks = [[], []]
                for tau, (si, li) in enumerate((
                    (layer.self_interaction, layer.linear),
                    (layer.self_interaction_o, layer.linear_o),
                )):
                    for l3 in range(lmax + 1):
                        sl = sh_slice(l3)
                        self_w = si[l3][types]
                        sc = torch_.einsum(
                            "ncd,nce->ned", h[:, :, sl, tau], self_w
                        ) * (1.0 / math.sqrt(C))
                        mixed = torch_.einsum(
                            "ncd,ec->ned", agg[:, :, sl, tau], li[l3].weight
                        ) * (1.0 / math.sqrt(C))
                        new_blocks[tau].append(sc + mixed)
                s_even = new_blocks[0][0][:, :, 0]
                s_odd = new_blocks[1][0][:, :, 0]
                act_even = torch_.nn.functional.silu(s_even) * act_c
                out = torch_.zeros_like(h)
                out[:, :, 0, 0] = act_even
                out[:, :, 0, 1] = torch_.tanh(s_odd) * tanh_c
                if lmax > 0:
                    gates = torch_.sigmoid(
                        act_even @ layer.gate.weight.T * (1.0 / math.sqrt(C))
                    ).reshape(-1, C, lmax, 2)
                    for tau in (0, 1):
                        for l3 in range(1, lmax + 1):
                            out[:, :, sh_slice(l3), tau] = (
                                new_blocks[tau][l3] * gates[:, :, l3 - 1 : l3, tau]
                            )
                h = out
            e_atom = mlp_forward(self.readout_mlp, h[:, :, 0, 0])[:, 0]
            e_atom = self.per_type_energy_scales[types] * e_atom \
                + self.per_type_energy_shifts[types]
            return {"atomic_energy": e_atom, "total_energy": e_atom.sum()}

    return TorchNequIP()
