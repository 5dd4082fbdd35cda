"""Allegro: strictly-local equivariant interatomic potential, TPU-native.

Re-implements the capability of ``allegro.model.AllegroModel`` (consumed by
the reference as a compiled libtorch artifact; hyperparameters of record in
/root/reference/tests/test_data/test_repro_allegro.yaml:79-103) as functional
JAX.  Strict locality is the property the reference's MPI path depends on
(/root/reference/pair_nequip_allegro.cpp:86-89): every output atomic energy
depends only on positions within one cutoff of that atom, so a single halo
exchange per step suffices — the same property our shard_map halo path uses.

Architecture (per ordered edge (i,j), both directions present, as in the
reference's FULL neighbor list, pair_nequip_allegro.cpp:143-147):

  two-body: x0 = MLP2b([onehot(t_i), onehot(t_j), Bessel(r_ij)]) * u(r_ij)
            V0[c] = (x0 @ W_embed)[c] * Y(r̂_ij)              (uniform layout)
  layer k:  w_env = x @ W_k                                    (E, C)
            env_i = Σ_{k∈N(i)} w_env ⊗ Y(r̂_ik) / sqrt(avg_n)  (N, C, D)
            T     = V ⊗_CG env_i  (channelwise; even-parity paths by default)
            x     = (x + MLP_k([x, invariants(T)]) * u(r_ij)) / sqrt(2)
            V     = mix_k(T)                                   (E, C, D)
  readout:  E_ij = MLP_out(x) ;  E_i = Σ_j E_ij
            E_i  = scale[t_i] * E_i + shift[t_i]               (masked)

The model computes energies only; forces/virial come from autodiff in
``pair_allegro_tpu.potential`` (the reference gets them from the model's
embedded autograd, pair_nequip_allegro.cpp:358-363).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from pair_allegro_tpu.ops.mlp import mlp_apply, mlp_dims, mlp_init
from pair_allegro_tpu.ops.prec import get_matmul_precision
from pair_allegro_tpu.ops.radial import bessel_basis, polynomial_cutoff
from pair_allegro_tpu.ops.scatter import segment_sum
from pair_allegro_tpu.ops.so3 import sh_dim, spherical_harmonics
from pair_allegro_tpu.ops.tp import (
    num_paths_per_l,
    scalar_part,
    tp_mix_apply,
    tp_mix_init,
    uniform_tp,
)


@dataclasses.dataclass(frozen=True)
class AllegroConfig:
    """Hyperparameters; field names follow the allegro training YAML
    (/root/reference/tests/test_data/test_repro_allegro.yaml:79-103)."""

    type_names: tuple[str, ...]
    r_max: float
    l_max: int = 2
    num_layers: int = 3
    num_scalar_features: int = 64
    num_tensor_features: int = 32
    num_bessels: int = 8
    polynomial_cutoff_p: int = 6
    two_body_mlp_depth: int = 2
    two_body_mlp_width: int = 64
    allegro_mlp_hidden_layers_depth: int = 2
    allegro_mlp_hidden_layers_width: int = 64
    readout_mlp_hidden_layers_depth: int = 1
    readout_mlp_hidden_layers_width: int = 32
    avg_num_neighbors: float = 1.0
    # rematerialize each layer in the backward pass: the per-edge tensor
    #-product intermediates are the HBM peak (E*C*51 floats/layer at l_max=2);
    # remat trades ~1 extra layer-forward of FLOPs for O(num_layers) less
    # activation memory — the standard TPU memory/compute trade.
    # "auto": the engine resolves it from the edge-count memory estimate
    # (False when residuals fit comfortably — measured ~1.5x faster with the
    # fused kernel); treated as True when unresolved.
    remat: bool | str = "auto"
    # interior compute dtype for the layer stack: "working" (= positions
    # dtype; the accurate tier, max|dF| 2.1e-5 eV/A vs f64) or "bf16"
    # (~6.6e-3 eV/A vs f32).  bf16 runs natively through the fused kernels
    # (round-1's Mosaic fault is gone in the env-fused design) but measures
    # NO FASTER on v5e (81.8 vs 76.5 ms/step at the bench config): once the
    # environment is fused in-kernel the interior is VPU-FMA-bound, not
    # HBM-bound, and bf16 does not increase VPU throughput.  Kept for
    # memory-constrained cases (halves per-edge residual memory).
    interior: str = "working"
    # fused Pallas TP+mix kernel (ops/pallas_tp.py): ~5x the XLA per-path
    # lowering on TPU (edges-in-lanes layout, T never leaves VMEM); exact
    # for forces, but its custom VJP NaN-poisons weight gradients (loud
    # failure) — disable for any training-style differentiation w.r.t.
    # params.
    fused_tp: bool = True
    # fully-fused layer-STACK Pallas kernel (ops/pallas_stack.py): the whole
    # interior (env aggregation + TP + mix + latent MLP, all layers) runs in
    # VMEM per center-aligned edge block — per-edge tensors never touch HBM
    # between layers.  TABLE layout only.  True: kernel on TPU (f32), pure-
    # jnp reference elsewhere.  Weight cotangents are NaN-poisoned (MD
    # forces never need them; training must disable).  Default OFF: measured
    # 2.5x SLOWER than the per-layer fused path at the bench config on v5e —
    # the model is compute-bound on the TP (VPU FMAs + small mix matmuls),
    # not HBM-bound, so extra fusion buys nothing yet; kept as an opt-in for
    # further tuning.  Also faults under donated-buffer scan chunks (see
    # Simulation) — another reason it stays opt-in.
    fused_stack: bool | str = False
    # O(3) parity: True (default) keeps only even-(l1+l2+l3) tensor-product
    # paths — energies are strictly reflection-invariant (matching the
    # e3nn-parity models the reference consumes) and the TP does ~1/3 less
    # work.  False = all SO(3) triangle paths (round-1 behavior; its odd
    # paths leak parity-odd pseudoscalar terms into the energy).
    parity: bool = True
    # TP+mix formulation inside the env-fused kernel: "paths" (unrolled 3j
    # VPU FMAs — production) or "mxu_highest"/"mxu_bf16x3"/"mxu_bf16" (the
    # combined one-matmul all-MXU form, ops/pallas_stack.py MXU-variant
    # section — the r2-VERDICT experiment; measured numbers in BASELINE.md)
    tp_mode: str = "paths"
    # ONE-LAYER fully-fused kernel (env + TP + mix + latent + residual per
    # pallas_call): removes the per-layer XLA passes over (features, E)
    # tensors (wz matmul, inv consumption, latent MLP, residual — the glue
    # tail in the r3 profile).  Default ON: pre-p-major it LOST (91.5 vs
    # 81 ms/step — Mosaic scheduling of the bigger body), but with the
    # p-major mix layout the body schedules well and the removed glue wins:
    # 48.8 -> 43.7 ms/step at the bench config, force parity vs the
    # non-fused kernels at f32 noise (6.4e-6 eV/A) across l_max/layers/
    # parity variants.  See ops/pallas_stack.allegro_layer_fused_t.
    layer_fused: bool = True
    # metadata the reference reads from the compiled artifact
    # (pair_nequip_allegro.cpp:214-220)
    per_edge_type_cutoff: tuple | None = None  # (num_types, num_types) nested tuple
    # optional extra-output head (the custom-output capability the reference
    # exposes through compute allegro / compute allegro/atom,
    # /root/reference/compute/compute_allegro.cpp:43-64; e.g. the
    # polarization example in compute/README.md:7-13).  When true the model
    # emits 'charges' (per-atom, from a dedicated readout head over the final
    # latent) and 'dipole' (extensive global 3-vector sum q_i * r_i).
    output_charges: bool = False

    @property
    def num_types(self) -> int:
        return len(self.type_names)

    def cutoff_matrix(self) -> np.ndarray:
        """(num_types, num_types) per-edge-type cutoffs, defaulting to r_max —
        the analog of pair_nequip_allegro.cpp:303-328."""
        if self.per_edge_type_cutoff is None:
            return np.full((self.num_types, self.num_types), self.r_max)
        m = np.asarray(self.per_edge_type_cutoff, dtype=np.float64)
        assert m.shape == (self.num_types, self.num_types)
        return m

    def for_training(self) -> "AllegroConfig":
        """Config for parameter differentiation (fine-tuning/training).

        The fused Pallas kernels' custom VJPs NaN-poison weight cotangents
        by design (MD forces never need them; see the fused_tp/fused_stack
        field docs above), so training-style grads must route through the
        XLA path.  The parameter pytree is layout-identical between the two
        configs: train with this one, then run MD inference with the
        original (fused) config on the same params.
        """
        return dataclasses.replace(self, fused_tp=False, fused_stack=False)


def allegro_init(key, cfg: AllegroConfig, dtype=jnp.float32) -> dict:
    """Build the parameter pytree."""
    nt, ns, C = cfg.num_types, cfg.num_scalar_features, cfg.num_tensor_features
    lmax = cfg.l_max
    keys = jax.random.split(key, 4 + 3 * cfg.num_layers)
    ki = iter(keys)

    params: dict = {}
    params["two_body_mlp"] = mlp_init(
        next(ki),
        mlp_dims(2 * nt + cfg.num_bessels, cfg.two_body_mlp_width, cfg.two_body_mlp_depth, ns),
        dtype,
    )
    params["tensor_embed"] = jax.random.normal(next(ki), (ns, C), dtype=dtype)

    layers = []
    for _ in range(cfg.num_layers):
        p0 = num_paths_per_l(lmax, lmax, lmax, cfg.parity)[0]
        layers.append(
            {
                "env_weight": jax.random.normal(next(ki), (ns, C), dtype=dtype),
                "latent_mlp": mlp_init(
                    next(ki),
                    mlp_dims(
                        ns + C * p0,
                        cfg.allegro_mlp_hidden_layers_width,
                        cfg.allegro_mlp_hidden_layers_depth,
                        ns,
                    ),
                    dtype,
                ),
                "mix": tp_mix_init(
                    next(ki), lmax, lmax, lmax, C, C, dtype, parity=cfg.parity
                ),
            }
        )
    params["layers"] = layers
    params["readout_mlp"] = mlp_init(
        next(ki),
        mlp_dims(
            ns, cfg.readout_mlp_hidden_layers_width, cfg.readout_mlp_hidden_layers_depth, 1
        ),
        dtype,
    )
    # per-type energy shifts/scales (data statistics in the reference config,
    # test_repro_allegro.yaml:101-103)
    params["per_type_shift"] = jnp.zeros((nt,), dtype=dtype)
    params["per_type_scale"] = jnp.ones((nt,), dtype=dtype)
    if cfg.output_charges:
        key, sub = jax.random.split(keys[-1])
        params["charge_mlp"] = mlp_init(
            sub,
            mlp_dims(
                ns, cfg.readout_mlp_hidden_layers_width,
                cfg.readout_mlp_hidden_layers_depth, 1,
            ),
            dtype,
        )
    return params


def allegro_energy(
    params: dict,
    cfg: AllegroConfig,
    positions,
    types,
    edge_index,
    *,
    cell=None,
    edge_shifts=None,
    atom_mask=None,
    edge_mask=None,
    center_offset=0,
    num_centers: int | None = None,
    capture: dict | None = None,
    edge_rev=None,
    edge_vec=None,
    edge_tjf=None,
):
    """Per-atom energies. Mirrors the AtomicDataDict contract (SURVEY §2.8):

    Args:
      positions: (N, 3) — includes ghost/padded atoms (allegro mode passes
        ntotal atoms, pair_nequip_allegro.cpp:524-525).
      types: (N,) int — model type indices.
      edge_index: (2, E) int — [0]=center i, [1]=neighbor j; FULL list (both
        directions).  Padded edges must be masked or parked far apart.
      cell, edge_shifts: optional PBC; edge vector = pos[j] - pos[i] +
        edge_shifts @ cell (nequip-mode convention,
        pair_nequip_allegro.cpp:604-618).  Omit when neighbors are unwrapped
        ghosts (allegro mode).
      atom_mask, edge_mask: validity masks for padding.  With a center
        window, atom_mask covers the WINDOW (num_centers,) not all atoms.
      capture: when a dict is passed, named intermediate activations
        (two_body_latent, layer{k}/invariants, layer{k}/latent, edge_energy)
        are stashed into it for the layer-by-layer checkpoint-import parity
        harness (vs the torch twin, pair_allegro_tpu.torch_ref).  Forces the
        plain un-fused, un-rematerialized path — diagnostics only.
      center_offset, num_centers: restrict energy accounting to the atom
        index window [center_offset, center_offset + num_centers) — all
        edge_index[0] values must lie inside it.  This is the shard-local
        evaluation of the spatial-DD path: per-atom reductions then run over
        num_centers instead of N (the TPU analog of the reference computing
        eng_vdwl over locals only, pair_nequip_allegro.cpp:366-380).
        `center_offset` may be traced; `num_centers` must be static.

    Returns:
      dict with 'atomic_energy' (num_centers,), 'total_energy' (),
      'edge_energy' (E,) / (num_centers, K).

    Edge layouts — the TPU-critical distinction:
      * FLAT (2, E): the reference's tensor contract.  Per-atom reductions
        are segment_sum scatters, env lookups are gathers.
      * TABLE (num_centers, K): j-neighbor table, center i implicit in the
        row (the layout the cell list produces natively).  Per-atom
        reductions become axis-1 reductions and env lookups become
        broadcasts — NO scatter in the forward pass, which measures ~10x
        faster on TPU (scatters don't vectorize on the VPU).  This is the
        production layout; flat remains for oracle tests and imports.
    """
    dtype = positions.dtype
    table = not (edge_index.ndim == 2 and edge_index.shape[0] == 2)
    if table:
        j_idx = edge_index  # (Nc, K)
        n_centers = j_idx.shape[0]
        c0 = jnp.asarray(center_offset, j_idx.dtype)
        if num_centers is not None and num_centers != n_centers:
            raise ValueError(f"num_centers={num_centers} != table rows {n_centers}")
        types_c = (
            types
            if (num_centers is None and positions.shape[0] == n_centers)
            else jax.lax.dynamic_slice_in_dim(types, c0, n_centers, axis=0)
        )
        standard = num_centers is None and positions.shape[0] == n_centers
        pos_c = (
            positions
            if standard
            else jax.lax.dynamic_slice_in_dim(positions, c0, n_centers, axis=0)
        )
        # the per-atom type rides the position row gather as a 4th float
        # column: a standalone ``types[j_idx]`` s32 gather measured
        # 2.26 ms/step at the 5,324-atom bench (TPU scalar gathers serialize
        # per element; see ops.scatter.table_edge_vec_typed).  Single-type
        # systems skip the column — the type is never consumed.
        from pair_allegro_tpu.ops.scatter import (
            table_edge_vec,
            table_edge_vec_typed,
        )

        typed = cfg.num_types > 1
        pos_t = (
            jnp.concatenate([positions, types.astype(dtype)[:, None]], 1)
            if typed
            else positions
        )
        if edge_vec is not None:
            # pre-gathered (window) edge vectors: the row-chunk scan gathers
            # them ONCE globally through table_edge_vec's custom VJP
            # (engine._make_chunked_energy) so each window's backward is a
            # stacked-slice update, not a serializing scatter into (N, 3)
            vec, tjf = edge_vec, edge_tjf
        elif edge_rev is not None and edge_mask is not None and standard:
            # gather-based force backward (see ops.scatter.table_edge_vec)
            if typed:
                vec, tjf = table_edge_vec_typed(pos_t, j_idx, edge_rev, edge_mask)
            else:
                vec, tjf = table_edge_vec(pos_t, j_idx, edge_rev, edge_mask), None
        else:
            ext = pos_t[j_idx]
            vec = ext[..., :3] - pos_c[:, None, :] if typed else ext - pos_c[:, None, :]
            tjf = ext[..., 3] if typed else None
        t_i, t_j = types_c[:, None], None  # neighbor types live in tjf

        def agg(e):  # (Nc, K, ...) -> (Nc, ...)
            return jnp.sum(e, axis=1)

        def per_edge(a):  # (Nc, ...) -> (Nc, 1, ...) broadcast over K
            return a[:, None]

    else:
        i_idx, j_idx = edge_index[0], edge_index[1]
        n_atoms = positions.shape[0] if num_centers is None else num_centers
        c0 = jnp.asarray(center_offset, i_idx.dtype)
        i_seg = i_idx - c0  # window-local center ids (identity by default)
        types_c = (
            types
            if num_centers is None
            else jax.lax.dynamic_slice_in_dim(types, c0, num_centers, axis=0)
        )
        vec = positions[j_idx] - positions[i_idx]
        t_i, t_j = types[i_idx], types[j_idx]

        def agg(e):
            return segment_sum(e, i_seg, n_atoms)

        def per_edge(a):
            return a[i_seg]

    if edge_shifts is not None and cell is not None:
        vec = vec + jnp.dot(
            edge_shifts.astype(dtype), cell.astype(dtype), precision=get_matmul_precision()
        )
    r = jnp.sqrt(jnp.maximum(jnp.sum(vec * vec, axis=-1), 1e-32))

    # Per-edge-type cutoff envelope (pair_nequip_allegro.cpp:303-328).
    cut_mat = jnp.asarray(cfg.cutoff_matrix(), dtype=dtype)
    if table:
        # arithmetic (gather-free) per-edge-type cutoff from the float
        # neighbor types: one-hot by comparison, contract the tiny type dim
        if cfg.num_types == 1:
            oh_j = jnp.ones((*j_idx.shape, 1), dtype)
            r_cut_edge = cut_mat[0, 0]
        else:
            oh_j = (
                tjf[..., None] == jnp.arange(cfg.num_types, dtype=dtype)
            ).astype(dtype)
            cut_rows = cut_mat[types_c]  # (Nc, T) — small
            r_cut_edge = jnp.einsum(
                "nkt,nt->nk", oh_j, cut_rows, precision=get_matmul_precision()
            )
    else:
        oh_j = None  # flat contract: built from t_j below
        r_cut_edge = cut_mat[t_i, t_j]
    u = polynomial_cutoff(r, r_cut_edge, cfg.polynomial_cutoff_p)
    if edge_mask is not None:
        u = u * edge_mask.astype(dtype)

    Y = spherical_harmonics(vec, cfg.l_max)  # (..., D)
    bessel = bessel_basis(r, cfg.r_max, cfg.num_bessels) * u[..., None]

    inv_sqrt_avg_n = 1.0 / math.sqrt(max(cfg.avg_num_neighbors, 1e-6))

    # interior compute dtype: bf16 "fast" tier halves HBM traffic of the
    # per-edge tensors (the measured bottleneck); geometry (vec/Y/u) and all
    # final energy accumulation stay in the working dtype.
    cdtype = jnp.bfloat16 if cfg.interior == "bf16" else dtype
    # fully-fused layer stack (TABLE layout): one kernel runs all layers in
    # VMEM.  "auto" = TPU at f32; forcing True off-TPU runs the jnp reference.
    use_stack = (
        table
        and capture is None
        and (
            cfg.fused_stack is True
            or (
                cfg.fused_stack == "auto"
                and cdtype == jnp.float32
                and jax.default_backend() == "tpu"
                and u.shape[-1] <= 1024
            )
        )
    )
    # the feature-major env-fused tier also serves the bf16 FAST tier
    # (interior="bf16"): kernels run natively in bf16 (DEFAULT MXU pass).
    # Decided EARLY because under it the two-body embed and the readout also
    # run feature-major — the (E, features) latent tensor never exists, so
    # neither do the (Nc, K, ns) layout copies around it (measured ~3 ms/step
    # of pure data formatting in the round-3 trace).
    use_env_fused = False
    import os as _os

    # PAT_FORCE_ENV_FUSED=1: take this tier off-TPU too — with the kernels
    # in interpret mode this lets the CPU suite execute the FULL env-fused
    # glue (feature-major embed/heads, first/last layer wiring, padding
    # hoist), which is otherwise chip-only (tests/test_stack_fused.py)
    if (
        not use_stack
        and cfg.fused_tp
        and table
        and capture is None
        and (
            jax.default_backend() == "tpu"
            or _os.environ.get("PAT_FORCE_ENV_FUSED") == "1"
        )
        and cdtype in (jnp.float32, jnp.bfloat16)
    ):
        from pair_allegro_tpu.ops.pallas_stack import env_fused_viable

        use_env_fused = env_fused_viable(
            u.shape[-1], u.shape[0], sh_dim(cfg.l_max), cfg.num_tensor_features
        )

    onehot = jnp.eye(cfg.num_types, dtype=dtype)
    if use_env_fused:
        from pair_allegro_tpu.ops.mlp import mlp_apply_t

        nc_b, k_b = u.shape
        e0 = nc_b * k_b
        ar = jnp.arange(cfg.num_types, dtype=t_i.dtype)[:, None]
        tif = jnp.broadcast_to(t_i, u.shape).reshape(1, e0)
        in_T = jnp.concatenate(
            [
                (tif == ar).astype(dtype),
                oh_j.reshape(e0, cfg.num_types).T,
                bessel.reshape(e0, -1).T,
            ],
            axis=0,
        )
        # embed/readout kernel fusion (r5, MEASURED AND CLOSED — default OFF):
        # with >=2 positional fused layers, the two-body MLP + tensor embed
        # can run in the FIRST layer kernel's prologue and the readout/charge
        # heads in the LAST kernel's epilogue (PAT_L1_EMBED=1).  The XLA glue
        # it removes (~2.8 device-ms/step: conv_multiply fusions + the long
        # tail, r5 trace) comes back as in-kernel time (+0.7 ms first bwd,
        # +1.5 ms last bwd, +0.8 ms first fwd even at policy precision —
        # Mosaic schedules the enlarged bodies worse), measuring 30.2 vs 29.8
        # device-ms/step.  Same lesson as the parked full-stack kernel: this
        # workload's glue matmuls were already near their (badly-MXU-shaped)
        # floor at the XLA level.  Kept tested (interpret A/B + on-chip
        # parity) as a lever for different model shapes.
        embed_ro_fused = (
            cfg.layer_fused
            and len(params["layers"]) >= 2
            and _os.environ.get("PAT_L1_POSITIONAL", "1") != "0"
            and _os.environ.get("PAT_L1_EMBED", "0") == "1"
        )
        if embed_ro_fused:
            xT0 = None
        else:
            xT0 = mlp_apply_t(params["two_body_mlp"], in_T) * u.reshape(1, e0)
        x = p_embed = None
    else:
        oh_i = jnp.broadcast_to(onehot[t_i], (*u.shape, cfg.num_types))
        oh_jx = onehot[t_j] if oh_j is None else oh_j
        x = mlp_apply(
            params["two_body_mlp"],
            jnp.concatenate([oh_i, oh_jx, bessel], axis=-1),
        )
        x = x * u[..., None]  # (..., ns)

        p_embed = jnp.dot(
            x, params["tensor_embed"].astype(dtype), precision=get_matmul_precision()
        ) * (1.0 / math.sqrt(x.shape[-1]))
    # fused per-layer kernel is f32-on-TPU only: the bf16 variant faulted the
    # TPU runtime (Mosaic tiling), and off-TPU the custom_vjp wrapper only
    # adds compile time over the identical XLA math
    use_fused = (
        cfg.fused_tp
        and cdtype == jnp.float32
        and jax.default_backend() == "tpu"
        and capture is None
        and not use_stack
    )
    batch = u.shape  # (E,) flat or (Nc, K) table

    V = (
        None
        if (use_stack or use_env_fused)
        else p_embed[..., :, None] * Y[..., None, :]
    )  # (..., C, D)

    def make_env(layer, x, Y, u):
        """Per-(channel) radial env weights and the per-CENTER environment."""
        w_env = jnp.dot(
            x, layer["env_weight"].astype(x.dtype), precision=get_matmul_precision()
        ) * (1.0 / math.sqrt(x.shape[-1]))
        w_env = w_env * u[..., None]
        env_edges = w_env[..., :, None] * Y[..., None, :]  # (..., C, D)
        return agg(env_edges) * inv_sqrt_avg_n  # (Nc, C, D)

    def layer_fn(layer, x, V, Y, u, _cap_key=None):
        env = make_env(layer, x, Y, u)
        # NOTE: the explicit broadcast measures FASTER than contracting the
        # per-center env directly (uniform_tp_table): one materialization
        # beats 19 per-path re-broadcasts.
        env_e = jnp.broadcast_to(per_edge(env), V.shape)
        T = uniform_tp(V, env_e, cfg.l_max, cfg.parity)
        inv = scalar_part(T)  # (..., C*P0)
        if capture is not None and _cap_key is not None:
            capture[f"{_cap_key}/invariants"] = inv
        V_new = tp_mix_apply(layer["mix"], T)
        x_new = mlp_apply(layer["latent_mlp"], jnp.concatenate([x, inv], axis=-1))
        x = (x + x_new * u[..., None]) * (1.0 / math.sqrt(2.0))
        return x, V_new

    def layer_fn_t(layer, x, Vt, Y, u):
        """Fused-kernel layer: V persists in kernel layout (D, C, E) across
        layers — only small (E, C)-sized tensors are ever transposed."""
        from pair_allegro_tpu.ops.pallas_tp import tp_mix_fused_t

        env = make_env(layer, x, Y, u)  # (Nc, C, D)
        env_t = jnp.transpose(env, (2, 1, 0))  # (D, C, Nc) — small
        if table:
            nc, k = batch
            env_e_t = jnp.broadcast_to(
                env_t[:, :, :, None], (*env_t.shape, k)
            ).reshape(*env_t.shape[:2], nc * k)
        else:
            env_e_t = env_t[:, :, i_seg]
        ws_flat = tuple(layer["mix"][f"l{l}"] for l in range(cfg.l_max + 1))
        Vt_new, inv = tp_mix_fused_t(
            Vt, env_e_t, ws_flat, cfg.l_max, parity=cfg.parity
        )
        inv = inv.reshape(*batch, inv.shape[-1])
        x_new = mlp_apply(layer["latent_mlp"], jnp.concatenate([x, inv], axis=-1))
        x = (x + x_new * u[..., None]) * (1.0 / math.sqrt(2.0))
        return x, Vt_new

    if use_stack:
        from pair_allegro_tpu.ops.pallas_stack import allegro_stack_apply

        if cdtype != dtype:
            x, p_s, Y_s, u_s = (a.astype(cdtype) for a in (x, p_embed, Y, u))
        else:
            p_s, Y_s, u_s = p_embed, Y, u
        x = allegro_stack_apply(
            x, p_s, Y_s, u_s, params["layers"], cfg.l_max, cfg.avg_num_neighbors,
            parity=cfg.parity,
        )
    else:
        do_remat = (
            cfg.remat if isinstance(cfg.remat, bool) else True
        ) and capture is None
        if use_env_fused:
            # FEATURE-MAJOR tier: per-edge tensors keep edges in the lane
            # (trailing) dimension end to end — the env+TP+mix kernel
            # (in-kernel per-center aggregation), the latent MLP, and the
            # residual all operate on (features, E), so no per-layer
            # transposes or (E, C, D) materializations exist at the XLA level.
            from pair_allegro_tpu.ops.mlp import mlp_apply_t
            from pair_allegro_tpu.ops.prec import matmul_precision_for
            from pair_allegro_tpu.ops.pallas_stack import tp_mix_env_fused_t

            nc, k = batch
            e_tot = nc * k
            ns_dim = params["tensor_embed"].shape[0]
            cns = 1.0 / math.sqrt(ns_dim)
            xT = None if xT0 is None else xT0.astype(cdtype)  # (ns, E)
            uT = u.reshape(1, e_tot).astype(cdtype)
            Y_T = Y.reshape(e_tot, -1).T.astype(cdtype)  # (D, E)
            # hoist the kernel's center-alignment padding OUT of the
            # per-layer calls: padding there copies the (D, C, E) V tensor
            # (~400 MB at the bench config) once per layer per direction —
            # measured ~6 ms/step of pure jnp.pad/slice in the r3 profile.
            # Padding the small (ns/1/D, E) operands once up front makes the
            # per-layer pad/slice a no-op that XLA elides.  Padded lanes
            # carry u=0, so they contribute exactly nothing anywhere.
            from pair_allegro_tpu.ops.pallas_stack import _env_block_geometry

            _, pad_c = _env_block_geometry(
                k, nc, sh_dim(cfg.l_max), cfg.num_tensor_features
            )
            if pad_c:
                pe = pad_c * k
                if xT is not None:
                    xT = jnp.pad(xT, ((0, 0), (0, pe)))
                if embed_ro_fused:
                    in_T = jnp.pad(in_T, ((0, 0), (0, pe)))
                uT = jnp.pad(uT, ((0, 0), (0, pe)))
                Y_T = jnp.pad(Y_T, ((0, 0), (0, pe)))
                e_tot = e_tot + pe
            if xT is not None:
                pT = (
                    jnp.dot(
                        params["tensor_embed"].astype(cdtype).T, xT,
                        precision=matmul_precision_for(cdtype),
                    )
                    * cns
                )
            if not cfg.layer_fused:
                Vt = pT[None, :, :] * Y_T[:, None, :]  # (D, C, E) directly

            def env_step(layer, xT, Vt):
                wzT = (
                    jnp.dot(
                        layer["env_weight"].astype(xT.dtype).T, xT,
                        precision=matmul_precision_for(xT.dtype),
                    )
                    * cns
                    * uT
                )
                ws_flat = tuple(layer["mix"][f"l{l}"] for l in range(cfg.l_max + 1))
                Vt_new, invT = tp_mix_env_fused_t(
                    Vt, wzT, Y_T, ws_flat, cfg.l_max, k, cfg.avg_num_neighbors,
                    parity=cfg.parity, inv_t=True, mode=cfg.tp_mode,
                )
                # latent MLP with the first layer SPLIT over [x; inv] — the
                # (ns+C*P0, E) concat would cost a ~200 MB HBM round trip
                lat_ws = layer["latent_mlp"]["w"]
                w0 = lat_ws[0].astype(xT.dtype)
                ns_rows = xT.shape[0]
                prec_l = matmul_precision_for(xT.dtype)
                h = (
                    jnp.dot(w0[:ns_rows].T, xT, precision=prec_l)
                    + jnp.dot(w0[ns_rows:].T, invT, precision=prec_l)
                ) * (1.0 / math.sqrt(w0.shape[0]))
                if len(lat_ws) == 1:
                    x_new = h  # single linear layer
                else:
                    from pair_allegro_tpu.ops.mlp import silu_norm_const

                    h = jax.nn.silu(h) * silu_norm_const()
                    x_new = mlp_apply_t({"w": lat_ws[1:]}, h)
                return (xT + x_new * uT) * (1.0 / math.sqrt(2.0)), Vt_new

            if cfg.layer_fused:
                # positional kernel variants: the FIRST layer consumes the
                # (C, E) tensor embedding pT and builds V0 = pT*Y in-body
                # (no (D, C, E) V0 in HBM); the LAST layer emits no V at all
                # (its V output is dead — only the scalar track reaches the
                # readout).  See ops/pallas_stack.allegro_layer_fused_t.
                from pair_allegro_tpu.ops.pallas_stack import (
                    allegro_layer_fused_t,
                )

                n_l = len(params["layers"])
                # PAT_L1_POSITIONAL=0: bench fallback tier — run every layer
                # as the plain (first_v=False, last=False) kernel with V0
                # materialized, the configuration validated on-chip before
                # the positional variants landed
                positional = _os.environ.get("PAT_L1_POSITIONAL", "1") != "0"

                def fused_step(first_v, last):
                    def f(layer, xT, Vc):
                        return allegro_layer_fused_t(
                            xT, Vc, Y_T, uT, layer, cfg.l_max, k,
                            cfg.avg_num_neighbors, parity=cfg.parity,
                            first_v=first_v, last=last,
                        )
                    return jax.checkpoint(f) if do_remat else f

                if embed_ro_fused:
                    from pair_allegro_tpu.ops.pallas_stack import (
                        allegro_layer_embed_fused_t,
                        allegro_layer_readout_fused_t,
                    )

                    tb_ws = tuple(params["two_body_mlp"]["w"])
                    te_w = params["tensor_embed"]

                    def embed_step(layer, in_T):
                        return allegro_layer_embed_fused_t(
                            in_T.astype(cdtype), Y_T, uT, layer, tb_ws, te_w,
                            cfg.l_max, k, cfg.avg_num_neighbors,
                            parity=cfg.parity,
                        )

                    ro_ws = tuple(params["readout_mlp"]["w"])
                    q_ws = (
                        tuple(params["charge_mlp"]["w"])
                        if cfg.output_charges else ()
                    )

                    def ro_step(layer, xT, Vc):
                        return allegro_layer_readout_fused_t(
                            xT, Vc, Y_T, uT, layer, ro_ws, q_ws,
                            cfg.l_max, k, cfg.avg_num_neighbors,
                            parity=cfg.parity,
                        )

                    if do_remat:
                        embed_step = jax.checkpoint(embed_step)
                        ro_step = jax.checkpoint(ro_step)
                    xT, Vc = embed_step(params["layers"][0], in_T)
                    for layer in params["layers"][1:-1]:
                        xT, Vc = fused_step(False, False)(layer, xT, Vc)
                    rows = ro_step(params["layers"][-1], xT, Vc)
                    e_row, q_row = rows if cfg.output_charges else (rows, None)
                    e_edge = e_row[0, : nc * k].astype(dtype).reshape(nc, k)
                    if cfg.output_charges:
                        q_edge = q_row[0, : nc * k].astype(dtype).reshape(nc, k)
                    xT = None  # heads already computed in-kernel
                else:
                    Vc = pT if positional else pT[None, :, :] * Y_T[:, None, :]
                    for li, layer in enumerate(params["layers"]):
                        first_v = positional and li == 0
                        last = positional and li == n_l - 1
                        out = fused_step(first_v, last)(layer, xT, Vc)
                        if last:
                            xT = out
                        else:
                            xT, Vc = out
            else:
                if do_remat:
                    env_step = jax.checkpoint(env_step)
                for layer in params["layers"]:
                    xT, Vt = env_step(layer, xT, Vt)
            # feature-major readout: the (E, ns) latent never materializes —
            # heads run on (ns, E) and only (1, E) rows leave this section
            # (xT is None when the heads already ran in the last layer kernel)
            if xT is not None:
                xT = xT.astype(dtype)
                e_edge = (
                    mlp_apply_t(params["readout_mlp"], xT)[0, : nc * k]
                    .reshape(nc, k)
                    * u
                )
                if cfg.output_charges:
                    q_edge = (
                        mlp_apply_t(params["charge_mlp"], xT)[0, : nc * k]
                        .reshape(nc, k)
                        * u
                    )
        else:
            step_fn = layer_fn_t if use_fused else layer_fn
            if do_remat:  # "auto" -> safe
                step_fn = jax.checkpoint(step_fn)
            if cdtype != dtype:
                x, V, Y_l, u_l = (a.astype(cdtype) for a in (x, V, Y, u))
            else:
                Y_l, u_l = Y, u
            if use_fused:
                V = jnp.transpose(
                    V.reshape(-1, *V.shape[-2:]), (2, 1, 0)
                )  # (D, C, E) once
            if capture is not None:
                capture["two_body_latent"] = x
                for li, layer in enumerate(params["layers"]):
                    x, V = step_fn(layer, x, V, Y_l, u_l, _cap_key=f"layer{li}")
                    capture[f"layer{li}/latent"] = x
            else:
                for layer in params["layers"]:
                    x, V = step_fn(layer, x, V, Y_l, u_l)
    if x is not None:  # env-fused tier computed the heads feature-major above
        x = x.astype(dtype)
        e_edge = mlp_apply(params["readout_mlp"], x)[..., 0] * u  # (E,)/(Nc, K)
        if cfg.output_charges:
            q_edge = mlp_apply(params["charge_mlp"], x)[..., 0] * u
    if capture is not None:
        capture["edge_energy"] = e_edge
    e_atom = agg(e_edge)  # (Nc,)
    scale = params["per_type_scale"].astype(dtype)[types_c]
    shift = params["per_type_shift"].astype(dtype)[types_c]
    e_atom = scale * e_atom + shift
    if atom_mask is not None:
        e_atom = e_atom * atom_mask.astype(dtype)
    out = {
        "atomic_energy": e_atom,
        "total_energy": jnp.sum(e_atom),
        "edge_energy": e_edge,
    }
    if cfg.output_charges:
        # custom-output head (compute allegro analog): per-atom charges from a
        # dedicated readout over the final latent (q_edge computed above, in
        # whichever layout the tier used); dipole = sum q_i r_i is the
        # extensive global quantity (polarization-style,
        # /root/reference/compute/README.md:7-13)
        q_atom = agg(q_edge)
        if atom_mask is not None:
            q_atom = q_atom * atom_mask.astype(dtype)
        if table:
            pos_centers = pos_c
        else:
            pos_centers = (
                positions
                if num_centers is None
                else jax.lax.dynamic_slice_in_dim(positions, c0, num_centers, axis=0)
            )
        out["charges"] = q_atom
        out["dipole"] = jnp.sum(q_atom[:, None] * pos_centers, axis=0)
    return out
