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
    # remat per layer: "auto" = off when the fused conv kernel is active
    # (its VJP already recomputes internally; storing the small residuals
    # measured 128.5 vs 177 ms/step on v5e), on otherwise (the generic
    # XLA message path holds ~17 GB live without it)
    remat: bool | str = "auto"
    per_edge_type_cutoff: tuple | None = None
    # Full O(3) two-track features (the upstream ``parity: true`` of the
    # reference's NequIP config of record,
    # /root/reference/tests/test_data/test_repro_nequip.yaml:96): hidden
    # irreps carry BOTH parities at every l ("Cx0e + Cx0o + Cx1e + Cx1o
    # ..."), doubling the feature tensor to (N, C, D, 2) with track 0 = even
    # (p = +(-1)^0... the e3nn "e") and track 1 = odd.  Spherical harmonics
    # have parity (-1)^l, so a TP path (l1, l2 -> l3) from input track pi
    # lands in output track pi XOR (l2 mod 2) — the routing implemented in
    # nequip_energy.  False (default) keeps the single-track SO(3) layout
    # (which equals the upstream parity=false "...e-only" models).
    parity: bool = False

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

    # Fused Pallas convolution kernel (ops/pallas_nequip.py) for the l_max=1
    # TABLE path: radial MLP + closed-form TP + K-aggregate in one kernel.
    # Like the Allegro kernels, its custom VJP NaN-poisons WEIGHT cotangents
    # (MD forces never need them) — for_training() flips this off.
    fused_conv: bool = True

    def for_training(self) -> "NequIPConfig":
        """API twin of AllegroConfig.for_training: route weight gradients
        through the XLA path (the fused conv kernel's custom VJP NaN-poisons
        weight cotangents by design).  The parameter pytree is layout-
        identical between the two configs."""
        return dataclasses.replace(self, fused_conv=False)


def _num_paths(l_max: int) -> int:
    return sum(len(paths_to_l(l_max, l_max, l3)) for l3 in range(l_max + 1))


def _self_connect(hb, w_t, types, prec):
    """Species-dependent self-connection sc[n] = hb[n] @ w_t[types[n]]
    (hb (N, d, C), w_t (T, C, C)).

    Computed as one matmul PER TYPE + a one-hot contraction instead of the
    per-atom weight gather ``w_t[types]``: the gather materializes an
    (N, C, C) tensor (~87 MB at the bench config) per (l, parity-track)
    block per direction, while T is small (the reference's configs carry
    1-5 species) — T full matmuls + T*(N, d, C) of select traffic is far
    cheaper, and at T=1 it collapses to one plain MXU matmul.  Same
    contraction per row, so the math is unchanged.  Falls back to the
    gather form above 8 types."""
    T = w_t.shape[0]
    if T == 1:
        return jnp.einsum("ndc,ce->nde", hb, w_t[0], precision=prec)
    if T > 8:
        return jnp.einsum("ndc,nce->nde", hb, w_t[types], precision=prec)
    per_t = jnp.einsum("ndc,tce->tnde", hb, w_t, precision=prec)
    onehot = jax.nn.one_hot(types, T, dtype=hb.dtype)
    return jnp.einsum("tnde,nt->nde", per_t, onehot)


def _hj_bf16() -> bool:
    """PAT_NEQUIP_HJ=bf16: gather neighbor features through a bf16 boundary.

    The h[j] row gather and its reverse-table transpose move (N, K, DF)
    feature rows through HBM per layer per direction — the dominant
    non-kernel cost of the message-passing step (r5 trace: ~17 of 64
    device-ms at the config of record).  Gathering bf16 halves that traffic
    AND the kernel's hj read; the fused conv upcasts in VMEM and computes
    f32 (accuracy measured on chip vs the f64 oracle — the NequIP fast
    tier, BASELINE.md).  Default OFF: the accurate tier stays full f32."""
    import os

    return os.environ.get("PAT_NEQUIP_HJ", "") == "bf16"


# ---------------------------------------------------------------------------
# Specialized l_max=1 message path (channels-LAST).
#
# Two measured problems with the generic path at the config of record
# (l_max=1, parity, C=64, ~340k edges, v5e; benchmarks/nequip_profile.py):
#
# 1. uniform_tp + one einsum per path materializes (E, C, P, 2l+1)
#    intermediates per path and track — ~17 GB live without remat (OOM) and
#    814 ms/step with remat; the tiny-contraction dots cannot fuse.
# 2. The (N, C, D[, 2]) channels-FIRST layout puts D*tracks = 8 in the
#    vector-lane (minor) dimension: every per-edge elementwise op runs at
#    8/128 lane utilization, and XLA inserts ~78 ms/step of relayout copies
#    (trace: copy family 77.7 ms, fusions 107 ms of a 333 ms step).
#
# The fast path fixes both: the five l_max=1 TP paths collapse to closed
# forms — (0,0,0): s*y0, (1,1,0): v.yv, (0,1,1): s*yv, (1,0,1): v*y0,
# (1,1,1): eps_ijk v_i yv_j — as one elementwise chain with C in the minor
# (lane) dimension end to end: features are (N, D[, 2], C), per-edge tensors
# (..., 3[, 2], C).  The 3j constants are read from real_wigner_3j so the
# math is bit-for-bit the same contraction, just unrolled; the radial/gate
# weight COLUMNS are permuted at trace time (tiny matrices) so the packed
# parameter layout — and hence checkpoints/import — is unchanged.
# PAT_NEQUIP_GENERIC=1 forces the generic path (differential testing).
# ---------------------------------------------------------------------------


def _lmax1_consts():
    from pair_allegro_tpu.ops.so3 import real_wigner_3j

    c000 = float(real_wigner_3j(0, 0, 0)[0, 0, 0])
    c110 = float(real_wigner_3j(1, 1, 0)[0, 0, 0])
    c011 = float(real_wigner_3j(0, 1, 1)[0, 0, 0])
    c101 = float(real_wigner_3j(1, 0, 1)[0, 0, 0])
    C111 = np.asarray(real_wigner_3j(1, 1, 1))
    return c000, c110, c011, c101, C111


def _tp111_cl(v, y, C111):
    """Path (1,1,1) with the actual 3j entries unrolled, channels-last:
    v (..., 3, C), y (..., 3) -> (..., 3, C) — six scalar-weighted
    elementwise products, no dot."""
    comps = []
    for k in range(3):
        acc = None
        for i in range(3):
            for j in range(3):
                c = float(C111[i, j, k])
                if abs(c) < 1e-14:
                    continue
                term = c * v[..., i, :] * y[..., j, None]
                acc = term if acc is None else acc + term
        comps.append(acc)
    return jnp.stack(comps, axis=-2)


def _msg_lmax1_single_cl(hj, Y, w):
    """Single-track l_max=1 message, channels-last: hj (..., 4, C),
    Y (..., 4), w (..., 5, C) (path-major columns) -> (..., 4, C).
    Exact closed form of the generic per-path contraction in layer_fn
    (path order (0,0),(1,1) | (0,1),(1,0),(1,1); norms 1/sqrt(P_l3))."""
    c000, c110, c011, c101, C111 = _lmax1_consts()
    n0, n1 = 1.0 / math.sqrt(2.0), 1.0 / math.sqrt(3.0)
    s = hj[..., 0, :]  # (..., C)
    v = hj[..., 1:4, :]  # (..., 3, C)
    y0 = Y[..., 0]  # (...)
    yv = Y[..., 1:4]  # (..., 3)
    m0 = n0 * (
        w[..., 0, :] * (c000 * s * y0[..., None])
        + w[..., 1, :] * (c110 * jnp.sum(v * yv[..., None], axis=-2))
    )
    mv = n1 * (
        w[..., 2, None, :] * (c011 * s[..., None, :]) * yv[..., None]
        + w[..., 3, None, :] * (c101 * v) * y0[..., None, None]
        + w[..., 4, None, :] * _tp111_cl(v, yv, C111)
    )
    return jnp.concatenate([m0[..., None, :], mv], axis=-2)  # (..., 4, C)


def _msg_lmax1_parity_cl(hj, Y, w):
    """Two-track l_max=1 message, channels-last: hj (..., 4, 2, C),
    Y (..., 4), w (..., 2, 5, C) (track-major, path-major columns) ->
    (..., 4, 2, C).  Closed form of layer_fn_parity's routed contraction:
    output track tau = source track XOR (l2 mod 2)."""
    c000, c110, c011, c101, C111 = _lmax1_consts()
    n0, n1 = 1.0 / math.sqrt(2.0), 1.0 / math.sqrt(3.0)
    s = hj[..., 0, :, :]  # (..., 2, C)
    v = hj[..., 1:4, :, :]  # (..., 3, 2, C)
    y0 = Y[..., 0]  # (...)
    yv = Y[..., 1:4]  # (..., 3)
    msgs = []
    for tau in (0, 1):
        pe, po = tau, 1 - tau
        m0 = n0 * (
            w[..., pe, 0, :] * (c000 * s[..., pe, :] * y0[..., None])
            + w[..., po, 1, :]
            * (c110 * jnp.sum(v[..., po, :] * yv[..., None], axis=-2))
        )
        mv = n1 * (
            w[..., po, 2, None, :] * (c011 * s[..., po, None, :]) * yv[..., None]
            + w[..., pe, 3, None, :] * (c101 * v[..., pe, :]) * y0[..., None, None]
            + w[..., po, 4, None, :] * _tp111_cl(v[..., po, :], yv, C111)
        )
        msgs.append(jnp.concatenate([m0[..., None, :], mv], axis=-2))
    return jnp.stack(msgs, axis=-2)  # (..., 4, 2, C)


import functools


@functools.lru_cache(maxsize=None)
def _tp_entry_table(lmax: int):
    """Trace-time unrolled TP structure for the generic-l_max channels-last
    message (and the generic fused-conv kernel body, ops/pallas_nequip):
    tuple over l3 of (n_paths, rows), rows = tuple of
    (p_global, l1, l2, entries), entries = tuple of (d1, d2, k_local, coeff)
    nonzeros of real_wigner_3j(l1, l2, l3) with d1/d2 GLOBAL sh indices
    (l*l + m).  Exactly the contraction uniform_tp + the per-path einsum
    perform (ops/tp.py:73-103), unrolled — the l_max=1 closed forms are the
    lmax==1 instance of this table."""
    from pair_allegro_tpu.ops.so3 import real_wigner_3j

    table = []
    p_off = 0
    for l3 in range(lmax + 1):
        paths = paths_to_l(lmax, lmax, l3)
        rows = []
        for p_local, (l1, l2) in enumerate(paths):
            C3 = np.asarray(real_wigner_3j(l1, l2, l3))
            o1, o2 = l1 * l1, l2 * l2
            entries = tuple(
                (o1 + i, o2 + j, k, float(C3[i, j, k]))
                for i in range(2 * l1 + 1)
                for j in range(2 * l2 + 1)
                for k in range(2 * l3 + 1)
                if abs(float(C3[i, j, k])) > 1e-14
            )
            rows.append((p_off + p_local, l1, l2, entries))
        table.append((len(paths), tuple(rows)))
        p_off += len(paths)
    return tuple(table)


def _msg_generic_single_cl(hj, Y, w, lmax):
    """Generic-l_max single-track channels-last message: hj (..., D, C),
    Y (..., D), w (..., P, C) path-major -> (..., D, C).  Same contraction
    as layer_fn's uniform_tp + per-path einsum (norm 1/sqrt(P_l3)),
    unrolled over the nonzero 3j entries."""
    blocks = []
    for l3, (n_paths, rows) in enumerate(_tp_entry_table(lmax)):
        norm = 1.0 / math.sqrt(max(n_paths, 1))
        for k in range(2 * l3 + 1):
            acc = None
            for (pg, l1, l2, entries) in rows:
                t = None
                for (d1, d2, kk, c) in entries:
                    if kk != k:
                        continue
                    term = (c * hj[..., d1, :]) * Y[..., d2, None]
                    t = term if t is None else t + term
                if t is None:
                    continue
                contrib = w[..., pg, :] * t
                acc = contrib if acc is None else acc + contrib
            blocks.append(
                acc * norm if acc is not None else jnp.zeros_like(hj[..., 0, :])
            )
    return jnp.stack(blocks, axis=-2)


def _msg_generic_parity_cl(hj, Y, w, lmax):
    """Generic-l_max two-track channels-last message: hj (..., D, 2, C),
    Y (..., D), w (..., 2, P, C) (track-major, path-major) ->
    (..., D, 2, C).  Routing tau = pi XOR (l2 mod 2) (_ParityRouting);
    every path feeds each tau from exactly one source track, so the
    per-(l3, tau) norm is 1/sqrt(n_paths) — the layer_fn_parity norm."""
    d3_blocks = []
    for l3, (n_paths, rows) in enumerate(_tp_entry_table(lmax)):
        norm = 1.0 / math.sqrt(max(n_paths, 1))
        for k in range(2 * l3 + 1):
            accs = [None, None]
            for (pg, l1, l2, entries) in rows:
                for pi in (0, 1):
                    tau = pi ^ (l2 % 2)
                    t = None
                    for (d1, d2, kk, c) in entries:
                        if kk != k:
                            continue
                        term = (c * hj[..., d1, pi, :]) * Y[..., d2, None]
                        t = term if t is None else t + term
                    if t is None:
                        continue
                    contrib = w[..., pi, pg, :] * t
                    accs[tau] = contrib if accs[tau] is None else accs[tau] + contrib
            zero = jnp.zeros_like(hj[..., 0, 0, :])
            d3_blocks.append(
                jnp.stack(
                    [a * norm if a is not None else zero for a in accs], axis=-2
                )
            )
    return jnp.stack(d3_blocks, axis=-3)  # (..., D, 2, C)


def _radial_cl(layer, C: int, p_total: int, n_tracks: int):
    """Radial MLP with its FINAL weight columns permuted from the stored
    (c-major: c*T*P + pi*P + p) packing to channels-last ((pi*P + p)*C + c)
    — a trace-time transpose of a (width, C*T*P) matrix, so the parameter
    pytree (and import key maps) keep the upstream packing."""
    ws = layer["radial_mlp"]["w"]
    wf = ws[-1]
    width = wf.shape[0]
    if n_tracks == 2:
        wf = wf.reshape(width, C, 2, p_total)
        wf = jnp.transpose(wf, (0, 2, 3, 1)).reshape(width, -1)
    else:
        wf = wf.reshape(width, C, p_total)
        wf = jnp.transpose(wf, (0, 2, 1)).reshape(width, -1)
    return {"radial_mlp": {"w": [*ws[:-1], wf]}}["radial_mlp"]


def _gate_cl(gate_w, C: int, lmax: int, n_tracks: int):
    """Gate weight columns permuted (c*lmax*T + l*T + ... stored c-major as
    reshape(-1, C, lmax[, 2])) -> channels-last reshape(-1, lmax[, 2], C)."""
    if n_tracks == 2:
        g = gate_w.reshape(gate_w.shape[0], C, lmax, 2)
        return jnp.transpose(g, (0, 2, 3, 1)).reshape(gate_w.shape[0], -1)
    g = gate_w.reshape(gate_w.shape[0], C, lmax)
    return jnp.transpose(g, (0, 2, 1)).reshape(gate_w.shape[0], -1)


@dataclasses.dataclass(frozen=True)
class _ParityRouting:
    """Static path routing for the two-track TP (see NequIPConfig.parity).

    For each (destination l3, destination track tau): the list of
    (source track pi, path index within l3) pairs that land there —
    pi XOR (l2 mod 2) == tau."""

    table: tuple  # [l3][tau] -> tuple of (pi, p)

    @staticmethod
    def build(lmax: int) -> "_ParityRouting":
        table = []
        for l3 in range(lmax + 1):
            paths = paths_to_l(lmax, lmax, l3)
            per_tau = ([], [])
            for p, (l1, l2) in enumerate(paths):
                for pi in (0, 1):
                    per_tau[pi ^ (l2 % 2)].append((pi, p))
            table.append((tuple(per_tau[0]), tuple(per_tau[1])))
        return _ParityRouting(tuple(table))


def nequip_init(key, cfg: NequIPConfig, dtype=jnp.float32) -> dict:
    nt, C, lmax = cfg.num_types, cfg.num_features, cfg.l_max
    p_total = _num_paths(lmax)
    n_tracks = 2 if cfg.parity else 1
    keys = jax.random.split(key, 4 + (4 * lmax + 12) * cfg.num_layers)
    ki = iter(keys)

    params: dict = {"chem_embed": jax.random.normal(next(ki), (nt, C), dtype=dtype)}
    layers = []
    for _ in range(cfg.num_layers):
        layer = {
            # per-(channel, source-track, path) radial weights; track-major
            # layout [even-input paths..., odd-input paths...]
            "radial_mlp": mlp_init(
                next(ki),
                mlp_dims(cfg.num_bessels, cfg.radial_mlp_width, cfg.radial_mlp_depth,
                         C * p_total * n_tracks),
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
            # gate scalars for the l>0 blocks (both tracks when parity),
            # from the EVEN scalar channels (gates must be even scalars)
            "gate_w": jax.random.normal(
                next(ki), (C, C * max(lmax, 1) * n_tracks), dtype=dtype
            ),
        }
        if cfg.parity:
            # odd-track self-connection / mix (parity is preserved per l)
            layer["self_w_o"] = [
                jax.random.normal(next(ki), (nt, C, C), dtype=dtype)
                for _ in range(lmax + 1)
            ]
            layer["mix_w_o"] = [
                jax.random.normal(next(ki), (C, C), dtype=dtype)
                for _ in range(lmax + 1)
            ]
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
    shard_axis=None,
    capture: dict | None = None,
    edge_rev=None,
):
    """Per-atom energies under the AtomicDataDict contract (SURVEY §2.8).

    ``capture``: when a dict is passed, the final node features are stashed
    under 'node_features' ((N, C, D) single-track or (N, C, D, 2) parity) —
    used by the parity-equivariance tests and import-parity harness.

    Same signature as ``allegro_energy``.  Edge layouts as in
    allegro_energy: FLAT (2, E) or TABLE (N, K) j-table with center i
    implicit in the row — the table must cover ALL atoms (rows == n_atoms)
    since messages update every node.

    ``shard_axis`` (inside shard_map only): multi-device message passing —
    a capability the REFERENCE DOES NOT HAVE (it hard-errors on >1 rank for
    this pair style, /root/reference/pair_nequip_allegro.cpp:86-89, because
    one ghost exchange cannot carry multi-hop messages).  With replicated
    positions + node features, each shard computes the message aggregation
    and update for its node WINDOW (the table rows it was given) and the
    new features are ``all_gather``-ed to every shard at each layer — the
    per-layer collective IS the multi-hop propagation MPI ghost exchange
    cannot express.  atom_mask then covers the window; returned
    atomic_energy is window-sized (caller psums the total)."""
    n_atoms = positions.shape[0]
    dtype = positions.dtype
    C, lmax = cfg.num_features, cfg.l_max
    table = not (edge_index.ndim == 2 and edge_index.shape[0] == 2)
    # TABLE paths: the per-atom type rides the position row gather as a 4th
    # float column, and the per-edge-type cutoff becomes an arithmetic
    # one-hot contraction — the same treatment that removed the 2.26 ms/step
    # scalar s32 ``types[j_idx]`` gather from the Allegro path
    # (ops.scatter.table_edge_vec_typed; BASELINE.md round-3 notes).
    typed = table and cfg.num_types > 1
    pos_t = (
        jnp.concatenate([positions, types.astype(dtype)[:, None]], 1)
        if typed
        else positions
    )
    tjf = None  # neighbor types as floats (table paths)
    if shard_axis is not None:
        if not table:
            raise ValueError("sharded nequip requires the TABLE edge layout")
        nw = edge_index.shape[0]  # this shard's node window
        c0 = jax.lax.axis_index(shard_axis) * nw
        j_idx = edge_index
        types_w = jax.lax.dynamic_slice_in_dim(types, c0, nw, axis=0)
        pos_w = jax.lax.dynamic_slice_in_dim(positions, c0, nw, axis=0)
        ext = pos_t[j_idx]
        vec = (ext[..., :3] if typed else ext) - pos_w[:, None, :]
        tjf = ext[..., 3] if typed else None

        def agg_edges(e):  # (nw, K, ...) -> (nw, ...)
            return jnp.sum(e, axis=1)

        def node_window(a):  # replicated (N, ...) -> this shard's rows
            return jax.lax.dynamic_slice_in_dim(a, c0, nw, axis=0)

        def node_sync(a):  # window update -> replicated (N, ...)
            return jax.lax.all_gather(a, shard_axis, axis=0, tiled=True)

        def gather_nodes(a):  # window rows: rev bijection doesn't apply
            return a[j_idx]

    elif table:
        if edge_index.shape[0] != n_atoms:
            raise ValueError(
                f"nequip table layout needs rows == n_atoms, got "
                f"{edge_index.shape[0]} != {n_atoms}"
            )
        j_idx = edge_index  # (N, K)
        types_w = types
        if edge_rev is not None and edge_mask is not None:
            # gather-based force backward (see ops.scatter.table_edge_vec)
            from pair_allegro_tpu.ops.scatter import (
                table_edge_vec,
                table_edge_vec_typed,
            )

            if typed:
                vec, tjf = table_edge_vec_typed(pos_t, j_idx, edge_rev, edge_mask)
            else:
                vec = table_edge_vec(pos_t, j_idx, edge_rev, edge_mask)
        else:
            ext = pos_t[j_idx]
            vec = (ext[..., :3] if typed else ext) - positions[:, None, :]
            tjf = ext[..., 3] if typed else None

        def agg_edges(e):  # (N, K, ...) -> (N, ...)
            return jnp.sum(e, axis=1)

        def node_window(a):
            return a

        def node_sync(a):
            return a

        if edge_rev is not None and edge_mask is not None:
            # gather-based node-feature backward: the h[j] gather's
            # transpose would scatter-add (N, K, feat) message cotangents —
            # the dominant cost of the NequIP force step on TPU; the
            # symmetric-table reverse bijection turns it into a row gather
            from pair_allegro_tpu.ops.scatter import table_gather_nodes

            def gather_nodes(a):
                return table_gather_nodes(a, j_idx, edge_rev, edge_mask)

        else:

            def gather_nodes(a):
                return a[j_idx]

    else:
        i_idx, j_idx = edge_index[0], edge_index[1]
        types_w = types
        vec = positions[j_idx] - positions[i_idx]
        t_i, t_j = types[i_idx], types[j_idx]

        def agg_edges(e):
            return segment_sum(e, i_idx, n_atoms)

        def node_window(a):
            return a

        def node_sync(a):
            return a

        def gather_nodes(a):
            return a[j_idx]

    if edge_shifts is not None and cell is not None:
        vec = vec + jnp.dot(
            edge_shifts.astype(dtype), cell.astype(dtype), precision=get_matmul_precision()
        )
    r = jnp.sqrt(jnp.maximum(jnp.sum(vec * vec, axis=-1), 1e-32))

    cut_mat = jnp.asarray(cfg.cutoff_matrix(), dtype=dtype)
    if table:
        if cfg.num_types == 1:
            r_cut_edge = cut_mat[0, 0]
        else:
            # gather-free per-edge-type cutoff: one-hot the float neighbor
            # types, contract against the tiny (rows, T) center-row gather
            oh_j = (
                tjf[..., None] == jnp.arange(cfg.num_types, dtype=dtype)
            ).astype(dtype)
            cut_rows = cut_mat[types_w]  # (rows, T) — small
            r_cut_edge = jnp.einsum(
                "nkt,nt->nk", oh_j, cut_rows, precision=get_matmul_precision()
            )
    else:
        r_cut_edge = cut_mat[t_i, t_j]
    u = polynomial_cutoff(r, r_cut_edge, cfg.polynomial_cutoff_p)
    if edge_mask is not None:
        u = u * edge_mask.astype(dtype)

    Y = spherical_harmonics(vec, lmax)  # (..., D)
    bessel = bessel_basis(r, cfg.r_max, cfg.num_bessels) * u[..., None]

    import os

    # channels-last fast path: l_max=1 runs the hand-derived closed forms,
    # l_max 2..3 the generic entry-table unroll (_tp_entry_table) — same
    # contraction, same layout wins.  PAT_NEQUIP_GENERIC forces the generic
    # channels-first path (differential testing).
    use_cl = lmax <= 3 and not os.environ.get("PAT_NEQUIP_GENERIC")
    use_lmax1 = use_cl  # historical name: gates the (N, D[, 2], C) layout
    # fused conv kernel tier: TABLE layout with full rows, f32-class dtype,
    # viable block geometry; interpret mode serves the CPU differential tests
    # (PAT_FORCE_NEQUIP_FUSED=1), the real kernel serves TPU
    n_tracks = 2 if cfg.parity else 1
    D = sh_dim(lmax)
    conv_cn = None
    conv_interpret = False
    if (
        use_cl
        and lmax <= 2
        and cfg.fused_conv
        and table
        and shard_axis is None
        and capture is None
    ):
        on_tpu = jax.default_backend() == "tpu"
        forced = os.environ.get("PAT_FORCE_NEQUIP_FUSED") == "1"
        # REAL-chip kernel coverage: l_max=1 (both parities, the config of
        # record) and l_max=2 single-track.  The two-track l_max=2 kernel
        # is mathematically proven (interpret-mode f64 parity,
        # tests/test_nequip_fused.py) but crashes the Mosaic compiler
        # on-chip (tpu_compile_helper exit 1, r5 verify-tpu) — the unrolled
        # two-track entry-table body exceeds what the compiler handles
        # today, so on TPU parity l_max=2 stays on the channels-last XLA
        # path until a kernel restructure.
        kernel_ok = lmax == 1 or not cfg.parity or not on_tpu
        if kernel_ok and ((on_tpu and dtype == jnp.float32) or forced):
            from pair_allegro_tpu.ops.pallas_nequip import conv_viable

            conv_cn = conv_viable(n_atoms, edge_index.shape[1],
                                  D * n_tracks * C)
            conv_interpret = not on_tpu

    # Pad the node/edge table ONCE to a conv_cn multiple, OUTSIDE the layer
    # loop.  The r5 NequIP trace showed ~85 of 122 device-ms/step was pure
    # data formatting — per-layer jnp.pad of the (E, DF≈512) gather output
    # (~2 ms per pad, several per layer per direction), the matching [:n]
    # slices, and their backward twins.  Padding the SMALL layer-invariant
    # per-edge arrays (u, bessel, Y, j_idx) and the node rows once makes
    # every per-layer pad/slice a no-op: padded rows carry u=0 (dead
    # envelope), their j_idx points at row 0, and real rows never reference
    # padded indices, so they contribute exactly nothing; h is sliced back
    # to the real rows after the layer loop.
    pad_n = (-n_atoms) % conv_cn if conv_cn else 0
    n_rows = n_atoms + pad_n
    types_h = types
    if pad_n:
        pk = j_idx.shape[1]
        j_idx = jnp.pad(j_idx, ((0, pad_n), (0, 0)))
        u = jnp.pad(u, ((0, pad_n), (0, 0)))
        bessel = jnp.pad(bessel, ((0, pad_n), (0, 0), (0, 0)))
        Y = jnp.pad(Y, ((0, pad_n), (0, 0), (0, 0)))
        types_w = jnp.pad(types_w, ((0, pad_n),))
        types_h = types_w
        if edge_rev is not None and edge_mask is not None:
            # reverse-table bijection: real flat edge ids (i*K + k, i < N) are
            # unchanged by appending rows, but the masked-slot sentinel (the
            # appended zero row) moves from N*K to N_rows*K
            from pair_allegro_tpu.ops.scatter import table_gather_nodes

            er = jnp.where(edge_rev == n_atoms * pk, n_rows * pk, edge_rev)
            er = jnp.pad(er, ((0, pad_n), (0, 0)),
                         constant_values=n_rows * pk)
            em = jnp.pad(edge_mask, ((0, pad_n), (0, 0)))

            def gather_nodes(a, _ji=j_idx, _er=er, _em=em):
                return table_gather_nodes(a, _ji, _er, _em)

        else:

            def gather_nodes(a, _ji=j_idx):
                return a[_ji]

    # initial node features: chemical embedding in the (even) scalar slot.
    # Fast path: channels-LAST (N, D[, 2], C) so C rides the vector lanes;
    # generic path: channels-first (N, C, D[, 2]) as uniform_tp expects.
    if use_lmax1:
        if cfg.parity:
            h = jnp.zeros((n_rows, cfg.feature_dim, 2, C), dtype)
            h = h.at[:, 0, 0, :].set(params["chem_embed"].astype(dtype)[types_h])
        else:
            h = jnp.zeros((n_rows, cfg.feature_dim, C), dtype)
            h = h.at[:, 0, :].set(params["chem_embed"].astype(dtype)[types_h])
    elif cfg.parity:
        h = jnp.zeros((n_atoms, C, cfg.feature_dim, 2), dtype)
        h = h.at[:, :, 0, 0].set(params["chem_embed"].astype(dtype)[types])
    else:
        h = jnp.zeros((n_atoms, C, cfg.feature_dim), dtype)
        h = h.at[:, :, 0].set(params["chem_embed"].astype(dtype)[types])

    inv_sqrt_avg_n = 1.0 / math.sqrt(max(cfg.avg_num_neighbors, 1e-6))
    p_total = _num_paths(lmax)
    act_c = silu_norm_const()
    # variance-preserving odd activation: tanh is odd (tanh(-x) = -tanh(x)),
    # the only parity-legal nonlinearity for odd scalars; 1/sqrt(E[tanh^2])
    # under N(0,1) = 1.5926 keeps unit variance like silu_norm_const
    tanh_c = 1.5926

    def layer_fn(layer, h, Y, u, bessel):
        # per-(channel, path) radial weights, envelope-killed on padded edges
        w = mlp_apply(layer["radial_mlp"], bessel) * u[..., None]  # (..., C*P)
        w = w.reshape(*u.shape, C, p_total)
        # message: TP(h_j, Y_ij) with radial weights, per output l
        tp_out = uniform_tp(gather_nodes(h), Y, lmax)  # list of (..., C, P_l, 2l+1)
        msg_blocks = []
        p_off = 0
        for l3, t in enumerate(tp_out):
            p_l = t.shape[-2]
            w_l = w[..., :, p_off : p_off + p_l]  # (..., C, P_l)
            p_off += p_l
            msg_blocks.append(
                jnp.einsum(
                    "...cpk,...cp->...ck", t, w_l,
                    precision=get_matmul_precision(),
                )
                * (1.0 / math.sqrt(p_l))
            )
        msg = jnp.concatenate(msg_blocks, axis=-1)  # (..., C, D)
        agg = agg_edges(msg) * inv_sqrt_avg_n  # (rows, C, D)

        # species-dependent self-connection + linear mix per l, then gate —
        # all on this shard's node window (rows = N unsharded)
        h_w = node_window(h)
        new_blocks = []
        for l3 in range(lmax + 1):
            sl = sh_slice(l3)
            self_w = layer["self_w"][l3].astype(dtype)[types_w]  # (rows, C, C)
            sc = jnp.einsum(
                "ncd,nce->ned", h_w[:, :, sl], self_w, precision=get_matmul_precision()
            ) * (1.0 / math.sqrt(C))
            mixed = jnp.einsum(
                "ncd,ce->ned", agg[:, :, sl], layer["mix_w"][l3].astype(dtype),
                precision=get_matmul_precision(),
            ) * (1.0 / math.sqrt(C))
            new_blocks.append(sc + mixed)

        scalars = new_blocks[0][:, :, 0]  # (rows, C)
        out = jnp.zeros_like(h_w)
        out = out.at[:, :, 0].set(jax.nn.silu(scalars) * act_c)
        if lmax > 0:
            gates = jax.nn.sigmoid(
                jnp.dot(
                    jax.nn.silu(scalars) * act_c,
                    layer["gate_w"].astype(dtype),
                    precision=get_matmul_precision(),
                )
                * (1.0 / math.sqrt(C))
            ).reshape(-1, C, lmax)  # (rows, C, lmax)
            for l3 in range(1, lmax + 1):
                out = out.at[:, :, sh_slice(l3)].set(
                    new_blocks[l3] * gates[:, :, l3 - 1 : l3]
                )
        # sharded: broadcast the window update to every shard — multi-hop
        # message passing over the mesh (autodiff transpose: reduce-scatter)
        return node_sync(out)

    def layer_fn_parity(layer, h, Y, u, bessel):
        """Two-track layer (cfg.parity): TP paths routed by output parity
        pi XOR (l2 mod 2); per-track self-connection/mix; even scalars gate
        every l>0 block, odd scalars pass through normalized tanh."""
        routing = _ParityRouting.build(lmax)
        w = mlp_apply(layer["radial_mlp"], bessel) * u[..., None]
        w = w.reshape(*u.shape, C, 2, p_total)  # (..., C, source-track, P)
        hj = gather_nodes(h)  # (..., C, D, 2)
        tp = [uniform_tp(hj[..., pi], Y, lmax) for pi in (0, 1)]
        p_off = 0
        msg_tracks = [[], []]  # per tau: list over l3 of (..., C, 2l+1)
        for l3 in range(lmax + 1):
            p_l = len(paths_to_l(lmax, lmax, l3))
            for tau in (0, 1):
                contribs = routing.table[l3][tau]
                sel = {0: [p for (pi, p) in contribs if pi == 0],
                       1: [p for (pi, p) in contribs if pi == 1]}
                norm = 1.0 / math.sqrt(max(len(contribs), 1))
                acc = None
                for pi in (0, 1):
                    if not sel[pi]:
                        continue
                    t = tp[pi][l3][..., :, sel[pi], :]  # (..., C, Psel, k)
                    w_sel = w[..., :, pi, [p_off + p for p in sel[pi]]]
                    term = jnp.einsum(
                        "...cpk,...cp->...ck", t, w_sel,
                        precision=get_matmul_precision(),
                    )
                    acc = term if acc is None else acc + term
                msg_tracks[tau].append(acc * norm)
            p_off += p_l
        msg = jnp.stack(
            [jnp.concatenate(blocks, axis=-1) for blocks in msg_tracks],
            axis=-1,
        )  # (..., C, D, 2)
        agg = agg_edges(msg) * inv_sqrt_avg_n  # (rows, C, D, 2)

        h_w = node_window(h)
        new_blocks = [[], []]  # per tau, per l3
        for tau, (sw_key, mw_key) in enumerate(
            (("self_w", "mix_w"), ("self_w_o", "mix_w_o"))
        ):
            for l3 in range(lmax + 1):
                sl = sh_slice(l3)
                self_w = layer[sw_key][l3].astype(dtype)[types_w]
                sc = jnp.einsum(
                    "ncd,nce->ned", h_w[:, :, sl, tau], self_w,
                    precision=get_matmul_precision(),
                ) * (1.0 / math.sqrt(C))
                mixed = jnp.einsum(
                    "ncd,ce->ned", agg[:, :, sl, tau],
                    layer[mw_key][l3].astype(dtype),
                    precision=get_matmul_precision(),
                ) * (1.0 / math.sqrt(C))
                new_blocks[tau].append(sc + mixed)

        s_even = new_blocks[0][0][:, :, 0]  # (rows, C) even scalars
        s_odd = new_blocks[1][0][:, :, 0]
        act_even = jax.nn.silu(s_even) * act_c
        out = jnp.zeros_like(h_w)
        out = out.at[:, :, 0, 0].set(act_even)
        out = out.at[:, :, 0, 1].set(jnp.tanh(s_odd) * tanh_c)
        if lmax > 0:
            gates = jax.nn.sigmoid(
                jnp.dot(
                    act_even, layer["gate_w"].astype(dtype),
                    precision=get_matmul_precision(),
                )
                * (1.0 / math.sqrt(C))
            ).reshape(-1, C, lmax, 2)
            for tau in (0, 1):
                for l3 in range(1, lmax + 1):
                    out = out.at[:, :, sh_slice(l3), tau].set(
                        new_blocks[tau][l3] * gates[:, :, l3 - 1 : l3, tau]
                    )
        return node_sync(out)

    def layer_fn_cl(layer, h, Y, u, bessel):
        """Channels-last single-track layer (see module note): h (N, D, C);
        same math as layer_fn, weight columns permuted at trace time so the
        stored packing is unchanged.  l_max=1 runs the hand-derived closed
        forms; l_max>=2 the generic entry-table unroll."""
        if conv_cn is not None:
            from pair_allegro_tpu.ops.pallas_nequip import nequip_conv_fused

            # gather FLAT (DF,) node rows: the gather output is then already
            # the kernel's (E, DF) operand layout — the (N, K, D, C)-shaped
            # gather cost a full layout-copy pass per layer per direction
            hsrc = h.reshape(h.shape[0], -1)
            if _hj_bf16() and dtype == jnp.float32:
                hsrc = hsrc.astype(jnp.bfloat16)
            hj = gather_nodes(hsrc)  # (N, K, DF)
            agg = nequip_conv_fused(
                hj, bessel, u, Y,
                [w.astype(dtype) for w in _radial_cl(layer, C, p_total, 1)["w"]],
                C=C, n_tracks=1, K=u.shape[1], cn=conv_cn,
                avg_num_neighbors=cfg.avg_num_neighbors,
                interpret=conv_interpret, lmax=lmax,
            ).reshape(h.shape[0], D, C)
        else:
            w = mlp_apply(_radial_cl(layer, C, p_total, 1), bessel) * u[..., None]
            w = w.reshape(*u.shape, p_total, C)
            hj = gather_nodes(h)
            msg = (
                _msg_lmax1_single_cl(hj, Y, w)
                if lmax == 1
                else _msg_generic_single_cl(hj, Y, w, lmax)
            )
            agg = agg_edges(msg) * inv_sqrt_avg_n  # (rows, D, C)

        h_w = node_window(h)
        new_blocks = []
        for l3 in range(lmax + 1):
            sl = sh_slice(l3)
            sc = _self_connect(
                h_w[:, sl, :], layer["self_w"][l3].astype(dtype), types_w,
                get_matmul_precision(),
            ) * (1.0 / math.sqrt(C))
            mixed = jnp.einsum(
                "ndc,ce->nde", agg[:, sl, :], layer["mix_w"][l3].astype(dtype),
                precision=get_matmul_precision(),
            ) * (1.0 / math.sqrt(C))
            new_blocks.append(sc + mixed)

        scalars = new_blocks[0][:, 0, :]  # (rows, C)
        out = jnp.zeros_like(h_w)
        out = out.at[:, 0, :].set(jax.nn.silu(scalars) * act_c)
        gates = jax.nn.sigmoid(
            jnp.dot(
                jax.nn.silu(scalars) * act_c,
                _gate_cl(layer["gate_w"].astype(dtype), C, lmax, 1),
                precision=get_matmul_precision(),
            )
            * (1.0 / math.sqrt(C))
        ).reshape(-1, lmax, C)  # (rows, lmax, C)
        for l3 in range(1, lmax + 1):
            out = out.at[:, sh_slice(l3), :].set(
                new_blocks[l3] * gates[:, l3 - 1 : l3, :]
            )
        return node_sync(out)

    def layer_fn_parity_cl(layer, h, Y, u, bessel):
        """Channels-last two-track layer: h (N, D, 2, C); same math as
        layer_fn_parity.  l_max=1 runs the closed forms; l_max>=2 the
        generic entry-table unroll."""
        if conv_cn is not None:
            from pair_allegro_tpu.ops.pallas_nequip import nequip_conv_fused

            hsrc = h.reshape(h.shape[0], -1)
            if _hj_bf16() and dtype == jnp.float32:
                hsrc = hsrc.astype(jnp.bfloat16)
            hj = gather_nodes(hsrc)  # (N, K, DF) flat rows
            agg = nequip_conv_fused(
                hj, bessel, u, Y,
                [w.astype(dtype) for w in _radial_cl(layer, C, p_total, 2)["w"]],
                C=C, n_tracks=2, K=u.shape[1], cn=conv_cn,
                avg_num_neighbors=cfg.avg_num_neighbors,
                interpret=conv_interpret, lmax=lmax,
            ).reshape(h.shape[0], D, 2, C)
        else:
            w = mlp_apply(_radial_cl(layer, C, p_total, 2), bessel) * u[..., None]
            w = w.reshape(*u.shape, 2, p_total, C)
            hj = gather_nodes(h)
            msg = (
                _msg_lmax1_parity_cl(hj, Y, w)
                if lmax == 1
                else _msg_generic_parity_cl(hj, Y, w, lmax)
            )
            agg = agg_edges(msg) * inv_sqrt_avg_n  # (rows, D, 2, C)

        h_w = node_window(h)
        new_blocks = [[], []]  # per tau, per l3
        for tau, (sw_key, mw_key) in enumerate(
            (("self_w", "mix_w"), ("self_w_o", "mix_w_o"))
        ):
            for l3 in range(lmax + 1):
                sl = sh_slice(l3)
                sc = _self_connect(
                    h_w[:, sl, tau, :], layer[sw_key][l3].astype(dtype),
                    types_w, get_matmul_precision(),
                ) * (1.0 / math.sqrt(C))
                mixed = jnp.einsum(
                    "ndc,ce->nde", agg[:, sl, tau, :],
                    layer[mw_key][l3].astype(dtype),
                    precision=get_matmul_precision(),
                ) * (1.0 / math.sqrt(C))
                new_blocks[tau].append(sc + mixed)

        s_even = new_blocks[0][0][:, 0, :]  # (rows, C) even scalars
        s_odd = new_blocks[1][0][:, 0, :]
        act_even = jax.nn.silu(s_even) * act_c
        out = jnp.zeros_like(h_w)
        out = out.at[:, 0, 0, :].set(act_even)
        out = out.at[:, 0, 1, :].set(jnp.tanh(s_odd) * tanh_c)
        gates = jax.nn.sigmoid(
            jnp.dot(
                act_even, _gate_cl(layer["gate_w"].astype(dtype), C, lmax, 2),
                precision=get_matmul_precision(),
            )
            * (1.0 / math.sqrt(C))
        ).reshape(-1, lmax, 2, C)  # (rows, lmax, tau, C)
        for tau in (0, 1):
            for l3 in range(1, lmax + 1):
                out = out.at[:, sh_slice(l3), tau, :].set(
                    new_blocks[tau][l3] * gates[:, l3 - 1 : l3, tau, :]
                )
        return node_sync(out)

    if use_lmax1:
        step = layer_fn_parity_cl if cfg.parity else layer_fn_cl
    else:
        step = layer_fn_parity if cfg.parity else layer_fn
    do_remat = (conv_cn is None) if cfg.remat == "auto" else bool(cfg.remat)
    if do_remat:
        step = jax.checkpoint(step)
    for layer in params["layers"]:
        h = step(layer, h, Y, u, bessel)
    if pad_n:
        # back to the real rows for the readout; the padded tail evolved
        # harmlessly (no real row ever gathers from a padded index)
        h = h[:n_atoms]
        types_w = types_w[:n_atoms]
    if capture is not None:
        # public contract: channels-FIRST (N, C, D[, 2]) regardless of the
        # internal fast-path layout (parity tests + import harness read this)
        if use_lmax1:
            capture["node_features"] = (
                jnp.moveaxis(h, -1, 1) if cfg.parity else jnp.swapaxes(h, -1, -2)
            )
        else:
            capture["node_features"] = h

    if use_lmax1:
        h_scalar = (
            node_window(h)[:, 0, 0, :] if cfg.parity else node_window(h)[:, 0, :]
        )
    else:
        h_scalar = (
            node_window(h)[:, :, 0, 0] if cfg.parity else node_window(h)[:, :, 0]
        )
    e_atom = mlp_apply(params["readout_mlp"], h_scalar)[:, 0]
    scale = params["per_type_scale"].astype(dtype)[types_w]
    shift = params["per_type_shift"].astype(dtype)[types_w]
    e_atom = scale * e_atom + shift
    if atom_mask is not None:
        e_atom = e_atom * atom_mask.astype(dtype)
    return {
        "atomic_energy": e_atom,
        "total_energy": jnp.sum(e_atom),
    }
