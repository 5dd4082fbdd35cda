"""Import model weights from torch checkpoints (.ckpt/.pth state dicts).

The reference consumes models as COMPILED libtorch artifacts produced by
``nequip-compile`` from a training checkpoint (tests/conftest.py:141-171);
the training checkpoint itself is a Lightning .ckpt whose state_dict holds
the raw weights.  This module is the TPU-native replacement for that
pipeline: read the torch state dict OFFLINE (torch never enters the MD
runtime), map the named tensors into our JAX parameter pytree, and save
natively via pair_allegro_tpu.checkpoint.

Key mapping: by default source keys are expected to match our canonical
flat names ('/'-joined pytree paths, e.g. ``two_body_mlp/w/0``).  A
``key_map`` dict translates foreign naming schemes (e.g. upstream
nequip-allegro module paths) to ours; common Lightning prefixes
(``state_dict`` nesting, ``model.`` prefixes) are stripped automatically,
and torch ``nn.Linear`` (out, in) weights are transposed to our (in, out)
on shape evidence.
"""

from __future__ import annotations

import numpy as np

from pair_allegro_tpu.checkpoint import _flatten, _unflatten

_STRIP_PREFIXES = ("model.", "func.", "module.", "_orig_mod.")

# metadata keys the reference pulls from a compiled TorchScript artifact
# (/root/reference/pair_nequip_allegro.cpp:214-222)
_TS_METADATA_KEYS = (
    "r_max", "per_edge_type_cutoff", "type_names", "num_types", "allow_tf32"
)


def _torch():
    try:
        import torch
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "importing .ckpt/.pth checkpoints requires torch (offline only); "
            "the MD runtime itself never needs it"
        ) from e
    return torch


def _strip(name: str) -> str:
    changed = True
    while changed:
        changed = False
        for p in _STRIP_PREFIXES:
            if name.startswith(p):
                name = name[len(p):]
                changed = True
    return name


def load_torchscript_artifact(path: str):
    """Open a compiled TorchScript package (``model.nequip.pth``) offline.

    The reference's actual input format is this artifact: it loads it via
    ``torch::jit::load(path, device, metadata)`` and reads the embedded
    metadata keys r_max / per_edge_type_cutoff / type_names / num_types /
    allow_tf32 (/root/reference/pair_nequip_allegro.cpp:197-222).  The same
    metadata lives in the archive's extra-files map; the module's
    state_dict carries the raw weights.  Returns ({name: np.ndarray},
    {metadata_key: str}).
    """
    torch = _torch()
    extra = {k: "" for k in _TS_METADATA_KEYS}
    mod = torch.jit.load(path, map_location="cpu", _extra_files=extra)
    sd = {
        _strip(k): v.detach().cpu().numpy() for k, v in mod.state_dict().items()
    }
    meta = {}
    for k, v in extra.items():
        if isinstance(v, bytes):
            v = v.decode()
        if v:
            meta[k] = v
    return sd, meta


def config_kwargs_from_metadata(meta: dict) -> dict:
    """Artifact metadata strings -> model-config kwargs (the parse the
    reference does in ``coeff``: r_max :216-222, type names :274-294,
    per-edge-type cutoff matrix :303-328)."""
    kw = {}
    if "r_max" in meta:
        kw["r_max"] = float(meta["r_max"])
    if "type_names" in meta:
        kw["type_names"] = tuple(meta["type_names"].split())
    if "per_edge_type_cutoff" in meta:
        vals = [float(x) for x in meta["per_edge_type_cutoff"].split()]
        nt = len(kw.get("type_names", ())) or int(meta.get("num_types", 0))
        if nt and len(vals) == nt * nt:
            kw["per_edge_type_cutoff"] = tuple(
                tuple(vals[i * nt : (i + 1) * nt]) for i in range(nt)
            )
    return kw


def _is_torchscript(path: str) -> bool:
    """TorchScript packages are zip archives containing constants.pkl +
    code/; eager checkpoints are zips with only data.pkl."""
    import zipfile

    try:
        with zipfile.ZipFile(path) as z:
            names = z.namelist()
        return any(n.endswith("constants.pkl") for n in names)
    except (OSError, zipfile.BadZipFile):
        return False


def load_torch_state_dict(path: str) -> dict[str, np.ndarray]:
    """Read a torch checkpoint into {name: np.ndarray} (torch is an offline
    dependency; raises a clear error when unavailable).  Accepts both eager
    state-dict checkpoints (Lightning .ckpt) and compiled TorchScript
    packages (.nequip.pth — metadata discarded here; use
    load_torchscript_artifact to keep it)."""
    torch = _torch()
    if _is_torchscript(path):
        sd, _ = load_torchscript_artifact(path)
        return sd
    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    out = {}
    for k, v in obj.items():
        if not hasattr(v, "detach"):
            continue
        out[_strip(k)] = v.detach().cpu().numpy()
    return out


def map_state_dict(
    sd: dict[str, np.ndarray],
    template_params,
    key_map: dict[str, str] | None = None,
    strict: bool = True,
    transpose: set[str] | str = "auto",
):
    """Fill the template pytree from named tensors.

    key_map values are source-key strings OR callables ``sd -> ndarray`` for
    sources whose weights are PACKED differently than ours (e.g. e3nn
    ``o3.Linear`` flat irreps-block concatenation — see
    ``e3nn_allegro_key_map``).  A callable must return the array already in
    canonical orientation; a KeyError it raises counts as a missing key.

    transpose: "auto" transposes 2-D tensors only when the direct shape does
    not fit but the transpose does (ambiguous for square matrices!); a set of
    canonical keys transposes exactly those — key-map presets that KNOW the
    source orientation (torch ``nn.Linear`` stores (out, in)) pass the set so
    square layers import correctly.  Missing keys: error when strict, else
    keep the template value (useful for partially-trained or schema-evolved
    checkpoints).
    """
    flat_t = _flatten(template_params)
    key_map = key_map or {}
    out, missing, mismatched = {}, [], []
    for k, tmpl in flat_t.items():
        src_key = key_map.get(k, k)
        if callable(src_key):
            try:
                arr = np.asarray(src_key(sd))
            except KeyError:
                missing.append(k)
                out[k] = tmpl
                continue
            if arr.shape == tmpl.shape:
                out[k] = arr.astype(tmpl.dtype)
            else:
                mismatched.append((k, arr.shape, tmpl.shape))
            continue
        if src_key not in sd and src_key.replace("/", ".") in sd:
            # torch module trees always join with '.'; canonical names use '/'
            src_key = src_key.replace("/", ".")
        if src_key not in sd:
            missing.append(k)
            out[k] = tmpl
            continue
        arr = np.asarray(sd[src_key])
        if transpose != "auto" and k in transpose:
            if arr.ndim != 2 or arr.T.shape != tmpl.shape:
                mismatched.append((k, arr.shape, tmpl.shape))
                continue
            out[k] = arr.T.astype(tmpl.dtype)
        elif arr.shape == tmpl.shape:
            out[k] = arr.astype(tmpl.dtype)
        elif arr.ndim == 2 and arr.T.shape == tmpl.shape:
            out[k] = arr.T.astype(tmpl.dtype)  # torch Linear (out, in)
        else:
            mismatched.append((k, arr.shape, tmpl.shape))
    if mismatched:
        raise ValueError(f"shape mismatches: {mismatched}")
    if strict and missing:
        raise KeyError(
            f"{len(missing)} parameter(s) not found in checkpoint: "
            f"{missing[:8]}{'...' if len(missing) > 8 else ''}"
        )
    return _unflatten(out), missing


def propose_key_map(
    sd: dict[str, np.ndarray], template_params, name_ratio_min: float = 0.35
):
    """Shape-match a foreign state dict against the template pytree.

    The safe half of an auto-importer: propose only what shapes determine
    unambiguously, refuse the rest.  For each (shape class) the proposal is

    * exactly one template key and one source key of that shape → mapped;
    * equal counts > 1 → mapped ONLY if name similarity (difflib ratio on
      '/'-vs-'.'-normalized names) yields a stable bijection with every pair
      ≥ ``name_ratio_min`` AND each side's best match is mutual — otherwise
      the whole class is reported ambiguous with its candidates;
    * unequal counts → ambiguous.

    2-D source tensors additionally match transposed (torch ``nn.Linear`` is
    (out, in)); a transposed match is tagged so the caller can build the
    ``transpose`` set.  Square 2-D matches are proposed but tagged
    ``orientation-unverifiable`` — shape evidence cannot pin them
    (the reason the pinned presets carry explicit transpose sets).

    Returns (proposed: {canonical: source}, transpose_keys: set,
    ambiguous: {shape_repr: (template_keys, source_keys)},
    unmatched_template: list, unused_source: list).
    """
    import difflib

    flat_t = _flatten(template_params)
    by_shape_t: dict[tuple, list[str]] = {}
    for k, v in flat_t.items():
        by_shape_t.setdefault(tuple(v.shape), []).append(k)
    by_shape_s: dict[tuple, list[str]] = {}
    for k, v in sd.items():
        by_shape_s.setdefault(tuple(np.asarray(v).shape), []).append(k)

    def _norm(name: str) -> str:
        return name.replace(".", "/").replace("layers/", "").lower()

    proposed: dict[str, str] = {}
    tkeys: set[str] = set()
    ambiguous: dict[str, tuple[list[str], list[str]]] = {}
    used_src: set[str] = set()

    for shape, t_keys in sorted(by_shape_t.items(), key=lambda x: str(x[0])):
        direct = list(by_shape_s.get(shape, ()))
        flipped: list[str] = []
        square = len(shape) == 2 and shape[0] == shape[1]
        if len(shape) == 2 and not square:
            flipped = [k for k in by_shape_s.get(shape[::-1], ())
                       if k not in direct]
        cands = [k for k in direct + flipped if k not in used_src]
        if len(cands) == len(t_keys) == 1:
            src = cands[0]
            proposed[t_keys[0]] = src
            used_src.add(src)
            if src in flipped:
                tkeys.add(t_keys[0])
        elif len(cands) == len(t_keys) and t_keys:
            # name-similarity bijection, required to be mutual-best
            ratio = {
                (t, s): difflib.SequenceMatcher(
                    None, _norm(t), _norm(s)
                ).ratio()
                for t in t_keys for s in cands
            }
            pick = {t: max(cands, key=lambda s: ratio[(t, s)]) for t in t_keys}
            rpick = {s: max(t_keys, key=lambda t: ratio[(t, s)]) for s in cands}
            bijective = (
                len(set(pick.values())) == len(t_keys)
                and all(rpick[pick[t]] == t for t in t_keys)
                and all(ratio[(t, pick[t])] >= name_ratio_min for t in t_keys)
            )
            if bijective:
                for t in t_keys:
                    proposed[t] = pick[t]
                    used_src.add(pick[t])
                    if pick[t] in flipped:
                        tkeys.add(t)
            else:
                ambiguous[str(shape)] = (t_keys, cands)
        else:
            ambiguous[str(shape)] = (t_keys, cands)

    unmatched = [k for k in flat_t if k not in proposed
                 and not any(k in g[0] for g in ambiguous.values())]
    unused = [k for k in sd if k not in used_src]
    return proposed, tkeys, ambiguous, unmatched, unused


def inspect_state_dict(sd: dict[str, np.ndarray], template_params=None) -> str:
    """Human-readable report of a foreign checkpoint: every tensor with its
    shape/dtype, and — when a template pytree is given — the shape-matched
    key-map proposal from ``propose_key_map`` (the ``--inspect`` mode of the
    CLI importer; the offline analog of reading the reference's printed
    type-mapping table, /root/reference/pair_nequip_allegro.cpp:274-294)."""
    lines = [f"source checkpoint: {len(sd)} tensors"]
    for k in sorted(sd):
        a = np.asarray(sd[k])
        lines.append(f"  {k}  {tuple(a.shape)}  {a.dtype}")
    if template_params is None:
        return "\n".join(lines)
    flat_t = _flatten(template_params)
    lines.append(f"template: {len(flat_t)} parameters")
    for k in sorted(flat_t):
        lines.append(f"  {k}  {tuple(flat_t[k].shape)}")
    proposed, tkeys, ambiguous, unmatched, unused = propose_key_map(
        sd, template_params
    )
    lines.append(f"proposed key map ({len(proposed)} of {len(flat_t)}):")
    for t in sorted(proposed):
        square = flat_t[t].ndim == 2 and flat_t[t].shape[0] == flat_t[t].shape[1]
        tag = (" [transposed]" if t in tkeys
               else " [orientation-unverifiable: square]" if square else "")
        lines.append(f"  {t}  <-  {proposed[t]}{tag}")
    if ambiguous:
        lines.append(
            f"AMBIGUOUS ({len(ambiguous)} shape classes) — refusing to guess; "
            "resolve via an explicit key_map:"
        )
        for shape, (tk, sk) in sorted(ambiguous.items()):
            lines.append(f"  shape {shape}:")
            lines.append(f"    template: {', '.join(sorted(tk))}")
            lines.append(f"    source:   {', '.join(sorted(sk))}")
    if unmatched:
        lines.append(f"unmatched template params ({len(unmatched)}):")
        for k in sorted(unmatched):
            lines.append(f"  {k}  {tuple(flat_t[k].shape)}")
    if unused:
        lines.append(f"unused source tensors ({len(unused)}):")
        for k in sorted(unused):
            lines.append(f"  {k}  {tuple(np.asarray(sd[k]).shape)}")
    return "\n".join(lines)


def upstream_allegro_key_map(cfg) -> tuple[dict[str, str], set[str]]:
    """Pinned (key_map, transpose_keys) for TWIN-SHAPED Allegro checkpoints.

    VALIDATION STATUS: this preset is derived from the module names in the
    reference training YAML
    (/root/reference/tests/test_data/test_repro_allegro.yaml:79-103) and
    round-trip-validated against the torch twin (pair_allegro_tpu.torch_ref)
    — NOT against a genuine upstream-trained ``last.ckpt`` (the nequip
    package is absent from this image, COMPONENTS.md).  Real upstream
    checkpoints use e3nn modules whose state-dict naming and weight packing
    may differ; import one with an explicit ``key_map`` dict (or extend this
    preset) after inspecting its keys, e.g. via
    ``load_torch_state_dict(path).keys()``.

    Canonical flat name (ours)      → checkpoint key (after ``model.`` strip)
      two_body_mlp/w/{i}            → radial_chemical_embed.two_body_mlp.layers.{i}.weight
      tensor_embed                  → tensor_embed.weight                (out, in)
      layers/{k}/env_weight         → layers.{k}.env_embed.weight       (out, in)
      layers/{k}/latent_mlp/w/{i}   → layers.{k}.latent_mlp.layers.{i}.weight
      layers/{k}/mix/l{l}           → layers.{k}.tp_mix.l{l}.weight     (out, in)
      readout_mlp/w/{i}             → readout_mlp.layers.{i}.weight
      per_type_shift / per_type_scale → per_type_energy_shifts / _scales

    Every 2-D entry is a torch ``nn.Linear`` weight in (out, in) orientation,
    so all of them are returned in ``transpose_keys`` — import is exact even
    for square layers.  The torch twin that writes checkpoints in this exact
    shape (and the layer-by-layer parity harness validating the round trip)
    is ``pair_allegro_tpu.torch_ref``.
    """
    km: dict[str, str] = {}
    tkeys: set[str] = set()

    def _mlp(ours: str, theirs: str, n_linear: int):
        for i in range(n_linear):
            km[f"{ours}/w/{i}"] = f"{theirs}.layers.{i}.weight"
            tkeys.add(f"{ours}/w/{i}")

    _mlp("two_body_mlp", "radial_chemical_embed.two_body_mlp",
         cfg.two_body_mlp_depth + 1)
    km["tensor_embed"] = "tensor_embed.weight"
    tkeys.add("tensor_embed")
    for k in range(cfg.num_layers):
        km[f"layers/{k}/env_weight"] = f"layers.{k}.env_embed.weight"
        tkeys.add(f"layers/{k}/env_weight")
        _mlp(f"layers/{k}/latent_mlp", f"layers.{k}.latent_mlp",
             cfg.allegro_mlp_hidden_layers_depth + 1)
        for l3 in range(cfg.l_max + 1):
            km[f"layers/{k}/mix/l{l3}"] = f"layers.{k}.tp_mix.l{l3}.weight"
            tkeys.add(f"layers/{k}/mix/l{l3}")
    _mlp("readout_mlp", "readout_mlp", cfg.readout_mlp_hidden_layers_depth + 1)
    km["per_type_shift"] = "per_type_energy_shifts"
    km["per_type_scale"] = "per_type_energy_scales"
    return km, tkeys


def e3nn_allegro_key_map(cfg) -> tuple[dict, set[str]]:
    """(key_map, transpose_keys) for e3nn-STYLE PACKED Allegro checkpoints —
    the second, adversarial import fixture the round-3 review asked for.

    Real upstream checkpoints come from e3nn modules whose weight STORAGE
    differs structurally from plain ``nn.Linear`` trees:

    * ``e3nn.o3.Linear`` holds ONE flat 1-D ``weight`` — the concatenation,
      in instruction order, of per-irrep blocks each of shape
      (mul_in, mul_out) — with 1/sqrt(fan_in) path normalization applied at
      run time (matching our run-time scaling convention);
    * ``e3nn.nn.FullyConnectedNet`` is a ``torch.nn.Sequential`` of layers
      whose state-dict keys are bare indices (``mlp.0.weight``) and whose
      weights are (h_in, h_out) — the OPPOSITE orientation of
      ``torch.nn.Linear`` — also scaled by 1/sqrt(h_in) at run time.

    This preset maps that layout (as produced by
    ``torch_ref.e3nn_pack_allegro_state``):

      two_body_mlp/w/{i}   ← radial_chemical_embed.two_body_mlp.{i}.weight  (in, out; direct)
      tensor_embed         ← tensor_embed.weight       flat (ns·C,) → (ns, C)
      layers/{k}/env_weight← layers.{k}.env_embed.weight  flat (ns·C,) → (ns, C)
      layers/{k}/mix/l{l}  ← slice of layers.{k}.tp_mix.weight — ONE flat
                             concatenation over l of (C·p_l, C) blocks
      readout/latent MLPs  ← indexed Sequential keys, (in, out) direct
      per_type_shift/scale ← per_type_energy_shifts / _scales

    REMAINING UNKNOWNS (documented, not guessable offline — the nequip
    package is uninstallable in this image): (a) the upstream module-tree
    NAMES (this fixture's names follow the training-YAML module names, like
    the twin's); (b) the (channel, path) ordering inside each o3.Linear
    multiplicity axis — this preset assumes channel-major, matching a
    reshape from (C, p_l); flipping to path-major is the one-line
    ``order="F"`` change in ``_unpack_2d`` below.  Both are resolvable in
    minutes against a real checkpoint via ``cli import --inspect``.
    """
    km: dict = {}
    tkeys: set[str] = set()
    ns, C, nt = cfg.num_scalar_features, cfg.num_tensor_features, cfg.num_types
    from pair_allegro_tpu.ops.tp import paths_to_l

    def _unpack_2d(key: str, off: int, rows: int, cols: int):
        def get(sd, key=key, off=off, rows=rows, cols=cols):
            return np.asarray(sd[key]).reshape(-1)[off : off + rows * cols] \
                .reshape(rows, cols, order="C")

        return get

    def _mlp(ours: str, theirs: str, n_linear: int):
        for i in range(n_linear):
            km[f"{ours}/w/{i}"] = f"{theirs}.{i}.weight"  # (in, out) direct

    _mlp("two_body_mlp", "radial_chemical_embed.two_body_mlp",
         cfg.two_body_mlp_depth + 1)
    km["tensor_embed"] = _unpack_2d("tensor_embed.weight", 0, ns, C)
    for k in range(cfg.num_layers):
        km[f"layers/{k}/env_weight"] = _unpack_2d(
            f"layers.{k}.env_embed.weight", 0, ns, C
        )
        _mlp(f"layers/{k}/latent_mlp", f"layers.{k}.latent_mlp",
             cfg.allegro_mlp_hidden_layers_depth + 1)
        off = 0
        for l3 in range(cfg.l_max + 1):
            pl = len(paths_to_l(cfg.l_max, cfg.l_max, l3,
                                getattr(cfg, "parity", False)))
            km[f"layers/{k}/mix/l{l3}"] = _unpack_2d(
                f"layers.{k}.tp_mix.weight", off, C * pl, C
            )
            off += C * pl * C
    _mlp("readout_mlp", "readout_mlp", cfg.readout_mlp_hidden_layers_depth + 1)
    km["per_type_shift"] = "per_type_energy_shifts"
    km["per_type_scale"] = "per_type_energy_scales"
    return km, tkeys


def upstream_nequip_key_map(cfg) -> tuple[dict[str, str], set[str]]:
    """Pinned (key_map, transpose_keys) for TWIN-SHAPED NequIP checkpoints
    (module tree per the training YAML
    /root/reference/tests/test_data/test_repro_nequip.yaml:83-100; validated
    round-trip against the torch twin, torch_ref.build_torch_nequip — NOT
    against a genuine upstream checkpoint; see upstream_allegro_key_map for
    the validation-status caveat, which applies equally here).

    Canonical flat name (ours)      → checkpoint key (after ``model.`` strip)
      chem_embed                    → chemical_embedding
      layers/{k}/radial_mlp/w/{i}   → layers.{k}.radial_mlp.layers.{i}.weight
      layers/{k}/self_w/{l}         → layers.{k}.self_interaction.{l}   (3-D, direct)
      layers/{k}/mix_w/{l}          → layers.{k}.linear.{l}.weight      (out, in)
      layers/{k}/gate_w             → layers.{k}.gate.weight            (out, in)
      readout_mlp/w/{i}             → readout_mlp.layers.{i}.weight
      per_type_shift / per_type_scale → per_type_energy_shifts / _scales
    """
    km: dict[str, str] = {}
    tkeys: set[str] = set()

    def _mlp(ours: str, theirs: str, n_linear: int):
        for i in range(n_linear):
            km[f"{ours}/w/{i}"] = f"{theirs}.layers.{i}.weight"
            tkeys.add(f"{ours}/w/{i}")

    km["chem_embed"] = "chemical_embedding"
    parity = bool(getattr(cfg, "parity", False))
    for k in range(cfg.num_layers):
        _mlp(f"layers/{k}/radial_mlp", f"layers.{k}.radial_mlp",
             cfg.radial_mlp_depth + 1)
        for l3 in range(cfg.l_max + 1):
            km[f"layers/{k}/self_w/{l3}"] = f"layers.{k}.self_interaction.{l3}"
            km[f"layers/{k}/mix_w/{l3}"] = f"layers.{k}.linear.{l3}.weight"
            tkeys.add(f"layers/{k}/mix_w/{l3}")
            if parity:  # odd-track twins (parity: true models)
                km[f"layers/{k}/self_w_o/{l3}"] = (
                    f"layers.{k}.self_interaction_o.{l3}"
                )
                km[f"layers/{k}/mix_w_o/{l3}"] = f"layers.{k}.linear_o.{l3}.weight"
                tkeys.add(f"layers/{k}/mix_w_o/{l3}")
        km[f"layers/{k}/gate_w"] = f"layers.{k}.gate.weight"
        tkeys.add(f"layers/{k}/gate_w")
    _mlp("readout_mlp", "readout_mlp", cfg.readout_mlp_depth + 1)
    km["per_type_shift"] = "per_type_energy_shifts"
    km["per_type_scale"] = "per_type_energy_scales"
    return km, tkeys


def e3nn_nequip_key_map(cfg) -> tuple[dict, set[str]]:
    """(key_map, transpose_keys) for e3nn-STYLE PACKED NequIP checkpoints —
    the NequIP mirror of ``e3nn_allegro_key_map`` (layout produced by
    ``torch_ref.e3nn_pack_nequip_state``; see that docstring for the packing
    contract).  Real upstream NequIP checkpoints store per-layer weights in
    e3nn modules: one flat multi-instruction ``o3.Linear`` weight per layer
    (irreps-block concatenation), a flat ``FullyConnectedTensorProduct``
    self-connection whose per-instruction blocks are
    (mul_in1=C, mul_in2=num_types, mul_out=C), indexed-Sequential
    ``FullyConnectedNet`` radial nets in (in, out) orientation, and a flat
    scalar gate linear.  Load contract of the reference:
    /root/reference/pair_nequip_allegro.cpp:214-232; the config of record is
    /root/reference/tests/test_data/test_repro_nequip.yaml:83-100.

    The same REMAINING UNKNOWNS as the Allegro preset apply (upstream module
    NAMES; e3nn's canonical irrep sort vs this preset's l-major/even-odd
    instruction order) — resolvable against a real artifact via
    ``cli import --inspect``, untestable offline in this image (no network,
    no nequip package)."""
    km: dict = {}
    tkeys: set[str] = set()
    C, nt, lmax = cfg.num_features, cfg.num_types, cfg.l_max
    parity = bool(getattr(cfg, "parity", False))
    n_tracks = 2 if parity else 1

    def _flat_2d(key: str, off: int, rows: int, cols: int):
        def get(sd, key=key, off=off, rows=rows, cols=cols):
            return np.asarray(sd[key]).reshape(-1)[off : off + rows * cols] \
                .reshape(rows, cols)

        return get

    def _flat_self(key: str, off: int):
        # (C, nt, C) instruction block -> the twin/JAX (nt, C, C) storage
        def get(sd, key=key, off=off):
            blk = np.asarray(sd[key]).reshape(-1)[off : off + C * nt * C]
            return blk.reshape(C, nt, C).transpose(1, 0, 2)

        return get

    def _mlp(ours: str, theirs: str, n_linear: int):
        for i in range(n_linear):
            km[f"{ours}/w/{i}"] = f"{theirs}.{i}.weight"  # (in, out) direct

    km["chem_embed"] = "chemical_embedding"
    for k in range(cfg.num_layers):
        _mlp(f"layers/{k}/radial_mlp", f"layers.{k}.radial_mlp",
             cfg.radial_mlp_depth + 1)
        off = 0
        for l3 in range(lmax + 1):
            km[f"layers/{k}/mix_w/{l3}"] = _flat_2d(
                f"layers.{k}.linear.weight", off, C, C
            )
            km[f"layers/{k}/self_w/{l3}"] = _flat_self(
                f"layers.{k}.self_interaction.weight", off * nt
            )
            off += C * C
            if parity:
                km[f"layers/{k}/mix_w_o/{l3}"] = _flat_2d(
                    f"layers.{k}.linear.weight", off, C, C
                )
                km[f"layers/{k}/self_w_o/{l3}"] = _flat_self(
                    f"layers.{k}.self_interaction.weight", off * nt
                )
                off += C * C
        km[f"layers/{k}/gate_w"] = _flat_2d(
            f"layers.{k}.gate.weight", 0, C, C * max(lmax, 1) * n_tracks
        )
    _mlp("readout_mlp", "readout_mlp", cfg.readout_mlp_depth + 1)
    km["per_type_shift"] = "per_type_energy_shifts"
    km["per_type_scale"] = "per_type_energy_scales"
    return km, tkeys


def import_allegro_checkpoint(
    path: str, cfg, key_map=None, strict: bool = True, dtype=None
):
    """torch checkpoint -> Allegro JAX params for `cfg` (shapes from init).

    key_map: explicit dict, or the string "upstream" to use the pinned
    upstream naming preset (`upstream_allegro_key_map`, which also fixes
    Linear-weight orientation for square layers).
    """
    import jax
    import jax.numpy as jnp

    from pair_allegro_tpu.models.allegro import allegro_init

    transpose: set[str] | str = "auto"
    if key_map == "upstream":
        key_map, transpose = upstream_allegro_key_map(cfg)
    elif key_map == "e3nn":
        key_map, transpose = e3nn_allegro_key_map(cfg)
    template = allegro_init(jax.random.PRNGKey(0), cfg, dtype=dtype or jnp.float32)
    template = jax.tree.map(np.asarray, template)
    sd = load_torch_state_dict(path)
    params, missing = map_state_dict(sd, template, key_map, strict, transpose)
    return jax.tree.map(jnp.asarray, params), missing


def import_nequip_checkpoint(
    path: str, cfg, key_map=None, strict: bool = True, dtype=None
):
    """torch checkpoint -> NequIP JAX params for `cfg`.

    key_map: explicit dict, or "upstream" for the pinned preset
    (`upstream_nequip_key_map`)."""
    import jax
    import jax.numpy as jnp

    from pair_allegro_tpu.models.nequip import nequip_init

    transpose: set[str] | str = "auto"
    if key_map == "upstream":
        key_map, transpose = upstream_nequip_key_map(cfg)
    elif key_map == "e3nn":
        key_map, transpose = e3nn_nequip_key_map(cfg)
    template = nequip_init(jax.random.PRNGKey(0), cfg, dtype=dtype or jnp.float32)
    template = jax.tree.map(np.asarray, template)
    sd = load_torch_state_dict(path)
    params, missing = map_state_dict(sd, template, key_map, strict, transpose)
    return jax.tree.map(jnp.asarray, params), missing
