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


def load_torch_state_dict(path: str) -> dict[str, np.ndarray]:
    """Read a torch checkpoint into {name: np.ndarray} (torch is an offline
    dependency; raises a clear error when unavailable)."""
    try:
        import torch
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "importing .ckpt/.pth checkpoints requires torch (offline only); "
            "the MD runtime itself never needs it"
        ) from e
    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    out = {}
    for k, v in obj.items():
        if not hasattr(v, "detach"):
            continue
        name = k
        changed = True
        while changed:
            changed = False
            for p in _STRIP_PREFIXES:
                if name.startswith(p):
                    name = name[len(p):]
                    changed = True
        out[name] = v.detach().cpu().numpy()
    return out


def map_state_dict(
    sd: dict[str, np.ndarray],
    template_params,
    key_map: dict[str, str] | None = None,
    strict: bool = True,
):
    """Fill the template pytree from named tensors.

    Torch Linear (out, in) tensors are transposed when that matches the
    template shape and the direct shape does not.  Missing keys: error when
    strict, else keep the template value (useful for partially-trained or
    schema-evolved checkpoints).
    """
    flat_t = _flatten(template_params)
    key_map = key_map or {}
    out, missing, mismatched = {}, [], []
    for k, tmpl in flat_t.items():
        src_key = key_map.get(k, k)
        if src_key not in sd:
            missing.append(k)
            out[k] = tmpl
            continue
        arr = np.asarray(sd[src_key])
        if arr.shape == tmpl.shape:
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


def import_allegro_checkpoint(path: str, cfg, key_map=None, strict: bool = True):
    """torch checkpoint -> Allegro JAX params for `cfg` (shapes from init)."""
    import jax
    import jax.numpy as jnp

    from pair_allegro_tpu.models.allegro import allegro_init

    template = allegro_init(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    template = jax.tree.map(np.asarray, template)
    sd = load_torch_state_dict(path)
    params, missing = map_state_dict(sd, template, key_map, strict)
    return jax.tree.map(jnp.asarray, params), missing


def import_nequip_checkpoint(path: str, cfg, key_map=None, strict: bool = True):
    """torch checkpoint -> NequIP JAX params for `cfg`."""
    import jax
    import jax.numpy as jnp

    from pair_allegro_tpu.models.nequip import nequip_init

    template = nequip_init(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    template = jax.tree.map(np.asarray, template)
    sd = load_torch_state_dict(path)
    params, missing = map_state_dict(sd, template, key_map, strict)
    return jax.tree.map(jnp.asarray, params), missing
