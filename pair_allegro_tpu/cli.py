"""CLI runner — the LAMMPS input-script analog.

The reference is driven by LAMMPS scripts (`pair_style allegro`,
`pair_coeff * * model.nequip.pth Cu ...`, `fix nve`, `run N`; see the
generated script at /root/reference/tests/test_python_repro_allegro.py:85-119).
Here the same simulation is one YAML config:

    data: structure.xyz            # extxyz or LAMMPS data file
    model:
      checkpoint: model.npz        # saved via pair_allegro_tpu.checkpoint
      # or, for smoke tests: family: allegro, seed: 0, config: {r_max: 4.5, ...}
    type_names: [Cu]               # pair_coeff type-name mapping
    masses: {Cu: 63.546}
    integrator: nve                # nve | nvt | npt (MTK) | npt_berendsen | langevin
    dt_fs: 2.0
    steps: 200
    temp_K: 300.0                  # velocity creation (and thermostat target)
    press_bar: 0.0                 # npt target pressure
    log_every: 50
    skin: 0.4
    dtype: float32
    dump: {path: traj.dump, every: 100}
    restart: {path: state.npz, every: 0}   # 0 = only at the end
    restart_from: state.npz        # resume (read_restart analog): restores
                                   # pos/vel/cell/step/thermostat/PRNG; data:
                                   # and velocity creation are then skipped
    sharding: {n_devices: 8, mode: replicated, row_chunk: 0}
                                   # spatial-DD over a device mesh; mode:
                                   # replicated (work sharding, small N) |
                                   # halo (positions sharded + ppermute
                                   # ghosts, O(N/devices) per chip); nequip
                                   # shards via per-layer gather
    computes:                      # compute allegro / allegro/atom analogs
      - {name: dip, quantity: dipole, style: global, length: 3}   # thermo cols
      - {name: q, quantity: charges, style: atom, ncols: 1}       # dump cols
    profile: {phases: true, trace_dir: /tmp/trace}  # observability hooks
    compile_cache: /var/cache/pat_xla # persistent compiled-executable cache
                                   # (the .nequip.pth/.pt2 AOT-artifact
                                   # analog): restarts of the same config
                                   # skip jit compile; env PAT_COMPILE_CACHE

Usage: python -m pair_allegro_tpu.cli run config.yaml
       python -m pair_allegro_tpu.cli info model.npz
       python -m pair_allegro_tpu.cli import last.ckpt model.yaml model.npz
"""

from __future__ import annotations

import argparse
import sys
import time


def _load_structure(path: str):
    import numpy as np

    if path.endswith((".xyz", ".extxyz")):
        from pair_allegro_tpu.io.extxyz import read_extxyz

        fr = read_extxyz(path, index=0)
        return fr["positions"], list(fr["symbols"]), fr["cell"], fr["pbc"], None, None
    from pair_allegro_tpu.io.lammps_data import read_lammps_data

    d = read_lammps_data(path)
    return (
        d["positions"],
        None,  # symbols resolved through numeric types
        d["cell"],
        (True, True, True),
        d["types"],
        d,
    )


def _build_model(mcfg: dict, dtype):
    import jax

    from pair_allegro_tpu import checkpoint as ckpt

    if "checkpoint" in mcfg:
        import numpy as np
        import jax.numpy as jnp

        params, cfg_dict, family = ckpt.load_params(mcfg["checkpoint"])
        cfg = ckpt.make_config(cfg_dict, family, params=params)
        params = jax.tree.map(
            lambda x: jnp.asarray(
                x, dtype if np.issubdtype(np.asarray(x).dtype, np.floating) else None
            ),
            params,
        )
        return cfg, params, family
    family = mcfg.get("family", "allegro")
    cfg_kw = dict(mcfg.get("config", {}))
    cfg_kw.setdefault("type_names", tuple(mcfg.get("type_names", ())))
    if isinstance(cfg_kw.get("type_names"), list):
        cfg_kw["type_names"] = tuple(cfg_kw["type_names"])
    if family == "allegro":
        from pair_allegro_tpu.models.allegro import AllegroConfig, allegro_init

        cfg = AllegroConfig(**cfg_kw)
        params = allegro_init(jax.random.PRNGKey(mcfg.get("seed", 0)), cfg, dtype=dtype)
    elif family == "nequip":
        from pair_allegro_tpu.models.nequip import NequIPConfig, nequip_init

        cfg = NequIPConfig(**cfg_kw)
        params = nequip_init(jax.random.PRNGKey(mcfg.get("seed", 0)), cfg, dtype=dtype)
    else:
        raise SystemExit(f"unknown model family {family!r}")
    return cfg, params, family


def _phase_timings(system, eng) -> dict:
    """Per-phase wall times (ms): neighbor rebuild and force evaluation,
    each timed on distinct inputs (the TPU relay elides repeated identical
    computations) after a compile warmup.  The observability hook the
    reference leaves to LAMMPS thermo columns (SURVEY §5.1)."""
    import dataclasses
    import jax

    out = {}
    nb = eng.rebuild_fn(system, None)
    jax.block_until_ready(nb.edge_index)
    ts = []
    for i in range(1, 4):
        sys_i = dataclasses.replace(system, positions=system.positions + i * 1e-7)
        t0 = time.time()
        nb_i = eng.rebuild_fn(sys_i, None)
        jax.block_until_ready(nb_i.edge_index)
        ts.append(time.time() - t0)
    out["neighbor_rebuild_ms"] = min(ts) * 1000

    o = eng.force_fn(system, nb)
    jax.block_until_ready(o.forces)
    ts = []
    for i in range(1, 4):
        sys_i = dataclasses.replace(system, positions=system.positions + i * 1e-7)
        t0 = time.time()
        o_i = eng.force_fn(sys_i, nb)
        jax.block_until_ready(o_i.forces)
        ts.append(time.time() - t0)
    out["force_eval_ms"] = min(ts) * 1000
    return out


def cmd_run(args) -> int:
    import numpy as np
    import yaml

    with open(args.config) as f:
        conf = yaml.safe_load(f)

    from pair_allegro_tpu.compile_cache import (
        enable_compile_cache,
        maybe_enable_from_env,
    )

    # persistent compiled-executable cache (the .nequip.pth/.pt2 AOT-artifact
    # analog, pair_nequip_allegro.cpp:197-247): restarts of the same config
    # skip the 20-150 s jit compile
    if conf.get("compile_cache"):
        enable_compile_cache(str(conf["compile_cache"]))
    else:
        maybe_enable_from_env()

    import jax.numpy as jnp

    dtype = {"float32": jnp.float32, "float64": jnp.float64}[conf.get("dtype", "float32")]
    if dtype == jnp.float64:
        import jax

        jax.config.update("jax_enable_x64", True)

    cfg, params, family = _build_model(conf.get("model", {}), dtype)

    from pair_allegro_tpu.engine import AllegroEngine, NequIPEngine, TypeMapper
    from pair_allegro_tpu.md.integrate import Simulation, Units
    from pair_allegro_tpu.system import System

    # resume path (LAMMPS read_restart analog): the state file carries the
    # full dynamical state — positions/velocities/cell/types/masses, step,
    # thermostat, PRNG key — so `data:` is not needed and velocities are NOT
    # re-initialized.
    resume_from = conf.get("restart_from")
    resume_step, resume_thermo, resume_key = 0, {}, None
    if resume_from:
        from pair_allegro_tpu.checkpoint import load_state

        system, resume_step, resume_thermo, resume_key = load_state(
            resume_from, dtype=dtype
        )
        print(f"# resuming from {resume_from} at step {resume_step}")
    else:
        pos, symbols, cell, pbc, numeric_types, data = _load_structure(conf["data"])
        # type mapping: the pair_coeff contract (pair_nequip_allegro.cpp:274-301)
        type_names = conf.get("type_names") or list(cfg.type_names)
        mapper = TypeMapper(cfg.type_names)
        per_file_type = mapper.map_names(type_names)  # file type t -> model index
        if numeric_types is not None:
            types = per_file_type[numeric_types]
        else:
            types = mapper.map_names(symbols)

        masses_conf = conf.get("masses", {})
        masses = np.asarray(
            [masses_conf.get(cfg.type_names[t], 1.0) for t in np.asarray(types)]
        )
        system = System.create(pos, types, cell=cell, masses=masses, pbc=pbc, dtype=dtype)

    family_name = "nequip" if "NequIP" in type(cfg).__name__ else "allegro"
    shard_conf = conf.get("sharding") or {}
    if shard_conf:
        # multi-device run (the MPI `mpirun -np N` analog):
        #   sharding: {n_devices: 8, mode: replicated|halo, row_chunk: 0}
        # modes: "replicated" (positions replicated, work sharded — small-N
        # fast path), "halo" (positions sharded as z-slabs + ppermute ghost
        # exchange — per-chip memory O(N/n_devices), the big-N path).
        # NequIP shards via per-layer all_gather (a capability the reference
        # forbids, pair_nequip_allegro.cpp:86-89).
        from pair_allegro_tpu.parallel import (
            HaloShardedAllegroEngine,
            ShardedAllegroEngine,
            ShardedNequIPEngine,
            make_mesh,
        )

        n_dev = int(shard_conf.get("n_devices", 0)) or None
        import jax

        mesh = make_mesh(n_dev or len(jax.devices()))
        mode = shard_conf.get("mode", "replicated")
        skin = float(conf.get("skin", 0.0))
        row_chunk = int(shard_conf.get("row_chunk", 0)) or None
        if family_name == "nequip":
            if mode == "halo":
                raise SystemExit(
                    "halo sharding requires strict locality; NequIP message "
                    "passing shards via mode: replicated (per-layer gather)"
                )
            system, _perm = ShardedNequIPEngine.prepare_system(
                system, mesh.shape["atoms"]
            )
            eng = ShardedNequIPEngine(cfg, params, system, mesh, skin=skin)
        elif mode == "halo":
            system, _perm = HaloShardedAllegroEngine.prepare_system(
                system, mesh.shape["atoms"]
            )
            eng = HaloShardedAllegroEngine(
                cfg, params, system, mesh, skin=skin, row_chunk=row_chunk,
            )
        else:
            system, _perm = ShardedAllegroEngine.prepare_system(
                system, mesh.shape["atoms"]
            )
            eng = ShardedAllegroEngine(
                cfg, params, system, mesh, skin=skin, row_chunk=row_chunk,
            )
    else:
        engine_cls = {"allegro": AllegroEngine, "nequip": NequIPEngine}[family_name]
        eng = engine_cls(cfg, params, system, skin=float(conf.get("skin", 0.0)))

    integrator = conf.get("integrator", "nve")
    kw = {}
    if integrator in ("nvt", "langevin"):
        kw = dict(temp_K=float(conf.get("temp_K", 300.0)),
                  **({"tdamp": float(conf.get("tdamp_ps", 0.1))} if integrator == "nvt"
                     else {"damp": float(conf.get("damp_ps", 0.1))}))
    elif integrator in ("npt", "npt_berendsen"):
        kw = dict(
            temp_K=float(conf.get("temp_K", 300.0)),
            tdamp=float(conf.get("tdamp_ps", 0.1)),
            press_bar=float(conf.get("press_bar", 0.0)),
            pdamp=float(conf.get("pdamp_ps", 1.0)),
        )
        if integrator == "npt_berendsen" and "bulk_modulus_bar" in conf:
            kw["bulk_modulus_bar"] = float(conf["bulk_modulus_bar"])
    sim = Simulation(
        system, eng.force_fn, eng.rebuild_fn,
        dt=float(conf.get("dt_fs", 1.0)) * Units.fs,
        integrator=integrator, grow_fn=eng.grow,
        # halo engine: atom re-assignment to slabs at chunk boundaries (the
        # LAMMPS subdomain re-sort at reneighboring)
        migrate_fn=getattr(eng, "maybe_migrate", None),
        # capacity shrink at chunk boundaries (the Kokkos 1.05^2 shrink
        # hysteresis, pair_nequip_allegro_kokkos.cpp:218-229): without this a
        # density spike keeps the inflated K forever
        shrink_fn=getattr(eng, "maybe_shrink", None),
        **kw,
    )
    if resume_from:
        import dataclasses as _dc
        import jax.numpy as _jnp

        # restore the non-System dynamical state; thermostat values are cast
        # into the freshly-created zeros so the scan pytree structure (and
        # dtypes) stay exactly what the integrator expects
        thermostat = {
            k: _jnp.asarray(resume_thermo[k], v.dtype) if k in resume_thermo else v
            for k, v in sim.state.thermostat.items()
        }
        sim.state = _dc.replace(
            sim.state,
            step=_jnp.asarray(resume_step, _jnp.int32),
            thermostat=thermostat,
            **({"key": resume_key} if resume_key is not None else {}),
        )
    from pair_allegro_tpu.debug import debug_enabled, dump_edges

    if debug_enabled():
        # edge-dump observability channel (the reference's
        # _NEQUIP_LOG_LEVEL=DEBUG, pair_nequip_allegro.cpp:562-633)
        dump_edges(sim.state.neighbors, np.asarray(system.positions),
                   np.asarray(system.cell))
    if conf.get("temp_K") and not resume_from:
        sim.init_velocities(float(conf["temp_K"]), seed=int(conf.get("velocity_seed", 1)))

    dump_conf = conf.get("dump")
    writer = None
    if dump_conf:
        from pair_allegro_tpu.io.dump import DumpWriter

        writer = DumpWriter(dump_conf["path"])

    # computes: the `compute allegro` / `compute allegro/atom` analog
    # (/root/reference/compute/compute_allegro.cpp:43-64): global computes
    # become thermo columns, per-atom computes become dump columns.
    from pair_allegro_tpu.computes import GlobalCompute, PerAtomCompute

    global_computes, atom_computes = [], []
    for cc in conf.get("computes") or []:
        name = cc.get("name", cc["quantity"])
        if cc.get("style", "global") == "atom":
            atom_computes.append((name, PerAtomCompute(cc["quantity"], int(cc.get("ncols", 1)))))
        else:
            global_computes.append((name, GlobalCompute(cc["quantity"], int(cc["length"])), int(cc["length"])))

    steps = int(conf.get("steps", 0))
    log_every = int(conf.get("log_every", max(1, steps // 10 or 1)))
    if writer is not None and dump_conf.get("every"):
        # the callback observes state only at chunk boundaries; clamp the
        # chunk so a dump cadence finer than log_every is never skipped
        log_every = min(log_every, int(dump_conf["every"]))
    cols = ["step", "pe", "ke", "etotal", "temp", "press", "n_edges"]
    gcols = [
        f"c_{name}" if length == 1 else f"c_{name}[{j + 1}]"
        for name, _, length in global_computes
        for j in range(length)
    ]
    print(" ".join(f"{c:>14s}" for c in cols + gcols))

    rst = conf.get("restart")
    if rst and rst.get("every"):
        log_every = min(log_every, int(rst["every"]))

    def _write_restart(state):
        from pair_allegro_tpu.checkpoint import save_state

        save_state(rst["path"], state.system, step=int(np.asarray(state.step)),
                   thermostat={k: np.asarray(v) for k, v in state.thermostat.items()},
                   rng_key=np.asarray(state.key))

    def callback(state, row):
        line = " ".join(f"{float(np.asarray(row[c])):14.6g}" for c in cols)
        for _, comp, _ in global_computes:
            vals = np.atleast_1d(np.asarray(comp(state, state.system)))
            line += " " + " ".join(f"{v:14.6g}" for v in vals)
        print(line, flush=True)
        if writer is not None and dump_conf.get("every"):
            if int(np.asarray(row["step"])) % int(dump_conf["every"]) == 0:
                writer.write_frame(
                    int(np.asarray(row["step"])), state.system,
                    forces=state.forces, atomic_energy=state.atomic_energy,
                    extras={
                        n: np.asarray(comp(state, state.system))
                        for n, comp in atom_computes
                    },
                )
        if rst and rst.get("every") and int(np.asarray(row["step"])) % int(rst["every"]) == 0:
            _write_restart(state)

    prof = conf.get("profile") or {}
    if prof.get("phases"):
        for k, v in _phase_timings(sim.state.system, eng).items():
            print(f"# phase {k}: {v:.2f}")

    import contextlib

    trace_dir = prof.get("trace_dir")
    if trace_dir:
        import jax

        trace_ctx = jax.profiler.trace(trace_dir)
        print(f"# jax.profiler trace -> {trace_dir}")
    else:
        trace_ctx = contextlib.nullcontext()
    t0 = time.time()
    with trace_ctx:
        sim.run(steps, log_every=log_every, callback=callback)
    wall = time.time() - t0
    sps = steps / wall if wall > 0 else float("inf")
    print(f"# {steps} steps in {wall:.1f} s ({sps:.2f} steps/s, "
          f"{sps * float(conf.get('dt_fs', 1.0)) * 1e-6 * 86400:.3f} ns/day)")

    if rst:
        _write_restart(sim.state)
        print(f"# restart written to {rst['path']}")
    if writer is not None:
        writer.close()
    return 0


def cmd_import(args) -> int:
    """torch checkpoint (.ckpt/.pth Lightning state dict) -> native .npz.

    The offline converter leg of the reference's model pipeline (training
    checkpoint -> deployable artifact, /root/reference/tests/conftest.py:141-171).
    The model config comes from a YAML file with the same ``model:`` schema as
    `run` (family + config), e.g.::

        family: allegro
        config: {type_names: [C, O, H], r_max: 5.0, l_max: 2, num_layers: 3, ...}
        key_map: upstream        # default; or a {ours: theirs} mapping
    """
    import yaml
    import jax
    import numpy as np

    from pair_allegro_tpu import checkpoint as ckpt
    from pair_allegro_tpu.import_torch import (
        import_allegro_checkpoint,
        import_nequip_checkpoint,
    )

    with open(args.model_config) as f:
        mconf = yaml.safe_load(f)
    family = mconf.get("family", "allegro")
    cfg_kw = dict(mconf.get("config", {}))
    if isinstance(cfg_kw.get("type_names"), list):
        cfg_kw["type_names"] = tuple(cfg_kw["type_names"])
    key_map = mconf.get("key_map", "upstream")
    # compiled TorchScript artifacts (.nequip.pth) are self-describing: pull
    # r_max / type_names / per_edge_type_cutoff from the embedded metadata
    # (the coeff-time parse of pair_nequip_allegro.cpp:214-222,303-328);
    # explicit YAML values win over metadata
    from pair_allegro_tpu.import_torch import (
        _is_torchscript,
        config_kwargs_from_metadata,
        load_torchscript_artifact,
    )

    if _is_torchscript(args.ckpt):
        _, meta = load_torchscript_artifact(args.ckpt)
        meta_kw = config_kwargs_from_metadata(meta)
        if meta_kw:
            print(f"# artifact metadata: {meta_kw}")
        for k, v in meta_kw.items():
            cfg_kw.setdefault(k, v)
    if family == "allegro":
        from pair_allegro_tpu.models.allegro import AllegroConfig

        cfg = AllegroConfig(**cfg_kw)
    elif family == "nequip":
        from pair_allegro_tpu.models.nequip import NequIPConfig

        cfg = NequIPConfig(**cfg_kw)
    else:
        raise SystemExit(f"unknown model family {family!r}")
    if getattr(args, "inspect", False):
        # --inspect: print the foreign tree + the shape-matched key-map
        # proposal (refusing ambiguity) and write nothing — the offline
        # analog of the reference's printed type-mapping table
        # (pair_nequip_allegro.cpp:274-294)
        import jax.numpy as jnp

        from pair_allegro_tpu.import_torch import (
            inspect_state_dict,
            load_torch_state_dict,
        )

        sd = load_torch_state_dict(args.ckpt)
        if family == "allegro":
            from pair_allegro_tpu.models.allegro import allegro_init

            template = allegro_init(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        else:
            from pair_allegro_tpu.models.nequip import nequip_init

            template = nequip_init(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        print(inspect_state_dict(sd, template))
        return 0
    if args.out is None:
        raise SystemExit("out path required (or pass --inspect)")
    if family == "allegro":
        params, missing = import_allegro_checkpoint(
            args.ckpt, cfg, key_map=key_map, strict=not args.lenient
        )
    else:
        params, missing = import_nequip_checkpoint(
            args.ckpt, cfg, key_map=key_map, strict=not args.lenient
        )
    if missing:
        # print EVERY unmatched key: a silently half-initialized model is the
        # worst failure mode of --lenient
        print(f"# WARNING: {len(missing)} params kept at init values:")
        for k in missing:
            print(f"#   missing: {k}")
    ckpt.save_params(args.out, jax.tree.map(np.asarray, params), cfg, family=family)
    n = sum(np.asarray(x).size for x in jax.tree.leaves(params))
    print(f"# imported {n} parameters ({family}) -> {args.out}")
    return 0


def cmd_train(args) -> int:
    """Train/fine-tune a model on an extxyz dataset — the ``nequip-train``
    analog (the reference's fixtures are trained exactly this way,
    /root/reference/tests/conftest.py:131-171), closed natively so the
    trained params drop straight into the MD engines.

    YAML keys::

        model: {family: allegro, config: {...}} | {checkpoint: in.npz}
        dataset: frames.xyz          # energy= + forces column (extxyz)
        val_dataset: other.xyz       # optional; default: val_fraction split
        val_fraction: 0.1
        loss: {energy: 1.0, force: 1.0, virial: 0.0, per_atom_energy: true}
        optimizer: {name: adam, lr: 1e-3, weight_decay: 0.0}
        ema_decay: 0.99              # optional EMA eval/save weights
        batch_size: 4
        epochs: 50
        seed: 0
        sharding: {n_devices: 8}     # optional data parallelism
        out: trained.npz
    """
    import numpy as np
    import yaml

    with open(args.config) as f:
        conf = yaml.safe_load(f)

    import jax
    import jax.numpy as jnp
    import optax

    dtype = {"float32": jnp.float32, "float64": jnp.float64}[
        conf.get("dtype", "float32")
    ]
    if dtype == jnp.float64:
        jax.config.update("jax_enable_x64", True)

    cfg, params, family = _build_model(conf.get("model", {}), dtype)
    tcfg = cfg.for_training()
    if family == "allegro":
        from pair_allegro_tpu.models.allegro import allegro_energy as energy_fn
    else:
        from pair_allegro_tpu.models.nequip import nequip_energy as energy_fn

    from pair_allegro_tpu.data import load_frames, shard_batch, stack_frames
    from pair_allegro_tpu.train import (
        make_batched_loss_fn,
        make_loss_fn,
        make_train_step,
    )

    frames = load_frames(conf["dataset"], cfg.type_names, cfg.r_max, dtype=dtype)
    rng = np.random.RandomState(int(conf.get("seed", 0)))
    if conf.get("val_dataset"):
        val_frames = load_frames(
            conf["val_dataset"], cfg.type_names, cfg.r_max, dtype=dtype
        )
    else:
        n_val = max(1, int(len(frames) * float(conf.get("val_fraction", 0.1))))
        idx = rng.permutation(len(frames))
        val_frames = [frames[i] for i in idx[:n_val]]
        frames = [frames[i] for i in idx[n_val:]]
        if not frames:
            raise SystemExit("val_fraction leaves no training frames")

    lconf = conf.get("loss") or {}
    loss_fn = make_loss_fn(
        energy_fn,
        tcfg,
        w_energy=float(lconf.get("energy", 1.0)),
        w_force=float(lconf.get("force", 1.0)),
        w_virial=float(lconf.get("virial", 0.0)),
        per_atom_energy=bool(lconf.get("per_atom_energy", True)),
    )
    batched = make_batched_loss_fn(loss_fn)

    oconf = conf.get("optimizer") or {}
    lr = float(oconf.get("lr", 1e-3))
    wd = float(oconf.get("weight_decay", 0.0))
    name = oconf.get("name", "adam")
    if name == "adamw" or (name == "adam" and wd):
        opt = optax.adamw(lr, weight_decay=wd)
    elif name == "adam":
        opt = optax.adam(lr)
    elif name == "sgd":
        opt = optax.sgd(lr)
    else:
        raise SystemExit(f"unknown optimizer {name!r}")

    ema_decay = conf.get("ema_decay")
    step = make_train_step(batched, opt, ema_decay=ema_decay)
    state = step.init(params)

    bsz = int(conf.get("batch_size", min(4, len(frames))))
    mesh = None
    shard_conf = conf.get("sharding") or {}
    if shard_conf:
        from pair_allegro_tpu.parallel import make_mesh

        n_dev = int(shard_conf.get("n_devices", 0)) or len(jax.devices())
        if bsz % n_dev:
            raise SystemExit(f"batch_size {bsz} must divide n_devices {n_dev}")
        mesh = make_mesh(n_dev, axis_name="dp")

    val_batch = stack_frames(val_frames)
    # val batch rides as an ARGUMENT (closures over device arrays embed them
    # in the remote-compile request over the TPU relay)
    eval_loss = jax.jit(lambda p, b: batched(p, b)[1])

    def val_metrics(p):
        m = eval_loss(p, val_batch)
        return float(m["rmse_f"]), float(m["mae_e_per_atom"])

    epochs = int(conf.get("epochs", 10))
    log_every = int(conf.get("log_every", max(1, epochs // 20)))
    best = (np.inf, None)
    print(f"# training {family}: {len(frames)} train / {len(val_frames)} val "
          f"frames, batch {bsz}, {epochs} epochs"
          + (f", DP over {mesh.devices.size} devices" if mesh else ""))
    for epoch in range(epochs):
        order = rng.permutation(len(frames))
        # wrap-around fill keeps every batch at the SAME compiled shape
        n_batches = max(1, (len(order) + bsz - 1) // bsz)
        pad = n_batches * bsz - len(order)
        order = np.concatenate([order, order[:pad]]) if pad else order
        last = {}
        for b in range(n_batches):
            batch = stack_frames([frames[i] for i in order[b * bsz : (b + 1) * bsz]])
            if mesh is not None:
                batch = shard_batch(batch, mesh, "dp")
            params, state, last = step.update(params, state, batch)
        eval_params = step.ema(state) if ema_decay else params
        rmse_f, mae_e = val_metrics(eval_params)
        if rmse_f < best[0]:
            best = (rmse_f, jax.tree.map(np.asarray, eval_params))
        if epoch % log_every == 0 or epoch == epochs - 1:
            print(f"epoch {epoch:4d}  loss {float(last['loss']):.4e}  "
                  f"val rmse_F {rmse_f:.4e} eV/A  val mae_E/atom {mae_e:.4e} eV")

    out = conf.get("out", "trained.npz")
    from pair_allegro_tpu import checkpoint as ckpt

    save_params = best[1] if best[1] is not None else jax.tree.map(
        np.asarray, eval_params
    )
    ckpt.save_params(out, save_params, cfg, family=family)
    print(f"# best val rmse_F {best[0]:.4e} eV/A -> {out}")
    return 0


def cmd_info(args) -> int:
    from pair_allegro_tpu import checkpoint as ckpt

    params, cfg, family = ckpt.load_params(args.model)
    print(f"family: {family}")
    if cfg:
        for k, v in sorted(cfg.items()):
            print(f"  {k}: {v}")
    import numpy as np

    n = sum(np.asarray(x).size for x in _leaves(params))
    print(f"parameters: {n}")
    return 0


def _leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _leaves(v)
    elif isinstance(tree, (list, tuple)):
        for v in tree:
            yield from _leaves(v)
    else:
        yield tree


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="pair_allegro_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)
    pr = sub.add_parser("run", help="run an MD simulation from a YAML config")
    pr.add_argument("config")
    pr.set_defaults(fn=cmd_run)
    pi = sub.add_parser("info", help="describe a saved model checkpoint")
    pi.add_argument("model")
    pi.set_defaults(fn=cmd_info)
    pt = sub.add_parser(
        "train", help="train/fine-tune on an extxyz dataset (nequip-train analog)"
    )
    pt.add_argument("config")
    pt.set_defaults(fn=cmd_train)
    pim = sub.add_parser(
        "import", help="import a torch training checkpoint to a native .npz"
    )
    pim.add_argument("ckpt", help="torch .ckpt/.pth checkpoint")
    pim.add_argument("model_config", help="YAML with family + config (+ key_map)")
    pim.add_argument("out", nargs="?", default=None, help="output .npz path")
    pim.add_argument(
        "--lenient", action="store_true",
        help="keep init values for params missing from the checkpoint",
    )
    pim.add_argument(
        "--inspect", action="store_true",
        help="print the checkpoint's tensor tree + a shape-matched key-map "
        "proposal (refusing ambiguity) and exit without writing",
    )
    pim.set_defaults(fn=cmd_import)
    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
