"""Roofline arithmetic for the fused Allegro layer kernels + NequIP gather.

Makes the BASELINE.md "floor" claims falsifiable (round-4 review item #2):

1. ``--calibrate``: measure THIS chip's achievable peaks — HBM stream
   bandwidth, MXU f32 matmul throughput at the production precisions
   (HIGHEST = 6 bf16 passes, split/HIGH-class = 3, DEFAULT = 1), and VPU
   f32 FMA throughput (a Pallas kernel of chained element-wise FMAs on a
   VMEM-resident block — the unit the TP inner loop runs on).
2. default: analytic FLOP/byte counts per fused-layer kernel call at the
   bench shapes (N=5324, K=64, ns=64, C=32, l_max=2, parity), split by
   execution unit with the precision pass-multiplier applied, then the
   per-unit time floors at the calibrated peaks, next to the measured
   kernel times from the step trace (benchmarks/profile_step.py).  The
   binding unit's achieved-% column is the floor evidence.

Counts mirror the kernel bodies in ops/pallas_stack.py
(_layer1_fwd_kernel/_layer1_bwd_kernel); block geometry BE=256, kernel_high
tier (XLA matmuls exact-f32; in-kernel mix/latent dots bf16x3; env matmul
split2).  The reference publishes no comparable numbers (BASELINE.md).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/roofline.py --calibrate
  python benchmarks/roofline.py [--peaks vpu=6.0,hbm=760,mxu1=190,mxu3=63,mxu6=32]
"""

from __future__ import annotations

import argparse
import math
import sys
import time

import numpy as np

# bench shapes (bench.py main line)
NS, C, LMAX, PARITY = 64, 32, 2, True
N_ATOMS, K = 5324, 64
E = N_ATOMS * K  # 340,736 padded edge lanes
D = (LMAX + 1) ** 2
BE = 256
LAT_DIMS = (NS + 3 * C, 64, 64, NS)  # mlp_dims(160, 64, 2, 64)

# measured per-kernel device ms/step, r5 trace (benchmarks/profile_step.py)
MEASURED = {}


def tp_counts():
    from pair_allegro_tpu.ops.pallas_tp import _nonzeros
    from pair_allegro_tpu.ops.tp import paths_to_l

    nz = _nonzeros(LMAX, PARITY)
    nnz = sum(len(v) for v in nz.values())
    P = {l3: len(paths_to_l(LMAX, LMAX, l3, PARITY)) for l3 in range(LMAX + 1)}
    return nnz, P


def layer_cost(first_v: bool, last: bool, bwd: bool) -> dict:
    """Analytic per-call cost of one fused-layer kernel over the full E lanes.

    Returns {mxu_macs_eff, vpu_flops, hbm_bytes}; mxu_macs_eff counts MACs x
    the bf16 pass multiplier of the op's precision class (kernel_high tier:
    env matmul split2 = 2 passes, mix/latent dots manual-bf16x3 = 3), so
    time_floor = 2*mxu_macs_eff / default_bf16_peak."""
    nnz, P = tp_counts()
    p0 = P[0]
    macs = 0.0  # effective (pass-weighted) MACs per lane
    vpu = 0.0  # VPU FLOPs per lane
    rb = wb = 0.0  # bytes per lane read/written

    # ---- inputs (read once per call) ----
    rb += NS * 4  # x
    rb += (C if first_v else D * C) * 4  # pT or V
    rb += D * 4 + 1 * 4  # Y, u
    # B indicator matrix: (BE, BE) per block, constant index map -> fetched
    # once per block in the worst case
    rb += BE * 4

    # ---- forward body (bwd recomputes all of it except the mix matmuls) ----
    macs += NS * C * 3  # wz: in-kernel _mm at bf16x3
    vpu += C  # wz * u
    vpu += D * C * (2 if first_v else 1)  # A build (+ V0 build when first)
    macs += D * C * BE * 2  # env avg A @ B, split2
    vpu += D * C  # * inv_avg
    # TP tiles: T[p,k] += wv * V[i] * env[j], 2 FLOP per channel per nonzero
    nnz_fwd = (9 if last else nnz) if not bwd else nnz  # last fwd: l3=0 only
    vpu += 2 * C * nnz_fwd
    if not last and not bwd:
        for l3 in range(LMAX + 1):  # mix matmuls (C*P_l -> C), bf16x3
            macs += (2 * l3 + 1) * C * P[l3] * C * 3
    # latent MLP fwd, bf16x3 in-kernel dots
    for i in range(len(LAT_DIMS) - 1):
        macs += LAT_DIMS[i] * LAT_DIMS[i + 1] * 3
        vpu += 6 * LAT_DIMS[i + 1]  # silu + scale
    vpu += NS * 3  # residual

    if not bwd:
        wb += NS * 4  # x'
        if not last:
            wb += D * C * 4  # V'
    else:
        # reverse pieces on top of the recompute
        rb += NS * 4  # dxout
        if not last:
            rb += D * C * 4  # dvout
            for l3 in range(LMAX + 1):  # mix backward (P_l*C, C) @ (C, BE)
                macs += (2 * l3 + 1) * C * P[l3] * C * 3
        # TP backward: per nonzero, dv and de accumulations (2 FLOPs*C each)
        # + the g = wv * slice multiply
        nnz_b = 9 if last else nnz
        vpu += (4 + 1) * C * nnz_b
        macs += D * C * BE * 2  # env bwd: denv @ B, split2
        vpu += D * 2 * C + D * C  # dwz/dy accumulation rows
        macs += NS * C * 3  # dx += Wenv @ (dwz*u)
        # latent backward ~ 2x fwd MACs (dz matmuls both directions)
        for i in range(len(LAT_DIMS) - 1):
            macs += 2 * LAT_DIMS[i] * LAT_DIMS[i + 1] * 3
            vpu += 4 * LAT_DIMS[i + 1]
        wb += NS * 4 + (C if first_v else D * C) * 4 + D * 4 + 4  # dx dV dy du

    return {
        "mxu_macs_eff": macs * E,
        "vpu_flops": vpu * E,
        "hbm_bytes": (rb + wb) * E,
    }


def table(peaks: dict) -> None:
    rows = []
    for name, (fv, la, bw) in {
        "fwd layer1 (first_v)": (True, False, False),
        "fwd layer2": (False, False, False),
        "fwd layer3 (last)": (False, True, False),
        "bwd layer3 (last)": (False, True, True),
        "bwd layer2": (False, False, True),
        "bwd layer1 (first_v)": (True, False, True),
    }.items():
        c = layer_cost(fv, la, bw)
        t_mxu = 2 * c["mxu_macs_eff"] / (peaks["mxu1"] * 1e12) * 1e3
        t_vpu = c["vpu_flops"] / (peaks["vpu"] * 1e12) * 1e3
        t_hbm = c["hbm_bytes"] / (peaks["hbm"] * 1e9) * 1e3
        floor = max(t_mxu, t_vpu, t_hbm)
        binding = ["MXU", "VPU", "HBM"][int(np.argmax([t_mxu, t_vpu, t_hbm]))]
        meas = MEASURED.get(name)
        rows.append((name, c, t_mxu, t_vpu, t_hbm, floor, binding, meas))
    print(f"peaks used: MXU(default bf16)={peaks['mxu1']:.0f} TFLOP/s, "
          f"VPU f32={peaks['vpu']:.2f} TFLOP/s, HBM={peaks['hbm']:.0f} GB/s")
    print(f"{'kernel':24s} {'GFLOPeff':>8s} {'GB':>6s} "
          f"{'t_mxu':>6s} {'t_vpu':>6s} {'t_hbm':>6s} {'floor':>6s} bind "
          f"{'meas':>6s} {'ach%':>5s}")
    tot_floor = tot_meas = 0.0
    for name, c, tm, tv, th, fl, bind, meas in rows:
        tot_floor += fl
        ach = ""
        if meas:
            tot_meas += meas
            ach = f"{100 * fl / meas:.0f}%"
        print(f"{name:24s} {2 * c['mxu_macs_eff'] / 1e9:8.1f} "
              f"{c['hbm_bytes'] / 1e9:6.2f} {tm:6.2f} {tv:6.2f} {th:6.2f} "
              f"{fl:6.2f} {bind:4s} "
              f"{meas if meas else 0:6.2f} {ach:>5s}")
    print(f"{'TOTAL (6 kernels)':24s} {'':8s} {'':6s} {'':6s} {'':6s} {'':6s} "
          f"{tot_floor:6.2f}      {tot_meas:6.2f}")


def nequip_table(peaks: dict) -> None:
    """#2b: per-MP-layer gather/scatter bytes vs HBM bandwidth (l_max=1,
    parity, C=64 config of record on the 5,324-atom bench system)."""
    Cq, Dq, n_tracks = 64, 4, 2
    feat_rows = Cq * Dq * n_tracks  # channels-last (N, D*C*tracks)
    n, e = N_ATOMS, E
    # per layer, fwd: gather h[j_idx] (E rows), scatter-add messages back
    # (table layout: segment sum over K), read/write node features, radial
    # weights from the radial MLP (E, C*p_total*tracks)
    p_total = 2 + 3  # paths for l_max=1 per track (l3=0: 2, l3=1: 3)
    gather = e * feat_rows * 4
    scatter = e * feat_rows * 4 + n * feat_rows * 4
    radial = e * Cq * p_total * n_tracks * 4
    per_layer = gather + scatter + radial + 2 * n * feat_rows * 4
    fwd_bwd_mult = 3.0  # bwd re-gathers + emits edge cotangents (measured ~2x fwd)
    total = 3 * per_layer * fwd_bwd_mult
    t_hbm = total / (peaks["hbm"] * 1e9) * 1e3
    print(f"\nNequIP (l_max=1, parity, C=64, 3 MP layers) per step:")
    print(f"  gather+scatter+radial bytes: {total / 1e9:.2f} GB "
          f"-> HBM floor {t_hbm:.1f} ms/step")
    print(f"  measured 122 ms/step (r4) -> achieved "
          f"{100 * t_hbm / 122:.0f}% of the HBM bound")


def calibrate() -> dict:
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)

    # Relay traps (verify-skill gotchas): (a) repeated IDENTICAL computations
    # are elided — every timed call uses an input VALUE the warmup did not
    # see; (b) block_until_ready does NOT wait for remote completion — only a
    # device->host READBACK does, so every timed leg ends in float(sum(...))
    # and the measured readback round-trip is subtracted.
    _ = float(jnp.sum(jnp.ones(8)))  # pay the one-time first-D2H cost (~140 s)
    rtts = []
    for i in range(7):
        t0 = time.time()
        _ = float(jnp.sum(jnp.ones(16) * (2.0 + i)))
        rtts.append(time.time() - t0)
    rtt = float(np.median(rtts))
    print(f"readback rtt: {rtt * 1e3:.0f} ms (median of {len(rtts)})",
          flush=True)

    def timed(fn, warm_in, timed_in, work):
        """Returns work/second; fn jitted, both inputs device-resident.
        Legs are sized multi-second so the rtt correction is noise-level."""
        _ = float(jnp.sum(fn(warm_in)))  # compile + warm
        t0 = time.time()
        _ = float(jnp.sum(fn(timed_in)))
        dt = time.time() - t0 - rtt
        return work / max(dt, 1e-9), dt

    # --- HBM stream: y = x * a over 256 MB, dependent scan ---
    x = jnp.ones((64 * 1024 * 1024,), jnp.float32)  # 256 MB
    LS = 4096  # ~2.8 s at the expected ~800 GB/s

    @jax.jit
    def stream(x):
        def body(c, _):
            return c * 1.0000001, ()
        c, _ = jax.lax.scan(body, x, None, length=LS)
        return c

    hbm, dt = timed(stream, x, x * 1.5, 2 * x.nbytes * LS / 1e9)
    print(f"HBM stream: {hbm:.0f} GB/s  (leg {dt * 1e3:.0f} ms)", flush=True)

    # --- MXU: 4096^3 matmul, DEFAULT(bf16 1-pass) and HIGHEST(6-pass) ---
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (4096, 4096), jnp.float32) * 1e-2

    def mm(prec, length):
        @jax.jit
        def f(a):
            def body(c, _):
                return jnp.dot(c, a, precision=prec) * 1e-3, ()
            c, _ = jax.lax.scan(body, a, None, length=length)
            return c
        rate, dt = timed(f, a, a * 1.01, 2 * 4096**3 * length / 1e12)
        print(f"  (mxu leg {dt * 1e3:.0f} ms)", flush=True)
        return rate

    mxu1 = mm(jax.lax.Precision.DEFAULT, 2048)   # ~1.5 s at ~190 TF/s
    mxu6 = mm(jax.lax.Precision.HIGHEST, 512)    # ~2.2 s at ~33 TF/s
    print(f"MXU f32 matmul: DEFAULT {mxu1:.0f} TFLOP/s, HIGHEST {mxu6:.1f} "
          f"TFLOP/s ({mxu1 / max(mxu6, 1e-9):.1f}x)", flush=True)

    # --- VPU FMA: Pallas kernel, chained x = x*a + b on a VMEM block ---
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, SL, LN = 16384, 256, 1024  # 1 MB f32 block, 16k chained FMAs

    def vpu_kernel(x_ref, o_ref):
        # 4 independent chains of FMAs to expose ILP (a single chain measured
        # 0.89 TFLOP/s — issue-latency-bound, not the achievable rate)
        x = x_ref[:]
        q = SL // 4
        chunks = tuple(x[i * q : (i + 1) * q] for i in range(4))

        def body(i, vs):
            return tuple(v * 1.0000001 + 1e-7 for v in vs)

        out = jax.lax.fori_loop(0, R, body, chunks)
        for i in range(4):
            o_ref[i * q : (i + 1) * q] = out[i]

    nblk = 256

    @jax.jit
    def vpu_run(x):
        return pl.pallas_call(
            vpu_kernel,
            out_shape=jax.ShapeDtypeStruct((nblk * SL, LN), jnp.float32),
            grid=(nblk,),
            in_specs=[pl.BlockSpec((SL, LN), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((SL, LN), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(x)

    xv = jnp.ones((nblk * SL, LN), jnp.float32)
    vpu, dt = timed(vpu_run, xv, xv * 0.5, nblk * SL * LN * R * 2 / 1e12)
    print(f"VPU f32 FMA: {vpu:.2f} TFLOP/s  (leg {dt * 1e3:.0f} ms)",
          flush=True)
    return {"hbm": hbm, "mxu1": mxu1, "mxu6": mxu6, "vpu": vpu}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--calibrate", action="store_true")
    ap.add_argument("--peaks", default="vpu=5.1,hbm=760,mxu1=190,mxu6=32")
    ap.add_argument("--measured", default="",
                    help="name=ms,... per-kernel measured device ms/step")
    args = ap.parse_args()
    if args.calibrate:
        peaks = calibrate()
    else:
        peaks = {k: float(v) for k, v in
                 (kv.split("=") for kv in args.peaks.split(","))}
    if args.measured:
        for kv in args.measured.split(","):
            k, v = kv.rsplit("=", 1)
            MEASURED[k] = float(v)
    table(peaks)
    nequip_table(peaks)


if __name__ == "__main__":
    main()
