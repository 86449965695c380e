"""Per-stage on-chip profile of the 4096^2 headline pipeline.

Emits ONE JSON object with a decomposition of the bench.py pipeline
into independently-timed stages (each stage is its own jitted program
re-running the production code path on production-shaped inputs), so
stage-level regressions are visible to the driver and perf arguments
cite a committed artifact instead of prose.

Methodology (tunnel-aware, see CLAUDE.md):
 - every dispatch on the tunneled TPU has a ~28 ms floor, so each
   stage is looped INNER times inside one jit program (a scalar carry
   threads a data dependency through the reps so XLA cannot CSE or
   reorder them) and the per-rep time is total/INNER;
 - the dispatch floor itself is measured (trivial scalar program) and
   reported alongside;
 - OUTER independent launches give median + IQR, making the ~±5%
   tunnel variance visible instead of folded into point numbers;
 - sync via a 4-byte f32 scalar fetch (block_until_ready is
   unreliable on the tunnel; bool/complex fetches are UNIMPLEMENTED).

MFU estimate: useful FLOPs of the sweep's second-stage dots (the
dominant MXU work) counted from the zoom plan shapes, divided by the
measured sweep time and the chip's bf16 peak. The bf16x3 emulation
runs 3 MXU passes per useful dot, so mxu_busy ~ 3x useful.

Run on the TPU host:  python benchmarks/profile.py [--out PROFILE.json]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SIZE = 4096
R_K, THETA, KAPPA, PSI = 0.02, 5.0, 1.005, 10.0
INNER = 6
OUTER = 5
PEAK_BF16_TFLOPS = 197.0   # TPU v5e per-chip bf16 peak


def _sync(x):
    import jax.numpy as jnp
    return float(jnp.sum(jnp.abs(x)).astype(jnp.float32))


def time_stage(fn, operands=(), inner=INNER, outer=OUTER):
    """fn: (scalar f32 `t`, *operands) -> scalar f32 (runs the stage
    once, with t threaded through its inputs). Large device arrays
    MUST ride `operands`, not the closure: closed-over arrays are
    baked into the HLO as literal constants and the tunneled
    remote-compile endpoint rejects multi-hundred-MB request bodies
    (HTTP 413, observed at ~128 MB+ of closure constants).
    Returns (median_ms, iqr_ms, raw)."""
    import jax

    @jax.jit
    def looped(*ops):
        def body(i, acc):
            return acc + fn(acc * 0.0, *ops)
        return jax.lax.fori_loop(0, inner, body,
                                 np.float32(0.0))

    _sync(looped(*operands))          # compile + warm
    ts = []
    for _ in range(outer):
        t0 = time.perf_counter()
        _sync(looped(*operands))
        ts.append((time.perf_counter() - t0) * 1e3 / inner)
    ts = np.asarray(ts)
    return (float(np.median(ts)),
            float(np.percentile(ts, 75) - np.percentile(ts, 25)),
            [round(float(t), 3) for t in ts])


def main():
    global SIZE, INNER, OUTER
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None,
                    help="also write the JSON to this path")
    ap.add_argument("--size", type=int, default=None,
                    help="image side (CPU smoke runs use small sizes)")
    ap.add_argument("--inner", type=int, default=None)
    ap.add_argument("--outer", type=int, default=None)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke validation)")
    args = ap.parse_args()
    if args.size:
        SIZE = args.size
    if args.inner:
        INNER = args.inner
    if args.outer:
        OUTER = args.outer
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    from pygpa_tpu.config import DEFAULTS
    from pygpa_tpu.lattices import hexlattice_gen, generate_ks
    from pygpa_tpu.gpa.pipeline import (make_displacement_extractor,
                                        gaussian_deconvolve)
    from pygpa_tpu.ops.wfr import (wfr_sweep_uv_multi,
                                   wfr_sweep_phase_weight_multi,
                                   _dft_windows, _plan_zoom_multi,
                                   _plan_col_groups)
    import pygpa_tpu.solvers.unwrap as U

    img = jax.device_put(hexlattice_gen(
        R_K, THETA, order=2, size=SIZE, kappa=KAPPA, psi=PSI,
        dtype=jnp.float32))
    ks = np.asarray(generate_ks(R_K, THETA, kappa=KAPPA, psi=PSI))[:3]
    knorms = np.linalg.norm(ks, axis=1)
    kw = knorms.mean() / DEFAULTS.kw_scale
    sig = int(np.ceil(1 / knorms.min()))
    dr = 2 * sig
    kstep = kw / DEFAULTS.ksteps
    steps = kstep * np.arange(2 * DEFAULTS.ksteps)
    wlists = []
    for pk in ks:
        wx, wy = np.meshgrid(pk[0] - kw + steps, pk[1] - kw + steps,
                             indexing="ij")
        wlists.append(np.stack([wx.ravel(), wy.ravel()], -1))
    gc = DEFAULTS.pipeline_gauss_cut
    img0 = img - img.mean()
    # off-TPU (CPU smoke validation) the kernel gates would silently
    # take the XLA fallback or return None; interpret mode forces the
    # production kernel code paths
    interp = jax.default_backend() != "tpu"

    stages = {}

    def record(name, fn, operands=(), inner=INNER):
        try:
            try:
                med, iqr, raw = time_stage(fn, operands=operands,
                                           inner=inner)
            except Exception:
                # one retry: the tunnel's remote-compile endpoint
                # sporadically drops a request mid-read (transient)
                time.sleep(10)
                med, iqr, raw = time_stage(fn, operands=operands,
                                           inner=inner)
        except Exception as e:  # keep the profile partial, not dead
            stages[name] = {"error": f"{type(e).__name__}: {e}"[:200]}
            print(f"  {name}: ERROR {type(e).__name__}", flush=True)
            return
        stages[name] = {"ms": round(med, 3), "iqr_ms": round(iqr, 3),
                        "raw_ms": raw}
        print(f"  {name}: {med:.2f} ms (iqr {iqr:.2f})", flush=True)

    # --- dispatch floor (trivial program, inner=1) ---
    record("dispatch_floor", lambda t: t + 1.0, inner=1)

    # --- full pipeline (bench.py configuration) ---
    extract = make_displacement_extractor((SIZE, SIZE), ks, chunk=4,
                                          unwrap_coarse=4)
    record("full_pipeline",
           lambda t, im: jnp.mean(extract(im + t)), (img,), inner=3)

    # --- grouped banded sweep, uv emission (production path) ---
    def sweep_uv(t, im0):
        uv = wfr_sweep_uv_multi(im0 + t, wlists, sig, dr, ks,
                                gauss_cut=gc, interpret=interp)
        return jnp.mean(uv[2])
    record("sweep_uv_3peaks", sweep_uv, (img0,))

    # --- grouped banded sweep, phase/weight emission ---
    def sweep_pw(t, im0):
        ph, wt = wfr_sweep_phase_weight_multi(
            im0 + t, wlists, sig, dr, gauss_cut=gc, interpret=interp)
        return jnp.mean(wt)
    record("sweep_pw_3peaks", sweep_pw, (img0,))

    # --- grouped banded sweep, gradient emission ---
    def sweep_grad(t, im0):
        out = wfr_sweep_phase_weight_multi(
            im0 + t, wlists, sig, dr, with_grad=True, krefs=ks,
            gauss_cut=gc, interpret=interp)
        return jnp.mean(out[1])
    record("sweep_grad_3peaks", sweep_grad, (img0,))

    # --- direct DFT spectrum windows alone ---
    plans = _plan_zoom_multi((SIZE, SIZE), wlists, float(sig),
                             gauss_cut=gc)
    idx0s = jnp.asarray(np.stack([p[0] for p in plans]))
    idx1s = jnp.asarray(np.stack([p[1] for p in plans]))

    def dftw(t, im0):
        Sr, Si = _dft_windows(im0 + t, idx0s, idx1s, jnp.float32)
        return jnp.mean(Sr) + jnp.mean(Si)
    record("dft_windows", dftw, (img0,))

    # --- production multigrid unwrap on the sweep's real outputs ---
    uv = jax.jit(lambda x: wfr_sweep_uv_multi(
        x, wlists, sig, dr, ks, gauss_cut=gc,
        interpret=interp))(img0)
    dudx = jax.device_put(uv[0][:, :, 1:])
    dudy = jax.device_put(uv[1][:, 1:, :])
    wnorm = jax.device_put(uv[2])
    kmg = min(DEFAULTS.unwrap_kmax_reconstruct, DEFAULTS.unwrap_kmax_mg)

    def unwrap_mg(t, dx2, dy2, wn):
        u = jax.vmap(lambda dx, dy: U.phase_unwrap_prediff_mg(
            dx, dy, wn + t, kmax=kmg, coarse=4))(dx2, dy2)
        return jnp.mean(u)
    record("unwrap_mg_2comp", unwrap_mg, (dudx, dudy, wnorm),
           inner=3)

    # --- fused V-branch stencil kernels at full size ---
    from pygpa_tpu.ops import pallas_vcycle, pallas_cg
    phi = jax.device_put(jnp.zeros((2, SIZE, SIZE), jnp.float32))
    dxp = jax.device_put(jnp.concatenate(
        [dudx, jnp.zeros((2, SIZE, 1), jnp.float32)], axis=-1))
    dyp = jax.device_put(jnp.concatenate(
        [dudy, jnp.zeros((2, 1, SIZE), jnp.float32)], axis=-2))

    def presmooth(t, ph2, dx2, dy2, wn):
        out = jax.vmap(
            lambda p, a, b: pallas_vcycle.presmooth(
                p, a, b, wn + t, 4, U._JACOBI_OMEGA)
        )(ph2, dx2, dy2)
        return jnp.mean(out[0])
    record("vcycle_presmooth_2comp", presmooth,
           (phi, dxp, dyp, wnorm))

    def applyq(t, ph2, wn):
        out = jax.vmap(lambda p: pallas_vcycle.applyq(p + t, wn))(ph2)
        return jnp.mean(out)
    record("vcycle_applyq_2comp", applyq, (phi, wnorm))

    # --- coarse-level CG: whole-VMEM kernel vs XLA while_loop ---
    nc = SIZE // 4
    rng = np.random.default_rng(0)
    wc = jnp.asarray(0.2 + 0.8 * rng.random((nc, nc)), jnp.float32)
    dxc = U._mask_last(jnp.asarray(
        rng.standard_normal((nc, nc)), jnp.float32), -1)
    dyc = U._mask_last(jnp.asarray(
        rng.standard_normal((nc, nc)), jnp.float32), -2)
    rk, WWx, WWy = jax.jit(U._residual_aligned)(dxc, dyc, wc)
    rk, WWx, WWy = map(jax.device_put, (rk, WWx, WWy))

    def cg_kernel(t, r0, wx, wy):
        phi = pallas_cg.cg_poisson(r0 + t, wx, wy, kmg,
                                   jax.lax.Precision.HIGH)
        return jnp.mean(phi)
    record(f"cg_kernel_{nc}", cg_kernel, (rk, WWx, WWy))

    def cg_xla(t, r0, wx, wy):
        phi, _ = U._cg_unwrap_jit(r0 + t, wx, wy, kmg,
                                  jax.lax.Precision.HIGH, None,
                                  True, False)
        return jnp.mean(phi)
    record(f"cg_xla_{nc}", cg_xla, (rk, WWx, WWy))

    # --- Wiener deconvolution of the displacement field ---
    u2 = jax.device_put(jnp.zeros((2, SIZE, SIZE), jnp.float32))

    def deconv(t, uu):
        return jnp.mean(gaussian_deconvolve(uu + t, sig, dr))
    record("deconvolve_2comp", deconv, (u2,), inner=3)

    # --- MFU estimate from the sweep plan shapes ---
    cg_plan = _plan_col_groups(wlists, plans, SIZE, float(sig),
                               gauss_cut=gc)
    W0 = int(plans[0][0].shape[0])
    W1 = int(plans[0][1].shape[0])
    Wb = int(cg_plan[2]) if cg_plan is not None else W1
    G = len(wlists)
    P = int(wlists[0].shape[0])
    # second stage (dominant): per group, per candidate, an (n, m)
    # output plane contracted over 2*Wb lanes -> 2*n*m*P*2*Wb flops;
    # first stage: (P, n, Wb) complex outputs contracted over W0.
    flops2 = 2.0 * SIZE * SIZE * P * (2 * Wb) * G
    flops1 = 2.0 * SIZE * W0 * (2 * Wb) * P * 2 * G
    useful_tflop = (flops1 + flops2) / 1e12
    t_sweep_s = stages["sweep_uv_3peaks"]["ms"] / 1e3
    mfu = useful_tflop / t_sweep_s / PEAK_BF16_TFLOPS
    mfu_busy = 3.0 * mfu   # bf16x3: 3 MXU passes per useful dot

    out = {
        "config": {"size": SIZE, "sigma": sig, "P": P, "G": G,
                   "W0": W0, "W1": W1, "Wb": Wb, "kmax_mg": kmg,
                   "inner_reps": INNER, "outer_reps": OUTER},
        "device": str(jax.devices()[0]),
        "stages": stages,
        "sweep_useful_tflop": round(useful_tflop, 4),
        "sweep_mfu_bf16": round(mfu, 4),
        "sweep_mxu_busy_bf16": round(mfu_busy, 4),
    }
    line = json.dumps(out)
    print(line, flush=True)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
