"""Benchmark: full-pipeline GPA throughput on a 4096^2 moire image.

Metric (BASELINE.json): Mpix/s for FFT -> Gabor/WFR sweep (3 Bragg
peaks x 36 candidates) -> weighted lstsq -> CG unwrap -> displacement
field, float32, single chip. Reference (pyGPA, single CPU core) is
estimated at 0.05-0.2 Mpix/s (BASELINE.md); vs_baseline uses the
favorable-to-reference 0.2.

Prints ONE JSON line.
"""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from pygpa_tpu.lattices import hexlattice_gen, generate_ks
    from pygpa_tpu.gpa.pipeline import make_displacement_extractor

    size = 4096
    r_k, theta, kappa, psi = 0.02, 5.0, 1.005, 10.0
    img = hexlattice_gen(r_k, theta, order=2, size=size, kappa=kappa,
                         psi=psi, dtype=jnp.float32)
    img = jax.device_put(img)
    ks = np.asarray(generate_ks(r_k, theta, kappa=kappa, psi=psi))[:3]

    # deformed fixture: the conftest 500^2 Gaussian-envelope x-shift
    # scaled to 4096^2 — a KNOWN analytic u, so the pipeline error on a
    # nonzero displacement is gated too (errors that scale with u are
    # invisible to the zero-displacement fixture below)
    S = size // 2
    xp, yp = np.meshgrid(np.arange(-S, S), np.arange(-S, S),
                         indexing="ij")
    xshift = (0.1 * xp * np.exp(-0.5 * ((xp / (2 * S / 8)) ** 2
                                        + 1.2 * (yp / (2 * S / 6)) ** 2)))
    u_true = np.stack((xshift, np.zeros_like(xshift))).astype(np.float32)
    img_d = jax.device_put(hexlattice_gen(
        r_k, theta, order=2, size=size, kappa=kappa, psi=psi,
        shift=u_true, dtype=jnp.float32))

    fn = make_displacement_extractor((size, size), ks, chunk=4,
                                 unwrap_coarse=4)

    # warmup / compile
    u = fn(img)
    u.block_until_ready()

    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        u = fn(img)
    u.block_until_ready()
    dt = (time.perf_counter() - t0) / reps

    mpix_s = size * size / 1e6 / dt
    baseline = 0.2
    # accuracy gate: the fixture embeds ZERO displacement (ks match the
    # rendered lattice exactly), so the recovered |u| IS the pipeline
    # error; fetch as float32 (tunnel-safe)
    b = 8 * int(np.ceil(1 / np.linalg.norm(ks, axis=1).min()))
    ui = u[:, b:-b, b:-b]
    u_err = float(jnp.max(jnp.abs(ui)).astype(jnp.float32))
    # dc-free interior error: GPA determines u only up to a constant
    # (the deformed gate below mean-subtracts for exactly this
    # reason), and the r5 decomposition showed the raw number is
    # ~1/3 unwrap DC: raw 0.0015 = DC 0.0005 + ripple 0.0014 on-chip
    # vs CPU f32 raw 0.00104 / dc-free 0.00064 (the r2 "0.00063" WAS
    # this structural floor). Gating both keeps the DC bounded while
    # ratcheting the physically meaningful ripple separately.
    um = ui - ui.mean(axis=(1, 2), keepdims=True)
    u_err_dcfree = float(jnp.max(jnp.abs(um)).astype(jnp.float32))
    # deformed-fixture gate: recovered -u vs the analytic truth
    # (mean-subtracted — the pipeline determines u up to a constant).
    # The raw field carries the sigma-wide lock-in window blur
    # (~0.4 px at this sigma/fixture); deconvolve it like the
    # reference's deconvolve=True path before gating.
    from pygpa_tpu.gpa.pipeline import gaussian_deconvolve
    sig = int(np.ceil(1 / np.linalg.norm(ks, axis=1).min()))
    ud = gaussian_deconvolve(fn(img_d), sig, 2 * sig)
    resid = -ud - jnp.asarray(u_true)
    resid = resid[:, b:-b, b:-b]
    resid = resid - resid.mean(axis=(1, 2), keepdims=True)
    u_err_def = float(jnp.max(jnp.abs(resid)).astype(jnp.float32))
    # HARD accuracy ratchets (round-3 values + slack): a speed change
    # that trades past these FAILS the bench outright instead of
    # silently drifting (r2 0.00063 -> r3 0.00138 px went unchecked).
    gate_interior, gate_deformed = 0.002, 0.075
    # ratcheted 0.0015 -> 0.0012 when gauss_cut=7 landed (measured
    # dc-free ripple 0.00091 on-chip; r4 verdict item 6 target <0.001
    # reached on this, the physically meaningful, metric)
    gate_dcfree = 0.0012
    if not (u_err < gate_interior and u_err_def < gate_deformed
            and u_err_dcfree < gate_dcfree):
        print(json.dumps({
            "metric": "ACCURACY GATE FAILED",
            "value": 0.0, "unit": "Mpix/s", "vs_baseline": 0.0,
            "u_err_interior_px": round(u_err, 5),
            "gate_interior_px": gate_interior,
            "u_err_interior_dcfree_px": round(u_err_dcfree, 5),
            "gate_dcfree_px": gate_dcfree,
            "u_err_deformed_px": round(u_err_def, 5),
            "gate_deformed_px": gate_deformed,
        }))
        raise SystemExit(1)
    print(json.dumps({
        "metric": "full-pipeline GPA throughput (4096^2 moire, "
                  "FFT+WFR sweep+lstsq+multigrid unwrap, f32)",
        "value": round(mpix_s, 2),
        "unit": "Mpix/s",
        "vs_baseline": round(mpix_s / baseline, 1),
        "seconds_per_image": round(dt, 4),
        "u_err_interior_px": round(u_err, 5),
        "u_err_interior_dcfree_px": round(u_err_dcfree, 5),
        "u_err_deformed_px": round(u_err_def, 5),
        "gated": f"interior<{gate_interior}, "
                 f"dcfree<{gate_dcfree}, deformed<{gate_deformed}",
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
