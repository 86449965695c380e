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
    u_err = float(jnp.max(jnp.abs(u[:, b:-b, b:-b])
                          ).astype(jnp.float32))
    print(json.dumps({
        "metric": "full-pipeline GPA throughput (4096^2 moire, "
                  "FFT+WFR sweep+lstsq+multigrid unwrap, f32)",
        "value": round(mpix_s, 2),
        "unit": "Mpix/s",
        "vs_baseline": round(mpix_s / baseline, 1),
        "seconds_per_image": round(dt, 4),
        "u_err_interior_px": round(u_err, 5),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
