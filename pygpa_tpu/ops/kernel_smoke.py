"""Trace-and-run every Pallas kernel entry point at tiny shapes.

The production kernels are gated on ``jax.default_backend() == "tpu"``
(ops/wfr.py:_use_pallas_sweep), so a CPU test run or the driver's CPU
dryrun silently takes the XLA fallback and cannot catch a broken
kernel signature or launch configuration (the round-3 failure class:
a kernel keyword added without updating the pallas_call site shipped
with a green dryrun).  ``run_kernel_smoke()`` forces every kernel
entry — grouped sweep (plain / grad / uv), single-peak
sweep (plain / grad / emit / multi-chunk), warp (bilinear
and cubic, both boundary modes), DCT lane kernels, unit-cell expand
and drizzle — through interpret mode on small fixtures and sanity-
checks the outputs.  Runs on any backend in well under two minutes;
called from ``__graft_entry__.dryrun_multichip`` and the test suite.
"""
import numpy as np

import jax
import jax.numpy as jnp


def _fixture(size=256, r_k=0.1, theta=7.0):
    from ..lattices import hexlattice_gen, generate_ks
    img = np.asarray(hexlattice_gen(r_k, theta, order=1, size=size,
                                    dtype=np.float32))
    img = img - img.mean()
    ks = np.asarray(generate_ks(r_k, theta), np.float32)[:3]
    return jnp.asarray(img), ks


def _wlists(ks, pts=4):
    """Small pts x pts candidate grids around each k (pipeline shape)."""
    knorms = np.linalg.norm(ks, axis=1)
    kw = knorms.mean() / 2.5
    step = 2 * kw / pts
    offs = (np.arange(pts) - (pts - 1) / 2) * step
    wx, wy = np.meshgrid(offs, offs, indexing="ij")
    grid = np.stack([wx.ravel(), wy.ravel()], -1)
    return [np.asarray(k)[None] + grid for k in ks]


def _check(name, *arrs):
    for a in arrs:
        if not bool(np.isfinite(np.asarray(a)).all()):
            raise AssertionError(f"kernel smoke [{name}]: non-finite "
                                 f"output (shape {np.shape(a)})")


def run_kernel_smoke(verbose=False):
    """Force every Pallas kernel entry point through interpret mode."""
    from . import wfr as wfr_mod
    from .wfr import (wfr_sweep, wfr_sweep_phase_weight,
                      wfr_sweep_phase_weight_multi, wfr_sweep_uv_multi)

    def log(msg):
        if verbose:
            print(f"  kernel-smoke: {msg}", flush=True)

    img, ks = _fixture()
    wlists = _wlists(ks)
    sigma = int(np.ceil(1 / np.linalg.norm(ks, axis=1).min()))
    dr = 2

    # production default: refinement OFF (measured on-chip regression,
    # see ops/wfr._REFINE) — the launches below trace the production
    # plain pass-A; the refined branch is traced separately at the end
    # of this section so the experimental path stays compile-checked
    assert not wfr_mod._REFINE, \
        "refinement is expected OFF in production (ops/wfr._REFINE)"
    assert wfr_mod._plan_refine(wlists) is not None

    # --- grouped sweep kernel (the production pipeline path) ---
    ph, wt = wfr_sweep_phase_weight_multi(img, wlists, sigma, dr,
                                          interpret=True)
    _check("grouped", ph, wt)
    assert ph.shape == (3,) + img.shape and wt.shape == ph.shape
    log("grouped plain ok")

    out = wfr_sweep_phase_weight_multi(img, wlists, sigma, dr,
                                       with_grad=True, krefs=ks,
                                       interpret=True)
    _check("grouped grad", *out)
    assert out[2].shape == (3,) + img.shape + (2,)
    log("grouped grad ok")

    uv = wfr_sweep_uv_multi(img, wlists, sigma, dr, ks, interpret=True)
    assert uv is not None, "grouped uv path unavailable in smoke"
    # shifted layout: column 0 of dudx / row 0 of dudy are carry
    # garbage by contract and dropped by reconstruct_u_inv_from_uv
    # (gpa/reconstruct.py:144) — check only the consumed region.
    _check("grouped uv", uv[0][:, :, 1:], uv[1][:, 1:, :], uv[2])
    assert uv[0].shape == (2,) + img.shape and uv[2].shape == img.shape
    log("grouped uv ok")

    # --- refined pass-A branch (experimental, off in production) ---
    # one grouped launch with the two-level refinement forced on, so
    # the conditional-tournament kernel branch keeps compiling even
    # though _REFINE defaults to False
    old_refine = wfr_mod._REFINE
    wfr_mod._REFINE = True
    try:
        phr, wtr = wfr_sweep_phase_weight_multi(img, wlists, sigma, dr,
                                                interpret=True)
        _check("grouped refined", phr, wtr)
        assert phr.shape == (3,) + img.shape
    finally:
        wfr_mod._REFINE = old_refine
    log("grouped refined ok")

    # --- BANDED grouped sweep (the production default at 4096^2) ---
    # at the 256^2 fixture above _plan_col_groups returns None (band ~
    # union width), so the grouped launches above are all UNBANDED
    # while production runs banded (_COL_GROUPS=True). This fixture is
    # the smallest that activates banding (Wb < W1) and forces all
    # three banded emission paths, so a signature/shape break
    # localized to the banded branch of ops/pallas_sweep fails the
    # CPU dryrun instead of surfacing in the on-chip bench.
    assert wfr_mod._COL_GROUPS, \
        "banded grouped sweep must be the production default"
    imgb, ksb = _fixture(size=512, r_k=0.12, theta=5.0)
    # banding constraints live entirely on the COLUMN axis, so a
    # 128-row strip activates the same plan 4x cheaper in interpret
    imgb = imgb[:128]
    wlb = _wlists(ksb)
    sigb = int(np.ceil(1 / np.linalg.norm(ksb, axis=1).min()))
    gcb = 10.0   # tighter windows than the default cut, so the
    # per-run band is genuinely narrower than the union window
    plansb = wfr_mod._plan_zoom_multi(imgb.shape, wlb, float(sigb),
                                      gauss_cut=gcb)
    cgp = wfr_mod._plan_col_groups(wlb, plansb, imgb.shape[1],
                                   float(sigb), gauss_cut=gcb)
    assert cgp is not None and cgp[2] < plansb[0][1].shape[0], \
        "banded smoke fixture no longer activates the col_groups " \
        "planner — the banded kernel branch is untested"
    phb, wtb = wfr_sweep_phase_weight_multi(imgb, wlb, sigb, dr,
                                            gauss_cut=gcb,
                                            interpret=True)
    _check("banded grouped", phb, wtb)
    log("banded grouped plain ok")

    outb = wfr_sweep_phase_weight_multi(imgb, wlb, sigb, dr,
                                        with_grad=True, krefs=ksb,
                                        gauss_cut=gcb, interpret=True)
    _check("banded grouped grad", *outb)
    log("banded grouped grad ok")

    uvb = wfr_sweep_uv_multi(imgb, wlb, sigb, dr, ksb, gauss_cut=gcb,
                             interpret=True)
    assert uvb is not None, "banded uv path unavailable in smoke"
    _check("banded grouped uv", uvb[0][:, :, 1:], uvb[1][:, 1:, :],
           uvb[2])
    log("banded grouped uv ok")

    # --- single-peak sweep kernel ---
    g = wfr_sweep(img, wlists[0], ks[0], sigma, interpret=True)
    _check("single", np.abs(np.asarray(g["lockin"])), g["w"])
    log("single plain ok")

    g2 = wfr_sweep(img, wlists[0], ks[0], sigma, with_grad=True,
                   interpret=True)
    _check("single grad", g2["grad"])
    log("single grad ok")

    ph1, wt1 = wfr_sweep_phase_weight(img, wlists[0], ks[0], sigma, dr,
                                      interpret=True)
    _check("single emit", ph1, wt1)
    log("single emit ok")

    # multi-chunk carry path (P > max_chunk clamps HIGH -> HIGHEST and
    # carries winners across pallas_call launches)
    knorms = np.linalg.norm(ks, axis=1)
    kw = knorms.mean() / 2.5
    offs = (np.arange(5) - 2) * (2 * kw / 5)
    wx, wy = np.meshgrid(offs, offs, indexing="ij")
    wbig = ks[0][None] + np.stack([wx.ravel(), wy.ravel()], -1)
    fr = wfr_mod._plan_zoom(img.shape, wbig, float(sigma))
    assert fr is not None
    spec = jnp.fft.fft2(img)
    big = wfr_mod._wfr_sweep_zoom(spec, jnp.asarray(wbig),
                                  jnp.asarray(fr[0]), jnp.asarray(fr[1]),
                                  float(sigma), False, 8,
                                  interpret=True)
    _check("single multi-chunk", big[0])
    log("single multi-chunk ok")

    # --- warp kernels (bilinear + cubic, both boundary modes) ---
    from .pallas_warp import warp_bilinear, warp_cubic
    yy, xx = jnp.meshgrid(jnp.arange(64, dtype=jnp.float32),
                          jnp.arange(64, dtype=jnp.float32),
                          indexing="ij")
    cy = yy + 1.3 * jnp.sin(xx / 9)
    cx = xx + 0.7 * jnp.cos(yy / 7)
    src = img[:64, :64]
    for mode in ("nearest", "constant"):
        _check(f"warp bilinear {mode}",
               warp_bilinear(src, cy, cx, mode=mode, interpret=True))
        for cub in ("catmull", "bspline"):
            _check(f"warp cubic {mode} {cub}",
                   warp_cubic(src, cy, cx, mode=mode, cubic=cub,
                              interpret=True))
    log("warp ok")

    # --- DCT lane kernels (forward + inverse) ---
    from .pallas_dct2 import dct_lane, idct_lane, supported
    n = 1024
    assert supported(n)
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((8, n)).astype(np.float32))
    y = dct_lane(x, interpret=True)
    xb = idct_lane(y, interpret=True)
    _check("dct lane", y, xb)
    np.testing.assert_allclose(np.asarray(xb), np.asarray(x),
                               atol=1e-3)
    log("dct ok")

    # --- fused V-branch unwrap stencil kernels ---
    from .pallas_vcycle import presmooth, applyq
    from .pallas_vcycle import supported as vc_supported
    nv, mv = 128, 128
    assert vc_supported(nv, mv, 4)
    rng = np.random.default_rng(1)
    phi = jnp.asarray(rng.standard_normal((nv, mv)).astype(np.float32))
    wv = jnp.asarray((0.1 + rng.random((nv, mv))).astype(np.float32))
    dxs = jnp.asarray(rng.standard_normal((nv, mv)).astype(np.float32))
    out = presmooth(phi, dxs, dxs, wv, 4, 0.8, interpret=True)
    _check("vcycle presmooth", *out)
    assert out[3].shape == (nv // 4, mv)
    _check("vcycle applyq", applyq(phi, wv, interpret=True))
    log("vcycle ok")

    # --- whole-VMEM coarse-level CG kernel ---
    from .pallas_cg import cg_poisson
    from .pallas_cg import supported as cg_supported
    assert cg_supported(nv, mv)
    wwx = wv * wv
    _check("cg poisson", cg_poisson(phi, wwx, wwx, 3, interpret=True))
    log("cg ok")

    # --- unit-cell expand + drizzle kernels ---
    from .pallas_expand import expand_cell
    from .pallas_drizzle import drizzle
    from ..ucell.averaging import calc_ucell_parameters
    ks2 = np.asarray(ks[:2], np.float64)
    rmin, rsize = calc_ucell_parameters(ks2, 1)
    s, w = drizzle(src, ks2, rmin, rsize, 1, interpret=True)
    _check("drizzle", s, w)
    cell = np.where(np.asarray(w) > 0,
                    np.asarray(s) / np.maximum(np.asarray(w), 1e-9),
                    0.0).astype(np.float32)
    rec = expand_cell(jnp.asarray(cell), ks2, rmin, 1, 1, None,
                      src.shape, interpret=True)
    _check("expand", rec)
    log("expand/drizzle ok")

    return True


if __name__ == "__main__":
    # NB: `python -m pygpa_tpu.ops.kernel_smoke` imports the package
    # (and may init the TPU backend) BEFORE this guard runs, so the
    # cpu override below only helps when this file is exec'd after a
    # bare-jax import (tests/dryrun set the platform themselves).
    jax.config.update("jax_platforms", "cpu")
    assert jax.default_backend() == "cpu", (
        "backend already initialized; set the platform before "
        "importing pygpa_tpu")
    run_kernel_smoke(verbose=True)
    print("kernel smoke: ALL OK")
