"""Quantify the documented behavioral deviations vs the reference.

PARITY.md claims two rim-band deviations; these tests measure them so
the claims carry numbers (and fail if a change ever widens a band):

1. WFF boundary handling: the repo computes the Gabor bank as Fourier
   multiplies (circular), the reference uses ndi.convolve (reflect)
   (/root/reference/pyGPA/geometric_phase_analysis.py:551-580). The
   difference must be confined to a rim of width 2*round(2*sigma)
   (the Gabor support diameter) and be zero (f64-exact) inside it.

2. wfr2_grad gradients: the fused kernel path returns analytic
   derivatives of the band-limited interpolant where the reference
   takes central differences of the wrapped winner phase
   (/root/reference/pyGPA/geometric_phase_analysis.py:722-760,
   np.gradient). On smooth phase they agree to O(h^2); the measured
   interior delta is pinned here.

Note the OTHER Gaussian smoothing surfaces are NOT deviations:
gauss_homogenize2 reflect-pads before its FFT filter, and the lock-in
family uses fourier_gaussian exactly like the reference (circular in
both).
"""
import numpy as np
import scipy.ndimage as ndi
import jax.numpy as jnp

from pygpa_tpu.lattices import hexlattice_gen, generate_ks


def _band_width(diff, tol):
    """Smallest margin b with max |diff[b:-b, b:-b]| < tol."""
    n = min(diff.shape) // 2
    for b in range(n):
        sl = diff[b:diff.shape[0] - b, b:diff.shape[1] - b]
        if sl.size and np.abs(sl).max() < tol:
            return b
    return n


def test_wff_circular_vs_reflect_rim_band():
    """One full WFF pass: circular-vs-reflect errors live in a rim of
    width <= 2*round(2*sigma) and the interior is f64-exact."""
    from pygpa_tpu.gpa.wff import wff

    n, sigma = 128, 5
    s = int(round(2 * sigma))
    rng = np.random.default_rng(5)
    xx, yy = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    img = (np.cos(0.55 * xx + 0.45 * yy)
           + 0.3 * rng.normal(size=(n, n)))

    thr, wl, wu = [2.0], 0.3, 0.9
    mine = np.asarray(wff(jnp.asarray(img), sigma=sigma,
                          threshold=thr, wl=wl, wu=wu))[0]

    # reference semantics oracle (reflect-mode convolutions)
    x = np.arange(-s, s)
    g1 = np.exp(-x ** 2 / (2 * sigma ** 2))
    w = g1[:, None] * g1[None, :]
    w = w / np.sqrt((w ** 2).sum())
    wi = 1.0 / sigma
    ref = np.zeros((n, n))
    for wx in np.arange(wl, wu + wi / 2, wi):
        for wy in np.arange(wl, wu + wi / 2, wi):
            wave = w * np.exp(1j * (wx * x[:, None] + wy * x[None, :]))
            sf = ndi.convolve(img.astype(complex), wave)
            sfi = np.where(np.abs(sf) >= thr[0], sf, 0.0)
            ref += ndi.convolve(sfi, wave).real
    ref *= wi * wi / (4 * np.pi ** 2)

    diff = mine - ref
    scale = np.abs(ref).max()
    b = _band_width(diff / scale, 1e-9)
    # the second convolution spreads the first's rim by another s:
    # bound the band by the Gabor support diameter (2s = 4*sigma)
    assert 0 < b <= 2 * s, b
    # quantified: interior is exact, rim error is O(signal)
    interior = np.abs(diff[2 * s:-2 * s, 2 * s:-2 * s]).max() / scale
    rim = np.abs(diff).max() / scale
    assert interior < 1e-9, interior
    assert rim < 1.0, rim


def test_wfr_grad_analytic_vs_central_difference():
    """The fused kernel's analytic gradients vs the reference's
    central-difference-of-wrapped-phase (np.gradient) oracle: O(h^2)
    agreement on smooth phase, interior delta < 2e-3 rad/px."""
    from pygpa_tpu.ops.wfr import wfr_sweep
    from reference_impls import ref_wfr

    r_k, theta, size = 0.15, 13.0, 192
    img = np.array(hexlattice_gen(r_k, theta, order=1, size=size,
                                  dtype=np.float64))
    img -= img.mean()
    ks = np.array(generate_ks(r_k, theta))[:3]
    k = ks[0]
    knorms = np.linalg.norm(ks, axis=1)
    kw = knorms.mean() / 2.5
    kstep = kw / 3
    sigma = int(np.ceil(1 / knorms.min()))
    ref = ref_wfr(img, sigma, k[0], k[1], kw, kstep, with_grad=True)

    wxs = np.arange(k[0] - kw, k[0] + kw, kstep)
    wys = np.arange(k[1] - kw, k[1] + kw, kstep)
    wx, wy = np.meshgrid(wxs, wys, indexing="ij")
    wlist = np.stack([wx.ravel(), wy.ravel()], -1)
    # float32 + interpret forces the fused kernel (analytic) path
    mine = wfr_sweep(jnp.asarray(img, jnp.float32), wlist, k, sigma,
                     with_grad=True, interpret=True)
    grad_k = np.asarray(mine["grad"], np.float64)

    m = 5 * sigma
    sl = np.s_[m:-m, m:-m]
    # winner flips (bf16 near-ties vs the f64 oracle) change the
    # demod ramp by multiples of 2*pi*kstep — exclude them
    same = (np.linalg.norm(np.moveaxis(np.asarray(mine["w"],
                                                  np.float64), 0, -1)
                           - ref["w"].transpose(1, 2, 0), axis=-1)
            < kstep / 2)
    mask = same[sl]
    delta = np.abs(grad_k[sl] - ref["grad"][sl])[mask]
    assert mask.mean() > 0.98
    # measured 4.9e-7 rad/px max at this fixture (6.1e-7 with a
    # curved-phase shift field: the O(h^2) CD error is negligible on
    # sigma-smooth phase) — pin with wide headroom so a convention
    # break (sign, 2*pi, axis swap, the banded ramp correction) trips
    # it immediately while f32 noise cannot
    assert delta.max() < 1e-4, delta.max()
    assert np.percentile(delta, 99) < 2e-5
