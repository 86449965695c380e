"""Coverage for the remaining utility surface: per-axis homogenize,
masked plane fit, klist generation, deconvolution, plotting smoke,
multi-axis meshes."""
import matplotlib
matplotlib.use("Agg")

import numpy as np
import jax.numpy as jnp

from pygpa_tpu import imagetools as it
from pygpa_tpu import gpa
from pygpa_tpu.core.mathtools import fit_plane_masked
from pygpa_tpu.core.fourier import fourier_gaussian_multiplier
from pygpa_tpu.lattices import generate_ks, hexlattice_gen
from pygpa_tpu.parallel import make_mesh


def test_homogenize_per_axis():
    rng = np.random.default_rng(0)
    base = rng.uniform(1, 2, size=(128, 128))
    profile = np.linspace(0.5, 1.5, 128)[:, None]
    img = base * profile
    out = np.asarray(it.homogenize_per_axis(img, sigma=30))
    rowmean = out.mean(axis=1)
    raw = img.mean(axis=1)
    assert rowmean.std() / rowmean.mean() < 0.5 * (raw.std() / raw.mean())


def test_fit_plane_masked():
    n = 48
    xx, yy = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    img = 0.2 * xx + 0.1 * yy + 1.0
    img[:10, :10] = 100.0  # corrupt region
    mask = np.ones((n, n), bool)
    mask[:10, :10] = False
    p = np.asarray(fit_plane_masked(jnp.asarray(img), mask=jnp.asarray(mask)))
    assert np.allclose(p, [0.2, 0.1, 1.0], atol=1e-3)


def test_generate_klists():
    pks = np.asarray(generate_ks(0.1, 5.0))[:3]
    klists = gpa.generate_klists(pks, dk=0.01)
    assert len(klists) == 3
    for kl, pk in zip(klists, pks):
        assert kl.shape[1] == 2
        assert len(kl) > 0
        # every candidate is closest to its own pk among +/- all pks
        allk = np.concatenate([pks, -pks])
        d = np.linalg.norm(kl[:, None] - allk[None], axis=-1)
        own = np.linalg.norm(kl - pk, axis=-1)
        assert np.all(own <= d.min(axis=1) + 1e-12)


def test_gaussian_deconvolve_recovers_blur():
    """gaussian_deconvolve approximately inverts the Gaussian window's
    smoothing of a smooth field (the pipeline's deconvolve step)."""
    n = 256
    xx, yy = np.meshgrid(np.arange(n) - n // 2, np.arange(n) - n // 2,
                         indexing="ij")
    field = 5.0 * np.exp(-((xx / 40.0) ** 2 + (yy / 60.0) ** 2))
    sigma = 10
    G = np.asarray(fourier_gaussian_multiplier((n, n), sigma, jnp.float64))
    blurred = np.fft.ifft2(np.fft.fft2(field) * G).real
    assert np.abs(blurred - field).max() > 0.1  # the blur is material
    # balance trades sharpness vs noise amplification; the pipeline
    # default (5000) is tuned for noisy lock-in fields — use a lighter
    # regularization for this clean test field
    out = np.asarray(gpa.gaussian_deconvolve(jnp.asarray(blurred), sigma,
                                             dr=20, balance=500))
    err = np.abs(out - field)[40:-40, 40:-40]
    assert err.max() < 0.1 * np.abs(blurred - field).max()


def test_plot_helpers_smoke():
    img = np.asarray(hexlattice_gen(0.1, 5.0, 1, size=64))
    it.fftplot(np.abs(np.fft.fftshift(np.fft.fft2(img))))
    it.fftplot(np.abs(np.fft.fft2(img)), pcolormesh=False, contour=True,
               levels=[1.0])
    ks = np.asarray(generate_ks(0.1, 5.0))[:3]
    ax = it.indicate_k(ks, 1, inset=False)
    assert ax is not None
    ax2 = it.indicate_k(ks, [0, 1])  # Iterable branch (py3.10 fix)
    assert ax2 is not None


def test_make_mesh_multi_axis():
    mesh = make_mesh(8, ("batch", "k"), (2, 4))
    assert mesh.shape == {"batch": 2, "k": 4}
    mesh1 = make_mesh(4)
    assert mesh1.shape == {"batch": 4}
