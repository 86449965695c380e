"""Image utilities and WFF denoising."""
import numpy as np
import scipy.ndimage as ndi
import jax.numpy as jnp

from pygpa_tpu import imagetools as it
from pygpa_tpu.gpa.wff import wff
from pygpa_tpu.lattices import hexlattice_gen


def test_gauss_homogenize2():
    rng = np.random.default_rng(0)
    base = np.asarray(hexlattice_gen(0.1, 5.0, 1, size=128,
                                     dtype=np.float64)) + 5
    # multiplicative illumination gradient
    xx = np.linspace(0.5, 2.0, 128)[:, None]
    img = base * xx
    mask = np.ones_like(img, bool)
    out = np.asarray(it.gauss_homogenize2(img, mask, sigma=20))
    # homogenized image should have a flat row-mean profile
    prof = out.mean(axis=1)
    rawprof = img.mean(axis=1)
    # a sigma=20 background can't track the steep ramp perfectly (same
    # with scipy); the variation must still drop several-fold
    assert prof.std() / prof.mean() < 0.25 * (rawprof.std()
                                              / rawprof.mean())


def test_gauss_homogenize_matches_scipy():
    rng = np.random.default_rng(1)
    img = rng.uniform(1, 2, size=(96, 96))
    mask = rng.uniform(size=(96, 96)) > 0.3
    ref = img / (ndi.gaussian_filter(np.where(mask, img, 0), 8)
                 / ndi.gaussian_filter(mask.astype(float), 8))
    mine = np.asarray(it.gauss_homogenize2(img, mask, sigma=8))
    assert np.allclose(mine[10:-10, 10:-10], ref[10:-10, 10:-10],
                       rtol=1e-2)


def test_trim_nans2():
    img = np.full((20, 30), 1.0)
    img[:3] = np.nan
    img[:, -2:] = np.nan
    img[5, 5] = np.nan  # interior nan: stays
    out, lims = it.trim_nans2(img, return_lims=True)
    # greedy both-ends peel (reference semantics): 3 nan rows on top
    # pull 3 bottom rows with them while the nan columns persist
    assert out.shape == (14, 28)
    assert lims.tolist() == [[3, 17], [0, 28]]
    # borders clean, interior nan preserved
    assert not np.isnan(out[[0, -1]]).any()
    assert not np.isnan(out[:, [0, -1]]).any()
    assert np.isnan(out[2, 5])
    out2 = it.trim_nans(np.where(np.isnan(img), np.nan, img))
    assert out2.shape[0] <= 20


def test_generate_mask_and_cull():
    data = np.ones((3, 64, 64))
    data[1, 10:20, 10:20] = -1  # mask_value region
    mask = np.asarray(it.generate_mask(data, -1, r=5))
    assert not mask[12:18, 12:18].any()
    assert mask[40:50, 40:50].all()
    # erosion margin: pixels within r of the bad region are masked
    assert not mask[21, 15]
    culled = it.cull_by_mask(data, mask)
    assert culled.shape[-2:] != (0, 0)


def test_to_kovesi_rgb():
    img = np.zeros((4, 4, 3))
    img[..., 0] = 1
    out = np.asarray(it.to_KovesiRGB(img))
    assert np.allclose(out[0, 0], [0.90, 0.17, 0.00])


def test_wff_denoises_fringes():
    """WFF must pass the fringe band and reject broadband noise."""
    n = 128
    xx, yy = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    clean = np.cos(0.6 * xx + 0.5 * yy)
    rng = np.random.default_rng(2)
    noisy = clean + 1.0 * rng.normal(size=clean.shape)
    out = np.asarray(wff(noisy, sigma=8, threshold=[3.0],
                         wl=0.3, wu=0.9))[0]
    # correlation with the clean fringes improves markedly
    c0 = np.corrcoef(noisy[16:-16, 16:-16].ravel(),
                     clean[16:-16, 16:-16].ravel())[0, 1]
    c1 = np.corrcoef(out[16:-16, 16:-16].ravel(),
                     clean[16:-16, 16:-16].ravel())[0, 1]
    assert c1 > 0.97
    assert c1 > c0


def test_wff_matches_scipy_convolution_interior():
    """One Gabor pass of the FFT path equals ndi.convolve in the
    interior (boundary handling differs: circular vs reflect)."""
    from pygpa_tpu.gpa.wff import _gabor_spectrum
    rng = np.random.default_rng(3)
    img = rng.normal(size=(96, 96))
    sigma, wx, wy = 5, 0.4, 0.7
    s = int(round(2 * sigma))
    x = np.arange(-s, s)
    g1 = np.exp(-x ** 2 / (2 * sigma ** 2))
    w = g1[:, None] * g1[None, :]
    w = w / np.sqrt((w ** 2).sum())
    wave = w * np.exp(1j * (wx * x[:, None] + wy * x[None, :]))
    ref = ndi.convolve(img.astype(complex), wave)
    K = np.asarray(_gabor_spectrum((96, 96), sigma, wx, wy,
                                   jnp.complex128))
    mine = np.fft.ifft2(np.fft.fft2(img) * K)
    m = 2 * s
    assert np.allclose(mine[m:-m, m:-m], ref[m:-m, m:-m], atol=1e-10)
