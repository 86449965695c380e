"""Image preprocessing / plotting utilities.

Reference behavior: /root/reference/pyGPA/imagetools.py. Dense filters
(Gaussian homogenization, mask generation) run on device; NaN trimming
and mask-culling stay host-side (data-dependent output shapes).
matplotlib helpers import lazily so the compute path never pulls in a
GUI stack. The reference's indicate_k used collections.Iterable and is
broken on Python >= 3.10 (imagetools.py:83); fixed here.
"""
import numpy as np
import jax.numpy as jnp

from .core.fourier import fftbounds, gaussian_filter_fft  # noqa: F401


def _gaussian_filter_reflect(image, sigma):
    """Gaussian smoothing with reflect boundary handling (matches
    scipy.ndimage.gaussian_filter closely): reflect-pad by 4*sigma,
    FFT-smooth, crop."""
    image = jnp.asarray(image)
    r = min(int(4 * sigma), min(image.shape) - 1)
    padded = jnp.pad(image, r, mode="reflect")
    return gaussian_filter_fft(padded, sigma)[r:-r, r:-r]


def gauss_homogenize2(image, mask, sigma, nan_scale=None):
    """Divide the image by its masked Gaussian-smoothed background
    (imagetools.py:92-105)."""
    image = jnp.asarray(image)
    mask = jnp.asarray(mask)
    VV = _gaussian_filter_reflect(jnp.where(mask, image, 0.0), sigma)
    VV = VV / _gaussian_filter_reflect(mask.astype(image.dtype), sigma)
    if nan_scale is not None:
        VV = jnp.nan_to_num(VV, nan=nan_scale)
    return image / VV


def gauss_homogenize3(image, mask, sigma):
    """(imagetools.py:108-109)."""
    return gauss_homogenize2(image, mask, sigma, nan_scale=1)


def homogenize_per_axis(image, sigma=200, mask=None,
                        reducfunc=jnp.nanmedian):
    """Divide out per-axis smoothed profiles (imagetools.py:112-125)."""
    res = jnp.asarray(image)
    for axis in (0, 1):
        if mask is not None:
            data = jnp.where(jnp.asarray(mask), res, jnp.nan)
        else:
            data = res
        profile = reducfunc(data, axis=axis, keepdims=True)
        prof = profile.ravel()
        r = min(int(4 * sigma), prof.shape[0] - 1)
        prof = jnp.pad(prof, r, mode="reflect")
        k = jnp.exp(-0.5 * (jnp.arange(prof.shape[0])
                            - prof.shape[0] // 2) ** 2 / sigma ** 2)
        k = k / k.sum()
        sm = jnp.convolve(prof, k, mode="same")[r:-r]
        sm = sm.reshape(profile.shape)
        res = res / (sm / sm.max())
    return res


def _nan_rows_cols(image):
    """Per-(row, column) NaN count of a 2D(+channels) image — NaN
    entries are counted per channel, the way the reference's peeling
    counts them (imagetools.py:145-175 sums raw np.isnan)."""
    nan = np.isnan(np.asarray(image))
    if nan.ndim >= 3:
        nan = nan.sum(axis=tuple(range(2, nan.ndim)))
    return nan.astype(np.int64)


def trim_nans(image):
    """Drop rows/columns where ANY single channel is all-NaN along the
    full row/column (the reference's reduction order, imagetools.py:
    128-142: all() along the axis first, THEN any() over channels,
    with RGBA ignoring alpha). Host-side (data-dependent shape)."""
    image = np.asarray(image)
    nan = np.isnan(image)
    xmask = nan.all(axis=1)        # (N, ...channels)
    ymask = nan.all(axis=0)
    if nan.ndim >= 3:
        if nan.shape[-1] == 4:
            xmask = xmask[..., :3]
            ymask = ymask[..., :3]
        xmask = xmask.any(axis=tuple(range(1, xmask.ndim)))
        ymask = ymask.any(axis=tuple(range(1, ymask.ndim)))
    return image[~xmask][:, ~ymask]


def trim_nans2(image, return_lims=False):
    """Peel NaN-containing border rows/columns greedily, keeping as
    much area as possible (contract of reference imagetools.py:
    145-175). Host-side.

    Implementation: instead of re-slicing the array every round, track
    the live window [x0, x1) x [y0, y1) against NaN-count prefix sums,
    so each peel decision costs O(1) after one O(N*M) pass."""
    image = np.asarray(image)
    nan = _nan_rows_cols(image).astype(np.int64)
    # prefix[i, j] = NaN count in row i, cols [0, j) / col j, rows [0, i)
    row_pre = np.pad(np.cumsum(nan, axis=1), ((0, 0), (1, 0)))
    col_pre = np.pad(np.cumsum(nan, axis=0), ((1, 0), (0, 0)))
    x0, x1 = 0, image.shape[0]
    y0, y1 = 0, image.shape[1]

    def row_count(i):
        return row_pre[i, y1] - row_pre[i, y0]

    def col_count(j):
        return col_pre[x1, j] - col_pre[x0, j]

    while True:
        r_top, r_bot = row_count(x0), row_count(x1 - 1)
        c_left, c_right = col_count(y0), col_count(y1 - 1)
        if r_top + r_bot + c_left + c_right == 0:
            break
        if r_top + r_bot > c_left + c_right:
            x0 += r_top > 0
            x1 -= r_bot > 0
        else:
            y0 += c_left > 0
            y1 -= c_right > 0
    trimmed = image[x0:x1, y0:y1]
    if return_lims:
        return trimmed, np.array([[x0, x1], [y0, y1]])
    return trimmed


def generate_mask(dataset, mask_value, r=20):
    """Mask of pixels never equal to mask_value in any stack image,
    eroded by a disk of radius r (imagetools.py:178-185). The erosion
    runs as an FFT convolution with the disk: a pixel survives iff no
    masked-out pixel lies within r (borders count as outside, like
    scipy binary_erosion's border_value=0)."""
    dataset = jnp.asarray(dataset)
    mask = ~jnp.any(dataset == mask_value, axis=0)
    n, m = mask.shape
    inv = 1.0 - mask.astype(jnp.float32)
    inv = jnp.pad(inv, r + 1, mode="constant", constant_values=1.0)
    yy, xx = jnp.mgrid[-r: r + 1, -r: r + 1]
    disk = ((xx ** 2 + yy ** 2) <= r ** 2).astype(jnp.float32)
    kern = jnp.zeros(inv.shape, jnp.float32)
    kern = kern.at[: 2 * r + 1, : 2 * r + 1].set(disk)
    kern = jnp.roll(kern, (-r, -r), axis=(0, 1))
    conv = jnp.fft.ifft2(jnp.fft.fft2(inv) * jnp.fft.fft2(kern)).real
    eroded = conv[r + 1: r + 1 + n, r + 1: r + 1 + m] < 0.5
    return eroded & mask


def cull_by_mask(data, mask):
    """Crop a (stack of) image(s) to the bounding box of the mask's
    nonzero rows/columns (contract of reference imagetools.py:188-194).
    Host-side."""
    data = np.asarray(data)
    alive_r = np.asarray(mask).any(axis=1)
    alive_c = np.asarray(mask).any(axis=0)
    x0 = int(alive_r.argmax())
    x1 = len(alive_r) - int(alive_r[::-1].argmax())
    y0 = int(alive_c.argmax())
    y1 = len(alive_c) - int(alive_c[::-1].argmax())
    return data[..., x0:x1, y0:y1]


# plotting / colormap helpers live in pygpa_tpu.viz (compute-free);
# re-exported here for reference API parity (imagetools.py:29-89,197-204)
from .viz import fftplot, indicate_k, to_KovesiRGB  # noqa: E402,F401
