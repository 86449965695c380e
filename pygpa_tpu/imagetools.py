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


def trim_nans(image):
    """Drop all-NaN rows/columns (imagetools.py:128-142). Host-side."""
    image = np.asarray(image)
    xmask = np.all(np.isnan(image), axis=1)
    ymask = np.all(np.isnan(image), axis=0)
    if len(image.shape) >= 3:
        if image.shape[-1] == 4:
            xmask = np.any(xmask[..., :3], axis=-1)
            ymask = np.any(ymask[..., :3], axis=-1)
        else:
            xmask = np.any(xmask, axis=-1)
            ymask = np.any(ymask, axis=-1)
    return image[~xmask][:, ~ymask]


def trim_nans2(image, return_lims=False):
    """Greedy row/column peel of NaN borders, preserving area
    (imagetools.py:145-175). Host-side."""
    timage = np.asarray(image).copy()
    xlims = [0, timage.shape[0]]
    ylims = [0, timage.shape[1]]
    while True:
        r = np.isnan(timage[[0, -1]]).sum(axis=1)
        c = np.isnan(timage[:, [0, -1]]).sum(axis=0)
        if r.sum() == 0 and c.sum() == 0:
            if return_lims:
                return timage, np.array([xlims, ylims])
            return timage
        elif r.sum() > c.sum():
            if r[0] > 0:
                timage = timage[1:]
                xlims[0] += 1
            if r[1] > 0:
                timage = timage[:-1]
                xlims[1] -= 1
        else:
            if c[0] > 0:
                timage = timage[:, 1:]
                ylims[0] += 1
            if c[1] > 0:
                timage = timage[:, :-1]
                ylims[1] -= 1


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
    """Remove edge rows/columns fully outside the mask
    (imagetools.py:188-194). Host-side."""
    data = np.asarray(data)
    mask = np.asarray(mask)
    xlims = np.where(np.sum(mask, axis=1))[0]
    ylims = np.where(np.sum(mask, axis=0))[0]
    return data[..., xlims.min():xlims.max() + 1,
                ylims.min():ylims.max() + 1]


def to_KovesiRGB(image):
    """Kovesi RGB basis (imagetools.py:197-204)."""
    A = jnp.array([[0.90, 0.17, 0.00],
                   [0.00, 0.50, 0.00],
                   [0.10, 0.33, 1.00]])
    return jnp.dot(jnp.asarray(image), A)


def fftplot(fftim, d=1, pcolormesh=True, contour=False, levels=None,
            **kwargs):
    """Plot a Fourier-transformed image with correct axes
    (imagetools.py:29-55)."""
    import matplotlib.pyplot as plt
    fftim = np.asarray(fftim)
    x, y = [fftbounds(n, d) for n in fftim.shape]
    origin = kwargs.pop("origin", "upper")
    ax = kwargs.pop("ax", None)
    if ax is None:
        _, ax = plt.subplots()
    if pcolormesh:
        X, Y = np.meshgrid(x, y, indexing="xy")
        im = ax.pcolormesh(X, Y, fftim.T, **kwargs)
    else:
        if origin == "upper":
            y = y[::-1]
        extent = [x[0], x[-1], y[0], y[-1]]
        im = ax.imshow(fftim.T, extent=extent, origin=origin, **kwargs)
        if contour:
            ax.contour(fftim.T, colors="white", extent=extent, alpha=0.3,
                       levels=levels)
    ax.set_aspect("equal")
    return im


def indicate_k(pks, i, ax=None, inset=True, size="25%", origin="upper",
               s=10, colors=("red", "gray")):
    """Highlight the i-th k-vector with an arrow (imagetools.py:58-89,
    with the Python >= 3.10 Iterable fix)."""
    import matplotlib.pyplot as plt
    from collections.abc import Iterable
    from mpl_toolkits.axes_grid1.inset_locator import inset_axes
    ks = np.asarray(pks).copy()
    if not ax:
        ax = plt.gca()
    if inset:
        ax = inset_axes(ax, width=size, height=size, loc=2)
        ax.tick_params(labelleft=False, labelbottom=False,
                       direction="in", length=0)
        for axis in ["top", "bottom", "left", "right"]:
            ax.spines[axis].set_color("None")
        ax.patch.set_alpha(0.0)
    if origin == "upper":
        ks[:, 1] *= -1
    ax.scatter(*np.concatenate([ks, -ks, [[0, 0]]]).T, color=colors[1], s=s)
    ax.scatter(ks[i, 0], ks[i, 1], color=colors[0], s=3 * s)
    if isinstance(i, Iterable):
        for j in i:
            ax.arrow(0, 0, ks[j, 0], ks[j, 1], length_includes_head=True)
    else:
        ax.arrow(0, 0, ks[i, 0], ks[i, 1], length_includes_head=True,
                 color="black")
    ax.set_aspect("equal")
    return ax
