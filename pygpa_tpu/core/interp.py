"""Image resampling (map_coordinates) on TPU.

scipy.ndimage.map_coordinates(order=3) underpins the reference's
distortion inversion, undistortion, and unit-cell expansion
(/root/reference/pyGPA/geometric_phase_analysis.py:256-299,973;
unit_cell_averaging.py:246-248). jax.scipy.ndimage only supports
order<=1, so this module adds an order=3 Catmull-Rom resampler built
from 16 fused gathers — an interpolating C^1 cubic whose accuracy is
comparable to scipy's prefiltered spline for the smooth fields GPA
works with, and which maps to plain XLA gathers on TPU (no host
round-trip, vmappable, differentiable).

Modes: 'nearest' (clamp) and 'constant' (cval outside, NaN supported).
"""
from functools import partial

import jax
import jax.numpy as jnp
from jax.scipy import ndimage as jndi

# Route order-1 2-D warps through the Pallas gather kernel on TPU
# (ops/pallas_warp.py): ~10x faster than the XLA gather lowering.
# Requires locally smooth coordinate fields (per-(8,128)-tile
# variation < 56 rows / 127 cols beyond the tile extent, i.e.
# |grad coords - I| <~ 0.4) — true of every displacement-field warp in
# this framework. Set False to force the exact-for-any-coords XLA path.
_PALLAS_WARP = True


def _use_pallas_warp(image, coordinates, order, mode):
    return (_PALLAS_WARP
            and order in (1, 3)
            and jax.default_backend() == "tpu"
            and image.ndim == 2
            and coordinates.shape[0] == 2
            and coordinates[0].ndim in (1, 2)
            and mode in ("nearest", "constant"))


def _cubic_weights(t):
    """Catmull-Rom weights for taps at offsets (-1, 0, 1, 2)."""
    t2 = t * t
    t3 = t2 * t
    w0 = -0.5 * t3 + t2 - 0.5 * t
    w1 = 1.5 * t3 - 2.5 * t2 + 1.0
    w2 = -1.5 * t3 + 2.0 * t2 + 0.5 * t
    w3 = 0.5 * t3 - 0.5 * t2
    return (w0, w1, w2, w3)


@partial(jax.jit, static_argnames=("mode",))
def _map_coordinates_cubic(image, coords, cval, mode):
    x, y = coords[0], coords[1]
    n, m = image.shape
    dt = image.dtype
    ix = jnp.floor(x)
    iy = jnp.floor(y)
    tx = (x - ix).astype(dt)
    ty = (y - iy).astype(dt)
    ix = ix.astype(jnp.int32)
    iy = iy.astype(jnp.int32)
    wx = _cubic_weights(tx)
    wy = _cubic_weights(ty)

    flat = image.ravel()
    out = jnp.zeros(x.shape, dt)
    if mode == "constant":
        cval = jnp.asarray(cval, dt)
    for a in range(4):
        xi = ix + (a - 1)
        vx = None
        if mode == "nearest":
            xi = jnp.clip(xi, 0, n - 1)
        else:
            vx = (xi >= 0) & (xi < n)
            xi = jnp.clip(xi, 0, n - 1)
        row_acc = jnp.zeros(x.shape, dt)
        for b in range(4):
            yi = iy + (b - 1)
            if mode == "nearest":
                yi = jnp.clip(yi, 0, m - 1)
                val = flat[xi * m + yi]
            else:
                vy = (yi >= 0) & (yi < m) & vx
                yi = jnp.clip(yi, 0, m - 1)
                val = jnp.where(vy, flat[xi * m + yi], cval)
            row_acc = row_acc + wy[b] * val
        out = out + wx[a] * row_acc
    return out


def map_coordinates(image, coordinates, order=3, mode="nearest", cval=0.0):
    """Sample `image` at fractional `coordinates` (shape (2, ...)).

    order=1 delegates to jax.scipy.ndimage (bilinear); order=3 uses the
    Catmull-Rom kernel. mode='nearest' clamps to the border (the
    reference's invert_u default, geometric_phase_analysis.py:248,283);
    mode='constant' fills with cval outside (undistort_image's final
    resample and expand_unitcell, geometric_phase_analysis.py:973,
    unit_cell_averaging.py:246-248).
    """
    image = jnp.asarray(image)
    coordinates = jnp.asarray(coordinates)
    if order <= 1:
        if _use_pallas_warp(image, coordinates, order, mode):
            from ..ops.pallas_warp import warp_bilinear
            return warp_bilinear(image, coordinates[0], coordinates[1],
                                 mode=mode, cval=cval)
        return jndi.map_coordinates(image, list(coordinates), order=order,
                                    mode=mode, cval=cval)
    if mode not in ("nearest", "constant"):
        raise NotImplementedError(f"mode={mode!r} not supported for cubic")
    if _use_pallas_warp(image, coordinates, order, mode):
        from ..ops.pallas_warp import warp_cubic
        return warp_cubic(image, coordinates[0], coordinates[1],
                          mode=mode, cval=cval)
    return _map_coordinates_cubic(image, coordinates, cval, mode)
