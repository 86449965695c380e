"""On-device local-maximum detection (skimage.feature.peak_local_max
replacement for Bragg-peak finding, used at
/root/reference/pyGPA/geometric_phase_analysis.py:438).

The reference calls peak_local_max(smooth, threshold_rel=t): maxima of
a 3x3 neighborhood (min_distance=1), above t * max(image), excluding a
1-pixel border. Here that is a reduce_window max + fused compares — one
boolean mask computed on device; the (tiny, data-dependent) coordinate
list is extracted host-side by the caller.
"""
from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("min_distance",))
def local_max_mask(image, threshold_rel, min_distance=1):
    """Boolean mask of strict-neighborhood local maxima above
    threshold_rel * max(image), with the `min_distance` border excluded
    (peak_local_max(min_distance=1, exclude_border=True) semantics)."""
    image = jnp.asarray(image)
    k = 2 * min_distance + 1
    neigh = jax.lax.reduce_window(
        image, -jnp.inf, jax.lax.max,
        window_dimensions=(k, k), window_strides=(1, 1), padding="SAME")
    mask = (image == neigh) & (image > threshold_rel * jnp.max(image))
    n, m = image.shape
    ii = jnp.arange(n)[:, None]
    jj = jnp.arange(m)[None, :]
    border = ((ii >= min_distance) & (ii < n - min_distance)
              & (jj >= min_distance) & (jj < m - min_distance))
    return mask & border
