"""Image preparation for GPA (the reference's deprecated prep_image,
geometric_phase_analysis.py:325-341), kept for API parity."""
import numpy as np
import jax.numpy as jnp

from ..imagetools import (gauss_homogenize2, trim_nans2,
                          _gaussian_filter_reflect)


def prep_image(original, vlims=None, edges=None):
    """DEPRECATED (as in the reference): clip, trim, and
    double-homogenize an image for GPA. Host/device hybrid: the NaN
    trim is data-dependent (host); filtering runs on device."""
    original = np.asarray(original)
    if vlims is None:
        vlims = np.quantile(original, [0.08, 0.999])
    if edges is not None:
        original = original[edges[0, 0]:edges[0, 1],
                            edges[1, 0]:edges[1, 1]]
    else:
        original = trim_nans2(np.where(original == 0, np.nan, original))
    original = np.clip(original, *vlims)
    mask = np.logical_and(original > np.quantile(original, 0.01),
                          original < np.quantile(original, 0.99))
    deformed1 = gauss_homogenize2(jnp.asarray(original),
                                  jnp.asarray(mask), sigma=5)
    mask2 = _gaussian_filter_reflect(deformed1, 5.0) > 0.995
    deformed2 = gauss_homogenize2(jnp.asarray(original), mask2, sigma=65)
    deformed = deformed2 - deformed2.mean()
    xx, yy = np.meshgrid(np.arange(original.shape[0]),
                         np.arange(original.shape[1]), indexing="ij")
    return deformed, xx, yy
