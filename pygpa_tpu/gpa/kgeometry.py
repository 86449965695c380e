"""k-vector geometry utilities.

Reference behavior: /root/reference/pyGPA/geometric_phase_analysis.py:
303-322 (average_lattice_vector, calc_diff_from_isotropic) and
:344-368 (ratio2angle, f2angle).
"""
import jax.numpy as jnp

from ..config import DEFAULTS
from ..core.mathtools import periodic_average
from ..lattices.transformations import rotate


def average_lattice_vector(ks, symmetry=6):
    """Mean lattice vector: circular-mean angle (period 2pi/symmetry)
    at the mean magnitude (geometric_phase_analysis.py:303-306)."""
    ks = jnp.asarray(ks)
    dt = periodic_average(jnp.arctan2(ks[:, 1], ks[:, 0]),
                          period=2 * jnp.pi / symmetry)
    r = jnp.mean(jnp.linalg.norm(ks, axis=1))
    return r * jnp.stack([jnp.cos(dt), jnp.sin(dt)])


def calc_diff_from_isotropic(ani_ks, symmetry=6):
    """Per-vector corrections dks such that ani_ks + dks is isotropic
    (all |k| equal, angles 2pi/symmetry apart)
    (geometric_phase_analysis.py:309-322)."""
    ani_ks = jnp.asarray(ani_ks)
    k_hex = average_lattice_vector(ani_ks, symmetry=symmetry)
    ks_hex = jnp.stack([rotate(k_hex, i * 2 * jnp.pi / symmetry)
                        for i in range(symmetry)])
    alldiffs = ks_hex[None, :, :] - ani_ks[:, None, :]
    argmins = jnp.argmin(jnp.linalg.norm(alldiffs, axis=-1), axis=1)
    return jnp.take_along_axis(alldiffs, argmins[:, None, None],
                               axis=1)[:, 0]


def ratio2angle(R):
    """Twist angle (degrees) for unit-cell size ratio R:
    theta = 2 asin(R/2) (geometric_phase_analysis.py:344-349)."""
    return jnp.rad2deg(2 * jnp.arcsin(R / 2))


def f2angle(f, nmperpixel=1.0, a_0=DEFAULTS.a_0):
    """Twist angle (degrees) for moire line frequency f (unit cells /
    pixel) on a lattice with constant a_0 nm
    (geometric_phase_analysis.py:352-368)."""
    ref_linespacing = 0.5 * jnp.sqrt(3.0) * a_0
    linespacing = nmperpixel / f
    return ratio2angle(ref_linespacing / linespacing)
