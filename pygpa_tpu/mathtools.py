"""pyGPA module-path compatibility: `from pygpa_tpu.mathtools import
wrapToPi, ...` exposes the function surface of
/root/reference/pyGPA/mathtools.py."""
from .core.mathtools import (  # noqa: F401
    wrap_to_pi, wrapToPi, periodic_average, periodic_difference,
    fit_plane, fit_plane_masked, lfit_func, lfit_func_mask,
    remove_negative_duplicates, standardize_ks,
)
