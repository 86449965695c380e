"""Core numerics: math utilities, Fourier tooling, interpolation."""
from . import mathtools  # noqa: F401
from . import fourier  # noqa: F401
from . import interp  # noqa: F401
