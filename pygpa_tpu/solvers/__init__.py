"""Numerical solvers: per-pixel weighted least squares and the
DCT-preconditioned conjugate-gradient weighted phase unwrapper."""
from .lstsq import weighted_lstsq_stack  # noqa: F401
from .unwrap import (  # noqa: F401
    phase_unwrap, phase_unwrap_mg, phase_unwrap_prediff, solve_poisson,
    phase_unwrap_ref, phase_unwrap_ref_prediff, solvePoisson,
    solvePoisson_precomped, precomp_Poissonscaling, applyQ,
)
