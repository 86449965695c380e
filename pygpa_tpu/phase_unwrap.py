"""pyGPA module-path compatibility: `import pygpa_tpu.phase_unwrap as
pu` exposes the function surface of
/root/reference/pyGPA/phase_unwrap.py."""
from .solvers.unwrap import (  # noqa: F401
    phase_unwrap, phase_unwrap_mg, phase_unwrap_prediff,
    phase_unwrap_ref, phase_unwrap_ref_prediff, solvePoisson,
    solvePoisson_precomped, precomp_Poissonscaling, applyQ, _wrapToPi,
)
