"""pyGPA module-path compatibility: `import
pygpa_tpu.unit_cell_averaging as uc` exposes the function surface of
/root/reference/pyGPA/unit_cell_averaging.py."""
from .ucell.averaging import (  # noqa: F401
    forward_transform, backward_transform, cart_in_uc, float_overlap,
    calc_ucell_parameters, unit_cell_average, expand_unitcell,
    add_to_position,
)
