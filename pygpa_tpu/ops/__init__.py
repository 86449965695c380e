"""Device kernels: spatial lock-in, WFR sweeps, peak finding, scatter."""
from .lockin import gpa_lockin, gpa_lockin_batch  # noqa: F401
from .wfr import wfr_sweep  # noqa: F401
from .peaks import local_max_mask  # noqa: F401
