"""Every Pallas kernel entry point must trace and run (interpret).

Guards the round-3 breakage class: the production kernels are gated on
``jax.default_backend() == "tpu"``, so the CPU suite exercises them
only where a test explicitly forces interpret mode — a broken launch
signature in an uncovered variant otherwise ships green. This single
test sweeps ALL entry variants through the production wrappers.
"""
from pygpa_tpu.ops.kernel_smoke import run_kernel_smoke


def test_kernel_smoke_all_entries():
    assert run_kernel_smoke()
