"""Periodic unit-cell expansion kernel (ops/pallas_expand.py) vs the
general map_coordinates path, interpret mode on CPU.

The kernel computes cell coordinates in-kernel from the k-vectors and
interpolates via dense hat-function matmuls — exact mode='constant'
cval=0 semantics with no coordinate arrays, immune to the sawtooth
seam discontinuity that forces the windowed warp kernel onto its dense
fallback (VERDICT round 1, weak #3 / next #4).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from pygpa_tpu.lattices import generate_ks
from pygpa_tpu.ucell.averaging import (calc_ucell_parameters,
                                       expand_unitcell)
from pygpa_tpu.ops.pallas_expand import expand_cell


@pytest.fixture(scope="module")
def case():
    rng = np.random.default_rng(0)
    ks2 = np.asarray(generate_ks(0.05, 7.0))[:2]
    z = 2
    rmin, rsize = calc_ucell_parameters(ks2, z)
    cell = rng.normal(size=rsize)  # worst case: white-noise cell
    shape = (192, 256)
    u = 0.5 * rng.normal(size=(2,) + shape)
    return ks2, z, rmin, cell, shape, u


@pytest.mark.parametrize("order", [1, 3])
@pytest.mark.parametrize("with_u", [False, True])
def test_expand_kernel_matches_f64_oracle(case, order, with_u):
    """In float64 (interpret mode) the kernel and the map_coordinates
    path compute the same interpolant exactly."""
    ks2, z, rmin, cell, shape, u = case
    uu = u if with_u else None
    ref = expand_unitcell(jnp.asarray(cell), ks2, shape, z=z,
                          u=(0 if uu is None else uu), order=order)
    mine = expand_cell(jnp.asarray(cell), ks2, rmin, z, 1, uu, shape,
                       order=order, interpret=True)
    assert np.allclose(np.asarray(mine), np.asarray(ref), atol=1e-10)


def test_expand_kernel_f32_accuracy(case):
    """In float32 the kernel is as close to the f64 oracle as the
    existing XLA path (differences are pure coordinate rounding)."""
    ks2, z, rmin, cell, shape, _ = case
    oracle = np.asarray(expand_unitcell(jnp.asarray(cell), ks2, shape,
                                        z=z, u=0, order=3))
    cell32 = jnp.asarray(cell.astype(np.float32))
    mine = np.asarray(expand_cell(cell32, ks2, rmin, z, 1, None, shape,
                                  order=3, interpret=True))
    assert np.abs(mine - oracle).max() < 1e-3


def test_expand_kernel_z2_supersampling(case):
    ks2, z, rmin, cell, shape, _ = case
    ref = expand_unitcell(jnp.asarray(cell), ks2, shape, z=z, z2=2,
                          u=0, order=3)
    mine = expand_cell(jnp.asarray(cell), ks2, rmin, z, 2, None, shape,
                       order=3, interpret=True)
    assert np.allclose(np.asarray(mine), np.asarray(ref), atol=1e-10)
