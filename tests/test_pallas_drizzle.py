"""Scatter-free drizzle kernel (ops/pallas_drizzle.py) vs the XLA
scatter-add formulation, interpret mode on CPU.

The kernel replaces the reference's serial pixel loop
(unit_cell_averaging.py:164-217) with dense hat-weighted MXU
contractions — the bilinear 2x2 overlap of float_overlap IS the hat
function, so the sums are mathematically identical; only the
accumulation order differs (f32 rounding).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from pygpa_tpu.lattices import generate_ks
from pygpa_tpu.ucell.averaging import _drizzle, calc_ucell_parameters
from pygpa_tpu.ops.pallas_drizzle import drizzle


@pytest.fixture(scope="module")
def case():
    rng = np.random.default_rng(1)
    ks2 = np.asarray(generate_ks(0.06, 9.0))[:2]
    z = 2
    rmin, rsize = calc_ucell_parameters(ks2, z)
    img = rng.normal(size=(160, 256))
    img[10:14, 40:60] = np.nan          # masked region
    u = 0.8 * rng.normal(size=(2,) + img.shape)
    return ks2, z, rmin, tuple(int(r) for r in rsize), img, u


@pytest.mark.parametrize("with_u", [False, True])
def test_drizzle_kernel_matches_scatter(case, with_u):
    ks2, z, rmin, rsize, img, u = case
    uu = u if with_u else None
    u_arr = jnp.asarray(u if with_u else np.zeros((2,) + img.shape))
    ref_res, ref_w = _drizzle(jnp.asarray(img), u_arr,
                              jnp.asarray(ks2), tuple(rmin), rsize, z)
    mine_sum, mine_w = drizzle(jnp.asarray(img), ks2, rmin, rsize, z,
                               u=uu, interpret=True)
    mine_res = mine_sum / mine_w
    ref_res, ref_w = np.asarray(ref_res), np.asarray(ref_w)
    mine_res, mine_w = np.asarray(mine_res), np.asarray(mine_w)
    # identical visit pattern: same bins populated
    assert ((ref_w > 0) == (mine_w > 0)).all()
    ok = ref_w > 1e-9
    assert np.allclose(mine_w[ok], ref_w[ok], rtol=1e-5)
    assert np.allclose(mine_res[ok], ref_res[ok], rtol=1e-4,
                       atol=1e-5)


def test_drizzle_kernel_nan_mask(case):
    """NaN pixels contribute neither value nor weight."""
    ks2, z, rmin, rsize, img, _ = case
    all_nan = np.full_like(img, np.nan)
    s, w = drizzle(jnp.asarray(all_nan), ks2, rmin, rsize, z,
                   interpret=True)
    assert float(np.abs(np.asarray(s)).max()) == 0.0
    assert float(np.abs(np.asarray(w)).max()) == 0.0
