"""Unit-cell averaging round trips, mirroring
/root/reference/tests/test_unit_cell_averaging.py."""
import numpy as np
import jax.numpy as jnp
import pytest

from pygpa_tpu.lattices import generate_ks, hexlattice_gen
import pygpa_tpu.ucell as uc


@pytest.mark.parametrize("z", [2, 3])
def test_project_and_expand(z):
    r_k, xi0, psi, kappa, order = 0.02, 7.0, 0.0, 1.05, 2
    ori_ks = np.asarray(generate_ks(r_k, xi0, kappa=kappa, psi=psi))[:2]
    original = np.asarray(hexlattice_gen(r_k, xi0, order, kappa=kappa,
                                         psi=psi, size=200,
                                         dtype=np.float64))
    original = original / original.max()
    cell = np.asarray(uc.unit_cell_average(original, ori_ks, z=z))
    expanded = np.asarray(uc.expand_unitcell(cell, ori_ks,
                                             original.shape, z=z))
    assert np.abs(original - expanded).mean() < 5e-3
    assert np.abs(original - expanded).max() < 0.11


@pytest.mark.parametrize("z", [2, 3])
def test_deformed_project_and_expand(z, gaussiandeform):
    r_k, xi0, psi, kappa, order = 0.02, 7.0, 0.0, 1.05, 2
    ori_ks = np.asarray(generate_ks(r_k, xi0, kappa=kappa, psi=psi))[:2]
    # 200^2 crop of the session deform field, as the reference's 200^2
    u = gaussiandeform[:, :200, :200]
    deformed = np.asarray(hexlattice_gen(r_k, xi0, order, kappa=kappa,
                                         psi=psi, size=200, shift=u,
                                         dtype=np.float64))
    deformed = deformed / deformed.max()
    cell = np.asarray(uc.unit_cell_average(deformed, ori_ks, z=z, u=u))
    expanded = np.asarray(uc.expand_unitcell(cell, ori_ks,
                                             deformed.shape, z=z, u=u))
    assert np.abs(deformed - expanded).mean() < 3e-3
    assert np.abs(deformed - expanded).max() < 0.15


def test_nan_masking():
    """NaN pixels are excluded; untouched bins come back NaN."""
    r_k = 0.05
    ks = np.asarray(generate_ks(r_k, 0.0))[:2]
    img = np.asarray(hexlattice_gen(r_k, 0.0, 1, size=100,
                                    dtype=np.float64)).copy()
    img[:50] = np.nan
    cell = np.asarray(uc.unit_cell_average(img, ks, z=2))
    assert np.isfinite(cell).any()
    clean = np.asarray(uc.unit_cell_average(
        np.asarray(hexlattice_gen(r_k, 0.0, 1, size=100,
                                  dtype=np.float64)), ks, z=2))
    both = np.isfinite(cell) & np.isfinite(clean)
    assert both.sum() > 0.9 * np.isfinite(clean).sum()
    # halving the contributing pixels shifts sparse bins a little;
    # the average must stay close
    d = np.abs(cell - clean)[both]
    assert d.mean() < 0.05 and np.quantile(d, 0.9) < 0.1


def test_weights_returned():
    ks = np.asarray(generate_ks(0.05, 0.0))[:2]
    img = np.asarray(hexlattice_gen(0.05, 0.0, 1, size=64,
                                    dtype=np.float64))
    cell, w = uc.unit_cell_average(img, ks, z=2, return_weights=True)
    w = np.asarray(w)
    assert w.sum() > 0
    assert np.isclose(w.sum(), 64 * 64)  # every pixel lands somewhere
