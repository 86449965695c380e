"""Kerelsky-style moire fits: hypothesis round trips mirroring
/root/reference/tests/test_property_extract.py:102-135, driven through
the in-repo Levenberg-Marquardt."""
import numpy as np
import jax.numpy as jnp
from hypothesis import given, settings, strategies as st

import pygpa_tpu.props as pe
from pygpa_tpu.core.mathtools import periodic_difference as pd_jnp
from pygpa_tpu.lattices.transformations import (a_0_to_r_k,
                                                epsilon_to_kappa)
from pygpa_tpu.lattices import generate_ks


def pdiff(x, y, period):
    return float(np.asarray(pd_jnp(x, y, period=period)))


def _moire_ks(theta, psi, epsilon, a, xi):
    ks1 = np.asarray(generate_ks(float(a_0_to_r_k(a)), xi, kappa=1,
                                 psi=psi))
    r_k2, kappa = [float(z) for z in
                   epsilon_to_kappa(float(a_0_to_r_k(a)), epsilon)]
    ks2 = np.asarray(generate_ks(r_k2, xi + theta, kappa=kappa, psi=psi))
    return ks2[:3] - ks1[:3]


@settings(deadline=None, max_examples=25)
@given(theta=st.floats(1e-1, 45 - 1e-1),
       psi=st.floats(-90.0, 90.0),
       epsilon=st.floats(1e-5, 0.1, exclude_min=True),
       a=st.floats(1e-3, 1e3, exclude_min=True),
       xi=st.floats(-90.0, 90.0))
def test_kerelsky_plus(theta, psi, epsilon, a, xi):
    props = pe.Kerelsky_plus(_moire_ks(theta, psi, epsilon, a, xi),
                             nmperpixel=1, a_0=a)
    assert np.isclose(pdiff(abs(props[0]), theta, 60), 0, atol=1e-2)
    assert np.isclose(pdiff(props[1], psi, 180), 0, atol=1e-2)
    assert np.isclose(props[2], epsilon, rtol=1e-3, atol=1e-6)
    assert np.isclose(pdiff(props[3], xi, 360), 0, atol=1e-2)


@settings(deadline=None, max_examples=25)
@given(theta=st.floats(1e-1, 45 - 1e-1),
       psi=st.floats(-90.0, 90.0),
       epsilon=st.floats(1e-5, 0.1, exclude_min=True),
       a=st.floats(1e-3, 1e3, exclude_min=True),
       xi=st.floats(-90.0, 90.0))
def test_kerelsky_jac(theta, psi, epsilon, a, xi):
    props = pe.Kerelsky_Jac(_moire_ks(theta, psi, epsilon, a, xi),
                            nmperpixel=1, a_0=a)
    assert np.isclose(pdiff(abs(props[0]), theta, 60), 0, atol=1e-2)
    assert np.isclose(pdiff(props[1], psi, 180), 0, atol=1e-2)
    assert np.isclose(props[2], epsilon, rtol=1e-3, atol=1e-6)
    assert np.isclose(pdiff(props[3], xi, 360), 0, atol=1e-2)


def test_kerelsky_amplitudes_only():
    mks = _moire_ks(2.0, 15.0, 0.01, 0.246, 5.0)
    props = pe.Kerelsky(mks)
    assert np.isclose(abs(props[0]), 2.0, atol=5e-2)
    assert np.isclose(props[2], 0.01, atol=1e-3)


def test_kerelsky_J_field():
    """Per-pixel field fits (the dask-gufunc replacement): a constant
    J field must fit to the same parameters everywhere."""
    mks = _moire_ks(1.5, 30.0, 0.02, 0.246, 10.0)
    J = np.zeros((4, 5, 2, 2))  # zero J: JacA0 == A0 at every pixel
    X, refest = pe.Kerelsky_J(jnp.asarray(J), mks, nmperpixel=1,
                              a_0=0.246)
    X = np.asarray(X)
    assert X.shape == (4, 5, 4)
    for i in range(4):
        assert np.allclose(X[..., i], refest[i], atol=1e-4)
    assert np.isclose(pdiff(abs(refest[0]), 1.5, 60), 0, atol=1e-2)
    assert np.isclose(refest[2], 0.02, rtol=1e-2)
