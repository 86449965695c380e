"""End-to-end property extraction: WFR phase gradients from a strained
lattice image -> local property maps recover the generation parameters
(the physics chain C2 -> C10 of SURVEY.md)."""
import numpy as np
import jax.numpy as jnp
import pytest

from pygpa_tpu.lattices import generate_ks, hexlattice_gen
from pygpa_tpu import gpa
import pygpa_tpu.props as pe
from pygpa_tpu.core.mathtools import periodic_difference


@pytest.fixture(scope="module")
def strained_lattice():
    r_k, theta, kappa, psi = 0.08, 16.0, 1.02, 25.0
    size = 256
    img = np.array(hexlattice_gen(r_k, theta, order=1, size=size,
                                  kappa=kappa, psi=psi,
                                  dtype=np.float64))
    ks = np.array(generate_ks(r_k, theta, kappa=kappa, psi=psi))[:3]
    return img, ks, (r_k, theta, kappa, psi)


def test_props_from_wfr_gradients(strained_lattice):
    """calc_props_from_phasegradient on WFR gradients of a uniformly
    strained lattice: the property maps must be spatially constant and
    recover (theta, kappa)."""
    img, ks, (r_k, theta, kappa, psi) = strained_lattice
    img0 = img - img.mean()
    knorms = np.linalg.norm(ks, axis=1)
    kw = knorms.mean() / 2.5
    sigma = int(np.ceil(1 / knorms.min()))
    gs = [gpa.wfr2_grad_opt(img0, sigma, pk[0], pk[1], kw, kw / 3)
          for pk in ks]
    grads = jnp.stack([g["grad"] for g in gs])
    weights = jnp.stack([jnp.abs(g["lockin"]) for g in gs])
    props = np.array(pe.calc_props_from_phasegradient(
        jnp.asarray(ks), grads, weights, nmperpixel=1.0))
    c = np.s_[64:-64, 64:-64]
    # uniform lattice -> constant maps
    assert props[0][c].std() < 0.05
    assert props[3][c].std() < 1e-3
    assert np.isclose(float(np.asarray(periodic_difference(
        props[0][c].mean(), theta, period=60))), 0, atol=0.1)
    assert np.isclose(props[3][c].mean(), kappa, atol=2e-3)
    # strain frame: the real-space stretch axis is perpendicular to
    # the k-space compression axis psi (generate_ks convention)
    assert np.isclose(float(np.asarray(periodic_difference(
        props[1][c].mean(), psi + 90, period=180))), 0, atol=2.0)


def test_reconstruct_use_only_ks(gaussiandeform):
    """reconstruct_u_inv(use_only_ks=...) exact 2-k inversion
    (geometric_phase_analysis.py:189-192)."""
    ks = np.array(generate_ks(0.05, 10.0))[:3]
    u = gaussiandeform[:, :100, :100]
    phases = 2 * np.pi * np.einsum("kc,cnm->knm", ks, u)
    us = np.array(gpa.reconstruct_u_inv(ks, jnp.asarray(phases),
                                        use_only_ks=(0, 1)))
    # exact inversion reproduces u up to the removed mean
    resid = us - (u - u.mean(axis=(1, 2), keepdims=True))
    assert np.abs(resid).max() < 1e-8


def test_reconstruct_prediff_path(gaussiandeform):
    """reconstruct_u_inv_from_phases(pre_diff=True) consumes phase
    gradients directly (geometric_phase_analysis.py:228-235)."""
    ks = np.array(generate_ks(0.05, 10.0))[:3]
    u = gaussiandeform[:, 100:228, 100:228]
    phases = 2 * np.pi * np.einsum("kc,cnm->knm", ks, u)
    # build (k, N, M, 2) gradient stack like wfr2_grad returns
    gx = np.gradient(phases, axis=1)
    gy = np.gradient(phases, axis=2)
    pre = np.stack([np.diff(phases, axis=2, append=np.nan),
                    np.diff(phases, axis=1, append=np.nan)], axis=-1)
    pre = np.nan_to_num(pre)
    w = np.ones_like(phases)
    us = np.array(gpa.reconstruct_u_inv_from_phases(
        jnp.asarray(ks), jnp.asarray(pre), jnp.asarray(w),
        pre_diff=True))
    resid = us - u
    resid -= resid.mean(axis=(1, 2), keepdims=True)
    assert np.abs(resid[:, 5:-5, 5:-5]).max() < 1e-4


def test_double_strain_decomp_smoke():
    """double_strain_decomp (reference marks it UNTESTED) on a
    twist-plus-heterostrain argument: finite and recovers the twist.
    Pure twist (zero strain) hits a 0/0 in the expansion — same as the
    reference formulation."""
    B = np.array(pe.twist_matrix(2.0))
    out = np.array(pe.double_strain_decomp(
        jnp.asarray(B + np.diag([0.01, 0.005]))))
    assert out.shape == (4,)
    assert np.isfinite(out).all()
    assert np.isclose(out[0], 2.0, atol=0.01)


def test_moire_props_chain():
    """calc_moire_props_from_kvecs recovers the twist angle of a
    synthetic moire between two graphene lattices."""
    from pygpa_tpu.lattices.transformations import a_0_to_r_k
    nmperpixel = 0.5
    a_0 = 0.246
    theta = 1.2
    rk = float(a_0_to_r_k(a_0 / nmperpixel))
    ks1 = np.array(generate_ks(rk, 10.0))[:3]
    ks2 = np.array(generate_ks(rk, 10.0 + theta))[:3]
    mks = ks2 - ks1
    props = np.array(pe.calc_moire_props_from_kvecs(
        jnp.asarray(mks), nmperpixel=nmperpixel, a_0=a_0))
    assert np.isclose(props[0], theta, atol=5e-3)
    assert np.isclose(props[3], 0.0, atol=1e-4)  # no heterostrain
