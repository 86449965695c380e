"""Lattice generation: k-vector conventions, rendering, displacement
shift semantics, transformation algebra."""
import numpy as np
import jax.numpy as jnp
from hypothesis import given, settings, strategies as st

from pygpa_tpu.lattices import (generate_ks, hexlattice_gen,
                                rotation_matrix, scaling_matrix,
                                strain_matrix, a_0_to_r_k, r_k_to_a_0,
                                epsilon_to_kappa, kappa_to_epsilon,
                                apply_transformation_matrix)


def test_generate_ks_contract():
    ks = np.asarray(generate_ks(0.1, 7.0))
    assert ks.shape == (7, 2)                       # sym + zero vector
    assert np.allclose(ks[-1], 0)
    assert np.allclose(np.linalg.norm(ks[:-1], axis=1), 0.1)
    angles = np.rad2deg(np.arctan2(ks[:6, 1], ks[:6, 0]))
    assert np.isclose(angles[0], 7.0)
    d = (np.diff(angles) + 360) % 360
    assert np.allclose(d, 60.0)


def test_generate_ks_anisotropy():
    ks = np.asarray(generate_ks(0.1, 0.0, kappa=1.1, psi=0.0))[:6]
    # psi=0: the x-axis (k at angle 0) is compressed in k-space by kappa
    assert np.isclose(np.linalg.norm(ks[0]), 0.1 / 1.1)
    # perpendicular direction unscaled
    ks90 = np.asarray(generate_ks(0.1, 90.0, kappa=1.1, psi=0.0))[:6]
    assert np.isclose(np.linalg.norm(ks90[0]), 0.1)


@settings(deadline=None, max_examples=30)
@given(eps=st.floats(1e-6, 0.2), r_k=st.floats(1e-3, 10))
def test_epsilon_kappa_roundtrip(eps, r_k):
    r2, kappa = [float(z) for z in epsilon_to_kappa(r_k, eps)]
    assert np.isclose(float(np.asarray(kappa_to_epsilon(kappa))), eps,
                      rtol=1e-10)
    # strain_matrix consistency: generate_ks(r2, th, kappa) equals
    # strain-transformed generate_ks(r_k, th)
    ks1 = np.asarray(generate_ks(r_k, 13.0))[:3]
    D = np.asarray(strain_matrix(eps))
    ks_strained = np.asarray(apply_transformation_matrix(
        jnp.asarray(ks1), jnp.asarray(D)))
    ks2 = np.asarray(generate_ks(r2, 13.0, kappa=kappa, psi=0.0))[:3]
    assert np.allclose(ks_strained, ks2, rtol=1e-10, atol=1e-12)


def test_a0_rk_roundtrip():
    assert np.isclose(float(np.asarray(r_k_to_a_0(a_0_to_r_k(0.246)))),
                      0.246)


def test_hexlattice_peaks_at_ks():
    """The rendered lattice's FFT must peak exactly at the primary ks."""
    r_k, theta = 0.08, 23.0
    img = np.asarray(hexlattice_gen(r_k, theta, order=1, size=256,
                                    dtype=np.float64))
    ks = np.asarray(generate_ks(r_k, theta))[:6]
    F = np.abs(np.fft.fft2(img - img.mean()))
    fx = np.fft.fftfreq(256)
    # find top-12 bins
    idx = np.argsort(F.ravel())[-12:]
    peaks = np.stack(np.unravel_index(idx, F.shape), -1)
    peak_ks = np.stack([fx[peaks[:, 0]], fx[peaks[:, 1]]], -1)
    allks = np.concatenate([ks, -ks])
    d = np.linalg.norm(peak_ks[:, None] - allks[None], axis=-1).min(axis=1)
    assert np.all(d < 1.5 / 256)


def test_hexlattice_shift_semantics():
    """hexlattice_gen(shift=u) must equal the analytic
    sum_i a_i cos(2 pi k_i . (r + u)) sampled per pixel."""
    size = 64
    rng = np.random.default_rng(0)
    u = 0.5 * rng.normal(size=(2, size, size))
    img = np.asarray(hexlattice_gen(0.1, 5.0, order=1, size=size,
                                    shift=u, dtype=np.float64))
    ks = np.asarray(generate_ks(0.1, 5.0))[:3]
    x = np.arange(size) - size // 2
    xs = x[:, None] + u[0]
    ys = x[None, :] + u[1]
    expect = np.zeros((size, size))
    for k in ks:
        expect += 2 * np.cos(2 * np.pi * (k[0] * xs + k[1] * ys))
    assert np.allclose(img, expect, atol=1e-10)


def test_order2_adds_second_shell():
    img1 = np.asarray(hexlattice_gen(0.1, 0.0, order=1, size=128))
    img2 = np.asarray(hexlattice_gen(0.1, 0.0, order=2, size=128))
    assert not np.allclose(img1, img2)
    F1 = np.abs(np.fft.fft2(img1 - img1.mean()))
    F2 = np.abs(np.fft.fft2(img2 - img2.mean()))
    fx = np.fft.fftfreq(128)
    # energy at the sqrt(3)*r_k second-shell frequency (30 deg)
    k2 = 0.1 * np.sqrt(3) * np.array([np.cos(np.pi / 6), np.sin(np.pi / 6)])
    i = np.argmin(np.abs(fx - k2[0]))
    j = np.argmin(np.abs(fx - k2[1]))
    # well above order-1's leakage there, and a real (0.4x-weighted) peak
    assert F2[i, j] > 3 * F1[i, j]
    assert F2[i, j] > 0.05 * F2.max()
