"""Phase unwrap: equivalence with the NumPy oracle and analytic
round trips (mirrors /root/reference/tests/test_phase_unwrap.py)."""
import numpy as np
import jax.numpy as jnp
from hypothesis import given, settings, strategies as st

import pygpa_tpu.solvers.unwrap as pu
from reference_impls import ref_phase_unwrap, ref_phase_unwrap_prediff

N = 128


def _plane(N):
    xx, yy = np.meshgrid(np.arange(N), np.arange(N), indexing="ij")
    return (yy + xx) / (4 * np.sqrt(2))


@settings(deadline=None, max_examples=12)
@given(kmax=st.integers(1, 30))
def test_phase_unwrap_matches_oracle(kmax):
    psi0 = _plane(N)
    psi = (psi0 + np.pi) % (2 * np.pi) - np.pi
    weight = np.ones_like(psi)
    ref = ref_phase_unwrap(psi, weight, kmax=kmax)
    mine = np.asarray(pu.phase_unwrap(jnp.asarray(psi), jnp.asarray(weight),
                                      kmax=kmax))
    assert np.allclose(mine, ref, atol=1e-8)
    # unweighted terminates in one exact Poisson solve
    mine_u = np.asarray(pu.phase_unwrap(jnp.asarray(psi), None, kmax=kmax))
    assert np.allclose(mine_u - mine_u.mean(), psi0 - psi0.mean(),
                       atol=1e-8)


def test_phase_unwrap_gaussian_weight_equivalence():
    psi0 = _plane(N)
    psi = (psi0 + np.pi) % (2 * np.pi) - np.pi
    xx, yy = np.meshgrid(np.arange(N), np.arange(N), indexing="ij")
    gaussian = np.exp(-((xx - N // 2) ** 2 + (yy - N // 2) ** 2)
                      / (0.3 * N ** 2))
    w = np.asarray(pu.phase_unwrap(jnp.asarray(psi), jnp.asarray(gaussian)))
    u = np.asarray(pu.phase_unwrap(jnp.asarray(psi), None))
    assert np.allclose(w, u, atol=1e-6)


@settings(deadline=None, max_examples=12)
@given(kmax=st.integers(1, 30))
def test_phase_unwrap_prediff_matches_oracle(kmax):
    psi0 = _plane(N)
    psi = (psi0 + np.pi) % (2 * np.pi) - np.pi
    dx = np.diff(psi, axis=1)
    dy = np.diff(psi, axis=0)
    weight = np.ones_like(psi)
    ref = ref_phase_unwrap_prediff(dx, dy, weight, kmax=kmax)
    mine = np.asarray(pu.phase_unwrap_prediff(
        jnp.asarray(dx), jnp.asarray(dy), jnp.asarray(weight), kmax=kmax))
    assert np.allclose(mine, ref, atol=1e-8)
    assert np.allclose(mine - mine.mean(), psi0 - psi0.mean(), atol=1e-6)


def test_weighted_unwrap_ignores_noisy_region():
    """Weights steer the integration: corrupt a corner, weight it to
    ~zero, and the rest must still unwrap to the plane."""
    psi0 = _plane(N)
    rng = np.random.default_rng(0)
    psi0_noisy = psi0.copy()
    psi0_noisy[:20, :20] += rng.normal(size=(20, 20)) * 3
    psi = (psi0_noisy + np.pi) % (2 * np.pi) - np.pi
    weight = np.ones_like(psi)
    weight[:22, :22] = 1e-4
    res = np.asarray(pu.phase_unwrap(jnp.asarray(psi), jnp.asarray(weight),
                                     kmax=200))
    good = np.s_[30:, 30:]
    err = (res - psi0)[good]
    assert np.abs(err - err.mean()).max() < 1e-2



def test_mg_schedule_knob_validation():
    """A bad unwrap_mg_final-style string in the schedule raises a
    helpful ValueError instead of a bare comparison TypeError."""
    import pytest
    from pygpa_tpu.solvers.unwrap import phase_unwrap_prediff_mg
    dx = jnp.zeros((64, 63))
    dy = jnp.zeros((63, 64))
    w = jnp.ones((64, 64))
    with pytest.raises(ValueError, match="unwrap_mg_final"):
        phase_unwrap_prediff_mg(dx, dy, w,
                                schedule=((4, 2), (1, "cg")))
    # the valid spellings still run
    for final in (1, "v", "vv"):
        out = phase_unwrap_prediff_mg(dx, dy, w,
                                      schedule=((4, 2), (1, final)))
        assert out.shape == (64, 64)
