"""Whole-VMEM CG Poisson solver (ops/pallas_cg) vs the XLA while-loop
CG (solvers/unwrap._cg_unwrap), interpret mode, f64.

The kernel runs the reference PCG of phase_unwrap.py:183-207 with a
fixed iteration count; the guarded coefficients make post-convergence
iterations no-ops, so at iteration counts below convergence the two
paths agree to roundoff."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pygpa_tpu.solvers.unwrap as U
from pygpa_tpu.ops import pallas_cg as C


@pytest.fixture
def system():
    rng = np.random.default_rng(5)
    n = m = 256
    x = np.linspace(0, 4 * np.pi, n)
    psi = jnp.asarray(np.sin(x)[:, None] * np.cos(0.7 * x)[None, :] * 5.0)
    w = jnp.asarray(0.2 + 0.8 * rng.random((n, m)))
    dxp = U._mask_last(jnp.diff(psi, axis=-1, append=psi[:, -1:]), -1)
    dyp = U._mask_last(jnp.diff(psi, axis=-2, append=psi[-1:, :]), -2)
    return U._residual_aligned(dxp, dyp, w)


@pytest.mark.parametrize("kmax", [1, 4, 6])
def test_cg_kernel_matches_while_loop(system, kmax):
    rk, WWx, WWy = system
    ref, k = U._cg_unwrap(rk, WWx, WWy, kmax,
                          jax.lax.Precision.HIGHEST, None, True)
    assert int(k) == kmax  # early stop must not fire for this check
    got = C.cg_poisson(rk, WWx, WWy, kmax, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-12)


def test_cg_kernel_zero_rhs(system):
    _, WWx, WWy = system
    got = C.cg_poisson(jnp.zeros_like(WWx), WWx, WWy, 4,
                       interpret=True)
    np.testing.assert_array_equal(np.asarray(got), 0.0)


def test_cg_kernel_rectangular():
    rng = np.random.default_rng(9)
    n, m = 128, 256
    w = jnp.asarray(0.2 + 0.8 * rng.random((n, m)))
    dxp = U._mask_last(jnp.asarray(rng.standard_normal((n, m))), -1)
    dyp = U._mask_last(jnp.asarray(rng.standard_normal((n, m))), -2)
    rk, WWx, WWy = U._residual_aligned(dxp, dyp, w)
    ref, _ = U._cg_unwrap(rk, WWx, WWy, 5,
                          jax.lax.Precision.HIGHEST, None, True)
    got = C.cg_poisson(rk, WWx, WWy, 5, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-12)


def test_mg_unwrap_cg_kernel_path(monkeypatch):
    """Full multigrid unwrap with BOTH kernel families forced equals
    the XLA path to f64 roundoff (512^2 fixture: its 128^2 coarse
    grids sit at the CG kernel's support floor)."""
    rng = np.random.default_rng(3)
    n = m = 512
    x = np.linspace(0, 4 * np.pi, n)
    psi = jnp.asarray(np.sin(x)[:, None] * np.cos(0.7 * x)[None, :] * 5.0)
    w = jnp.asarray(0.2 + 0.8 * rng.random((n, m)))
    dx = jnp.diff(psi, axis=-1)
    dy = jnp.diff(psi, axis=-2)

    def run():
        return U.phase_unwrap_prediff_mg(dx, dy, w, kmax=6, coarse=4)

    monkeypatch.setattr(U, "_PALLAS_VCYCLE", False)
    monkeypatch.setattr(U, "_PALLAS_CG", False)
    ref = run()
    monkeypatch.setattr(U, "_PALLAS_VCYCLE", True)
    monkeypatch.setattr(U, "_PALLAS_CG", True)
    before = C._trace_count
    got = run()
    # the gate is resolved OUTSIDE the jitted CG (static arg), so the
    # flag flip must force a fresh trace that actually launches the
    # kernel — a jit cache hit on the XLA trace would compare the
    # reference against itself
    assert C._trace_count > before, \
        "forced _PALLAS_CG run never invoked cg_poisson"
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-9)


def test_cg_f64_high_clamps_to_highest(system):
    """precision=HIGH (the production mg default) on f64 operands must
    not silently drop to the f32-targeted bf16x3 emulation."""
    rk, WWx, WWy = system
    ref, k = U._cg_unwrap(rk, WWx, WWy, 4,
                          jax.lax.Precision.HIGHEST, None, True)
    assert int(k) == 4
    got = C.cg_poisson(rk, WWx, WWy, 4,
                       precision=jax.lax.Precision.HIGH,
                       interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-12)


def test_cg_gate():
    assert not U._cg_kernel_ok((100, 256), jnp.float32)
    assert not U._cg_kernel_ok((4096, 4096), jnp.float32)  # > VMEM cap
    assert not U._cg_kernel_ok((2048, 2048), jnp.float32)  # > VMEM cap
