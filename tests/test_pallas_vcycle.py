"""Fused V-branch unwrap stencil kernels (ops/pallas_vcycle) vs the
XLA aligned-stencil forms (solvers/unwrap.py), interpret mode, f64.

The kernels implement the reference algebra of
/root/reference/pyGPA/phase_unwrap.py:118-175 in one image pass; these
tests pin bit-level (f64 roundoff) equivalence against the lane-aligned
XLA forms they replace, including the cyclic halo wrap at the image
borders and the vmapped production call shape.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pygpa_tpu.solvers.unwrap as U
from pygpa_tpu.ops import pallas_vcycle as V


@pytest.fixture
def fixture():
    rng = np.random.default_rng(7)
    n, m = 128, 256
    phi = jnp.asarray(rng.standard_normal((n, m)))
    w = jnp.asarray(0.1 + 0.9 * rng.random((n, m)))
    dxc = U._mask_last(jnp.asarray(rng.standard_normal((n, m))), -1)
    dyc = U._mask_last(jnp.asarray(rng.standard_normal((n, m))), -2)
    return phi, dxc, dyc, w


def _xla_chain(phi, dxc, dyc, w, cr):
    rdx = dxc - U._mask_last(jnp.roll(phi, -1, -1) - phi, -1)
    rdy = dyc - U._mask_last(jnp.roll(phi, -1, -2) - phi, -2)
    rk, WWx, WWy = U._residual_aligned(rdx, rdy, w)
    Dinv = U._jacobi_dinv_aligned(WWx, WWy)
    d = rk * Dinv
    r = rk - U._apply_q_aligned(d, WWx, WWy)
    n, m = phi.shape
    rrow = r.reshape(n // cr, cr, m).mean(axis=1)
    return r, d, Dinv, rrow, WWx, WWy


@pytest.mark.parametrize("cr", [2, 4])
def test_presmooth_matches_xla_chain(fixture, cr):
    phi, dxc, dyc, w = fixture
    ref = _xla_chain(phi, dxc, dyc, w, cr)[:4]
    got = V.presmooth(phi, dxc, dyc, w, cr, U._JACOBI_OMEGA,
                      interpret=True)
    for name, a, b in zip(("r", "d", "Dinv", "rrow"), ref, got):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-12, err_msg=name)


def test_applyq_matches_xla(fixture):
    phi, dxc, dyc, w = fixture
    _, _, _, _, WWx, WWy = _xla_chain(phi, dxc, dyc, w, 4)
    ref = U._apply_q_aligned(phi, WWx, WWy)
    got = V.applyq(phi, w, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-12)


def test_vmap_unbatched_weight(fixture):
    """Production call shape: vmapped over displacement components with
    the weight plane closed over (unbatched) — the pallas batching
    path the pipeline exercises (gpa/reconstruct._integrate_uv)."""
    phi, dxc, dyc, w = fixture
    pb = jnp.stack([phi, 2.0 * phi])
    got = jax.vmap(lambda p: V.applyq(p, w, interpret=True))(pb)
    _, _, _, _, WWx, WWy = _xla_chain(phi, dxc, dyc, w, 4)
    ref = jax.vmap(lambda p: U._apply_q_aligned(p, WWx, WWy))(pb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-12)


@pytest.mark.parametrize("final", ["v", "vv"])
def test_mg_unwrap_kernel_path_equivalence(monkeypatch, final):
    """phase_unwrap_prediff_mg with the kernel V-branch forced equals
    the XLA path to f64 roundoff, including under the production
    component vmap."""
    rng = np.random.default_rng(3)
    n = m = 256
    x = np.linspace(0, 4 * np.pi, n)
    psi = jnp.asarray(np.sin(x)[:, None] * np.cos(0.7 * x)[None, :] * 5.0)
    w = jnp.asarray(0.2 + 0.8 * rng.random((n, m)))
    dx = jnp.diff(psi, axis=-1)
    dy = jnp.diff(psi, axis=-2)
    dxb = jnp.stack([dx, 0.5 * dx])
    dyb = jnp.stack([dy, 0.5 * dy])
    sched = ((4, 6), (1, final))

    def run():
        return jax.vmap(lambda a, b: U.phase_unwrap_prediff_mg(
            a, b, w, kmax=6, schedule=sched))(dxb, dyb)

    monkeypatch.setattr(U, "_PALLAS_VCYCLE", False)
    ref = run()
    monkeypatch.setattr(U, "_PALLAS_VCYCLE", True)
    got = run()
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-9)


def test_kernel_gate_respects_distributed_path():
    """The kernel path must stay off when a precond_factory is given
    (the GSPMD-sharded solver keeps the XLA stencils whose rolls lower
    to halo collectives)."""
    assert not U._vcycle_kernel_ok((256, 256), jnp.float32,
                                   jnp.ones((256, 256)),
                                   lambda s: None, 4)
    assert not U._vcycle_kernel_ok((256, 256), jnp.float32, None,
                                   None, 4)
    assert not U._vcycle_kernel_ok((100, 256), jnp.float32,
                                   jnp.ones((100, 256)), None, 4)


def test_supported_rejects_oversized_coarse_factors():
    """The rrow restriction block has _ROWS // cr sublanes; Mosaic
    requires sublane block sizes divisible by 8 (interpret mode does
    NOT check this), so cr > 8 must route to the XLA fallback instead
    of failing Mosaic compile on-chip."""
    from pygpa_tpu.ops import pallas_vcycle as V
    assert V.supported(1024, 1024, 4)
    assert V.supported(1024, 1024, 8)
    for cr in (16, 32, 64):
        assert not V.supported(1024, 1024, cr)
