"""Fused V-branch stencil kernels for the multigrid phase unwrap.

The finest level of the multigrid unwrap (solvers/unwrap.py,
phase_unwrap_prediff_mg's "v" branch; reference algorithm
/root/reference/pyGPA/phase_unwrap.py:118-175) chains ~6 full-image
stencil passes before its coarse-grid solve: residual gradients of the
upsampled solution, min-neighbor weight build, weighted residual,
Jacobi diagonal, pre-smooth, and one applyQ. Each pass is a roll-heavy
elementwise program that XLA materializes separately — measured
3.2 ms for ONE applyQ at 4096^2 on v5e (~5x HBM speed-of-light),
~10 ms for the chain.

These kernels run the whole chain in ONE pass over the image:

 - presmooth(): phi, dxc, dyc, w  ->  r, d, Dinv, rrow
     rdx/rdy residual gradients, WWx/WWy min-neighbor weights,
     rk weighted residual, Dinv = omega/diag(Q), pre-smooth
     d = Dinv*rk, r = rk - Q d, plus the ROW-averaged restriction
     rrow (rows reduced by the V-branch coarse factor — the cheap
     sublane half of block_mean; the caller finishes the lane half
     with one small matmul).
 - applyq(): p, w -> Q p (the line-search application on the
     upsampled coarse correction).

Layout: grid over row strips of R rows at full width (the whole lane
axis stays resident, so column neighbors are in-register lane rolls).
Row neighbors come from two extra 2-row halo refs per input whose
index maps wrap modularly — the aligned stencil forms (see
solvers/unwrap.py "lane-aligned stencil forms") are exactly cyclic:
every wrap-around term is killed by a structural zero tail or an
explicit global-edge mask, so the halo wrap IS the roll semantics of
the XLA reference implementation, bit for bit.

All arithmetic is elementwise f32 on VMEM-resident strips (no MXU, no
precision knob needed); HBM traffic is one read per input plane and
one write per output plane.
"""
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS = 64


def _interpret():
    return jax.default_backend() != "tpu"


def supported(n, m, cr=1):
    # the rrow restriction output block has _ROWS // cr sublanes and
    # Mosaic requires sublane block sizes divisible by 8 (interpret
    # mode does NOT check this) — oversized coarse factors must fall
    # back to the XLA path instead of failing Mosaic compile on-chip
    cr = max(int(cr), 1)
    return (n % _ROWS == 0 and m % 128 == 0 and n % 2 == 0
            and _ROWS % cr == 0 and (_ROWS // cr) % 8 == 0)


_HALO = 8   # Mosaic requires sublane block sizes divisible by 8


def _halo_specs(n, m, R, count):
    """(center, prev8, next8) BlockSpec triplets for `count` inputs.
    prev8/next8 are the 8-row strips just above/below the center strip
    (only their outermost 2 rows are consumed — 8 is the Mosaic
    sublane-divisibility minimum), with modularly wrapping index maps
    (the aligned stencils are cyclic — see module docstring)."""
    nb = n // _HALO
    specs = []
    for _ in range(count):
        specs += [
            pl.BlockSpec((R, m), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_HALO, m),
                         lambda i: ((i * (R // _HALO) - 1) % nb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_HALO, m),
                         lambda i: (((i + 1) * (R // _HALO)) % nb, 0),
                         memory_space=pltpu.VMEM),
        ]
    return specs


def _ext(c, p, nx):
    """(R+4, m) extended strip: rows [i*R-2, i*R+R+2) of the cyclic
    image (the halo refs carry 8 rows; only the 2 adjacent ones are
    used)."""
    return jnp.concatenate([p[_HALO - 2:], c[:], nx[:2]], axis=0)


def _dn(a):
    """a[k+1] along rows (strip-local; row R+3 wraps garbage that only
    feeds rows outside the valid output window)."""
    return jnp.concatenate([a[1:], a[:1]], axis=0)


def _up(a):
    """a[k-1] along rows."""
    return jnp.concatenate([a[-1:], a[:-1]], axis=0)


def _rl(a):
    """column j+1 (cyclic lane roll)."""
    return jnp.roll(a, -1, axis=1)


def _rr(a):
    """column j-1 (cyclic lane roll)."""
    return jnp.roll(a, 1, axis=1)


def _masks(i, R, n, m):
    col = jax.lax.broadcasted_iota(jnp.int32, (R + 4, m), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (R + 4, m), 0)
    g = (row + i * R - 2) % n
    return col < (m - 1), g != (n - 1)


def _weights(w, lanemask, rowmask, zero):
    """Aligned min-neighbor weights (solvers/unwrap._residual_aligned)."""
    WW = w * w
    WWx = jnp.where(lanemask, jnp.minimum(WW, _rl(WW)), zero)
    WWy = jnp.where(rowmask, jnp.minimum(WW, _dn(WW)), zero)
    return WWx, WWy


def _q(p, WWx, WWy):
    """applyQ on extended strips (solvers/unwrap._apply_q_aligned)."""
    tx = WWx * (_rl(p) - p)
    ty = WWy * (_dn(p) - p)
    return tx - _rr(tx) + ty - _up(ty)


def _presmooth_kernel(phic, phip, phin, dxcc, dxcp, dxcn,
                      dycc, dycp, dycn, wc, wp, wn,
                      r_ref, d_ref, dinv_ref, rrow_ref,
                      *, R, n, m, cr, omega):
    i = pl.program_id(0)
    phi = _ext(phic, phip, phin)
    dxc = _ext(dxcc, dxcp, dxcn)
    dyc = _ext(dycc, dycp, dycn)
    w = _ext(wc, wp, wn)
    dt = phi.dtype
    zero = jnp.zeros((), dt)
    lanemask, rowmask = _masks(i, R, n, m)

    WWx, WWy = _weights(w, lanemask, rowmask, zero)
    # residual gradients of the upsampled solution (unwrap.py:478-479)
    rdx = dxc - jnp.where(lanemask, _rl(phi) - phi, zero)
    rdy = dyc - jnp.where(rowmask, _dn(phi) - phi, zero)
    WWdx = WWx * rdx
    WWdy = WWy * rdy
    rk = WWdx - _rr(WWdx) + WWdy - _up(WWdy)
    # omega / diag(Q) (solvers/unwrap._jacobi_dinv_aligned)
    D = -(WWx + _rr(WWx) + WWy + _up(WWy))
    dinv = jnp.where(jnp.abs(D) > jnp.asarray(1e-8, dt),
                     jnp.asarray(omega, dt)
                     / jnp.where(D != 0, D, jnp.ones((), dt)), zero)
    d = rk * dinv
    r = rk - _q(d, WWx, WWy)
    rc = r[2:R + 2]
    r_ref[:] = rc
    d_ref[:] = d[2:R + 2]
    dinv_ref[:] = dinv[2:R + 2]
    # sublane half of block_mean(r, cr): rows reduced in-kernel, the
    # lane half is one tiny averaging matmul in the caller
    rrow_ref[:] = rc.reshape(R // cr, cr, m).mean(axis=1)


@partial(jax.jit, static_argnames=("cr", "omega", "interpret"))
def _presmooth_call(phi, dxc, dyc, w, cr, omega, interpret):
    n, m = phi.shape
    R = _ROWS
    dt = phi.dtype
    out = pl.pallas_call(
        partial(_presmooth_kernel, R=R, n=n, m=m, cr=cr, omega=omega),
        grid=(n // R,),
        in_specs=_halo_specs(n, m, R, 4),
        out_specs=[
            pl.BlockSpec((R, m), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, m), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, m), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R // cr, m), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, m), dt),
            jax.ShapeDtypeStruct((n, m), dt),
            jax.ShapeDtypeStruct((n, m), dt),
            jax.ShapeDtypeStruct((n // cr, m), dt),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(phi, phi, phi, dxc, dxc, dxc, dyc, dyc, dyc, w, w, w)
    return tuple(out)


def presmooth(phi, dxc, dyc, w, cr, omega, interpret=None):
    """Fused V-branch pre-smooth: returns (r, d, Dinv, rrow) where
    rrow is r with rows block-averaged by `cr` (the sublane half of
    block_mean; finish with the lane-averaging matmul). Exactly the
    aligned-stencil chain of solvers/unwrap.py:478-499."""
    if interpret is None:
        interpret = _interpret()
    return _presmooth_call(phi, dxc, dyc, w, int(cr), float(omega),
                           bool(interpret))


def _applyq_kernel(pc, pp, pn, wc, wp, wn, q_ref, *, R, n, m):
    i = pl.program_id(0)
    p = _ext(pc, pp, pn)
    w = _ext(wc, wp, wn)
    zero = jnp.zeros((), p.dtype)
    lanemask, rowmask = _masks(i, R, n, m)
    WWx, WWy = _weights(w, lanemask, rowmask, zero)
    q_ref[:] = _q(p, WWx, WWy)[2:R + 2]


@partial(jax.jit, static_argnames=("interpret",))
def _applyq_call(p, w, interpret):
    n, m = p.shape
    R = _ROWS
    return pl.pallas_call(
        partial(_applyq_kernel, R=R, n=n, m=m),
        grid=(n // R,),
        in_specs=_halo_specs(n, m, R, 2),
        out_specs=pl.BlockSpec((R, m), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, m), p.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(p, p, p, w, w, w)


def applyq(p, w, interpret=None):
    """Fused weighted transformation Q p with the min-neighbor weights
    built in-kernel from `w` (solvers/unwrap._apply_q_aligned +
    _residual_aligned's weight build; reference
    phase_unwrap.py:118-132)."""
    if interpret is None:
        interpret = _interpret()
    return _applyq_call(p, w, bool(interpret))
