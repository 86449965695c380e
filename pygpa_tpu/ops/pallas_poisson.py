"""Fused Neumann-Poisson solve kernel: z = idct2(dct2(r) / scale) in
ONE pallas launch.

The CG phase-unwrap preconditioner (solvers/unwrap.py, reference
phase_unwrap.py:95-103) runs this solve every iteration. As separate
XLA/pallas launches the chain costs 4 transform launches plus a
full-size divide — each a round trip through HBM with per-launch
overhead. Here the full plane lives in a persistent VMEM scratch
across a 3-phase grid:

 - phase 0 (per row block): forward lane DCT into the scratch;
 - phase 1 (per column block): forward sublane DCT -> divide by the
   in-kernel-computed Poisson eigenvalues (iota + cos, the
   phase_unwrap.py:106-115 formula with the [0,0] bias) -> inverse
   sublane DCT, written back to the scratch;
 - phase 2 (per row block): inverse lane DCT into the output block.

Grid iteration is phase-major, so the scratch is complete before any
phase-1 step; input/output blocks for inactive phases map to block 0
(the garbage writes there are re-written by phase 2's first step).
The kernel body holds one block's worth of contractions — small
enough for fast Mosaic compiles at every size.

The DCT math is the direct digit factorization of ops/pallas_dct2
(same _lane_math/_sub_math, supported sizes n in {1024, 2048, 4096,
8192} per axis subject to the VMEM scratch bound n*m <= 4096^2 f32 =
64 MB), so the result is bit-identical to dct2n/idct2n at the same
precision. One HBM read and one write per solve.
"""
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_dct2 import _L, _factors, _lane_math, _sub_math
from . import pallas_dct2

_COL_BLOCK = 128
_SCRATCH_MAX = 4096 * 4096   # f32 elements of the resident plane


def _grid_b(n, m):
    b = min(n, m) // _COL_BLOCK
    if b < 1 or n % b or m % b or (m // b) % _COL_BLOCK:
        return None
    return b


def supported(shape, dtype=jnp.float32):
    n, m = shape[-2:]
    return (pallas_dct2.supported(n) and pallas_dct2.supported(m)
            and jnp.dtype(dtype) == jnp.float32
            and n * m <= _SCRATCH_MAX
            and _grid_b(n, m) is not None)


def _scale_block(qn, cols, c0, n, m, fn):
    """Poisson eigenvalue block for the (qn, _L, cols) sub-DCT layout
    (flat row i = k2*_L + k1), columns [c0, c0+cols)."""
    k2 = jax.lax.broadcasted_iota(jnp.int32, (qn, _L, cols), 0)
    k1 = jax.lax.broadcasted_iota(jnp.int32, (qn, _L, cols), 1)
    jj = jax.lax.broadcasted_iota(jnp.int32, (qn, _L, cols), 2) + c0
    fi = (k2 * _L + k1).astype(fn)
    scale = 2.0 * (jnp.cos(jnp.asarray(np.pi / n, fn) * fi)
                   + jnp.cos(jnp.asarray(np.pi / m, fn)
                             * jj.astype(fn)) - 2.0)
    dc = (k2 == 0) & (k1 == 0) & (jj == 0)
    return jnp.where(dc, 1.0, scale), (k2 == 0) & (k1 == 0)


def _kernel(x_ref, lfc0, lfc1, lfc2, lfc3, lfc4, lfc5,
            lic0, lic1, lic2, lic3, lic4, lic5,
            sfc0, sfc1, sfc2, sfc3, sfc4, sfc5,
            sic0, sic1, sic2, sic3, sic4, sic5,
            o_ref, s_ref, *, n, m, rb, cb, precision):
    lf = (lfc0[:], lfc1[:], lfc2[:], lfc3[:], lfc4[:], lfc5[:])
    li = (lic0[:], lic1[:], lic2[:], lic3[:], lic4[:], lic5[:])
    sf = (sfc0[:], sfc1[:], sfc2[:], sfc3[:], sfc4[:], sfc5[:])
    si = (sic0[:], sic1[:], sic2[:], sic3[:], sic4[:], sic5[:])
    p = pl.program_id(0)
    b = pl.program_id(1)
    qm = m // _L
    qn = n // _L
    fn = jnp.float32

    @pl.when(p == 0)
    def _fwd_lane():
        x = x_ref[:].reshape(rb, qm, _L)
        s_ref[pl.ds(b * rb, rb), :] = _lane_math(
            x, lf, False, precision).reshape(rb, m)

    @pl.when(p == 1)
    def _sub():
        for c0 in range(0, cb, _COL_BLOCK):
            cs = b * cb + c0
            t = s_ref[:, pl.ds(cs, _COL_BLOCK)].reshape(qn, _L,
                                                        _COL_BLOCK)
            y = _sub_math(t, sf, False, precision)
            scale, row0 = _scale_block(qn, _COL_BLOCK, cs, n, m, fn)
            y = y / scale * jnp.asarray(1.0 / (2 * n), fn)
            y = jnp.where(row0, y * 0.5, y)
            s_ref[:, pl.ds(cs, _COL_BLOCK)] = _sub_math(
                y, si, True, precision).reshape(n, _COL_BLOCK)

    @pl.when(p == 2)
    def _inv_lane():
        y = s_ref[pl.ds(b * rb, rb), :].reshape(rb, qm, _L)
        y = y * jnp.asarray(1.0 / (2 * m), jnp.float32)
        a0 = jax.lax.broadcasted_iota(jnp.int32, (rb, qm, _L), 1)
        b0 = jax.lax.broadcasted_iota(jnp.int32, (rb, qm, _L), 2)
        y = jnp.where((a0 == 0) & (b0 == 0), y * 0.5, y)
        o_ref[:] = _lane_math(y, li, True, precision).reshape(rb, m)


@partial(jax.jit, static_argnames=("precision", "interpret"))
def _solve_call(x, consts, precision, interpret):
    n, m = x.shape
    B = _grid_b(n, m)
    rb = n // B
    cb = m // B
    cspecs = [pl.BlockSpec(c.shape, lambda p, b: (0, 0),
                           memory_space=pltpu.VMEM) for c in consts]
    return pl.pallas_call(
        partial(_kernel, n=n, m=m, rb=rb, cb=cb, precision=precision),
        grid=(3, B),
        in_specs=[pl.BlockSpec(
            (rb, m), lambda p, b: (jnp.where(p == 0, b, 0), 0),
            memory_space=pltpu.VMEM)] + cspecs,
        out_specs=pl.BlockSpec(
            (rb, m), lambda p, b: (jnp.where(p == 2, b, 0), 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, m), x.dtype),
        scratch_shapes=[pltpu.VMEM((n, m), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, *consts)


def poisson_solve(rho, precision=jax.lax.Precision.HIGHEST,
                  interpret=None):
    """idct2(dct2(rho) / poisson_scale) — the unweighted-Poisson CG
    preconditioner — as one fused launch per plane. rho: (..., n, m)
    with supported() shape/dtype; leading axes run as sequential
    launches (unrolled — the unwrap batch is the 2 displacement
    components)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    lead = rho.shape[:-2]
    n, m = rho.shape[-2:]
    x = rho.reshape((-1, n, m))
    consts = [jnp.asarray(c)
              for c in (_factors(m, rho.dtype, False)
                        + _factors(m, rho.dtype, True)
                        + _factors(n, rho.dtype, False)
                        + _factors(n, rho.dtype, True))]
    out = jnp.stack([_solve_call(x[i], consts, precision, interpret)
                     for i in range(x.shape[0])])
    return out.reshape(lead + (n, m))
