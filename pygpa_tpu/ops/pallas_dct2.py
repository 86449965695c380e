"""Single-pass Pallas DCT-II / iDCT kernels (the unwrap solver's
transform).

The CG phase-unwrap preconditioner (solvers/unwrap.py, reference
phase_unwrap.py:95-103) is transform-bound: the XLA lowering of the
radix-split DCT costs ~6 HBM passes of permutations, twiddles and
digit transposes per transform. These kernels need NONE of that: the
DCT-II matrix C[k, j] = 2 cos(pi k (2j+1) / 2n) factorizes DIRECTLY
over the digit splits j = j2*128 + j1, k = k2*128 + k1:

  C[k, j] = Re[ 2 * U[k2, j1] * V[k1, j1] * W[k1, j2] ]
     U = e^{i pi k2 (2 j1 + 1) / (2q)},  V = e^{i pi k1 (2 j1 + 1)/(2n)},
     W = e^{i pi k1 j2 / q},             q = n / 128,
  (the cross term e^{i pi k2 * 128 * j2 / q} == 1 because 128/q is a
   positive even integer for n in {1024, 2048, 4096, 8192})

so the whole transform is two MXU contractions per real/imag part —
  G[k1, j1] = sum_j2 W[k1, j2] x[j2, j1]          (contract q)
  X[k2, k1] = sum_j1 U[k2, j1] (V .* G)[k1, j1]   (contract 128)
— with input viewed (q, 128) and output (q, 128), both row-major flat
views of the length-n axis: no permutation, no reordering, lane-width
128 everywhere, ONE HBM read and ONE write per transform. The inverse
is the exact transpose (with the k=0 half-weight of scipy's
idct type-2, norm=None). Separate kernels serve the lane (axis -1)
and sublane (axis -2) cases so no full-array transpose ever exists.

Precision: HIGHEST (f32-exact, 6 passes) or HIGH via explicit bf16x3
(~1e-7 relative), selected by core.fourier's _MXU_FFT_PRECISION; the
CG preconditioner does not need an exact transform (solvers/unwrap).
"""
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_L = 128


def supported(n):
    # 128/q must be a positive even integer, q >= 8 for sane sublanes
    return n in (1024, 2048, 4096, 8192)


def _interpret():
    return jax.default_backend() != "tpu"


def _factors(n, dtype, inverse):
    """(U, V, W) factor matrices as (cos, sin) pairs, numpy f64-exact.
    For the inverse, U/W absorb the 1/(2n) scale and the k=0
    half-weight goes into V (k1 = 0 column) and U (k2 = 0 row is
    handled via k1: flat k = k2*128 + k1 -> k == 0 iff k1 == 0 and
    k2 == 0; the half-weight multiplies the single (k2=0, k1=0)
    element, folded into U)."""
    q = n // _L
    j1 = np.arange(_L)
    j2 = np.arange(q)
    k1 = np.arange(_L)
    k2 = np.arange(q)
    U = np.pi * np.outer(k2, 2 * j1 + 1) / (2 * q)
    V = np.pi * np.outer(k1, 2 * j1 + 1) / (2 * n)
    W = np.pi * np.outer(k1, j2) / q
    f = np.dtype(dtype)
    out = [np.cos(U), np.sin(U), np.cos(V), np.sin(V),
           np.cos(W), np.sin(W)]
    return [np.asarray(a, f) for a in out]


def _dots(precision, sublane=False):
    """einsum-style contraction at the requested effective precision.

    HIGH on the LANE kernels = explicit bf16x3 (split operands into
    bf16 hi/lo, three DEFAULT MXU passes, ~1e-7 relative) — measured
    to compile fine. HIGH on the SUBLANE kernels is clamped to
    HIGHEST: their bf16 sublane-contraction einsums send Mosaic into a
    multi-minute compile blowup ending in VMEM OOM, and exactness is
    cheap next to that risk."""
    if precision == jax.lax.Precision.HIGH and sublane:
        precision = jax.lax.Precision.HIGHEST
    if precision == jax.lax.Precision.HIGH:
        def split(x):
            hi = x.astype(jnp.bfloat16)
            lo = (x - hi.astype(x.dtype)).astype(jnp.bfloat16)
            return hi, lo

        def ein(expr, a, b):
            def raw(x, y):
                return jnp.einsum(expr, x, y,
                                  precision=jax.lax.Precision.DEFAULT,
                                  preferred_element_type=jnp.float32)
            ahi, alo = split(a)
            bhi, blo = split(b)
            return raw(ahi, bhi) + raw(ahi, blo) + raw(alo, bhi)
        return ein

    def ein(expr, a, b):
        return jnp.einsum(expr, a, b, precision=precision,
                          preferred_element_type=a.dtype)
    return ein


# ------------------------------------------------------------- lane axis

def _lane_math(x, consts, inverse, precision):
    """Pure-array lane-axis DCT math on an (R, q, 128) view (flat
    (R, n)); factored out of the kernel bodies so forward and inverse
    share one implementation."""
    uc, us, vc, vs, wc, ws = consts
    ein = _dots(precision)
    if not inverse:
        # G[k1, j1] = sum_j2 W[k1, j2] x[j2, j1]
        gr = ein("kj,rjl->rkl", wc, x)
        gi = ein("kj,rjl->rkl", ws, x)
        hr = vc * gr - vs * gi         # (R, 128 k1, 128 j1)
        hi = vs * gr + vc * gi
        # X[k2, k1] = 2 Re sum_j1 U[k2, j1] H[k1, j1]
        return 2.0 * (ein("qj,rkj->rqk", uc, hr)
                      - ein("qj,rkj->rqk", us, hi))
    # P[k1, j1] = sum_k2 y[k2, k1] U[k2, j1]   (y real)
    pr = ein("rjk,jl->rkl", x, uc)
    pi = ein("rjk,jl->rkl", x, us)
    # x[j2, j1] = Re[ 2 sum_k1 W[k1, j2] (V P)[k1, j1] ]
    hr = vc * pr - vs * pi
    hi = vs * pr + vc * pi
    return 2.0 * (ein("km,rkl->rml", wc, hr)
                  - ein("km,rkl->rml", ws, hi))


def _fwd_lane_kernel(x_ref, uc, us, vc, vs, wc, ws, o_ref, *,
                     precision, inverse):
    o_ref[:] = _lane_math(x_ref[:],
                          (uc[:], us[:], vc[:], vs[:], wc[:], ws[:]),
                          inverse, precision)


@partial(jax.jit, static_argnames=("inverse", "precision", "interpret"))
def _lane_call(x, consts, inverse, precision, interpret):
    lead = x.shape[:-1]
    n = x.shape[-1]
    q = n // _L
    R = max(int(np.prod(lead)), 1)
    xf = x.reshape(R, q, _L)
    rb = 256
    pad = (-R) % rb
    if pad:
        xf = jnp.concatenate(
            [xf, jnp.zeros((pad, q, _L), x.dtype)])
    R = R + pad
    cspecs = [pl.BlockSpec(c.shape, lambda r, nd=c.ndim: (0,) * nd,
                           memory_space=pltpu.VMEM) for c in consts]
    out = pl.pallas_call(
        partial(_fwd_lane_kernel, precision=precision, inverse=inverse),
        grid=(R // rb,),
        in_specs=[pl.BlockSpec((rb, q, _L), lambda r: (r, 0, 0),
                               memory_space=pltpu.VMEM)] + cspecs,
        out_specs=pl.BlockSpec((rb, q, _L), lambda r: (r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, q, _L), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xf, *consts)
    if pad:
        out = out[:R - pad]
    return out.reshape(lead + (n,))


def dct_lane(x, precision=jax.lax.Precision.HIGHEST, interpret=None):
    """DCT-II along axis -1 (== scipy.fft.dct type 2, norm=None)."""
    if interpret is None:
        interpret = _interpret()
    n = x.shape[-1]
    consts = [jnp.asarray(c) for c in _factors(n, x.dtype, False)]
    return _lane_call(x, consts, False, precision, interpret)


def idct_lane(y, precision=jax.lax.Precision.HIGHEST, interpret=None):
    """Inverse of dct_lane (== scipy.fft.idct type 2, norm=None)."""
    if interpret is None:
        interpret = _interpret()
    n = y.shape[-1]
    consts = [jnp.asarray(c) for c in _factors(n, y.dtype, True)]
    # scipy idct type-2 norm=None: x = (y0 + 2 sum_{k>0} y_k cos)/2n;
    # C already carries the factor 2, so scale y and halve y[0]
    y = y * (1.0 / (2 * n))
    y = y.at[..., 0].mul(0.5)
    return _lane_call(y, consts, True, precision, interpret)


# ---------------------------------------------------------- sublane axis

def _sub_math(x, consts, inverse, precision):
    """Pure-array sublane-axis DCT math on a (q, 128, m) view (flat
    (n, m)); factored out of the kernel bodies so forward and inverse
    share one implementation."""
    uc, us, vc, vs, wc, ws = consts
    ein = _dots(precision, sublane=True)
    if not inverse:
        # T[k1, j1, m] = sum_j2 W[k1, j2] x[j2, j1, m]
        tr = ein("kj,jlm->klm", wc, x)
        ti = ein("kj,jlm->klm", ws, x)
        hr = vc[:, :, None] * tr - vs[:, :, None] * ti
        hi = vs[:, :, None] * tr + vc[:, :, None] * ti
        # X[k2, k1, m] = 2 Re sum_j1 U[k2, j1] H[k1, j1, m]
        return 2.0 * (ein("qj,kjm->qkm", uc, hr)
                      - ein("qj,kjm->qkm", us, hi))
    # P[k1, j1, m] = sum_k2 y[k2, k1, m] U[k2, j1]
    pr = ein("jkm,jl->klm", x, uc)
    pi = ein("jkm,jl->klm", x, us)
    hr = vc[:, :, None] * pr - vs[:, :, None] * pi
    hi = vs[:, :, None] * pr + vc[:, :, None] * pi
    # x[j2, j1, m] = Re[ 2 sum_k1 W[k1, j2] H[k1, j1, m] ]
    return 2.0 * (ein("kj,klm->jlm", wc, hr)
                  - ein("kj,klm->jlm", ws, hi))


def _fwd_sub_kernel(x_ref, uc, us, vc, vs, wc, ws, o_ref, *,
                    precision, inverse):
    o_ref[0] = _sub_math(x_ref[0],
                         (uc[:], us[:], vc[:], vs[:], wc[:], ws[:]),
                         inverse, precision)


@partial(jax.jit, static_argnames=("inverse", "precision", "interpret"))
def _sub_call(x, consts, inverse, precision, interpret):
    lead = x.shape[:-2]
    n, m = x.shape[-2:]
    q = n // _L
    B = max(int(np.prod(lead)), 1)
    xf = x.reshape(B, q, _L, m)
    lb = 128
    pad = (-m) % lb
    if pad:
        xf = jnp.concatenate(
            [xf, jnp.zeros((B, q, _L, pad), x.dtype)], axis=-1)
    m = m + pad
    cspecs = [pl.BlockSpec(c.shape, lambda b, i, nd=c.ndim: (0,) * nd,
                           memory_space=pltpu.VMEM) for c in consts]
    out = pl.pallas_call(
        partial(_fwd_sub_kernel, precision=precision, inverse=inverse),
        grid=(B, m // lb),
        in_specs=[pl.BlockSpec((1, q, _L, lb),
                               lambda b, i: (b, 0, 0, i),
                               memory_space=pltpu.VMEM)] + cspecs,
        out_specs=pl.BlockSpec((1, q, _L, lb), lambda b, i: (b, 0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, q, _L, m), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xf, *consts)
    if pad:
        out = out[..., :m - pad]
        m = m - pad
    return out.reshape(lead + (n, m))


def dct_sub(x, precision=jax.lax.Precision.HIGHEST, interpret=None):
    """DCT-II along axis -2."""
    if interpret is None:
        interpret = _interpret()
    n = x.shape[-2]
    consts = [jnp.asarray(c) for c in _factors(n, x.dtype, False)]
    return _sub_call(x, consts, False, precision, interpret)


def idct_sub(y, precision=jax.lax.Precision.HIGHEST, interpret=None):
    """Inverse of dct_sub."""
    if interpret is None:
        interpret = _interpret()
    n = y.shape[-2]
    consts = [jnp.asarray(c) for c in _factors(n, y.dtype, True)]
    y = y * (1.0 / (2 * n))
    y = y.at[..., 0, :].mul(0.5)
    return _sub_call(y, consts, True, precision, interpret)
