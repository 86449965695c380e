"""Pallas TPU kernel for unit-cell drizzle accumulation.

The reference accumulates every image pixel into a small unit-cell
grid with 2x2 bilinear overlap weights, serially, pixel by pixel
(/root/reference/pyGPA/unit_cell_averaging.py:164-217). The XLA
formulation in ucell/averaging.py is a deterministic scatter-add —
correct, but TPU scatters serialize on the scalar core.

This kernel has NO scatter. The bilinear overlap of the reference's
float_overlap IS the separable hat function max(0, 1-|d|):
a pixel at cell position (X0, X1) contributes
hat(X0 - r) * hat(X1 - c) * value to bin (r, c), for ALL bins.
Because the cell is small and VMEM-resident, the whole accumulation
over a tile of P pixels becomes two dense MXU contractions over P:

    res  += (Hy * val)^T @ Hx      Hy[p, r] = hat(X0[p] - r)
    wsum += (Hy * vw )^T @ Hx      Hx[p, c] = hat(X1[p] - c)

with X computed in-kernel from the k-vector scalars (SMEM), exactly
like ops/pallas_expand.py. NaN pixels get val = 0, vw = 0 — the
reference's mask semantics. The accumulators live in VMEM across the
whole grid (output block index is constant), so HBM sees one write.

Determinism: bin sums are f32 MXU-accumulator reductions in a fixed
order — no atomics, no data races, same result every run (the property
the reference gets from serialization, SURVEY.md:318-322).
"""
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_sweep import _dot_maker

_TR, _TC = 32, 128     # input pixel tile
_MAXC = 512


def _clamp(precision):
    # the accumulation dots contract the (sublane) pixel axis; Mosaic's
    # bf16 path for sublane contractions is a compile blowup (same as
    # pallas_dct2's sub kernels), so HIGH clamps to exact HIGHEST —
    # ~17 ms total at 4096^2, still ~100x the XLA scatter path
    if precision == jax.lax.Precision.HIGH:
        return jax.lax.Precision.HIGHEST
    return precision


def supported(rsize):
    return rsize[0] <= _MAXC and rsize[1] <= _MAXC


def _drizzle_kernel(s_ref, img_ref, u0_ref, u1_ref,
                    res_ref, w_ref, *, with_u, R0p, R1p, precision):
    dt = res_ref.dtype
    a00, a01, a10, a11 = s_ref[0], s_ref[1], s_ref[2], s_ref[3]
    b00, b01, b10, b11 = s_ref[4], s_ref[5], s_ref[6], s_ref[7]
    rmin0, rmin1 = s_ref[8], s_ref[9]
    z = s_ref[10]
    dot = _dot_maker(_clamp(precision))

    r = pl.program_id(0)
    c = pl.program_id(1)
    TR, TC = img_ref.shape
    ii = (jax.lax.broadcasted_iota(jnp.int32, (TR, TC), 0)
          + r * TR).astype(dt)
    jj = (jax.lax.broadcasted_iota(jnp.int32, (TR, TC), 1)
          + c * TC).astype(dt)
    if with_u:
        ii = ii + u0_ref[:]
        jj = jj + u1_ref[:]
    f0 = a00 * ii + a01 * jj
    f1 = a10 * ii + a11 * jj
    f0 = f0 - jnp.floor(f0)
    f1 = f1 - jnp.floor(f1)
    X0 = (b00 * f0 + b01 * f1 - rmin0) * z
    X1 = (b10 * f0 + b11 * f1 - rmin1) * z

    img = img_ref[:]
    valid = img == img                     # not-NaN
    val = jnp.where(valid, img, 0.0)
    vw = valid.astype(dt)

    rows = jax.lax.broadcasted_iota(jnp.int32, (1, 1, R0p), 2).astype(dt)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, 1, R1p), 2).astype(dt)
    Hy3 = jnp.maximum(0.0, 1.0 - jnp.abs(X0[:, :, None] - rows))
    Hx3 = jnp.maximum(0.0, 1.0 - jnp.abs(X1[:, :, None] - cols))
    P = TR * TC
    # fold value/weight into the 3D hat tensor BEFORE collapsing the
    # pixel dims: only leading-dim collapses (lane dim intact) lower
    # in Mosaic — a (P, 1) reshape of the 2D tile does not
    Hyv = (Hy3 * val[:, :, None]).reshape(P, R0p)
    Hyw = (Hy3 * vw[:, :, None]).reshape(P, R0p)
    Hx = Hx3.reshape(P, R1p)
    dims = (((0,), (0,)), ((), ()))        # contract the pixel axis

    @pl.when((r == 0) & (c == 0))
    def _init():
        res_ref[:] = jnp.zeros((R0p, R1p), dt)
        w_ref[:] = jnp.zeros((R0p, R1p), dt)

    res_ref[:] += dot(Hyv, Hx, dims)
    w_ref[:] += dot(Hyw, Hx, dims)


@partial(jax.jit, static_argnames=("rsize", "precision", "interpret"))
def _drizzle_call(scalars, img, u0, u1, rsize,
                  precision=jax.lax.Precision.HIGH, interpret=False):
    n, m = img.shape
    with_u = u0 is not None
    R0p = rsize[0] + (-rsize[0]) % 8
    R1p = rsize[1] + (-rsize[1]) % 128

    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((_TR, _TC), lambda r, c: (r, c),
                             memory_space=pltpu.VMEM)]
    args = [scalars, img]
    for u in (u0, u1):
        if with_u:
            in_specs.append(pl.BlockSpec((_TR, _TC),
                                         lambda r, c: (r, c),
                                         memory_space=pltpu.VMEM))
            args.append(u)
        else:
            in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
            args.append(jnp.zeros((1,), img.dtype))

    def kern(s_ref, img_ref, u0_ref, u1_ref, res_ref, w_ref):
        _drizzle_kernel(s_ref, img_ref, u0_ref, u1_ref, res_ref, w_ref,
                        with_u=with_u, R0p=R0p, R1p=R1p,
                        precision=precision)

    acc = pl.BlockSpec((R0p, R1p), lambda r, c: (0, 0),
                       memory_space=pltpu.VMEM)
    res, wsum = pl.pallas_call(
        kern,
        grid=(n // _TR, m // _TC),
        in_specs=in_specs,
        out_specs=(acc, acc),
        out_shape=(jax.ShapeDtypeStruct((R0p, R1p), img.dtype),
                   jax.ShapeDtypeStruct((R0p, R1p), img.dtype)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    return res[:rsize[0], :rsize[1]], wsum[:rsize[0], :rsize[1]]


def drizzle(image, ks, rmin, rsize, z, u=None,
            precision=jax.lax.Precision.HIGH, interpret=None):
    """Accumulate `image` (optionally displaced by u) into the unit
    cell: returns (sum, weights) of shape rsize — the unnormalized
    drizzle of unit_cell_average (unit_cell_averaging.py:164-217)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    image = jnp.asarray(image)
    dt = image.dtype
    n, m = image.shape
    A = np.asarray(ks, np.float64)
    Ainv = np.linalg.inv(A)
    scalars = jnp.asarray(
        [A[0, 0], A[0, 1], A[1, 0], A[1, 1],
         Ainv[0, 0], Ainv[0, 1], Ainv[1, 0], Ainv[1, 1],
         float(rmin[0]), float(rmin[1]), float(z), 0.0], dt)
    pn = (-n) % _TR
    pm = (-m) % _TC
    u0 = u1 = None
    if u is not None:
        u = jnp.asarray(u, dt)
        u0 = jnp.pad(u[0], ((0, pn), (0, pm)))
        u1 = jnp.pad(u[1], ((0, pn), (0, pm)))
    if pn or pm:
        # NaN-pad: padded pixels contribute nothing (mask semantics)
        image = jnp.pad(image, ((0, pn), (0, pm)),
                        constant_values=np.nan)
    return _drizzle_call(scalars, image, u0, u1,
                         (int(rsize[0]), int(rsize[1])),
                         precision=precision, interpret=interpret)
