"""Pallas TPU kernel for periodic unit-cell expansion.

The reference's expand_unitcell inverse-maps every output pixel into
the averaged unit cell and resamples it with map_coordinates
(/root/reference/pyGPA/unit_cell_averaging.py:236-249). The coordinate
field is a sawtooth (mod-1 wrap at every cell seam), which defeats both
the XLA gather lowering (scalar-core bound) and the windowed warp
kernel (ops/pallas_warp.py — seam tiles span the whole cell, forcing
its dense fallback).

This kernel uses neither gathers nor coordinate arrays:

 - the unit-cell coordinates are computed IN-KERNEL from the k-vector
   matrix (12 scalars in SMEM): x = i/z2 + u, fractional coords
   f = (A x) mod 1, cell coords X = (A^-1 f - rmin) * z — exact to
   float32, no seam discontinuity problem because nothing is windowed;
 - the cell is small (it is one moire unit cell) and lives whole in
   VMEM; interpolation weights become DENSE separable kernel-function
   evaluations: W_x[p, c] = K(X1[p] - c) over ALL cell columns c
   (K = bilinear hat or Catmull-Rom piecewise cubic, zero beyond its
   support), so the resample is one MXU matmul with the cell plus a
   VPU row-reduction:  out[p] = sum_r K(X0[p]-r) * (W_x @ cell^T)[p,r].
   Taps outside the cell get zero weight — exactly map_coordinates'
   mode='constant', cval=0 contract of the reference.

Per output tile the work is ~R1 MACs/pixel (R1 = cell width); at
4096^2 with a 128-wide cell that is ~2 GMAC on the MXU — micro-
seconds of compute versus the reference's per-pixel Python/numba loop
and ~10^2 ms of XLA gathers.
"""
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TR, _TC = 64, 128     # output tile
_MAXC = 512            # max cell rows/cols served (VMEM budget)


def supported(cell_shape, out_shape, order):
    # expand_cell pads the output grid to tile multiples itself; the
    # only hard requirement is a VMEM-resident cell
    return (order in (1, 3)
            and cell_shape[0] <= _MAXC and cell_shape[1] <= _MAXC)


def _hat(d):
    """Bilinear kernel: max(0, 1 - |d|)."""
    return jnp.maximum(0.0, 1.0 - jnp.abs(d))


def _catmull_rom(d):
    """Catmull-Rom kernel K(d), support |d| < 2 — the same interpolant
    as core.interp._cubic_weights evaluated at signed distance d."""
    a = jnp.abs(d)
    inner = (1.5 * a - 2.5) * a * a + 1.0
    outer = ((-0.5 * a + 2.5) * a - 4.0) * a + 2.0
    return jnp.where(a < 1.0, inner,
                     jnp.where(a < 2.0, outer, 0.0))


def _bspline3(d):
    """Cubic B-spline basis B3(d), support |d| < 2 — evaluated on
    spline_filter'ed coefficients this is scipy's prefiltered order=3
    interpolant (core.interp._bspline_weights as a kernel function)."""
    a = jnp.abs(d)
    s = 1.0 / 6.0
    inner = s * (4.0 + a * a * (3.0 * a - 6.0))
    t = 2.0 - a
    outer = s * t * t * t
    return jnp.where(a < 1.0, inner,
                     jnp.where(a < 2.0, outer, 0.0))


def _expand_kernel(s_ref, cell_ref, u0_ref, u1_ref, o_ref, *,
                   order, with_u, R0, R1, cubic="bspline"):
    dt = o_ref.dtype
    a00, a01, a10, a11 = s_ref[0], s_ref[1], s_ref[2], s_ref[3]
    b00, b01, b10, b11 = s_ref[4], s_ref[5], s_ref[6], s_ref[7]
    rmin0, rmin1 = s_ref[8], s_ref[9]
    z, inv_z2 = s_ref[10], s_ref[11]

    r = pl.program_id(0)
    c = pl.program_id(1)
    TR, TC = o_ref.shape
    ii = (jax.lax.broadcasted_iota(jnp.int32, (TR, TC), 0)
          + r * TR).astype(dt) * inv_z2
    jj = (jax.lax.broadcasted_iota(jnp.int32, (TR, TC), 1)
          + c * TC).astype(dt) * inv_z2
    if with_u:
        ii = ii + u0_ref[:]
        jj = jj + u1_ref[:]
    f0 = a00 * ii + a01 * jj
    f1 = a10 * ii + a11 * jj
    f0 = f0 - jnp.floor(f0)
    f1 = f1 - jnp.floor(f1)
    X0 = (b00 * f0 + b01 * f1 - rmin0) * z        # cell row coord
    X1 = (b10 * f0 + b11 * f1 - rmin1) * z        # cell col coord

    if order == 1:
        K = _hat
    else:
        K = _bspline3 if cubic == "bspline" else _catmull_rom
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, 1, R1), 2).astype(dt)
    rows = jax.lax.broadcasted_iota(jnp.int32, (1, 1, R0), 2).astype(dt)
    Wx = K(X1[:, :, None] - cols)                 # (TR, TC, R1)
    Wy = K(X0[:, :, None] - rows)                 # (TR, TC, R0)
    # cubic == "bspline" needs NO extra terms here: the wrapper folds
    # the scipy-legacy mirror boundary into the coefficient array
    # itself (prefilter + 2 reflected rings + a coordinate shift), so
    # the plain zero-outside weight vectors sample it exactly.
    G = jax.lax.dot_general(                      # (TR, TC, R0)
        Wx, cell_ref[:], (((2,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=dt)
    o_ref[:] = jnp.sum(Wy * G, axis=2)


@partial(jax.jit,
         static_argnames=("out_shape", "order", "interpret", "cubic"))
def _expand_call(scalars, cell, u0, u1, out_shape, order,
                 interpret=False, cubic="bspline"):
    R0, R1 = cell.shape
    n, m = out_shape
    with_u = u0 is not None
    tr = _TR if n % _TR == 0 else 8
    grid = (n // tr, m // _TC)

    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((R0, R1), lambda r, c: (0, 0),
                             memory_space=pltpu.VMEM)]
    args = [scalars, cell]
    for u in (u0, u1):
        if with_u:
            in_specs.append(pl.BlockSpec((tr, _TC), lambda r, c: (r, c),
                                         memory_space=pltpu.VMEM))
            args.append(u)
        else:
            in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
            args.append(jnp.zeros((1,), cell.dtype))

    def kern(s_ref, cell_ref, u0_ref, u1_ref, o_ref):
        _expand_kernel(s_ref, cell_ref, u0_ref, u1_ref, o_ref,
                       order=order, with_u=with_u, R0=R0, R1=R1,
                       cubic=cubic)

    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tr, _TC), lambda r, c: (r, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, m), cell.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)


def expand_cell(cell, ks, rmin, z, z2, u, out_shape, order=3,
                interpret=None, cubic="bspline"):
    """Expand the averaged unit `cell` onto an (N, M) image grid.

    cell : (R0, R1) real array (NaNs already replaced by the caller).
    ks : (2, 2) k-vector matrix (concrete); rmin: cell-bbox offset.
    z, z2 : cell zoom / output supersampling (reference semantics,
        unit_cell_averaging.py:236-249).
    u : optional (2, N, M) displacement field.
    cubic='bspline' (default) prefilters the cell and samples with the
    B-spline basis — scipy's order=3 semantics, matching
    core.interp.map_coordinates; 'catmull' keeps the unfiltered
    Catmull-Rom interpolant.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    cell = jnp.asarray(cell)
    rmin = (float(rmin[0]), float(rmin[1]))
    if order == 3 and cubic == "bspline":
        # scipy's order=3 semantics with the mirror boundary FOLDED
        # INTO the coefficients: prefilter, add two reflected rings,
        # and shift the cell-coordinate origin by 2 samples (rmin is
        # in pre-zoom units, hence -2/z). In-domain X lands in
        # [2, R+1], so every 4-tap stencil stays inside the extended
        # array and the kernel's plain zero-outside weights are exact.
        from ..core.interp import spline_filter
        cell = spline_filter(cell, mode="constant")
        cell = jnp.pad(cell, 2, mode="reflect")
        rmin = (rmin[0] - 2.0 / float(z), rmin[1] - 2.0 / float(z))
    dt = cell.dtype
    A = np.asarray(ks, np.float64)
    Ainv = np.linalg.inv(A)
    n, m = out_shape
    scalars = jnp.asarray(
        [A[0, 0], A[0, 1], A[1, 0], A[1, 1],
         Ainv[0, 0], Ainv[0, 1], Ainv[1, 0], Ainv[1, 1],
         float(rmin[0]), float(rmin[1]), float(z), 1.0 / float(z2)],
        dt)
    # pad output to tile multiples; cell lanes to the vreg width
    tr = _TR if n % _TR == 0 else 8
    pn = (-n) % tr
    pm = (-m) % _TC
    u0 = u1 = None
    if u is not None:
        u = jnp.asarray(u, dt)
        u0 = jnp.pad(u[0], ((0, pn), (0, pm)))
        u1 = jnp.pad(u[1], ((0, pn), (0, pm)))
    out = _expand_call(scalars, cell, u0, u1, (n + pn, m + pm),
                       order, interpret=interpret, cubic=cubic)
    return out[:n, :m]
