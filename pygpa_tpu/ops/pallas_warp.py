"""Pallas TPU kernel for exact bilinear image warping.

The reference's distortion inversion and undistortion resample images
at per-pixel fractional coordinates via scipy.ndimage.map_coordinates
(/root/reference/pyGPA/geometric_phase_analysis.py:256-299,973). On
TPU the XLA lowering of such resampling is a per-element gather that
runs at only ~60-70M indices/s (measured: 810 ms for one bilinear
4096^2 warp) — it serializes on the scalar core. That made the
warp-heavy pipelines (invert_u_overlap refinement, undistort_image)
the slowest part of the framework by far.

This kernel restructures the warp around what the TPU vector unit CAN
do:

 - Mosaic's `tpu.dynamic_gather` handles arbitrary per-element
   within-row gathers as long as the source spans a single vreg along
   the gather (lane) dimension, i.e. 128 columns. (Measured: a
   (64,128) in-kernel `jnp.take_along_axis(axis=-1)` compiles and is
   bit-exact; wider sources and sublane-axis gathers are rejected.)
 - There is no sublane (row) gather at all, but for the smooth
   displacement fields GPA works with, the row offset varies by only
   a few rows within a small tile — so row selection can be an
   unrolled shift+select loop over a bounded window.
 - Arbitrary per-tile window positions come from scalar-prefetched
   block indices: for every (8,128) output tile we pick a 3x3 group
   of (32,128) input blocks around the tile's coordinate range, so
   the kernel sees a 96x384 window at dynamic block-aligned offsets.

Per output tile the kernel unrolls d over the window's row span; for
each d it blends rows d/d+1 with the y-fraction, lane-gathers the two
x-taps from the left/right 128-wide chunks, blends with the
x-fraction, and keeps the result where the pixel's row offset equals
d. Everything is elementwise or single-vreg gathers — no reshapes,
flips, or cross-vreg ops.

Validity domain: within any (8,128) output tile the sample
coordinates may vary by at most 56 rows and 127 columns beyond the
tile's own extent (worst-case block alignment; typically ~1.5x more).
That is |grad u| <~ 0.4 for displacement-field warps — GPA fields vary
on the moire scale with |grad u| <~ 0.1, far inside the bound. The
bound is GUARDED at runtime: _warp_core detects any tile whose taps
fall outside its 3x3 window and lax.cond-switches the whole call to a
dense XLA-gather fallback with identical tap/weight algebra, so
discontinuous coordinate fields (e.g. sawtooth cell-expansion coords)
are exact — merely slower.

Boundary modes replicate jax.scipy.ndimage.map_coordinates order=1:
'nearest' clamps the sample position; 'constant' pads the image with
one cval ring (taps at distance <1 outside blend with cval exactly as
scipy does) and masks samples further out.
"""
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Output tile (sublanes x lanes) and input window block geometry.
# _TR=32: the per-grid-step overhead dominates the smooth-field warp
# (measured 2048^2 bilinear: 5.7 ms/warp at _TR=8, 2.1 at _TR=32 —
# total executed-d gather work is tile-size invariant, the fixed
# per-tile cost is not); the 96-row window still admits |grad u| ~ 1.
_TR, _TC = 32, 128         # output tile
_WR, _WC = 32, 128         # input window block
_NB = 3                    # row blocks per window
_NC = 3                    # col blocks per window (3x3 group -> 96x384)


def _warp_kernel(pk_ref,
                 w00_ref, w01_ref, w02_ref, w10_ref, w11_ref, w12_ref,
                 w20_ref, w21_ref, w22_ref,
                 iy_ref, ix_ref, fy_ref, fx_ref, out_ref,
                 acc_ref, p0_ref, p1_ref):
    # 96-row window in three 128-wide column chunks; pad top and
    # bottom with copies so every d slice is in-bounds — rows read
    # from the pads are never selected (masked by d_pix).
    w0 = jnp.concatenate([w00_ref[:], w10_ref[:], w20_ref[:]], axis=0)
    w1 = jnp.concatenate([w01_ref[:], w11_ref[:], w21_ref[:]], axis=0)
    w2 = jnp.concatenate([w02_ref[:], w12_ref[:], w22_ref[:]], axis=0)
    w0 = jnp.concatenate([w0[:_TR], w0, w0[-_TR:]], axis=0)  # (160, 128)
    w1 = jnp.concatenate([w1[:_TR], w1, w1[-_TR:]], axis=0)
    w2 = jnp.concatenate([w2[:_TR], w2, w2[-_TR:]], axis=0)

    fy = fy_ref[:]
    fx = fx_ref[:]
    v = pk_ref[pl.program_id(0), pl.program_id(1)]
    # window-relative taps from the scalar window base: full-size
    # er/ec planes (plus the repeats building them) are relayout-bound
    # XLA passes — two int ops per pixel here are free
    oy = v & 511
    ox = jax.lax.shift_right_logical(v, jnp.int32(9)) & 511
    er = jnp.clip(iy_ref[:] - oy * _WR, 0, _NB * _WR - 2)
    ec = jnp.clip(ix_ref[:] - ox * _WC, 0, _NC * _WC - 2)
    # this tile's actual d_pix range (bit-packed with the window base,
    # see the pk packing): for smooth fields only ~_TR + a few of the
    # 127 static iterations do real work
    smin = (jax.lax.shift_right_logical(v, jnp.int32(18)) & 127) - _TR
    smax = (jax.lax.shift_right_logical(v, jnp.int32(25)) & 127) - _TR

    i_loc = jax.lax.broadcasted_iota(jnp.int32, (_TR, _TC), 0)
    d_pix = er - i_loc        # in [-(_TR-1), _NB*_WR - 2]

    def chunk_idx(e):
        in0 = e < _WC
        in1 = e < 2 * _WC
        e0 = jnp.minimum(e, _WC - 1)
        e1_ = jnp.clip(e - _WC, 0, _WC - 1)
        e2 = jnp.clip(e - 2 * _WC, 0, _WC - 1)
        return in0, in1, e0, e1_, e2

    t0 = chunk_idx(ec)
    t1 = chunk_idx(ec + 1)

    def gather(A0, A1, A2, t):
        in0, in1, e0, e1_, e2 = t
        g = jnp.where(in1, jnp.take_along_axis(A1, e1_, axis=1),
                      jnp.take_along_axis(A2, e2, axis=1))
        return jnp.where(in0, jnp.take_along_axis(A0, e0, axis=1), g)

    one = jnp.ones((), fy.dtype)
    acc_ref[:] = jnp.zeros((_TR, _TC), fy.dtype)
    # Gather BEFORE blending: the vertical fraction fy belongs to the
    # output pixel, so row taps must be gathered at the pixel's own
    # column first. Row tap d+1 of this iteration is row tap d of the
    # next, so a rolling pair (in scratch) keeps it at 6 vreg-gathers
    # per executed d. Iterations outside [smin, smax+1] are skipped at
    # runtime (pl.when): the selection mask d_pix == d-1 would be
    # all-false there anyway. At d == smin the prev scratch holds
    # garbage, but d-1 < smin means no pixel selects it.
    for d in range(-_TR + 1, _NB * _WR):
        @pl.when((d >= smin) & (d <= smax + 1))
        def _body(d=d):
            a0 = d + _TR      # slice start in the row-padded window
            A0 = w0[a0:a0 + _TR]
            A1 = w1[a0:a0 + _TR]
            A2 = w2[a0:a0 + _TR]
            c0 = gather(A0, A1, A2, t0)
            c1 = gather(A0, A1, A2, t1)
            val = ((one - fy) * ((one - fx) * p0_ref[:] + fx * p1_ref[:])
                   + fy * ((one - fx) * c0 + fx * c1))
            acc_ref[:] = jnp.where(d_pix == d - 1, val, acc_ref[:])
            p0_ref[:] = c0
            p1_ref[:] = c1
    out_ref[:] = acc_ref[:]


def _cr_weights(t):
    """Catmull-Rom weights for taps at offsets (-1, 0, 1, 2) —
    identical algebra to core.interp._cubic_weights."""
    t2 = t * t
    t3 = t2 * t
    return (-0.5 * t3 + t2 - 0.5 * t,
            1.5 * t3 - 2.5 * t2 + 1.0,
            -1.5 * t3 + 2.0 * t2 + 0.5 * t,
            0.5 * t3 - 0.5 * t2)


def _bs_weights(t):
    """Cubic B-spline basis weights (core.interp._bspline_weights) —
    for sampling spline_filter'ed coefficient arrays."""
    t2 = t * t
    t3 = t2 * t
    s = 1.0 / 6.0
    return (s * (1.0 - 3.0 * t + 3.0 * t2 - t3),
            s * (4.0 - 6.0 * t2 + 3.0 * t3),
            s * (1.0 + 3.0 * t + 3.0 * t2 - 3.0 * t3),
            s * t3)


def _warp_cubic_kernel(pk_ref,
                       w00_ref, w01_ref, w02_ref, w10_ref, w11_ref,
                       w12_ref, w20_ref, w21_ref, w22_ref,
                       iy_ref, ix_ref, fy_ref, fx_ref, out_ref,
                       acc_ref, r0_ref, r1_ref, r2_ref, r3_ref,
                       weight_fn=_cr_weights):
    """Catmull-Rom 4x4-tap variant: er/ec point at the FIRST tap
    (floor - 1, pre-shifted by the wrapper). Per executed d, the four
    column taps are gathered and x-blended into one plane stored in a
    4-slot scratch ring; the ring y-blends into the output for pixels
    whose first row tap is d-3 rows back. Iterations outside
    [smin, smax+3] are skipped at runtime."""
    w0 = jnp.concatenate([w00_ref[:], w10_ref[:], w20_ref[:]], axis=0)
    w1 = jnp.concatenate([w01_ref[:], w11_ref[:], w21_ref[:]], axis=0)
    w2 = jnp.concatenate([w02_ref[:], w12_ref[:], w22_ref[:]], axis=0)
    w0 = jnp.concatenate([w0[:_TR], w0, w0[-_TR:]], axis=0)
    w1 = jnp.concatenate([w1[:_TR], w1, w1[-_TR:]], axis=0)
    w2 = jnp.concatenate([w2[:_TR], w2, w2[-_TR:]], axis=0)

    fy = fy_ref[:]
    fx = fx_ref[:]
    v = pk_ref[pl.program_id(0), pl.program_id(1)]
    oy = v & 511
    ox = jax.lax.shift_right_logical(v, jnp.int32(9)) & 511
    er = jnp.clip(iy_ref[:] - oy * _WR, 0, _NB * _WR - 4)
    ec = jnp.clip(ix_ref[:] - ox * _WC, 0, _NC * _WC - 4)
    smin = (jax.lax.shift_right_logical(v, jnp.int32(18)) & 127) - _TR
    smax = (jax.lax.shift_right_logical(v, jnp.int32(25)) & 127) - _TR

    i_loc = jax.lax.broadcasted_iota(jnp.int32, (_TR, _TC), 0)
    d_pix = er - i_loc

    def chunk_idx(e):
        in0 = e < _WC
        in1 = e < 2 * _WC
        e0 = jnp.minimum(e, _WC - 1)
        e1_ = jnp.clip(e - _WC, 0, _WC - 1)
        e2 = jnp.clip(e - 2 * _WC, 0, _WC - 1)
        return in0, in1, e0, e1_, e2

    ts = [chunk_idx(ec + k) for k in range(4)]
    wx = weight_fn(fx)
    wy = weight_fn(fy)

    def gather(A0, A1, A2, t):
        in0, in1, e0, e1_, e2 = t
        g = jnp.where(in1, jnp.take_along_axis(A1, e1_, axis=1),
                      jnp.take_along_axis(A2, e2, axis=1))
        return jnp.where(in0, jnp.take_along_axis(A0, e0, axis=1), g)

    ring = (r0_ref, r1_ref, r2_ref, r3_ref)
    acc_ref[:] = jnp.zeros((_TR, _TC), fy.dtype)
    for d in range(-_TR + 1, _NB * _WR):
        @pl.when((d >= smin) & (d <= smax + 3))
        def _body(d=d):
            a0 = d + _TR
            A0 = w0[a0:a0 + _TR]
            A1 = w1[a0:a0 + _TR]
            A2 = w2[a0:a0 + _TR]
            cv = (wx[0] * gather(A0, A1, A2, ts[0])
                  + wx[1] * gather(A0, A1, A2, ts[1])
                  + wx[2] * gather(A0, A1, A2, ts[2])
                  + wx[3] * gather(A0, A1, A2, ts[3]))
            ring[d % 4][:] = cv
            # selection for pixels with first row tap at d-3: ring
            # slots (d-3)..d; at d < smin+3 some slots hold garbage,
            # but d_pix == d-3 < smin is then all-false.
            val = (wy[0] * ring[(d - 3) % 4][:]
                   + wy[1] * ring[(d - 2) % 4][:]
                   + wy[2] * ring[(d - 1) % 4][:]
                   + wy[3] * cv)
            acc_ref[:] = jnp.where(d_pix == d - 3, val, acc_ref[:])
    out_ref[:] = acc_ref[:]


def _warp_xla(image, iy0, ix0, fy, fx, taps, cubic="catmull"):
    """Dense XLA-gather fallback with the exact tap/weight algebra of
    the Pallas kernels — used when a tile's coordinate span exceeds the
    kernel's 3x3 window (discontinuous fields)."""
    m = image.shape[1]
    flat = image.ravel()
    if taps == 2:
        r0 = flat[iy0 * m + ix0]
        r1 = flat[iy0 * m + ix0 + 1]
        r2 = flat[(iy0 + 1) * m + ix0]
        r3 = flat[(iy0 + 1) * m + ix0 + 1]
        one = jnp.ones((), fy.dtype)
        return ((one - fy) * ((one - fx) * r0 + fx * r1)
                + fy * ((one - fx) * r2 + fx * r3))
    weight_fn = _bs_weights if cubic == "bspline" else _cr_weights
    wy = weight_fn(fy)
    wx = weight_fn(fx)
    out = jnp.zeros(fy.shape, fy.dtype)
    for a in range(4):
        row = jnp.zeros(fy.shape, fy.dtype)
        for b in range(4):
            row = row + wx[b] * flat[(iy0 + a) * m + ix0 + b]
        out = out + wy[a] * row
    return out


@partial(jax.jit, static_argnames=("interpret", "taps", "cubic"))
def _warp_core(image, iy0, ix0, fy, fx, interpret, taps=2,
               cubic="catmull"):
    """Separable-kernel sample of `image` at integer base taps
    (iy0, ix0) with fractions (fy, fx): bilinear for taps=2,
    Catmull-Rom cubic for taps=4 (base tap = floor - 1). Taps must
    satisfy 0 <= t <= dim - taps. The image must be a multiple of the
    window group and the tap arrays a multiple of the output tile
    (the wrapper guarantees all of this). Taps and fractions are taken
    separately so boundary-mode wrappers can shift taps in exact
    integer arithmetic."""
    n, m = image.shape
    ch, cw = iy0.shape
    nr, nc = ch // _TR, cw // _TC
    nbr, nbc = n // _WR, m // _WC

    # Per-tile aggregates only (the kernels rebuild per-pixel er/ec
    # from the scalar window base — full-size er/ec planes and the
    # repeats that built them were relayout-bound XLA passes).
    i_loc = jnp.arange(ch, dtype=jnp.int32)[:, None] % _TR
    rel = iy0 - i_loc
    rel4 = rel.reshape(nr, _TR, nc, _TC)
    rel_min = rel4.min(axis=(1, 3))                       # (nr, nc)
    rel_max = rel4.max(axis=(1, 3))
    iy4 = iy0.reshape(nr, _TR, nc, _TC)
    iy_min = iy4.min(axis=(1, 3))
    iy_max = iy4.max(axis=(1, 3))
    ix4 = ix0.reshape(nr, _TR, nc, _TC)
    ix_min = ix4.min(axis=(1, 3))
    ix_max = ix4.max(axis=(1, 3))
    oy = jnp.clip(rel_min // _WR, 0, nbr - _NB)
    ox = jnp.clip(ix_min // _WC, 0, nbc - _NC)

    # Validity: clamping would silently corrupt samples whenever a
    # tile's taps span more than its 3x3 window (sawtooth coords at
    # unit-cell seams, arbitrary caller fields) — detect that exactly
    # from the tile aggregates and lax.cond to the dense XLA fallback
    # below, so out-of-domain inputs are slow, never wrong.
    in_domain = jnp.all(
        (iy_min - oy * _WR >= 0)
        & (iy_max - oy * _WR <= _NB * _WR - taps)
        & (ix_min - ox * _WC >= 0)
        & (ix_max - ox * _WC <= _NC * _WC - taps))

    # Per-tile d_pix range for the kernels' runtime iteration skip
    # (d_pix = er - i_loc = rel - oy*_WR on in-domain tiles; clip to
    # the 7-bit packing range (offset _TR) — out-of-range only on fallback tiles).
    dmin = jnp.clip(rel_min - oy * _WR, -_TR, 127 - _TR)
    dmax = jnp.clip(rel_max - oy * _WR, -_TR, 127 - _TR)

    dtype = image.dtype
    scratch = [pltpu.VMEM((_TR, _TC), dtype)] * (2 if taps == 2 else 4)
    # All four per-tile scalars (window base oy/ox, d_pix range) ride
    # in ONE bit-packed scalar-prefetch array: SMEM is 1MB total and
    # whole-array prefetch operands live there ((n/8, m/128) int32 is
    # 256KB at 4096^2; Mosaic rejects (1,1)/size-1 SMEM input blocks,
    # so packing is the only way to stay within budget). Layout:
    # oy | ox<<9 | (dmin+8)<<18 | (dmax+8)<<25.
    pk = (oy | (ox << 9) | ((dmin + _TR) << 18)
          | ((dmax + _TR) << 25)).astype(jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nr, nc),
        in_specs=[
            pl.BlockSpec((_WR, _WC),
                         (lambda dy, dx: lambda r, c, pk_:
                          ((pk_[r, c] & 511) + dy,
                           ((pk_[r, c] >> 9) & 511) + dx))(dy, dx))
            for dy in range(_NB) for dx in range(_NC)
        ] + [
            pl.BlockSpec((_TR, _TC), lambda r, c, pk_: (r, c))
            for _ in range(4)
        ],
        out_specs=pl.BlockSpec((_TR, _TC), lambda r, c, pk_: (r, c)),
        scratch_shapes=[pltpu.VMEM((_TR, _TC), dtype)] + scratch,
    )
    if taps == 2:
        kernel = _warp_kernel
    else:
        kernel = partial(_warp_cubic_kernel,
                         weight_fn=(_bs_weights if cubic == "bspline"
                                    else _cr_weights))

    def pallas_branch(image, iy0, ix0, fy, fx):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((ch, cw), image.dtype),
            interpret=interpret,
        )(pk, *([image] * (_NB * _NC)), iy0, ix0, fy, fx)

    return jax.lax.cond(
        in_domain, pallas_branch,
        partial(_warp_xla, taps=taps, cubic=cubic),
        image, iy0, ix0, fy, fx)


def _pad_to(x, rows, cols, edge=False):
    pr = (-x.shape[0]) % rows
    pc = (-x.shape[1]) % cols
    if pr or pc:
        # edge replication for coordinate arrays: padded entries must
        # stay inside the smooth neighborhood of their tile, or they
        # would drag the per-tile window base away from the real
        # pixels (zeros would corrupt every boundary tile).
        x = jnp.pad(x, ((0, pr), (0, pc)),
                    mode="edge" if edge else "constant")
    return x


def warp_bilinear(image, cy, cx, mode="nearest", cval=0.0,
                  interpret=None):
    """map_coordinates(order=1) drop-in for 2-D images on TPU.

    Exact bilinear resampling (same tap/weight algebra as
    jax.scipy.ndimage.map_coordinates order=1) with 'nearest' and
    'constant' boundary modes. `interpret=None` auto-selects the
    compiled kernel on TPU and interpret mode elsewhere.
    """
    image = jnp.asarray(image)
    cy = jnp.asarray(cy)
    cx = jnp.asarray(cx)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, m = image.shape
    out_shape = cy.shape
    if cy.ndim != 2:
        cy = (cy.reshape(-1, cy.shape[-1]) if cy.ndim > 2
              else cy.reshape(1, -1))
        cx = cx.reshape(cy.shape)

    fl_y = jnp.floor(cy)
    fl_x = jnp.floor(cx)
    fy = (cy - fl_y).astype(image.dtype)   # exact float ops
    fx = (cx - fl_x).astype(image.dtype)
    ty = fl_y.astype(jnp.int32)
    tx = fl_x.astype(jnp.int32)
    if mode == "nearest":
        # clamp the sample position: outside, both taps hit the border
        # row/col, so clamping tap0 and zeroing the fraction matches.
        fy = jnp.where((ty < 0) | (ty > n - 2), 0.0, fy)
        fx = jnp.where((tx < 0) | (tx > m - 2), 0.0, fx)
        fy = jnp.where(cy >= n - 1, 1.0, fy)
        fx = jnp.where(cx >= m - 1, 1.0, fx)
        ty = jnp.clip(ty, 0, n - 2)
        tx = jnp.clip(tx, 0, m - 2)
        img = image
    elif mode == "constant":
        # One cval ring makes taps at distance <1 outside blend with
        # cval exactly as scipy does; further out is masked below.
        # The +1 shift happens on the integer taps — exact at any
        # image size (a float coordinate shift would round).
        img = jnp.pad(image, 1, constant_values=cval)
        outside = ((cy <= -1) | (cy >= n) | (cx <= -1) | (cx >= m))
        ty = jnp.clip(ty + 1, 0, n)
        tx = jnp.clip(tx + 1, 0, m)
        n, m = img.shape
    else:
        raise NotImplementedError(f"mode={mode!r}")

    img_p = _pad_to(img, _WR * _NB, _WC * _NC)
    ch, cw = ty.shape
    ty_p = _pad_to(ty, _TR, _TC, edge=True)
    tx_p = _pad_to(tx, _TR, _TC, edge=True)
    fy_p = _pad_to(fy, _TR, _TC, edge=True)
    fx_p = _pad_to(fx, _TR, _TC, edge=True)
    out = _warp_core(img_p, ty_p, tx_p, fy_p, fx_p, interpret)[:ch, :cw]
    if mode == "constant":
        out = jnp.where(outside, jnp.asarray(cval, out.dtype), out)
    return out.reshape(out_shape)


def warp_cubic(image, cy, cx, mode="nearest", cval=0.0, interpret=None,
               cubic="catmull"):
    """map_coordinates(order=3) drop-in for 2-D images on TPU — the
    same interpolant as core.interp's order=3 resampler (16 fused
    gathers there; 12 vreg-gathers per row-shift here).
    cubic='catmull' is the interpolating Catmull-Rom kernel;
    cubic='bspline' samples with B-spline basis weights (pass a
    spline_filter'ed coefficient array for scipy-equivalent results).
    Boundary semantics match core.interp._map_coordinates_cubic:
    'nearest' clamps each tap, 'constant' blends cval for taps outside
    (exact out to the 2-pixel partial-overlap rim, masked beyond).
    """
    image = jnp.asarray(image)
    cy = jnp.asarray(cy)
    cx = jnp.asarray(cx)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, m = image.shape
    out_shape = cy.shape
    if cy.ndim != 2:
        cy = (cy.reshape(-1, cy.shape[-1]) if cy.ndim > 2
              else cy.reshape(1, -1))
        cx = cx.reshape(cy.shape)

    if mode == "nearest":
        # Two edge-replicated rings reproduce per-tap clamping for
        # sample positions out to 1 px outside; clamping the position
        # with fraction->1 reproduces it exactly beyond (the t=1
        # weight vector (0,0,1,0) picks the border tap).
        img = jnp.pad(image, 2, mode="edge")
        cyc = jnp.clip(cy, -1, n)
        cxc = jnp.clip(cx, -1, m)
        fl_y = jnp.floor(cyc)
        fl_x = jnp.floor(cxc)
        fy = (cyc - fl_y).astype(image.dtype)
        fx = (cxc - fl_x).astype(image.dtype)
        fy = jnp.where(fl_y > n - 1, 1.0, fy)
        fx = jnp.where(fl_x > m - 1, 1.0, fx)
        ty = jnp.minimum(fl_y.astype(jnp.int32), n - 1) + 1
        tx = jnp.minimum(fl_x.astype(jnp.int32), m - 1) + 1
    elif mode == "constant":
        if cubic == "bspline":
            # scipy's legacy 'constant': in-bounds coordinates sample
            # the MIRROR-extended spline (three reflected rings cover
            # the edge taps); out-of-bounds coordinates hard-cut to
            # cval.
            img = jnp.pad(image, 3, mode="reflect")
            outside = (cy < 0) | (cy > n - 1) | (cx < 0) | (cx > m - 1)
            cyc = jnp.clip(cy, 0.0, n - 1.0)
            cxc = jnp.clip(cx, 0.0, m - 1.0)
        else:
            # Three cval rings cover taps of positions out to 2 px
            # outside (where scipy still blends partial cval); beyond,
            # every tap is outside -> masked to pure cval.
            img = jnp.pad(image, 3, constant_values=cval)
            outside = ((cy <= -2) | (cy >= n + 1)
                       | (cx <= -2) | (cx >= m + 1))
            cyc = jnp.clip(cy, -2, n + 1)
            cxc = jnp.clip(cx, -2, m + 1)
        fl_y = jnp.floor(cyc)
        fl_x = jnp.floor(cxc)
        fy = (cyc - fl_y).astype(image.dtype)
        fx = (cxc - fl_x).astype(image.dtype)
        ty = jnp.minimum(fl_y.astype(jnp.int32), n) + 2
        tx = jnp.minimum(fl_x.astype(jnp.int32), m) + 2
    else:
        raise NotImplementedError(f"mode={mode!r}")

    img_p = _pad_to(img, _WR * _NB, _WC * _NC)
    ch, cw = ty.shape
    ty_p = _pad_to(ty, _TR, _TC, edge=True)
    tx_p = _pad_to(tx, _TR, _TC, edge=True)
    fy_p = _pad_to(fy, _TR, _TC, edge=True)
    fx_p = _pad_to(fx, _TR, _TC, edge=True)
    out = _warp_core(img_p, ty_p, tx_p, fy_p, fx_p, interpret,
                     taps=4, cubic=cubic)[:ch, :cw]
    if mode == "constant":
        out = jnp.where(outside, jnp.asarray(cval, out.dtype), out)
    return out.reshape(out_shape)
