"""Fully-fused zoom-sweep kernel: both DFT matmul stages + |.|^2 +
argmax tournament in one pallas_call.

The zoom WFR sweep (ops/wfr.py:_wfr_sweep_zoom) evaluates each
candidate's full-resolution lock-in M_w as two skinny DFT matmuls
applied to the bandpassed spectrum window — the TPU-native form of the
reference's per-candidate iFFT loop (optwfr2,
/root/reference/pyGPA/geometric_phase_analysis.py:669-686). Both
intermediates are pure scratch:

 - the (C, N, W1) first-stage partials (~300 MB/sweep at 4096^2);
 - the (C, N, M) candidate planes (~19 GB/sweep) that are squared,
   compared against the running best, and discarded.

This kernel materializes neither. Grid (N/ROWS, M/128), row-major: at
each new row block (c == 0) it computes the C first-stage partials
T_i = A0[r] @ (gx_i * S * gy_i) into one VMEM scratch laid out as
(C*ROWS, 2*W1) holding [Re T_i | Im T_i] row-blocks; every column step
then evaluates ALL candidates with TWO dot_generals — the complex
second stage collapses to real matmuls against [A1c | A1s] /
[A1s | -A1c]... i.e. (C*ROWS, 2W1) @ (2W1, 128), a 512-deep
contraction with M = C*ROWS ~ 4-6k that keeps the MXU saturated
instead of 4*C skinny dots — followed by the where-tournament into
the four carry planes. Per sweep the only HBM traffic is the carries
(read+write once), the A0/A1 basis blocks, and the tiny spectrum
window; the whole sweep is ONE kernel launch per Bragg peak.

Matmul precision: HIGHEST (float32-exact, 6 MXU passes) or HIGH,
implemented in-kernel as explicit bf16x3 (split each operand into
bf16 high+low parts, 3 native passes, ~1e-7 relative error) because
Mosaic's dot lowering has no HIGH mode. The sweep is MXU-bound
(~1.2 TFLOP/sweep at 4096^2, 36 candidates), so HIGH is the
production default in ops/wfr.py, accuracy-gated by the
reference-tolerance pipeline tests and tests/test_tpu_hardware.py.
"""
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS = 128   # output row-block (second-stage M rows per grid step)
_COLS = 256   # output column-block (second-stage N per dot)


def _dot_maker(precision):
    """Return dot(a, b, dims) at the requested effective precision.
    HIGH = explicit bf16x3 (Mosaic lowers only DEFAULT/HIGHEST)."""
    if precision == jax.lax.Precision.HIGH:
        def raw(a, b, dims):
            return jax.lax.dot_general(
                a, b, dims, precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32)

        def split(x):
            hi = x.astype(jnp.bfloat16)
            lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            return hi, lo

        def dot(a, b, dims):
            ahi, alo = split(a)
            bhi, blo = split(b)
            return (raw(ahi, bhi, dims) + raw(ahi, blo, dims)
                    + raw(alo, bhi, dims))
        return dot

    def dot(a, b, dims):
        return jax.lax.dot_general(a, b, dims, precision=precision,
                                   preferred_element_type=jnp.float32)
    return dot


_D01 = (((1,), (0,)), ((), ()))   # contract a's last with b's first
_D11 = (((1,), (1,)), ((), ()))   # contract both last dims


def _split_bf16(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _kernel(sr_ref, si_ref, gx_ref, gy_ref, a0c_ref, a0s_ref,
            b1r_ref, b1i_ref, base_ref,
            ba_ref, br_ref, bi_ref, bx_ref,
            oa_ref, or_ref, oi_ref, ox_ref,
            ph_ref, w_ref,
            t_ref, tlo_ref, *, precision, emit_dr):
    C = gx_ref.shape[0]
    R = a0c_ref.shape[0]
    W1 = sr_ref.shape[1]
    high = precision == jax.lax.Precision.HIGH
    dot = _dot_maker(precision)

    @pl.when(pl.program_id(1) == 0)
    def _stage1():
        sr = sr_ref[:]                    # (W0, W1) pre-scaled window
        si = si_ref[:]
        a0c = a0c_ref[:]                  # (R, W0) row basis block
        a0s = a0s_ref[:]
        for i in range(C):
            g = gx_ref[i][:, None] * gy_ref[i][None, :]
            swr = g * sr
            swi = g * si
            # T_i = (A0c + i A0s) @ (swr + i swi); contraction over W0
            tr = dot(a0c, swr, _D01) - dot(a0s, swi, _D01)
            ti = dot(a0c, swi, _D01) + dot(a0s, swr, _D01)
            if high:
                # store bf16 hi/lo once — the per-step second stage
                # then reads half the bytes and skips re-splitting
                rhi, rlo = _split_bf16(tr)
                ihi, ilo = _split_bf16(ti)
                t_ref[i * R:(i + 1) * R, :W1] = rhi
                t_ref[i * R:(i + 1) * R, W1:] = ihi
                tlo_ref[i * R:(i + 1) * R, :W1] = rlo
                tlo_ref[i * R:(i + 1) * R, W1:] = ilo
            else:
                t_ref[i * R:(i + 1) * R, :W1] = tr
                t_ref[i * R:(i + 1) * R, W1:] = ti

    # second stage for ALL candidates in two deep dots:
    #   Re M = Tr @ A1c^T - Ti @ A1s^T = [Tr|Ti] @ [A1c|-A1s]^T
    #   Im M = Tr @ A1s^T + Ti @ A1c^T = [Tr|Ti] @ [A1s| A1c]^T
    # b1r/b1i blocks arrive pre-concatenated as (128, 2*W1).
    base = base_ref[0]
    if high:
        def raw(a, b):
            return jax.lax.dot_general(
                a, b, _D11, precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32)

        thi = t_ref[:]                    # (C*R, 2*W1) bf16
        tlo = tlo_ref[:]
        b1r_hi, b1r_lo = _split_bf16(b1r_ref[:])
        b1i_hi, b1i_lo = _split_bf16(b1i_ref[:])
        # PASS A — winner search at single-pass bf16 (the argmax does
        # not need exact amplitudes; ties between near-identical
        # candidates may flip, which the reference's own float64
        # rounding also permits)
        mall_r = raw(thi, b1r_hi)
        mall_i = raw(thi, b1i_hi)
        ba = ba_ref[:]
        bx = bx_ref[:]
        for i in range(C):
            mr = mall_r[i * R:(i + 1) * R]
            mi = mall_i[i * R:(i + 1) * R]
            absq = mr * mr + mi * mi
            sel = absq > ba
            ba = jnp.where(sel, absq, ba)
            bx = jnp.where(sel, base + i, bx)
        ox_ref[:] = bx
        # PASS B — exact bf16x3 recompute of ONLY the candidates that
        # won somewhere in this tile (typically 1-3 of C): 1 + ~3*3/C
        # effective MXU passes instead of 3.
        oa_ref[:] = ba_ref[:]
        or_ref[:] = br_ref[:]
        oi_ref[:] = bi_ref[:]
        for i in range(C):
            sel = bx == base + i

            @pl.when(jnp.any(sel))
            def _recompute(i=i, sel=sel):
                sl = slice(i * R, (i + 1) * R)
                mr = (raw(thi[sl], b1r_hi) + raw(thi[sl], b1r_lo)
                      + raw(tlo[sl], b1r_hi))
                mi = (raw(thi[sl], b1i_hi) + raw(thi[sl], b1i_lo)
                      + raw(tlo[sl], b1i_hi))
                oa_ref[:] = jnp.where(sel, mr * mr + mi * mi,
                                      oa_ref[:])
                or_ref[:] = jnp.where(sel, mr, or_ref[:])
                oi_ref[:] = jnp.where(sel, mi, oi_ref[:])
        _emit(ph_ref, w_ref, oa_ref, or_ref, oi_ref, emit_dr)
        return

    t = t_ref[:]                      # (C*R, 2*W1) f32
    mall_r = dot(t, b1r_ref[:], _D11)     # (C*R, 128)
    mall_i = dot(t, b1i_ref[:], _D11)

    ba = ba_ref[:]
    br = br_ref[:]
    bi = bi_ref[:]
    bx = bx_ref[:]
    for i in range(C):
        mr = mall_r[i * R:(i + 1) * R]
        mi = mall_i[i * R:(i + 1) * R]
        absq = mr * mr + mi * mi
        sel = absq > ba
        ba = jnp.where(sel, absq, ba)
        br = jnp.where(sel, mr, br)
        bi = jnp.where(sel, mi, bi)
        bx = jnp.where(sel, base + i, bx)
    oa_ref[:] = ba
    or_ref[:] = br
    oi_ref[:] = bi
    ox_ref[:] = bx
    _emit(ph_ref, w_ref, oa_ref, or_ref, oi_ref, emit_dr)


# Mosaic has no atan/atan2 lowering; degree-8 polynomial in t^2 fitted
# on Chebyshev nodes — max |err| 1.2e-8 rad over [0, 1], far below the
# pipeline's f32 phase noise. Standard octant reduction handles the
# rest of the plane; atan2(0, 0) returns 0.
_ATAN_C = (0.9999999842426367, -0.33333066780692006,
           0.19992483578501838, -0.14202570511686974,
           0.10636754098042872, -0.07495445443117779,
           0.04258760746266369, -0.016005030501746318,
           0.0028340642985320618)


def _atan2(y, x):
    ay = jnp.abs(y)
    ax = jnp.abs(x)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    t = lo / jnp.where(hi > 0.0, hi, 1.0)
    s = t * t
    poly = jnp.full_like(t, _ATAN_C[-1])
    for c in _ATAN_C[-2::-1]:
        poly = poly * s + c
    r = t * poly
    pi = 3.14159265358979
    r = jnp.where(ay > ax, pi / 2 - r, r)
    r = jnp.where(x < 0.0, pi - r, r)
    return jnp.where(y < 0.0, -r, r)


def _emit(ph_ref, w_ref, oa_ref, or_ref, oi_ref, emit_dr):
    """Optionally write the winner's PHASE and WEIGHT planes directly:
    the pipeline consumes angle(lockin) and sqrt(absq)*(mask+1e-6),
    and computing them here (per tile, values already in VMEM) removes
    three full-size XLA passes per sweep. emit_dr = (dr, n, m) border
    of the interior weight mask (extract_displacement_field's rim,
    reference geometric_phase_analysis.py:923-926), or None."""
    if emit_dr is None:
        return
    dr, n, m = emit_dr
    R, Cc = ph_ref.shape
    r0 = pl.program_id(0) * R
    c0 = pl.program_id(1) * Cc
    ph_ref[:] = _atan2(oi_ref[:], or_ref[:])
    ii = jax.lax.broadcasted_iota(jnp.int32, (R, Cc), 0) + r0
    jj = jax.lax.broadcasted_iota(jnp.int32, (R, Cc), 1) + c0
    interior = ((ii >= dr) & (ii < n - dr)
                & (jj >= dr) & (jj < m - dr))
    mask = jnp.where(interior, 1.0 + 1e-6, 1e-6).astype(w_ref.dtype)
    w_ref[:] = jnp.sqrt(jnp.maximum(oa_ref[:], 0.0)) * mask


@partial(jax.jit,
         static_argnames=("n", "m", "rows", "cols", "precision",
                          "interpret", "emit_dr"))
def fused_zoom_sweep_chunk(Sr, Si, gx, gy, A0c, A0s, B1r, B1i,
                           base_idx, best_absq, best_r, best_i,
                           best_idx, *, n, m, rows=None, cols=None,
                           precision=jax.lax.Precision.HIGHEST,
                           interpret=False, emit_dr=None):
    """Run one chunk of C candidates through the fully-fused sweep,
    updating the four carry planes in place (donated/aliased).

    Sr, Si : (W0, W1) spectrum window, pre-scaled by 1/(n*m).
    gx, gy : (C, W0), (C, W1) per-candidate Gaussian bandpass factors.
    A0c/A0s : (n, W0) row inverse-DFT basis.
    B1r/B1i : (m, 2*W1) pre-concatenated column basis, [A1c | -A1s]
        and [A1s | A1c].
    base_idx : int32 scalar — candidate index of gx[0].
    """
    C = gx.shape[0]
    W0, W1 = Sr.shape
    rows = rows or max(b for b in (8, 64, 128, _ROWS) if n % b == 0)
    cols = cols or max(b for b in (128, _COLS) if m % b == 0)
    grid = (n // rows, m // cols)

    def const(shape):
        return pl.BlockSpec(shape, lambda r, c: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def plane():
        return pl.BlockSpec((rows, cols), lambda r, c: (r, c),
                            memory_space=pltpu.VMEM)

    # phase/weight emission shapes (dummy (8, 128) planes when off)
    ph_shape = (n, m) if emit_dr is not None else (8, 128)
    ph_spec = (plane() if emit_dr is not None
               else pl.BlockSpec((8, 128), lambda r, c: (0, 0),
                                 memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        partial(_kernel, precision=precision, emit_dr=emit_dr),
        grid=grid,
        in_specs=[const((W0, W1)), const((W0, W1)),
                  const((C, W0)), const((C, W1)),
                  pl.BlockSpec((rows, W0), lambda r, c: (r, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((rows, W0), lambda r, c: (r, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((cols, 2 * W1), lambda r, c: (c, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((cols, 2 * W1), lambda r, c: (c, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  plane(), plane(), plane(), plane()],
        out_specs=(plane(), plane(), plane(), plane(),
                   ph_spec, ph_spec),
        out_shape=(jax.ShapeDtypeStruct((n, m), best_absq.dtype),
                   jax.ShapeDtypeStruct((n, m), best_r.dtype),
                   jax.ShapeDtypeStruct((n, m), best_i.dtype),
                   jax.ShapeDtypeStruct((n, m), best_idx.dtype),
                   jax.ShapeDtypeStruct(ph_shape, best_absq.dtype),
                   jax.ShapeDtypeStruct(ph_shape, best_absq.dtype)),
        input_output_aliases={9: 0, 10: 1, 11: 2, 12: 3},
        scratch_shapes=[
            pltpu.VMEM((C * rows, 2 * W1),
                       jnp.bfloat16 if precision ==
                       jax.lax.Precision.HIGH else jnp.float32),
            pltpu.VMEM((C * rows, 2 * W1) if precision ==
                       jax.lax.Precision.HIGH else (8, 128),
                       jnp.bfloat16)],
        # the candidate partials live in VMEM scratch for the whole
        # row block — budget beyond the 16MB default (v5e has 128MB)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(Sr, Si, gx, gy, A0c, A0s, B1r, B1i,
      jnp.asarray([base_idx], jnp.int32).reshape(1),
      best_absq, best_r, best_i, best_idx)
    return out


def fused_zoom_sweep(Sr, Si, gx, gy, A0c, A0s, A1c, A1s, *,
                     precision=jax.lax.Precision.HIGHEST,
                     max_chunk=48, interpret=False, emit_dr=None):
    """Whole-sweep driver: splits the P candidates into VMEM-sized
    chunks (unrolled Python loop, one pallas_call each — usually one)
    and returns (best_absq, best_r, best_i, best_idx[, phase, weight]).

    emit_dr = (dr,) emits the winner's phase and the rim-masked weight
    directly from the kernel (only meaningful results on the LAST
    chunk; with one chunk — the production case — always valid)."""
    P = gx.shape[0]
    n = A0c.shape[0]
    m = A1c.shape[0]
    rdt = Sr.dtype
    B1r = jnp.concatenate([A1c, -A1s], axis=1)   # (m, 2*W1)
    B1i = jnp.concatenate([A1s, A1c], axis=1)
    best_absq = jnp.zeros((n, m), rdt)
    best_r = jnp.zeros((n, m), rdt)
    best_i = jnp.zeros((n, m), rdt)
    best_idx = jnp.zeros((n, m), jnp.int32)
    ph = w = None
    for s in range(0, P, max_chunk):
        e = min(s + max_chunk, P)
        last = e >= P
        ed = ((int(emit_dr[0]), n, m)
              if (emit_dr is not None and last) else None)
        best_absq, best_r, best_i, best_idx, ph, w = \
            fused_zoom_sweep_chunk(
                Sr, Si, gx[s:e], gy[s:e], A0c, A0s, B1r, B1i, s,
                best_absq, best_r, best_i, best_idx, n=n, m=m,
                precision=precision, interpret=interpret, emit_dr=ed)
    if emit_dr is not None:
        return best_absq, best_r, best_i, best_idx, ph, w
    return best_absq, best_r, best_i, best_idx
