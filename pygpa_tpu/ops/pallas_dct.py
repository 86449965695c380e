"""Pallas-fused radix stages for the DCT-II / inverse.

The CG unwrapper's preconditioner (solvers.unwrap) is transform-bound:
the XLA lowering of the radix-64 DCT materializes every intermediate
(two complex stages + twiddles — ~6 HBM round trips per transform).
These kernels fuse the whole stage chain in VMEM: one HBM read, one
write per transform pass.

Mosaic constraints shape the split of work:
 - jnp.flip has no TPU lowering -> the Makhoul permutation / mirror /
   interleave stay in XLA (single relayout passes);
 - in-kernel lane-splitting reshapes are unsupported -> inputs arrive
   pre-factored as (..., 64, n/64) *views* (row-major reshapes are
   free in XLA), kernels are pure dot_generals + elementwise twiddles,
   and the final digit transpose happens in XLA.

Separate kernels serve the minor (lane) axis and the second-minor
(sublane) axis so no full-array transpose is ever taken. Used by
core.fourier's dct2n/idct2n on TPU for radix-compatible sizes;
interpret mode keeps CPU tests exact.
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128  # minor factor = lane width: no tile padding in VMEM


def supported(n):
    return n >= 512 and n % (2 * _LANE) == 0


def _factors(n, dtype, inverse):
    """Stage matrices and twiddles; the DCT output modulation is
    provided in (k1, k2)-factored form (flat k = k1 + k2 * n1)."""
    n1 = n // _LANE
    n2 = _LANE
    sgn = 2.0 if inverse else -2.0
    a1 = sgn * np.pi * np.outer(np.arange(n1), np.arange(n1)) / n1
    a2 = sgn * np.pi * np.outer(np.arange(n2), np.arange(n2)) / n2
    tw = sgn * np.pi * np.outer(np.arange(n1), np.arange(n2)) / n
    f = np.dtype(dtype)
    out = [np.asarray(z, f) for z in
           (np.cos(a1), np.sin(a1), np.cos(a2), np.sin(a2),
            np.cos(tw), np.sin(tw))]
    kflat = (np.arange(n1)[:, None] + n1 * np.arange(n2)[None, :])
    kk = np.pi * kflat / (2 * n)
    out += [np.asarray(np.cos(kk), f), np.asarray(np.sin(kk), f)]
    return out


def _interpret():
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------- minor axis

def _fwd_kernel_minor(x_ref, w1c, w1s, w2c, w2s, twc, tws, wc, ws,
                      o_ref):
    """Factored permuted input (R, n1, n2) -> modulated DCT spectrum in
    (k1, k2) digit order (XLA transposes digits afterwards)."""
    xr = x_ref[:]
    hi = jax.lax.Precision.HIGHEST
    Ar = jnp.einsum("kj,rjm->rkm", w1c[:], xr, precision=hi)
    Ai = jnp.einsum("kj,rjm->rkm", w1s[:], xr, precision=hi)
    Br = Ar * twc[:] - Ai * tws[:]
    Bi = Ar * tws[:] + Ai * twc[:]
    Cr = (jnp.einsum("rkj,jl->rkl", Br, w2c[:], precision=hi)
          - jnp.einsum("rkj,jl->rkl", Bi, w2s[:], precision=hi))
    Ci = (jnp.einsum("rkj,jl->rkl", Br, w2s[:], precision=hi)
          + jnp.einsum("rkj,jl->rkl", Bi, w2c[:], precision=hi))
    o_ref[:] = 2 * (Cr * wc[:] + Ci * ws[:])


def _inv_kernel_minor(fr_ref, fi_ref, w1c, w1s, w2c, w2s, twc, tws,
                      o_ref):
    """Factored (Fr, Fi) (R, n1, n2) -> pre-interleave inverse in
    (k1, k2) digit order."""
    xr = fr_ref[:]
    xi = fi_ref[:]
    n = xr.shape[-1] * xr.shape[-2]
    hi = jax.lax.Precision.HIGHEST
    Ar = (jnp.einsum("kj,rjm->rkm", w1c[:], xr, precision=hi)
          - jnp.einsum("kj,rjm->rkm", w1s[:], xi, precision=hi))
    Ai = (jnp.einsum("kj,rjm->rkm", w1s[:], xr, precision=hi)
          + jnp.einsum("kj,rjm->rkm", w1c[:], xi, precision=hi))
    Br = Ar * twc[:] - Ai * tws[:]
    Bi = Ar * tws[:] + Ai * twc[:]
    vr = (jnp.einsum("rkj,jl->rkl", Br, w2c[:], precision=hi)
          - jnp.einsum("rkj,jl->rkl", Bi, w2s[:], precision=hi))
    o_ref[:] = vr * (1.0 / n)


def _row_call(kernel, inputs, n, dtype, rows, consts, rb=16):
    n1 = n // _LANE
    n2 = _LANE
    rb = min(rb, rows)
    pad = (-rows) % rb
    padded = []
    for a in inputs:
        if pad:
            a = jnp.concatenate([a, jnp.zeros((pad, n1, n2), dtype)])
        padded.append(a)
    consts = [jnp.asarray(c) for c in consts]
    cspecs = [pl.BlockSpec(c.shape, lambda i, nd=c.ndim: (0,) * nd,
                           memory_space=pltpu.VMEM) for c in consts]
    out = pl.pallas_call(
        kernel,
        grid=((rows + pad) // rb,),
        in_specs=[pl.BlockSpec((rb, n1, n2), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)
                  for _ in inputs] + cspecs,
        out_specs=pl.BlockSpec((rb, n1, n2), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows + pad, n1, n2), dtype),
        interpret=_interpret(),
    )(*padded, *consts)
    return out[:rows] if pad else out


def _digits_to_flat_minor(c, lead, n):
    """(R, k1, k2) digit order -> flat k = k1 + k2*64 (XLA relayout)."""
    return jnp.swapaxes(c, -1, -2).reshape(lead + (n,))


def dct_stages_minor(v):
    """Fused stages for the minor-axis DCT of permuted input v
    (..., n). Returns the finished DCT."""
    n = v.shape[-1]
    lead = v.shape[:-1]
    n1 = n // _LANE
    vf = v.reshape((-1, n1, _LANE))
    fac = _factors(n, v.dtype, False)
    out = _row_call(_fwd_kernel_minor, [vf], n, v.dtype, vf.shape[0],
                    fac)
    return _digits_to_flat_minor(out, lead, n)


def idct_stages_minor(Fr, Fi):
    """Fused inverse stages; takes flat spectra, returns the
    pre-interleave sequence (flat)."""
    n = Fr.shape[-1]
    lead = Fr.shape[:-1]
    n1 = n // _LANE
    fac = _factors(n, Fr.dtype, True)[:6]
    out = _row_call(_inv_kernel_minor,
                    [Fr.reshape((-1, n1, _LANE)),
                     Fi.reshape((-1, n1, _LANE))],
                    n, Fr.dtype, max(int(np.prod(lead)), 1), fac)
    return _digits_to_flat_minor(out, lead, n)


# ------------------------------------------------------------ sublane axis

def _fwd_kernel_sub(x_ref, w1c, w1s, w2c, w2s, twc, tws, wc, ws, o_ref):
    """Factored permuted input (1, n1, n2, L) -> modulated spectrum in
    (k1, k2) digit order along the leading factor axes."""
    xr = x_ref[0]
    hi = jax.lax.Precision.HIGHEST
    Ar = jnp.einsum("kj,jml->kml", w1c[:], xr, precision=hi)
    Ai = jnp.einsum("kj,jml->kml", w1s[:], xr, precision=hi)
    Tc = twc[:][:, :, None]
    Ts = tws[:][:, :, None]
    Br = Ar * Tc - Ai * Ts
    Bi = Ar * Ts + Ai * Tc
    Cr = (jnp.einsum("kjl,jm->kml", Br, w2c[:], precision=hi)
          - jnp.einsum("kjl,jm->kml", Bi, w2s[:], precision=hi))
    Ci = (jnp.einsum("kjl,jm->kml", Br, w2s[:], precision=hi)
          + jnp.einsum("kjl,jm->kml", Bi, w2c[:], precision=hi))
    o_ref[0] = 2 * (Cr * wc[:][:, :, None] + Ci * ws[:][:, :, None])


def _inv_kernel_sub(fr_ref, fi_ref, w1c, w1s, w2c, w2s, twc, tws,
                    o_ref):
    xr = fr_ref[0]
    xi = fi_ref[0]
    n = xr.shape[0] * xr.shape[1]
    hi = jax.lax.Precision.HIGHEST
    Ar = (jnp.einsum("kj,jml->kml", w1c[:], xr, precision=hi)
          - jnp.einsum("kj,jml->kml", w1s[:], xi, precision=hi))
    Ai = (jnp.einsum("kj,jml->kml", w1s[:], xr, precision=hi)
          + jnp.einsum("kj,jml->kml", w1c[:], xi, precision=hi))
    Tc = twc[:][:, :, None]
    Ts = tws[:][:, :, None]
    Br = Ar * Tc - Ai * Ts
    Bi = Ar * Ts + Ai * Tc
    vr = (jnp.einsum("kjl,jm->kml", Br, w2c[:], precision=hi)
          - jnp.einsum("kjl,jm->kml", Bi, w2s[:], precision=hi))
    o_ref[0] = vr * (1.0 / n)


def _col_call(kernel, inputs, B, n, M, dtype, consts, lanes=128):
    n1 = n // _LANE
    n2 = _LANE
    lb = min(lanes, M)
    pad = (-M) % lb
    padded = []
    for a in inputs:
        if pad:
            a = jnp.concatenate(
                [a, jnp.zeros(a.shape[:-1] + (pad,), dtype)], axis=-1)
        padded.append(a)
    consts = [jnp.asarray(c) for c in consts]
    cspecs = [pl.BlockSpec(c.shape, lambda b, i, nd=c.ndim: (0,) * nd,
                           memory_space=pltpu.VMEM) for c in consts]
    out = pl.pallas_call(
        kernel,
        grid=(B, (M + pad) // lb),
        in_specs=[pl.BlockSpec((1, n1, n2, lb),
                               lambda b, i: (b, 0, 0, i),
                               memory_space=pltpu.VMEM)
                  for _ in inputs] + cspecs,
        out_specs=pl.BlockSpec((1, n1, n2, lb), lambda b, i: (b, 0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n1, n2, M + pad), dtype),
        interpret=_interpret(),
    )(*padded, *consts)
    return out[..., :M] if pad else out


def dct_stages_sub(v):
    """Fused stages for the axis(-2) DCT of permuted input v
    (..., n, M). Returns the finished DCT."""
    n, M = v.shape[-2], v.shape[-1]
    lead = v.shape[:-2]
    n1 = n // _LANE
    n2 = _LANE
    vf = v.reshape((-1, n1, n2, M))
    fac = _factors(n, v.dtype, False)
    out = _col_call(_fwd_kernel_sub, [vf], vf.shape[0], n, M, v.dtype,
                    fac)
    # digits (k1, k2) -> flat k = k1 + k2*64 along axis -2
    out = jnp.swapaxes(out, -3, -2).reshape(lead + (n, M))
    return out


def idct_stages_sub(Fr, Fi):
    n, M = Fr.shape[-2], Fr.shape[-1]
    lead = Fr.shape[:-2]
    n1 = n // _LANE
    n2 = _LANE
    fac = _factors(n, Fr.dtype, True)[:6]
    out = _col_call(_inv_kernel_sub,
                    [Fr.reshape((-1, n1, n2, M)),
                     Fi.reshape((-1, n1, n2, M))],
                    max(int(np.prod(lead)), 1), n, M, Fr.dtype, fac)
    return jnp.swapaxes(out, -3, -2).reshape(lead + (n, M))
