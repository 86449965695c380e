"""Fourier-domain building blocks: Gaussian multipliers, FFT-based DCT,
Moisan periodic-plus-smooth decomposition, FFT smoothing, Wiener filter.

TPUs have fast batched complex FFTs but no native DCT; the DCT-II /
inverse pair here uses the Makhoul length-N permutation + twiddle trick
so a 2D DCT costs exactly one complex FFT per axis. All functions are
jittable and dtype-preserving (float32 by default, float64 with x64).

Reference behavior replaced:
 - scipy.ndimage.fourier_gaussian      -> fourier_gaussian_multiplier
 - scipy.fft.dctn / idctn              -> dct2n / idct2n
 - moisan2011.per                      -> moisan_per
   (used at /root/reference/pyGPA/geometric_phase_analysis.py:429)
 - scipy.ndimage.gaussian_filter       -> gaussian_filter_fft
 - skimage.restoration.wiener          -> wiener_deconvolve
   (used at /root/reference/pyGPA/geometric_phase_analysis.py:901-903)
"""
import numpy as np
import jax
import jax.numpy as jnp


def _real_dtype(dtype):
    return jnp.finfo(dtype).dtype if jnp.issubdtype(dtype, jnp.floating) \
        else jnp.zeros((), dtype).real.dtype


def fourier_gaussian_multiplier(shape, sigma, dtype=jnp.float32,
                                shift=(0.0, 0.0)):
    """Fourier-domain Gaussian window exp(-2 pi^2 sigma^2 |f + shift|^2).

    Equals scipy.ndimage.fourier_gaussian's multiplier on an fft2 grid
    (used at geometric_phase_analysis.py:44,75,87). `shift` evaluates
    the analytic Gaussian at frequencies offset by a (possibly
    fractional) k-vector — the key to the single-FFT WFR sweep in
    ops/wfr.py.
    """
    fx = jnp.fft.fftfreq(shape[0]).astype(dtype) + shift[0]
    fy = jnp.fft.fftfreq(shape[1]).astype(dtype) + shift[1]
    arg = fx[:, None] ** 2 + fy[None, :] ** 2
    s2 = jnp.asarray(2.0 * np.pi ** 2, dtype) * jnp.asarray(sigma, dtype) ** 2
    return jnp.exp(-s2 * arg)


# --- MXU (matmul) FFT --------------------------------------------------
# XLA's TPU FFT runs on the VPU at a fraction of peak; a radix-split
# Cooley-Tukey FFT expressed as two batched matmuls against small DFT
# matrices runs on the systolic array instead (~5x for the DCT sizes
# the CG unwrapper uses). Exact to f32/f64 rounding (HIGHEST precision).

_MXU_FFT_RADIX = 64
_MXU_FFT_MIN = 512  # below this the VPU FFT wins (dispatch/GEMM setup)

# Matmul precision of the MXU FFT/DCT stages. HIGHEST is float32-exact
# (6 bf16 MXU passes); HIGH (bf16x3, ~1e-7 relative) halves the cost of
# the transform-bound CG preconditioner. The unwrap solver switches to
# HIGH locally (solvers/unwrap.py); the public dct2n/idct2n default to
# exact.
_MXU_FFT_PRECISION = jax.lax.Precision.HIGHEST


class mxu_fft_precision:
    """Context manager scoping the MXU FFT/DCT matmul precision."""

    def __init__(self, precision):
        self.precision = precision

    def __enter__(self):
        global _MXU_FFT_PRECISION
        self.saved = _MXU_FFT_PRECISION
        _MXU_FFT_PRECISION = self.precision
        return self

    def __exit__(self, *exc):
        global _MXU_FFT_PRECISION
        _MXU_FFT_PRECISION = self.saved
        return False


def _mxu_fft_supported(n):
    return n >= _MXU_FFT_MIN and n % _MXU_FFT_RADIX == 0


def _mxu_fft_factors(n, dtype, inverse):
    n1 = _MXU_FFT_RADIX
    n2 = n // n1
    sgn = 2.0 if inverse else -2.0
    a1 = sgn * np.pi * np.outer(np.arange(n1), np.arange(n1)) / n1
    a2 = sgn * np.pi * np.outer(np.arange(n2), np.arange(n2)) / n2
    tw = sgn * np.pi * np.outer(np.arange(n1), np.arange(n2)) / n
    f = np.float64 if dtype == jnp.float64 else np.float32
    return (np.cos(a1).astype(f), np.sin(a1).astype(f),
            np.cos(a2).astype(f), np.sin(a2).astype(f),
            np.cos(tw).astype(f), np.sin(tw).astype(f))


def _mxu_fft_real(v):
    """Forward FFT along the last axis of a real array via two MXU
    matmuls (Cooley-Tukey n = 64 * n/64). Returns (Re F, Im F)."""
    n = v.shape[-1]
    dt = v.dtype
    W1c, W1s, W2c, W2s, Twc, Tws = _mxu_fft_factors(n, dt, False)
    hi = _MXU_FFT_PRECISION
    n1 = _MXU_FFT_RADIX
    xr = v.reshape(v.shape[:-1] + (n1, n // n1))           # (j1, j2)
    Ar = jnp.einsum("kj,...jm->...km", W1c, xr, precision=hi)
    Ai = jnp.einsum("kj,...jm->...km", W1s, xr, precision=hi)
    Br = Ar * Twc - Ai * Tws
    Bi = Ar * Tws + Ai * Twc
    Cr = (jnp.einsum("...kj,jm->...km", Br, W2c, precision=hi)
          - jnp.einsum("...kj,jm->...km", Bi, W2s, precision=hi))
    Ci = (jnp.einsum("...kj,jm->...km", Br, W2s, precision=hi)
          + jnp.einsum("...kj,jm->...km", Bi, W2c, precision=hi))
    # output index k = k1 + k2*n1 -> transpose (k2, k1) and flatten
    out_shape = v.shape
    Fr = jnp.swapaxes(Cr, -1, -2).reshape(out_shape)
    Fi = jnp.swapaxes(Ci, -1, -2).reshape(out_shape)
    return Fr, Fi


def _mxu_ifft_real_out(Fr, Fi):
    """Real part of the inverse FFT along the last axis of (Fr + i Fi),
    via MXU matmuls (the final stage only computes the real part)."""
    n = Fr.shape[-1]
    dt = Fr.dtype
    W1c, W1s, W2c, W2s, Twc, Tws = _mxu_fft_factors(n, dt, True)
    hi = _MXU_FFT_PRECISION
    n1 = _MXU_FFT_RADIX
    xr = Fr.reshape(Fr.shape[:-1] + (n1, n // n1))
    xi = Fi.reshape(Fi.shape[:-1] + (n1, n // n1))
    Ar = (jnp.einsum("kj,...jm->...km", W1c, xr, precision=hi)
          - jnp.einsum("kj,...jm->...km", W1s, xi, precision=hi))
    Ai = (jnp.einsum("kj,...jm->...km", W1s, xr, precision=hi)
          + jnp.einsum("kj,...jm->...km", W1c, xi, precision=hi))
    Br = Ar * Twc - Ai * Tws
    Bi = Ar * Tws + Ai * Twc
    vr = (jnp.einsum("...kj,jm->...km", Br, W2c, precision=hi)
          - jnp.einsum("...kj,jm->...km", Bi, W2s, precision=hi))
    return jnp.swapaxes(vr, -1, -2).reshape(Fr.shape) / n


def dct2_1d(x):
    """Unnormalized DCT-II along the last axis (== scipy.fft.dct, norm=None).

    Makhoul's single-FFT algorithm: permute to v = [x0, x2, ..., x3, x1],
    FFT, twiddle by exp(-i pi k / 2n), keep 2*Re. For even lengths the
    even/odd split is a reshape (one layout pass) instead of two strided
    gathers — strided memory ops are slow on TPU. Radix-64-compatible
    lengths use the MXU matmul FFT.
    """
    n = x.shape[-1]
    if n % 2 == 0:
        pairs = x.reshape(x.shape[:-1] + (n // 2, 2))
        v = jnp.concatenate([pairs[..., 0], pairs[..., 1][..., ::-1]],
                            axis=-1)
    else:
        v = jnp.concatenate([x[..., ::2], x[..., 1::2][..., ::-1]],
                            axis=-1)
    k = jnp.arange(n, dtype=_real_dtype(x.dtype))
    if _mxu_fft_supported(n):
        Fr, Fi = _mxu_fft_real(v)
        Wc = jnp.cos(jnp.pi * k / (2 * n))
        Ws = jnp.sin(jnp.pi * k / (2 * n))
        return 2 * (Fr * Wc + Fi * Ws)   # 2 Re(F * exp(-i pi k/2n))
    F = jnp.fft.fft(v)
    W = jnp.exp(-1j * jnp.pi * k / (2 * n)).astype(F.dtype)
    return 2 * (F * W).real


def idct2_1d(y):
    """Exact inverse of dct2_1d (== scipy.fft.idct, type 2, norm=None)."""
    n = y.shape[-1]
    k = jnp.arange(n, dtype=_real_dtype(y.dtype))
    # G_k = (y_k - i y_{n-k}) / 2 with y_n := 0
    ynk = jnp.concatenate([jnp.zeros_like(y[..., :1]), y[..., :0:-1]], axis=-1)
    if _mxu_fft_supported(n):
        Wc = jnp.cos(jnp.pi * k / (2 * n))
        Ws = jnp.sin(jnp.pi * k / (2 * n))
        Fr = (y * Wc + ynk * Ws) * 0.5
        Fi = (y * Ws - ynk * Wc) * 0.5
        v = _mxu_ifft_real_out(Fr, Fi)
        half = (n + 1) // 2
        return jnp.stack([v[..., :half], v[..., half:][..., ::-1]],
                         axis=-1).reshape(y.shape)
    G = (y - 1j * ynk) * 0.5
    F = G * jnp.exp(1j * jnp.pi * k / (2 * n)).astype(G.dtype)
    v = jnp.fft.ifft(F).real
    half = (n + 1) // 2
    if n % 2 == 0:
        # interleave via stack+reshape (one layout pass, no strided
        # scatter): x[2j] = v[j], x[2j+1] = v[n-1-j]
        x = jnp.stack([v[..., :half], v[..., half:][..., ::-1]],
                      axis=-1).reshape(y.shape)
    else:
        x = jnp.zeros_like(y)
        x = x.at[..., ::2].set(v[..., :half])
        x = x.at[..., 1::2].set(v[..., half:][..., ::-1])
    return x


# --- axis(-2) DCT without transposes ------------------------------------
# Full-array (N, M) transposes are expensive relayouts on TPU; the MXU
# contraction can run along the sublane axis directly, keeping the lane
# (minor) dimension contiguous throughout.

def _perm_axis2(x):
    """Makhoul even/odd permutation along axis -2 (even length)."""
    n = x.shape[-2]
    pairs = x.reshape(x.shape[:-2] + (n // 2, 2, x.shape[-1]))
    return jnp.concatenate([pairs[..., 0, :],
                            jnp.flip(pairs[..., 1, :], axis=-2)], axis=-2)


def _dct2_axis2_mxu(x):
    """DCT-II along axis -2 via MXU matmuls, no full transposes."""
    n = x.shape[-2]
    dt = x.dtype
    W1c, W1s, W2c, W2s, Twc, Tws = _mxu_fft_factors(n, dt, False)
    hi = _MXU_FFT_PRECISION
    n1 = _MXU_FFT_RADIX
    v = _perm_axis2(x)
    xr = v.reshape(v.shape[:-2] + (n1, n // n1, v.shape[-1]))  # j1 j2 m
    Ar = jnp.einsum("kj,...jnm->...knm", W1c, xr, precision=hi)
    Ai = jnp.einsum("kj,...jnm->...knm", W1s, xr, precision=hi)
    Tc = Twc[:, :, None]
    Ts = Tws[:, :, None]
    Br = Ar * Tc - Ai * Ts
    Bi = Ar * Ts + Ai * Tc
    Cr = (jnp.einsum("...kjm,jl->...klm", Br, W2c, precision=hi)
          - jnp.einsum("...kjm,jl->...klm", Bi, W2s, precision=hi))
    Ci = (jnp.einsum("...kjm,jl->...klm", Br, W2s, precision=hi)
          + jnp.einsum("...kjm,jl->...klm", Bi, W2c, precision=hi))
    # output index k = k1 + k2*n1: swap the two small factor axes
    Fr = jnp.swapaxes(Cr, -3, -2).reshape(x.shape)
    Fi = jnp.swapaxes(Ci, -3, -2).reshape(x.shape)
    k = jnp.arange(n, dtype=_real_dtype(dt))[:, None]
    Wc = jnp.cos(jnp.pi * k / (2 * n))
    Ws = jnp.sin(jnp.pi * k / (2 * n))
    return 2 * (Fr * Wc + Fi * Ws)


def _idct2_axis2_mxu(y):
    """Inverse DCT-II along axis -2 via MXU matmuls."""
    n = y.shape[-2]
    dt = y.dtype
    W1c, W1s, W2c, W2s, Twc, Tws = _mxu_fft_factors(n, dt, True)
    hi = _MXU_FFT_PRECISION
    n1 = _MXU_FFT_RADIX
    k = jnp.arange(n, dtype=_real_dtype(dt))[:, None]
    ynk = jnp.concatenate([jnp.zeros_like(y[..., :1, :]),
                           jnp.flip(y[..., 1:, :], axis=-2)], axis=-2)
    Wc = jnp.cos(jnp.pi * k / (2 * n))
    Ws = jnp.sin(jnp.pi * k / (2 * n))
    Fr = (y * Wc + ynk * Ws) * 0.5
    Fi = (y * Ws - ynk * Wc) * 0.5
    xr = Fr.reshape(Fr.shape[:-2] + (n1, n // n1, Fr.shape[-1]))
    xi = Fi.reshape(Fi.shape[:-2] + (n1, n // n1, Fi.shape[-1]))
    Ar = (jnp.einsum("kj,...jnm->...knm", W1c, xr, precision=hi)
          - jnp.einsum("kj,...jnm->...knm", W1s, xi, precision=hi))
    Ai = (jnp.einsum("kj,...jnm->...knm", W1s, xr, precision=hi)
          + jnp.einsum("kj,...jnm->...knm", W1c, xi, precision=hi))
    Tc = Twc[:, :, None]
    Ts = Tws[:, :, None]
    Br = Ar * Tc - Ai * Ts
    Bi = Ar * Ts + Ai * Tc
    vr = (jnp.einsum("...kjm,jl->...klm", Br, W2c, precision=hi)
          - jnp.einsum("...kjm,jl->...klm", Bi, W2s, precision=hi))
    v = jnp.swapaxes(vr, -3, -2).reshape(y.shape) / n
    half = (n + 1) // 2
    return jnp.stack([v[..., :half, :],
                      jnp.flip(v[..., half:, :], axis=-2)],
                     axis=-2).reshape(y.shape[:-2] + (n, y.shape[-1]))


# Single-pass Pallas DCT (ops/pallas_dct2) on/off switch.
_PALLAS_DCT2 = True


def _pallas_dct_ok(n):
    """Single-pass Pallas DCT (ops/pallas_dct2): direct two-stage MXU
    factorization of the DCT matrix, one HBM read + write per
    transform — no permutation, twiddle or digit-transpose passes.
    Measured in the vmapped CG while_loop on v5e: wins at 4096
    (27 vs 37 ms/iteration) but loses to the fused XLA chain below
    (per-launch overhead dominates: 4.9 vs 1.1 ms at 1024), so the
    production gate is size-dependent."""
    from ..ops import pallas_dct2
    return (_PALLAS_DCT2 and jax.default_backend() == "tpu"
            and n >= 4096 and pallas_dct2.supported(n))


def dct2n(x):
    """2D DCT-II over the last two axes (== scipy.fft.dctn, norm=None).
    On TPU, power-of-two axes from 1024 up run as single-pass Pallas
    kernels (ops/pallas_dct2) at the scoped MXU precision
    (_MXU_FFT_PRECISION); other sizes use the Makhoul + radix-matmul
    XLA path (axis -2 contracts along sublanes — no transposes)."""
    from ..ops import pallas_dct2
    if _pallas_dct_ok(x.shape[-1]):
        x = pallas_dct2.dct_lane(x, precision=_MXU_FFT_PRECISION)
    else:
        x = dct2_1d(x)
    if _pallas_dct_ok(x.shape[-2]):
        return pallas_dct2.dct_sub(x, precision=_MXU_FFT_PRECISION)
    if _mxu_fft_supported(x.shape[-2]) and x.shape[-2] % 2 == 0:
        return _dct2_axis2_mxu(x)
    return jnp.swapaxes(dct2_1d(jnp.swapaxes(x, -1, -2)), -1, -2)


def idct2n(x):
    """2D inverse DCT-II over the last two axes (== scipy.fft.idctn)."""
    from ..ops import pallas_dct2
    if _pallas_dct_ok(x.shape[-2]):
        x = pallas_dct2.idct_sub(x, precision=_MXU_FFT_PRECISION)
    elif _mxu_fft_supported(x.shape[-2]) and x.shape[-2] % 2 == 0:
        x = _idct2_axis2_mxu(x)
    else:
        x = jnp.swapaxes(idct2_1d(jnp.swapaxes(x, -1, -2)), -1, -2)
    if _pallas_dct_ok(x.shape[-1]):
        return pallas_dct2.idct_lane(x, precision=_MXU_FFT_PRECISION)
    return idct2_1d(x)


def moisan_per(image, inverse_dft=True):
    """Moisan periodic-plus-smooth decomposition image = p + s.

    Removes the cross artefact that non-periodic boundaries leave in the
    DFT, so Bragg-peak detection sees clean peaks. In-repo replacement
    for moisan2011.per (geometric_phase_analysis.py:8,429). The smooth
    component solves a discrete Laplace equation driven by the boundary
    jumps; its DFT is the boundary image's DFT divided by the Laplacian
    symbol.

    With inverse_dft=False returns (p_dft, s_dft); otherwise (p, s).

    Reference: L. Moisan, "Periodic plus smooth image decomposition",
    J. Math. Imaging Vis. 39, 161-179 (2011).
    """
    image = jnp.asarray(image)
    m, n = image.shape[-2:]
    dt = _real_dtype(image.dtype)
    arg_m = (2 * jnp.pi * jnp.fft.fftfreq(m)).astype(dt)
    arg_n = (2 * jnp.pi * jnp.fft.fftfreq(n)).astype(dt)
    cos_m, sin_m = jnp.cos(arg_m), jnp.sin(arg_m)
    cos_n, sin_n = jnp.cos(arg_n), jnp.sin(arg_n)

    # boundary image: v[0,:] = u[-1,:]-u[0,:], v[-1,:] = -(u[-1,:]-u[0,:])
    # whose DFT along axis 0 is fft(w1) * (1 - exp(2 pi i q/m))
    w1 = image[..., -1, :] - image[..., 0, :]
    v_dft = jnp.fft.fft(w1)[..., None, :] * \
        (1.0 - cos_m - 1j * sin_m)[:, None]
    w2 = image[..., :, -1] - image[..., :, 0]
    v_dft = v_dft + jnp.fft.fft(w2)[..., :, None] * \
        (1.0 - cos_n - 1j * sin_n)[None, :]

    denom = 2.0 * (cos_m[:, None] + cos_n[None, :] - 2.0)
    denom = denom.at[0, 0].set(1.0)
    s_dft = v_dft / denom
    s_dft = s_dft.at[..., 0, 0].set(0.0)
    p_dft = jnp.fft.fft2(image) - s_dft
    if inverse_dft:
        return jnp.fft.ifft2(p_dft).real, jnp.fft.ifft2(s_dft).real
    return p_dft, s_dft


def gaussian_filter_fft(image, sigma):
    """Gaussian smoothing via Fourier multiplication (circular boundary).

    Replaces scipy.ndimage.gaussian_filter on the smoothed-|FFT| images
    of peak detection (geometric_phase_analysis.py:432-434), where the
    data is already near-periodic so circular boundary handling is
    appropriate and the whole op stays on device as FFT*mult*iFFT.
    """
    image = jnp.asarray(image)
    mult = fourier_gaussian_multiplier(image.shape[-2:], sigma,
                                       _real_dtype(image.dtype))
    return jnp.fft.ifft2(jnp.fft.fft2(image) * mult).real


def laplacian_transfer(shape, dtype=jnp.float32):
    """DFT transfer function of the (periodic) 5-point Laplacian with
    center 4 and neighbors -1 — exactly skimage.restoration.uft.
    laplacian's convention, so the reference's balance=5000 transfers
    unchanged (geometric_phase_analysis.py:892-904)."""
    fx = jnp.fft.fftfreq(shape[0]).astype(dtype)
    fy = jnp.fft.fftfreq(shape[1]).astype(dtype)
    lap = (2 * jnp.cos(2 * jnp.pi * fx)[:, None]
           + 2 * jnp.cos(2 * jnp.pi * fy)[None, :] - 4.0)
    return -lap  # positive semi-definite, peak 8 at Nyquist


def wiener_deconvolve(image, transfer, balance):
    """Tikhonov-regularized Wiener deconvolution in the Fourier domain.

    x_hat = IFFT[ conj(H) / (|H|^2 + balance |L|^2) FFT(y) ] with the
    Laplacian regularizer L, the same estimator
    skimage.restoration.wiener computes (used by gaussian_deconvolve,
    geometric_phase_analysis.py:892-904). `transfer` is the real DFT of
    the blur kernel on this grid.
    """
    image = jnp.asarray(image)
    L = laplacian_transfer(image.shape[-2:], _real_dtype(image.dtype))
    H = transfer
    filt = H / (H * H + balance * L * L)
    return jnp.fft.ifft2(jnp.fft.fft2(image) * filt).real


def fftbounds(n, d=1):
    """Frequency bin edges for pcolormesh-style plotting
    (imagetools.py:22-26). Host-side numpy."""
    r = np.fft.fftshift(np.fft.fftfreq(n, d))
    return np.append(r, r[-1] + 1 / (n * d))
