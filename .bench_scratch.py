import time, numpy as np
import jax, jax.numpy as jnp

N = 4096
rng = np.random.default_rng(0)
x2 = jax.device_put(rng.normal(size=(2, N, N)).astype(np.float32))

def rep(name, f, *a, n=8):
    float(f(*a))
    t0=time.perf_counter()
    for _ in range(n): float(f(*a))
    print(f"{name}: {(time.perf_counter()-t0)/n*1000:.0f} ms", flush=True)

def perm(x):
    n = x.shape[-1]
    pairs = x.reshape(x.shape[:-1] + (n//2, 2))
    return jnp.concatenate([pairs[..., 0], pairs[..., 1][..., ::-1]], -1)

def dct_rfft(x):
    n = x.shape[-1]
    v = perm(x)
    Fh = jnp.fft.rfft(v)
    k = jnp.arange(n//2+1, dtype=x.dtype)
    W = jnp.exp(-1j*jnp.pi*k/(2*n)).astype(Fh.dtype)
    lo = 2*(Fh*W).real
    k2 = jnp.arange(n//2+1, n, dtype=x.dtype)
    W2 = jnp.exp(-1j*jnp.pi*k2/(2*n)).astype(Fh.dtype)
    src = Fh[..., 1:n-n//2][..., ::-1].conj()
    hi = 2*(src*W2).real
    return jnp.concatenate([lo, hi], -1)

def dct_cfft(x):
    n = x.shape[-1]
    v = perm(x)
    F = jnp.fft.fft(v.astype(jnp.complex64))
    k = jnp.arange(n, dtype=x.dtype)
    W = jnp.exp(-1j*jnp.pi*k/(2*n)).astype(F.dtype)
    return 2*(F*W).real

def d2(f, x):
    return jnp.swapaxes(f(jnp.swapaxes(f(x), -1, -2)), -1, -2)

rep("dct2n rfft-based", jax.jit(lambda z: d2(dct_rfft, z).sum()), x2)
rep("dct2n cfft-based", jax.jit(lambda z: d2(dct_cfft, z).sum()), x2)

# 2D-fused DCT: one fft2 + mirror
def dct2d_fused(x):
    n1, n2 = x.shape[-2:]
    v = perm(jnp.swapaxes(perm(x), -1, -2))
    v = jnp.swapaxes(v, -1, -2)
    F = jnp.fft.fft2(v.astype(jnp.complex64))
    k1 = jnp.arange(n1, dtype=x.dtype)[:, None]
    k2 = jnp.arange(n2, dtype=x.dtype)[None, :]
    W1 = jnp.exp(-1j*jnp.pi*k1/(2*n1))
    W2 = jnp.exp(-1j*jnp.pi*k2/(2*n2))
    Fm = jnp.roll(jnp.flip(F, axis=-2), 1, axis=-2).conj()
    return 2*(W1*(W2*F + W2.conj()*Fm)).real

rep("dct2n 2d-fused", jax.jit(lambda z: dct2d_fused(z).sum()), x2)

# check correctness vs scipy on small
from scipy.fft import dctn
xs = rng.normal(size=(8, 12)).astype(np.float64)
import jax
a = np.asarray(jax.device_get(dct2d_fused(jnp.asarray(xs, jnp.float32))))
print("2d-fused max err vs scipy:", np.abs(a - dctn(xs)).max() / np.abs(dctn(xs)).max(), flush=True)
