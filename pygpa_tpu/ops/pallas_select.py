"""Pallas fused chunk-selection for the WFR sweep.

After the zoom matmuls produce a chunk of candidate lock-ins
Mr/Mi (C, N, M), the running per-pixel argmax updates 4 carry planes
per candidate — ~75% of the sweep's HBM traffic is those carry
reads/writes (the matmuls themselves are ~4 ms per k-sweep). This
kernel runs the whole chunk tournament per VMEM tile: the candidate
planes are read once, the carry planes are read and written once per
chunk instead of once per candidate.

Pure elementwise compares/selects (no reshapes, flips, or gathers —
all Mosaic-safe). Carries travel as float planes (complex is kept as
separate re/im). Interpret mode keeps CPU tests exact.

Status (measured on v5e): bit-exact against the where-loop
(max|diff| = 0.0 on a 4096^2 sweep) but performance-NEUTRAL — a
standalone 1-k sweep is 264 ms either way, i.e. XLA already fuses
the where-loop's carry traffic into the IFFT/matmul epilogue — and
embedding the kernel in the full-pipeline jit crashed the TPU
compile helper (remote_compile HTTP 500, no diagnostic surfaced).
Hence ops.wfr._PALLAS_SELECT defaults to False; this stays as
tested groundwork for a round-2 fused matmul+select kernel where
the candidate planes never round-trip HBM at all.
"""
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _select_kernel(mr_ref, mi_ref, base_ref, ba_ref, br_ref, bi_ref,
                   bx_ref, oa_ref, or_ref, oi_ref, ox_ref):
    C = mr_ref.shape[0]
    ba = ba_ref[:]
    br = br_ref[:]
    bi = bi_ref[:]
    bx = bx_ref[:]
    base = base_ref[0]
    for i in range(C):
        mr = mr_ref[i]
        mi = mi_ref[i]
        absq = mr * mr + mi * mi
        t = absq > ba
        ba = jnp.where(t, absq, ba)
        br = jnp.where(t, mr, br)
        bi = jnp.where(t, mi, bi)
        bx = jnp.where(t, base + i, bx)
    oa_ref[:] = ba
    or_ref[:] = br
    oi_ref[:] = bi
    ox_ref[:] = bx


def chunk_select(Mr, Mi, base_idx, best_absq, best_r, best_i, best_idx,
                 rows=256):
    """Fused strict-'>' tournament of a candidate chunk against the
    running best planes. Returns updated (absq, re, im, idx)."""
    C, n, m = Mr.shape
    grid = (pl.cdiv(n, rows),)

    def cand(i):
        return pl.BlockSpec((C, rows, m), lambda r: (0, r, 0),
                            memory_space=pltpu.VMEM)

    def plane(i):
        return pl.BlockSpec((rows, m), lambda r: (r, 0),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        _select_kernel,
        grid=grid,
        in_specs=[cand(0), cand(1),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  plane(0), plane(1), plane(2), plane(3)],
        out_specs=(plane(0), plane(1), plane(2), plane(3)),
        out_shape=(jax.ShapeDtypeStruct((n, m), best_absq.dtype),
                   jax.ShapeDtypeStruct((n, m), best_r.dtype),
                   jax.ShapeDtypeStruct((n, m), best_i.dtype),
                   jax.ShapeDtypeStruct((n, m), best_idx.dtype)),
        input_output_aliases={3: 0, 4: 1, 5: 2, 6: 3},
        interpret=(jax.default_backend() != "tpu"),
    )(Mr, Mi, jnp.asarray([base_idx], jnp.int32).reshape(1),
      best_absq, best_r, best_i, best_idx)
