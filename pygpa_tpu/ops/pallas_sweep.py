"""Fused zoom-sweep kernel: column DFT matmul + |.|^2 + argmax
tournament in one pass, per output tile.

The zoom WFR sweep (ops/wfr.py:_wfr_sweep_zoom) evaluates each
candidate's full-resolution lock-in as two skinny DFT matmuls. The
second matmul's output — the (C, N, M) complex candidate planes — is
pure intermediate: it is squared, compared against the running best,
and discarded. Materializing it costs ~1 GB of HBM write+read traffic
per candidate chunk at 4096^2, which dominates the sweep (the matmul
FLOPs themselves are ~4 ms per full sweep).

This kernel keeps the candidate planes in VMEM: per (rows, 128)
output tile it runs the C second-stage matmuls on the MXU
(jax.lax.dot_general at HIGHEST precision, matching the XLA einsum),
squares, and updates the four aliased carry planes — so per chunk the
first-stage partials are read once (they are re-used across the
column grid by Mosaic's revisit elision), the carries are read and
written once, and the (C, N, M) planes never exist in HBM.

A selection-only fusion (ops/pallas_select.py) was measured
performance-neutral because XLA already fuses the where-tournament
into the producer; the win here is specifically avoiding the
second-matmul materialization.
"""
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(tr_ref, ti_ref, ac_ref, as_ref, base_ref,
            ba_ref, br_ref, bi_ref, bx_ref,
            oa_ref, or_ref, oi_ref, ox_ref):
    C = tr_ref.shape[0]
    ba = ba_ref[:]
    br = br_ref[:]
    bi = bi_ref[:]
    bx = bx_ref[:]
    base = base_ref[0]
    ac = ac_ref[:]            # (128, W1) cos basis rows for this tile
    as_ = as_ref[:]           # (128, W1) sin basis rows
    dims = (((1,), (1,)), ((), ()))
    hi = jax.lax.Precision.HIGHEST

    def dot(a, b):
        return jax.lax.dot_general(a, b, dims, precision=hi,
                                   preferred_element_type=a.dtype)

    for i in range(C):
        tr = tr_ref[i]        # (rows, W1)
        ti = ti_ref[i]
        mr = dot(tr, ac) - dot(ti, as_)     # (rows, 128)
        mi = dot(tr, as_) + dot(ti, ac)
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


@partial(jax.jit, static_argnames=("rows", "interpret"))
def fused_colmm_select(Tr, Ti, A1c, A1s, base_idx,
                       best_absq, best_r, best_i, best_idx,
                       rows=256, interpret=False):
    """Update carry planes with a chunk of candidates given their
    first-stage partials.

    Tr, Ti : (C, N, W1) real/imag first-stage DFT partials.
    A1c, A1s : (M, W1) cos/sin inverse-DFT basis along the second axis.
    base_idx : int32 scalar — candidate index of Tr[0].
    best_* : (N, M) carry planes, donated (aliased to the outputs).
    """
    C, n, W1 = Tr.shape
    m = A1c.shape[0]
    grid = (n // rows, m // 128)

    def t_spec():
        return pl.BlockSpec((C, rows, W1), lambda r, c: (0, r, 0),
                            memory_space=pltpu.VMEM)

    def a_spec():
        return pl.BlockSpec((128, W1), lambda r, c: (c, 0),
                            memory_space=pltpu.VMEM)

    def plane():
        return pl.BlockSpec((rows, 128), lambda r, c: (r, c),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[t_spec(), t_spec(), a_spec(), a_spec(),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  plane(), plane(), plane(), plane()],
        out_specs=(plane(), plane(), plane(), plane()),
        out_shape=(jax.ShapeDtypeStruct((n, m), best_absq.dtype),
                   jax.ShapeDtypeStruct((n, m), best_r.dtype),
                   jax.ShapeDtypeStruct((n, m), best_i.dtype),
                   jax.ShapeDtypeStruct((n, m), best_idx.dtype)),
        input_output_aliases={5: 0, 6: 1, 7: 2, 8: 3},
        interpret=interpret,
    )(Tr, Ti, A1c, A1s,
      jnp.asarray([base_idx], jnp.int32).reshape(1),
      best_absq, best_r, best_i, best_idx)
