"""Fused brute-force kNN Pallas kernel: matmul + streaming top-k.

The XLA path (ops/vector.py) materializes the [Q, N] similarity matrix in
HBM (256 MB at Q=64, N=1M) and re-reads it for `top_k` — ~1/4 of the total
HBM traffic. This kernel streams corpus blocks HBM→VMEM, computes the
[Q, BN] block similarities on the MXU, and maintains the running top-k in a
VMEM scratch across sequential grid steps — similarities never touch HBM.

Top-k maintenance is heap-free (XLA/VPU-friendly, SURVEY.md §7 "top-k
inside kernels"): K rounds of max/argmax over the block (extract the
block's best K) each merged into the running set by replacing the current
minimum when beaten.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -3.0e38


def _knn_kernel(
    q_ref, v_ref, out_vals_ref, out_idx_ref, tv_ref, ti_ref, k: int, n_valid: int
):
    """Grid: (num_blocks,). q [Q, D] resident; v block [BN, D] streamed;
    scratch tv/ti [Q, K] running top-k. Rows >= n_valid are padding."""
    step = pl.program_id(0)
    n_steps = pl.num_programs(0)
    bn = v_ref.shape[0]

    @pl.when(step == 0)
    def _init():
        tv_ref[:] = jnp.full(tv_ref.shape, NEG, jnp.float32)
        ti_ref[:] = jnp.zeros(ti_ref.shape, jnp.int32)

    sims = jax.lax.dot_general(
        q_ref[:], v_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [Q, BN]

    base = step * bn
    col_ids = jax.lax.broadcasted_iota(jnp.int32, sims.shape, 1) + base
    sims = jnp.where(col_ids < n_valid, sims, NEG)
    kcol = jax.lax.broadcasted_iota(jnp.int32, tv_ref.shape, 1)

    def round_body(j, carry):
        sims, tv, ti = carry
        m = jnp.max(sims, axis=1)                       # [Q]
        am_onehot = sims == m[:, None]
        # first max position only (break ties by lowest column)
        idx = jnp.min(
            jnp.where(am_onehot, col_ids, jnp.int32(2**30)), axis=1
        )
        sims = jnp.where(am_onehot, NEG, sims)

        minv = jnp.min(tv, axis=1)                      # [Q]
        min_onehot = tv == minv[:, None]
        # only the first min slot
        min_pos = jnp.min(jnp.where(min_onehot, kcol, jnp.int32(2**30)), axis=1)
        better = m > minv                               # [Q]
        do_replace = better[:, None] & (kcol == min_pos[:, None])
        tv = jnp.where(do_replace, m[:, None], tv)
        ti = jnp.where(do_replace, idx[:, None], ti)
        return sims, tv, ti

    sims, tv, ti = jax.lax.fori_loop(
        0, k, round_body, (sims, tv_ref[:], ti_ref[:])
    )
    tv_ref[:] = tv
    ti_ref[:] = ti

    @pl.when(step == n_steps - 1)
    def _emit():
        # sort the K survivors descending (K is tiny: selection sort via
        # the same max/mask rounds)
        def emit_round(j, carry):
            tv, ti = carry
            m = jnp.max(tv, axis=1)
            oh = tv == m[:, None]
            pos = jnp.min(jnp.where(oh, kcol, jnp.int32(2**30)), axis=1)
            sel = kcol == pos[:, None]
            out_vals_ref[:, j] = m
            out_idx_ref[:, j] = jnp.sum(jnp.where(sel, ti, 0), axis=1)
            tv = jnp.where(sel, NEG, tv)
            return tv, ti

        jax.lax.fori_loop(0, k, emit_round, (tv_ref[:], ti_ref[:]), unroll=True)


def _knn_int8_kernel(
    q_ref, v_ref, scale_ref, out_vals_ref, out_idx_ref, tv_ref, ti_ref,
    k: int, n_valid: int,
):
    """int8 variant: corpus block is int8 [BN, D] + per-row scales; the
    query arrives pre-quantized int8 with its scale folded into scale_ref
    by the caller. Same streaming top-k as _knn_kernel."""
    step = pl.program_id(0)
    bn = v_ref.shape[0]

    @pl.when(step == 0)
    def _init():
        tv_ref[:] = jnp.full(tv_ref.shape, NEG, jnp.float32)
        ti_ref[:] = jnp.zeros(ti_ref.shape, jnp.int32)

    acc = jax.lax.dot_general(
        q_ref[:], v_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [Q, BN] int32
    sims = acc.astype(jnp.float32) * scale_ref[:].reshape(1, -1)

    base = step * bn
    col_ids = jax.lax.broadcasted_iota(jnp.int32, sims.shape, 1) + base
    sims = jnp.where(col_ids < n_valid, sims, NEG)
    kcol = jax.lax.broadcasted_iota(jnp.int32, tv_ref.shape, 1)

    def round_body(j, carry):
        sims, tv, ti = carry
        m = jnp.max(sims, axis=1)
        am_onehot = sims == m[:, None]
        idx = jnp.min(jnp.where(am_onehot, col_ids, jnp.int32(2**30)), axis=1)
        sims = jnp.where(am_onehot, NEG, sims)
        minv = jnp.min(tv, axis=1)
        min_onehot = tv == minv[:, None]
        min_pos = jnp.min(jnp.where(min_onehot, kcol, jnp.int32(2**30)), axis=1)
        do_replace = (m > minv)[:, None] & (kcol == min_pos[:, None])
        tv = jnp.where(do_replace, m[:, None], tv)
        ti = jnp.where(do_replace, idx[:, None], ti)
        return sims, tv, ti

    sims, tv, ti = jax.lax.fori_loop(0, k, round_body, (sims, tv_ref[:], ti_ref[:]))
    tv_ref[:] = tv
    ti_ref[:] = ti

    @pl.when(step == pl.num_programs(0) - 1)
    def _emit():
        def emit_round(j, carry):
            tv, ti = carry
            m = jnp.max(tv, axis=1)
            oh = tv == m[:, None]
            pos = jnp.min(jnp.where(oh, kcol, jnp.int32(2**30)), axis=1)
            sel = kcol == pos[:, None]
            out_vals_ref[:, j] = m
            out_idx_ref[:, j] = jnp.sum(jnp.where(sel, ti, 0), axis=1)
            tv = jnp.where(sel, NEG, tv)
            return tv, ti

        jax.lax.fori_loop(0, k, emit_round, (tv_ref[:], ti_ref[:]), unroll=True)


@functools.partial(
    jax.jit, static_argnames=("k", "block_rows", "interpret", "n_valid")
)
def knn_topk_int8(
    codes: jax.Array,     # int8[N, D]
    scales: jax.Array,    # f32[N] per-row scales
    queries: jax.Array,   # f32[Q, D] (quantized on the fly)
    k: int = 10,
    block_rows: int = 4096,
    interpret: bool = False,
    n_valid: int = -1,
):
    """Fused int8 kNN: ~2x less HBM traffic than bf16 at recall ~1."""
    n, d = codes.shape
    q = queries.shape[0]
    assert n % block_rows == 0
    if n_valid < 0:
        n_valid = n
    q_absmax = jnp.maximum(jnp.max(jnp.abs(queries), axis=-1, keepdims=True), 1e-9)
    q_scale = q_absmax / 127.0
    q8 = jnp.clip(jnp.round(queries / q_scale), -127, 127).astype(jnp.int8)
    # The kernel scores with per-column scales only: sims[r, c] =
    # acc * scales[c]. The per-query factor q_scale[r] is constant within a
    # query row, so each row's ranking is already correct without it; the
    # true cosine value is recovered after the kernel by the `vals *
    # q_scale` rescale below (q_scale is kept per-query, never folded).
    kernel = functools.partial(_knn_int8_kernel, k=k, n_valid=n_valid)
    vals, idx = pl.pallas_call(
        kernel,
        grid=(n // block_rows,),
        in_specs=[
            pl.BlockSpec((q, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (block_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((block_rows,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((q, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((q, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((q, k), jnp.float32),
            jax.ShapeDtypeStruct((q, k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((q, k), jnp.float32),
            pltpu.VMEM((q, k), jnp.int32),
        ],
        interpret=interpret,
    )(q8, codes, scales)
    # rescale values per query for score fidelity (ranking already correct)
    return vals * q_scale, idx


@functools.partial(
    jax.jit, static_argnames=("k", "block_rows", "interpret", "n_valid")
)
def knn_topk(
    vecs: jax.Array,      # [N, D] bf16/f32 (N a multiple of block_rows)
    queries: jax.Array,   # [Q, D] same dtype
    k: int = 10,
    block_rows: int = 2048,
    interpret: bool = False,
    n_valid: int = -1,    # real rows; rest is padding (-1 => all valid)
):
    """(values f32[Q, k], indices int32[Q, k]) — fused matmul+top-k."""
    n, d = vecs.shape
    q = queries.shape[0]
    assert n % block_rows == 0, "pad corpus to a multiple of block_rows"
    if n_valid < 0:
        n_valid = n
    grid = (n // block_rows,)
    kernel = functools.partial(_knn_kernel, k=k, n_valid=n_valid)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((q, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (block_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec((q, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((q, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((q, k), jnp.float32),
            jax.ShapeDtypeStruct((q, k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((q, k), jnp.float32),
            pltpu.VMEM((q, k), jnp.int32),
        ],
        interpret=interpret,
    )(queries, vecs)
