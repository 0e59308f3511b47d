"""Phase-1/phase-2 isolation + kernel-variant experiments for the headline
exact-kNN kernel (ops/pallas_knn.knn_topk) at the bench shape (1M x 768,
batch 256, k=10, BN=2048, SUB=32).

Measured questions, one flag per variant so each compile is independently
cacheable through the axon relay:

  --variant base      : shipped knn_topk (reference point)
  --variant phase1    : the pallas_call alone (sub-block maxes, reduced to
                        a scalar) — isolates phase-2 + final-top-k cost
  --variant mm        : phase-1 kernel with the max/mask stripped (dot +
                        one output row-slice) — the DMA+MXU lower bound a
                        perfect phase 1 could approach
  --variant qt        : full pipeline, queries PRE-TRANSPOSED to [D, Q] so
                        the in-kernel dot is a plain [M,K]@[K,N] (no rhs
                        transpose for Mosaic to materialize per block)
  --variant masklast  : full pipeline, padding mask applied only on the
                        final grid step (other blocks are all-valid)
  --variant rmax      : full pipeline, sub-block max via reshape
                        [BN/SUB, SUB, Q].max(1) instead of concat-of-slices
  --variant phase2    : _rescore_topk alone over a precomputed bmax
  --variant all       : run every variant in the order above

Usage: python benchmarks/knn_tune_bench.py --variant all --iters 50
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


N, D, K, QB = 1_000_000, 768, 10, 256
BN, SUB = 2048, 32
NEG = -3.0e38


def make_corpus(jnp, jax, n_pad):
    @jax.jit
    def gen(salt):
        idx = jax.lax.broadcasted_iota(
            jnp.uint32, (n_pad, D), 0
        ) * jnp.uint32(D) + jax.lax.broadcasted_iota(jnp.uint32, (n_pad, D), 1)
        v = jnp.zeros((n_pad, D), jnp.float32)
        for s in (1, 2, 3, 4):
            x = idx * jnp.uint32(2654435761) + salt * jnp.uint32(s)
            x = x ^ (x >> 15)
            x = x * jnp.uint32(2246822519)
            x = x ^ (x >> 13)
            x = x * jnp.uint32(3266489917)
            x = x ^ (x >> 16)
            v = v + x.astype(jnp.float32) * jnp.float32(1.0 / 4294967296.0)
        v = v - 2.0
        n = jnp.sqrt(jnp.sum(v * v, -1, keepdims=True))
        return (v / jnp.maximum(n, 1e-9)).astype(jnp.bfloat16)

    return gen(jnp.uint32(1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="all")
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from orama_core_tpu.ops.pallas_knn import (
        _pick_sub, _rescore_topk, knn_topk,
    )

    n_pad = ((N + BN - 1) // BN) * BN
    _ = np.asarray(jnp.ones(8) + 1.0)  # flush relay session establishment
    vecs = make_corpus(jnp, jax, n_pad)
    _ = np.asarray(vecs[0, 0])
    rng = np.random.default_rng(11)
    q_np = rng.standard_normal((QB, D)).astype(np.float32)
    q_np /= np.linalg.norm(q_np, axis=-1, keepdims=True)
    q = jnp.asarray(q_np, jnp.bfloat16)
    qt = jnp.asarray(q_np.T, jnp.bfloat16)  # [D, Q]
    sub = _pick_sub(BN, SUB)
    nsub = n_pad // sub
    nblocks = n_pad // BN
    iters = args.iters

    def timed(name, step_fn, *xs):
        """step_fn(carry, *xs) -> scalar; chained, one closing fetch."""
        f = jax.jit(step_fn)
        t0 = time.time()
        c = np.asarray(f(jnp.float32(0.0), *xs))
        log(f"  [{name}] compile+first: {time.time()-t0:.1f}s")
        carry = jnp.float32(0.0)
        t0 = time.time()
        for _ in range(iters):
            carry = f(carry, *xs)
        _ = np.asarray(carry)
        dt = (time.time() - t0) / iters
        log(f"  [{name}] {dt*1e3:.3f} ms/batch  ({QB/dt:.0f} QPS)")
        return dt

    # ---------------- kernel bodies --------------------------------------
    def k_base(q_ref, v_ref, out_ref):
        step = pl.program_id(0)
        sims = jax.lax.dot_general(
            v_ref[:], q_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        row = jax.lax.broadcasted_iota(jnp.int32, sims.shape, 0) + step * BN
        sims = jnp.where(row < N, sims, NEG)
        out_ref[:] = jnp.concatenate(
            [jnp.max(sims[c * sub:(c + 1) * sub, :], 0, keepdims=True)
             for c in range(BN // sub)], 0)

    def k_mm(q_ref, v_ref, out_ref):
        sims = jax.lax.dot_general(
            v_ref[:], q_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_ref[:] = sims[:BN // sub, :]

    def k_qt(qt_ref, v_ref, out_ref):
        step = pl.program_id(0)
        sims = jax.lax.dot_general(
            v_ref[:], qt_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        row = jax.lax.broadcasted_iota(jnp.int32, sims.shape, 0) + step * BN
        sims = jnp.where(row < N, sims, NEG)
        out_ref[:] = jnp.concatenate(
            [jnp.max(sims[c * sub:(c + 1) * sub, :], 0, keepdims=True)
             for c in range(BN // sub)], 0)

    def k_masklast(q_ref, v_ref, out_ref):
        step = pl.program_id(0)
        sims = jax.lax.dot_general(
            v_ref[:], q_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

        def masked():
            row = jax.lax.broadcasted_iota(
                jnp.int32, sims.shape, 0) + step * BN
            return jnp.where(row < N, sims, NEG)

        s = jax.lax.cond(step == nblocks - 1, masked, lambda: sims)
        out_ref[:] = jnp.concatenate(
            [jnp.max(s[c * sub:(c + 1) * sub, :], 0, keepdims=True)
             for c in range(BN // sub)], 0)

    def k_rmax(q_ref, v_ref, out_ref):
        step = pl.program_id(0)
        sims = jax.lax.dot_general(
            v_ref[:], q_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        row = jax.lax.broadcasted_iota(jnp.int32, sims.shape, 0) + step * BN
        sims = jnp.where(row < N, sims, NEG)
        out_ref[:] = jnp.max(sims.reshape(BN // sub, sub, QB), axis=1)

    def run_phase1(kernel, qq):
        return pl.pallas_call(
            kernel,
            grid=(nblocks,),
            in_specs=[
                pl.BlockSpec(qq.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BN, D), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BN // sub, QB), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nsub, QB), jnp.float32),
        )(qq, vecs)

    def full(kernel, qq):
        bmax = run_phase1(kernel, qq)

        def rescore(rows):
            cand = vecs[rows]
            return jnp.einsum("qd,qcd->qc", q, cand,
                              preferred_element_type=jnp.float32)

        v, i = _rescore_topk(bmax.T, rescore, K, sub, N, QB)
        return jnp.max(v) + jnp.min(i).astype(jnp.float32) * 0

    want = args.variant
    res = {}

    if want in ("base", "all"):
        res["base"] = timed(
            "base knn_topk",
            lambda c, qq: jnp.max(
                knn_topk(vecs, qq + c.astype(qq.dtype) * 0, k=K,
                         block_rows=BN, n_valid=N)[0]),
            q)
    if want in ("phase1", "all"):
        res["phase1"] = timed(
            "phase1 only",
            lambda c, qq: jnp.max(
                run_phase1(k_base, qq + c.astype(qq.dtype) * 0)),
            q)
    if want in ("mm", "all"):
        res["mm"] = timed(
            "mm lower bound",
            lambda c, qq: jnp.max(
                run_phase1(k_mm, qq + c.astype(qq.dtype) * 0)),
            q)
    if want in ("qt", "all"):
        res["qt"] = timed(
            "q-transposed",
            lambda c, qq: jnp.max(
                run_phase1(k_qt, qq + c.astype(qq.dtype) * 0)),
            qt)
    if want in ("masklast", "all"):
        res["masklast"] = timed(
            "mask last block",
            lambda c, qq: jnp.max(
                run_phase1(k_masklast, qq + c.astype(qq.dtype) * 0)),
            q)
    if want in ("rmax", "all"):
        res["rmax"] = timed(
            "reshape max",
            lambda c, qq: jnp.max(
                run_phase1(k_rmax, qq + c.astype(qq.dtype) * 0)),
            q)
    if want in ("phase2", "all"):
        bmax_fixed = run_phase1(k_base, q)
        _ = np.asarray(bmax_fixed[0, 0])

        def p2(c, bm):
            def rescore(rows):
                cand = vecs[rows]
                return jnp.einsum("qd,qcd->qc", q, cand,
                                  preferred_element_type=jnp.float32)
            v, i = _rescore_topk(bm.T + c * 0, rescore, K, sub, N, QB)
            return jnp.max(v)

        res["phase2"] = timed("phase2 only", p2, bmax_fixed)
    if want in ("fullqt", "all"):
        res["fullqt"] = timed(
            "full qt pipeline",
            lambda c, qq: full(k_qt, qq + c.astype(qq.dtype) * 0),
            qt)

    log("---- summary (ms/batch) ----")
    for k2, v2 in sorted(res.items(), key=lambda x: x[1]):
        log(f"  {k2:10s} {v2*1e3:8.3f}")


if __name__ == "__main__":
    main()
