"""Phase-1/phase-2 isolation + kernel-variant experiments for the headline
exact-kNN kernel (ops/pallas_knn.knn_topk) at the bench shape (1M x 768,
batch 256, k=10, BN=2048, SUB=32).

CRITICAL harness rule (BENCH_NOTES "TPU timing rules"): the corpus is an
explicit jit ARGUMENT in every timed function — a closure capture becomes
a 1.5 GB HLO constant and stalls the remote-compile tunnel for 30+ min
(reproduced in r3 before this file passed `vecs` through).

Variants (one flag per variant; each compile independently cacheable):

  base      : shipped knn_topk (reference point)
  phase1    : the pallas_call alone — isolates phase-2 + top-k cost
  mm        : phase-1 kernel with max/mask stripped (dot + row-slice
              output) — the DMA+MXU lower bound phase 1 could approach
  qt        : phase 1 with queries PRE-TRANSPOSED to [D, Q] so the
              in-kernel dot is a plain [M,K]@[K,N] (no rhs transpose
              for Mosaic to materialize per block)
  masklast  : phase 1, padding mask applied only on the final grid step
  rmax      : phase 1, sub-block max via reshape [BN/SUB, SUB, Q].max(1)
  sub64     : phase 1 with SUB=64 (half the output rows/max work)
  phase2    : _rescore_topk alone over a precomputed bmax
  fullqt    : full pipeline with the qt phase 1
  all       : every variant above

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
    t0 = time.time()
    _ = np.asarray(jnp.ones(8) + 1.0)
    log(f"relay session: {time.time()-t0:.1f}s")

    from orama_core_tpu.utils.benchgen import hashed_unit_corpus

    @jax.jit
    def make_corpus(salt):
        return hashed_unit_corpus(n_pad, D, salt)

    t0 = time.time()
    vecs = make_corpus(jnp.uint32(1))
    _ = np.asarray(vecs[0, 0])
    log(f"corpus: {time.time()-t0:.1f}s")
    rng = np.random.default_rng(11)
    q_np = rng.standard_normal((QB, D)).astype(np.float32)
    q_np /= np.linalg.norm(q_np, axis=-1, keepdims=True)
    q = jnp.asarray(q_np, jnp.bfloat16)
    qt = jnp.asarray(np.ascontiguousarray(q_np.T), jnp.bfloat16)  # [D, Q]
    sub = _pick_sub(BN, SUB)
    nblocks = n_pad // BN
    iters = args.iters

    def timed(name, step_fn, *xs):
        """step_fn(carry, vecs, *xs) -> scalar; chained, one fetch."""
        f = jax.jit(step_fn)
        t0 = time.time()
        _ = np.asarray(f(jnp.float32(0.0), vecs, *xs))
        log(f"  [{name}] compile+first: {time.time()-t0:.1f}s")
        carry = jnp.float32(0.0)
        t0 = time.time()
        for _ in range(iters):
            carry = f(carry, vecs, *xs)
        _ = np.asarray(carry)
        dt = (time.time() - t0) / iters
        log(f"  [{name}] {dt*1e3:.3f} ms/batch  ({QB/dt:.0f} QPS)")
        return dt

    # ---------------- kernel bodies -------------------------------------
    def mk_max(s_in, subr):
        return jnp.concatenate(
            [jnp.max(s_in[c * subr:(c + 1) * subr, :], 0, keepdims=True)
             for c in range(BN // subr)], 0)

    def k_base(q_ref, v_ref, out_ref):
        step = pl.program_id(0)
        sims = jax.lax.dot_general(
            v_ref[:], q_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        row = jax.lax.broadcasted_iota(jnp.int32, sims.shape, 0) + step * BN
        out_ref[:] = mk_max(jnp.where(row < N, sims, NEG), sub)

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
        out_ref[:] = mk_max(jnp.where(row < N, sims, NEG), sub)

    def k_masklast(q_ref, v_ref, out_ref):
        step = pl.program_id(0)
        sims = jax.lax.dot_general(
            v_ref[:], q_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

        def masked():
            row = jax.lax.broadcasted_iota(
                jnp.int32, sims.shape, 0) + step * BN
            return jnp.where(row < N, sims, NEG)

        out_ref[:] = mk_max(
            jax.lax.cond(step == nblocks - 1, masked, lambda: sims), sub)

    def k_rmax(q_ref, v_ref, out_ref):
        step = pl.program_id(0)
        sims = jax.lax.dot_general(
            v_ref[:], q_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        row = jax.lax.broadcasted_iota(jnp.int32, sims.shape, 0) + step * BN
        s = jnp.where(row < N, sims, NEG)
        out_ref[:] = jnp.max(s.reshape(BN // sub, sub, QB), axis=1)

    def k_sub64(q_ref, v_ref, out_ref):
        step = pl.program_id(0)
        sims = jax.lax.dot_general(
            v_ref[:], q_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        row = jax.lax.broadcasted_iota(jnp.int32, sims.shape, 0) + step * BN
        out_ref[:] = mk_max(jnp.where(row < N, sims, NEG), 64)

    def run_phase1(kernel, v, qq, subr=None):
        subr = subr or sub
        return pl.pallas_call(
            kernel,
            grid=(nblocks,),
            in_specs=[
                pl.BlockSpec(qq.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BN, D), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BN // subr, QB), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_pad // subr, QB), jnp.float32),
        )(qq, v)

    def rescore_with(v, queries):
        def rescore(rows):
            cand = v[rows]
            return jnp.einsum("qd,qcd->qc", queries, cand,
                              preferred_element_type=jnp.float32)
        return rescore

    want = args.variant
    res = {}

    def carry_mix(c, qq):
        return qq + c.astype(qq.dtype) * 0

    if want in ("base", "all"):
        res["base"] = timed(
            "base knn_topk",
            lambda c, v, qq: jnp.max(
                knn_topk(v, carry_mix(c, qq), k=K, block_rows=BN,
                         n_valid=N)[0]),
            q)
    if want in ("phase1", "all"):
        res["phase1"] = timed(
            "phase1 only",
            lambda c, v, qq: jnp.max(run_phase1(k_base, v, carry_mix(c, qq))),
            q)
    if want in ("mm", "all"):
        res["mm"] = timed(
            "mm lower bound",
            lambda c, v, qq: jnp.max(run_phase1(k_mm, v, carry_mix(c, qq))),
            q)
    if want in ("qt", "all"):
        res["qt"] = timed(
            "q-transposed",
            lambda c, v, qq: jnp.max(run_phase1(k_qt, v, carry_mix(c, qq))),
            qt)
    if want in ("masklast", "all"):
        res["masklast"] = timed(
            "mask last block",
            lambda c, v, qq: jnp.max(
                run_phase1(k_masklast, v, carry_mix(c, qq))),
            q)
    if want in ("rmax", "all"):
        res["rmax"] = timed(
            "reshape max",
            lambda c, v, qq: jnp.max(run_phase1(k_rmax, v, carry_mix(c, qq))),
            q)
    if want in ("sub64", "all"):
        res["sub64"] = timed(
            "SUB=64",
            lambda c, v, qq: jnp.max(
                run_phase1(k_sub64, v, carry_mix(c, qq), subr=64)),
            q)
    if want in ("phase2", "all"):
        bmax_fixed = jax.jit(
            lambda v, qq: run_phase1(k_base, v, qq))(vecs, q)
        _ = np.asarray(bmax_fixed[0, 0])

        def p2(c, v, qq, bm):
            vv, _ = _rescore_topk(
                bm.T + c * 0, rescore_with(v, qq), K, sub, N, QB)
            return jnp.max(vv)

        res["phase2"] = timed("phase2 only", p2, q, bmax_fixed)
    if want in ("p2topk", "all2"):
        bm = jax.jit(lambda v, qq: run_phase1(k_base, v, qq))(vecs, q)
        _ = np.asarray(bm[0, 0])
        res["p2topk"] = timed(
            "p2: lax.top_k only",
            lambda c, v, qq, b: jnp.max(jax.lax.top_k(b.T + c * 0, K)[0]),
            q, bm)
    if want in ("p2approx", "all2"):
        bm = jax.jit(lambda v, qq: run_phase1(k_base, v, qq))(vecs, q)
        _ = np.asarray(bm[0, 0])
        res["p2approx"] = timed(
            "p2: approx_max_k",
            lambda c, v, qq, b: jnp.max(
                jax.lax.approx_max_k(b.T + c * 0, K)[0]),
            q, bm)
    if want in ("p2rescore", "all2"):
        bm = jax.jit(lambda v, qq: run_phase1(k_base, v, qq))(vecs, q)
        rows_f = jax.jit(
            lambda b: (
                jax.lax.top_k(b.T, K)[1][:, :, None] * sub
                + jax.lax.broadcasted_iota(jnp.int32, (QB, K, sub), 2)
            ).reshape(QB, K * sub)
        )(bm)
        _ = np.asarray(rows_f[0, 0])

        def p2r(c, v, qq, rws):
            cand = v[rws]
            s = jnp.einsum("qd,qcd->qc", carry_mix(c, qq), cand,
                           preferred_element_type=jnp.float32)
            return jnp.max(s)

        res["p2rescore"] = timed("p2: gather+einsum only", p2r, q, rows_f)

    def full_sub(subr, kern):
        def f(c, v, qq):
            bmax = run_phase1(kern, v, carry_mix(c, qq), subr=subr)
            vv, _ = _rescore_topk(
                bmax.T, rescore_with(v, qq), K, subr, N, QB)
            return jnp.max(vv)
        return f

    if want in ("sub64full", "all2"):
        res["sub64full"] = timed(
            "e2e SUB=64", full_sub(64, k_sub64), q)
    if want in ("sub128full", "all2"):
        def k_sub128(q_ref, v_ref, out_ref):
            step = pl.program_id(0)
            sims = jax.lax.dot_general(
                v_ref[:], q_ref[:],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            row = jax.lax.broadcasted_iota(
                jnp.int32, sims.shape, 0) + step * BN
            out_ref[:] = mk_max(jnp.where(row < N, sims, NEG), 128)

        res["sub128full"] = timed(
            "e2e SUB=128", full_sub(128, k_sub128), q)
    if want in ("approxfull", "all2"):
        # exactness caveat: approx_max_k may miss a qualifying sub-block;
        # measured here to size the win before deciding
        def fa(c, v, qq):
            bmax = run_phase1(k_base, v, carry_mix(c, qq))
            _, sub_ids = jax.lax.approx_max_k(bmax.T, K)
            rows = (
                sub_ids[:, :, None] * sub
                + jax.lax.broadcasted_iota(jnp.int32, (QB, K, sub), 2)
            ).reshape(QB, K * sub)
            cand = v[rows]
            s = jnp.einsum("qd,qcd->qc", qq, cand,
                           preferred_element_type=jnp.float32)
            s = jnp.where(rows < N, s, NEG)
            vv, _ = jax.lax.top_k(s, K)
            return jnp.max(vv)

        res["approxfull"] = timed("e2e approx select", fa, q)
    # ---- phase-2 redesign candidates (all3) ----------------------------
    def chunked_topk(x, k, chunk):
        """Exact two-level top-k: per-chunk top-k (batched small sorts)
        then top-k of the C*k survivors. Exact: every global top-k
        element is top-k within its own chunk."""
        qn, n = x.shape
        c = -(-n // chunk)
        if c * chunk != n:
            x = jnp.concatenate(
                [x, jnp.full((qn, c * chunk - n), NEG, x.dtype)], axis=1)
        v, i = jax.lax.top_k(x.reshape(qn, c, chunk), k)     # [Q, c, k]
        base = (jnp.arange(c, dtype=jnp.int32) * chunk)[None, :, None]
        v = v.reshape(qn, c * k)
        i = (i + base).reshape(qn, c * k)
        v2, j = jax.lax.top_k(v, k)
        return v2, jnp.take_along_axis(i, j, axis=1)

    if want in ("p2chunk", "all3"):
        bm = jax.jit(lambda v, qq: run_phase1(k_base, v, qq))(vecs, q)
        _ = np.asarray(bm[0, 0])
        for chunk in (512, 2048):
            res[f"p2chunk{chunk}"] = timed(
                f"p2: chunked topk {chunk}",
                (lambda ch: lambda c, v, qq, b: jnp.max(
                    chunked_topk(b.T + c * 0, K, ch)[0]))(chunk),
                q, bm)

    PACK = 8  # selected sub-blocks per grid step (out sublane rule)

    def pallas_rescore(v, qt_arr, sub_ids_flat, k):
        """PACK selected sub-blocks per grid step: DMA each one's
        [sub, D] rows (own BlockSpec views of the same corpus array),
        MXU-score TRANSPOSED against all queries ([Q, sub] — no Mosaic
        transposes anywhere), left-one-hot-select the owner query's row,
        stack PACK [1, sub] rows into the (PACK, sub) output block.
        Output [nsel, sub] is q-major because ids are."""
        nsel = sub_ids_flat.shape[0]
        assert nsel % PACK == 0

        def kern(sb_ref, qt_ref, *refs):
            v_refs, out_ref = refs[:PACK], refs[PACK]
            g0 = pl.program_id(0) * PACK
            rows = []
            for j in range(PACK):
                sims_t = jax.lax.dot_general(
                    qt_ref[:], v_refs[j][:],
                    dimension_numbers=(((0,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)   # [Q, sub]
                owner = (g0 + j) // k
                oh = (jax.lax.broadcasted_iota(jnp.int32, (1, QB), 1)
                      == owner).astype(jnp.float32)
                rows.append(jax.lax.dot_general(
                    oh, sims_t,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))  # [1, sub]
            out_ref[:] = jnp.concatenate(rows, axis=0)    # [PACK, sub]

        def mk_vspec(j):
            return pl.BlockSpec(
                (sub, D), lambda i, sb, j=j: (sb[i * PACK + j], 0))

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nsel // PACK,),
            in_specs=[pl.BlockSpec((D, QB), lambda i, sb: (0, 0))]
            + [mk_vspec(j) for j in range(PACK)],
            out_specs=pl.BlockSpec((PACK, sub), lambda i, sb: (i, 0)),
        )
        return pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nsel, sub), jnp.float32),
        )(sub_ids_flat, qt_arr, *([v] * PACK))

    def iter_topk(x, k, group=128):
        """Exact top-k via hierarchical iterative argmax: one full pass
        builds per-group maxes; each of the k rounds argmaxes the SMALL
        [Q, n_groups] table, gathers the winning group's [Q, group]
        slice, masks previously-taken ids of that group on the fly (at
        most k compares), and records the winner. Big-array traffic =
        one pass + k row-gathers — no 32 MB sorts, no scatters."""
        qn, n = x.shape
        ng = -(-n // group)
        if ng * group != n:
            x = jnp.concatenate(
                [x, jnp.full((qn, ng * group - n), NEG, x.dtype)], axis=1)
        g = x.reshape(qn, ng, group)
        gmax = jnp.max(g, axis=-1)                        # [Q, ng]
        taken = jnp.full((qn, k), -1, jnp.int32)          # global ids
        vals = jnp.full((qn, k), NEG, jnp.float32)
        rows_q = jnp.arange(qn)
        for r in range(k):
            gi = jnp.argmax(gmax, axis=-1)                # [Q]
            sl = g[rows_q, gi]                            # [Q, group]
            base = gi.astype(jnp.int32)[:, None] * group
            ids = base + jnp.arange(group, dtype=jnp.int32)[None, :]
            m = (ids[:, None, :] == taken[:, :, None]).any(axis=1)
            sl = jnp.where(m, NEG, sl)
            li = jnp.argmax(sl, axis=-1)                  # [Q]
            v = sl[rows_q, li]
            taken = taken.at[:, r].set(base[:, 0] + li.astype(jnp.int32))
            vals = vals.at[:, r].set(v)
            # the chosen group's max drops to its masked-slice runner-up
            sl2 = sl.at[rows_q, li].set(NEG)
            gmax = gmax.at[rows_q, gi].set(jnp.max(sl2, axis=-1))
        return vals, taken

    def tiered_topk(x, k, group=128):
        """Exact top-k via the block-max filter applied RECURSIVELY:
        per-group max (one bandwidth pass), top-k over the tiny group
        table (contains the top-k elements' groups — same proof as
        phase 1's sub-block filter), then top-k inside the k winning
        group slices. No wide sorts, no sequential rounds."""
        qn, n = x.shape
        ng = -(-n // group)
        if ng * group != n:
            x = jnp.concatenate(
                [x, jnp.full((qn, ng * group - n), NEG, x.dtype)], axis=1)
        g = x.reshape(qn, ng, group)
        gmax = jnp.max(g, axis=-1)                        # [Q, ng]
        kg = min(k, ng)
        _, gi = jax.lax.top_k(gmax, kg)                   # [Q, kg]
        sl = jnp.take_along_axis(g, gi[:, :, None], axis=1)  # [Q, kg, group]
        v, li = jax.lax.top_k(sl.reshape(qn, kg * group), k)
        ids = (
            jnp.take_along_axis(gi, li // group, axis=1) * group
            + li % group
        )
        return v, ids.astype(jnp.int32)

    if want in ("p2tier", "all3c"):
        bm = jax.jit(lambda v, qq: run_phase1(k_base, v, qq))(vecs, q)
        _ = np.asarray(bm[0, 0])
        res["p2tier"] = timed(
            "p2: tiered block-max select",
            lambda c, v, qq, b: jnp.max(tiered_topk(b.T + c * 0, K)[0]),
            q, bm)
    if want in ("fulltier", "all3c"):
        def ft(c, v, qq, qtq):
            bmax = run_phase1(k_base, v, carry_mix(c, qq))
            _, sub_ids = tiered_topk(bmax.T, K)
            ids = sub_ids.reshape(-1).astype(jnp.int32)
            out = pallas_rescore(v, qtq, ids, K)          # [Q*K, sub]
            sims = out.reshape(QB, K * sub)
            rows = (
                sub_ids[:, :, None] * sub
                + jax.lax.broadcasted_iota(jnp.int32, (QB, K, sub), 2)
            ).reshape(QB, K * sub)
            sims = jnp.where(rows < N, sims, NEG)
            vv, ii = jax.lax.top_k(sims, K)
            return jnp.max(vv) + jnp.min(ii).astype(jnp.float32) * 0

        res["fulltier"] = timed("e2e tiered+pallas rescore", ft, q, qt)

    def tiered_topk_nt(bmax, k, group=128):
        """tiered_topk on the UNtransposed [nsub, Q] phase-1 output: the
        32 MB transpose was the dominant select cost — replaced by a
        layout-friendly middle-axis reduce + a tiny [Q, ng] transpose +
        a vmapped small gather of the winning group slices."""
        n, qn = bmax.shape
        ng = -(-n // group)
        if ng * group != n:
            bmax = jnp.concatenate(
                [bmax, jnp.full((ng * group - n, qn), NEG, bmax.dtype)], 0)
        g3 = bmax.reshape(ng, group, qn)
        gmax_t = jnp.max(g3, axis=1).T                    # [Q, ng] tiny
        kg = min(k, ng)
        _, gi = jax.lax.top_k(gmax_t, kg)                 # [Q, kg]
        sl = jax.vmap(lambda col, idx: col[idx], in_axes=(2, 0))(g3, gi)
        v, li = jax.lax.top_k(sl.reshape(qn, kg * group), k)
        ids = (
            jnp.take_along_axis(gi, li // group, axis=1) * group
            + li % group
        )
        return v, ids.astype(jnp.int32)

    if want in ("p2tier2", "all3d"):
        bm = jax.jit(lambda v, qq: run_phase1(k_base, v, qq))(vecs, q)
        _ = np.asarray(bm[0, 0])
        res["p2tier2"] = timed(
            "p2: tiered no-transpose",
            lambda c, v, qq, b: jnp.max(tiered_topk_nt(b + c * 0, K)[0]),
            q, bm)
    if want in ("fulltier2", "all3d"):
        def ft2(c, v, qq, qtq):
            bmax = run_phase1(k_base, v, carry_mix(c, qq))
            _, sub_ids = tiered_topk_nt(bmax, K)
            ids = sub_ids.reshape(-1).astype(jnp.int32)
            out = pallas_rescore(v, qtq, ids, K)          # [Q*K, sub]
            sims = out.reshape(QB, K * sub)
            rows = (
                sub_ids[:, :, None] * sub
                + jax.lax.broadcasted_iota(jnp.int32, (QB, K, sub), 2)
            ).reshape(QB, K * sub)
            sims = jnp.where(rows < N, sims, NEG)
            vv, ii = jax.lax.top_k(sims, K)
            return jnp.max(vv) + jnp.min(ii).astype(jnp.float32) * 0

        res["fulltier2"] = timed("e2e tiered-nt+pallas rescore", ft2, q, qt)

    if want in ("p2iter", "all3b"):
        bm = jax.jit(lambda v, qq: run_phase1(k_base, v, qq))(vecs, q)
        _ = np.asarray(bm[0, 0])
        res["p2iter"] = timed(
            "p2: iterative argmax select",
            lambda c, v, qq, b: jnp.max(iter_topk(b.T + c * 0, K)[0]),
            q, bm)
    if want in ("fullbest", "all3b"):
        def fb(c, v, qq, qtq):
            bmax = run_phase1(k_base, v, carry_mix(c, qq))
            _, sub_ids = iter_topk(bmax.T, K)
            ids = sub_ids.reshape(-1).astype(jnp.int32)
            out = pallas_rescore(v, qtq, ids, K)          # [Q*K, sub]
            sims = out.reshape(QB, K * sub)
            rows = (
                sub_ids[:, :, None] * sub
                + jax.lax.broadcasted_iota(jnp.int32, (QB, K, sub), 2)
            ).reshape(QB, K * sub)
            sims = jnp.where(rows < N, sims, NEG)
            vv, ii = jax.lax.top_k(sims, K)
            return jnp.max(vv) + jnp.min(ii).astype(jnp.float32) * 0

        res["fullbest"] = timed("e2e iter+pallas rescore", fb, q, qt)

    if want in ("prescore", "all3"):
        bm = jax.jit(lambda v, qq: run_phase1(k_base, v, qq))(vecs, q)
        ids_f = jax.jit(
            lambda b: jax.lax.top_k(b.T, K)[1].reshape(-1).astype(jnp.int32)
        )(bm)
        _ = np.asarray(ids_f[0])

        def pr(c, v, qtq, ids):
            out = pallas_rescore(v, qtq + c.astype(qtq.dtype) * 0, ids, K)
            return jnp.max(out)

        res["prescore"] = timed("p2: pallas rescore only", pr, qt, ids_f)
    if want in ("fullfast", "all3"):
        def ff(c, v, qq, qtq):
            bmax = run_phase1(k_base, v, carry_mix(c, qq))
            bv, sub_ids = chunked_topk(bmax.T, K, 1024)
            ids = sub_ids.reshape(-1).astype(jnp.int32)
            out = pallas_rescore(v, qtq, ids, K)          # [Q*K, sub]
            sims = out.reshape(QB, K * sub)
            rows = (
                sub_ids[:, :, None] * sub
                + jax.lax.broadcasted_iota(jnp.int32, (QB, K, sub), 2)
            ).reshape(QB, K * sub)
            sims = jnp.where(rows < N, sims, NEG)
            vv, ii = jax.lax.top_k(sims, K)
            return jnp.max(vv) + jnp.min(ii).astype(jnp.float32) * 0

        res["fullfast"] = timed("e2e chunked+pallas rescore", ff, q, qt)

    if want in ("fullqt", "all"):
        def fullqt(c, v, qtq, qq):
            bmax = run_phase1(k_qt, v, qtq + c.astype(qtq.dtype) * 0)
            vv, _ = _rescore_topk(
                bmax.T, rescore_with(v, qq), K, sub, N, QB)
            return jnp.max(vv)

        res["fullqt"] = timed("full qt pipeline", fullqt, qt, q)

    log("---- summary (ms/batch) ----")
    for k2, v2 in sorted(res.items(), key=lambda x: x[1]):
        log(f"  {k2:10s} {v2*1e3:8.3f}")


if __name__ == "__main__":
    main()
