"""Per-doc reduction design-space bench (the BM25 scan's real floor).

bm25_scan_bench showed the 1M-posting scan is bound by the final
segment_sum (~10.3 ms for 1M contribs -> 1M docs on v5e), not by the
posting gathers. This bench isolates the reduction candidates:

  segsum          jax.ops.segment_sum (current; scatter-add, duplicate ids)
  at_add          zeros.at[idx].add(vals) with no hints
  at_add_hints    same with indices_are_sorted + unique_indices (legal for
                  ONE term's postings: sorted unique doc ids)
  per_term        T accumulating unique+sorted scatters (one per query term)
  onehot_mm       one-hot matmul partial: dense head-term block windows

Run: python benchmarks/segsum_bench.py [--iters 20]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--docs", type=int, default=1 << 20)
    args = ap.parse_args()
    n_docs = args.docs
    rng = np.random.default_rng(0)

    # Zipf term mix as in bm25_scan_bench: 9 terms, ~1M postings total
    dfs = [500000, 250000, 125000, 62500, 31250, 15625, 7812, 3906, 1953]
    idx_l, val_l = [], []
    for df in dfs:
        ids = np.sort(rng.permutation(n_docs)[:df]).astype(np.int32)
        idx_l.append(ids)
        val_l.append(rng.standard_normal(df).astype(np.float32))
    idx_all = np.concatenate(idx_l)
    val_all = np.concatenate(val_l)
    P = idx_all.size

    ref = np.zeros(n_docs, np.float64)
    np.add.at(ref, idx_all, val_all.astype(np.float64))
    ref = ref.astype(np.float32)

    d_idx = jnp.asarray(idx_all)
    d_val = jnp.asarray(val_all)
    # per-term padded to a shared budget (drop-slot n_docs)
    budget = max(dfs)
    idx_pad = np.full((len(dfs), budget), n_docs, np.int32)
    val_pad = np.zeros((len(dfs), budget), np.float32)
    for t, (ids, vs) in enumerate(zip(idx_l, val_l)):
        idx_pad[t, : ids.size] = ids
        val_pad[t, : vs.size] = vs
    d_idx_t = jnp.asarray(idx_pad)
    d_val_t = jnp.asarray(val_pad)

    results = {}

    def timed(name, fn, *xs):
        out = fn(*xs)
        out.block_until_ready()
        err = float(np.max(np.abs(np.asarray(out)[:n_docs] - ref)))
        rel = err / max(float(np.max(np.abs(ref))), 1e-9)
        R = args.iters

        @jax.jit
        def loop(ys):
            def body(_, c):
                s, zs = c
                s, zs = jax.lax.optimization_barrier((s, zs))
                return (s + fn(*zs)[0], zs)
            return jax.lax.fori_loop(0, R, body, (jnp.float32(0.0), ys))[0]

        s = loop(xs)
        s.block_until_ready()
        t0 = time.time()
        s = loop(xs)
        s.block_until_ready()
        dt = (time.time() - t0) / R * 1e3
        log(f"  [{name}] {dt:.2f} ms  rel-err {rel:.2e}")
        results[name] = {"ms": round(dt, 3), "rel_err": float(f"{rel:.3e}")}

    timed("segsum",
          jax.jit(lambda i, v: jax.ops.segment_sum(v, i, num_segments=n_docs)),
          d_idx, d_val)

    timed("at_add",
          jax.jit(lambda i, v: jnp.zeros(n_docs, jnp.float32).at[i].add(
              v, mode="drop")),
          d_idx, d_val)

    # single-term semantics check: unique+sorted hints on ONE term
    one_i = jnp.asarray(idx_l[0])
    one_v = jnp.asarray(val_l[0])
    ref1 = np.zeros(n_docs, np.float32)
    ref1[idx_l[0]] = val_l[0]
    sv_ref, ref = ref, ref1
    timed("at_add_hints_1term",
          jax.jit(lambda i, v: jnp.zeros(n_docs, jnp.float32).at[i].add(
              v, mode="drop", indices_are_sorted=True, unique_indices=True)),
          one_i, one_v)
    ref = sv_ref

    def per_term(it, vt):
        out = jnp.zeros(n_docs + 1, jnp.float32)

        def body(t, acc):
            return acc.at[it[t]].add(
                vt[t], mode="drop",
                indices_are_sorted=True, unique_indices=True)
        return jax.lax.fori_loop(0, it.shape[0], body, out)[:n_docs]

    timed("per_term_hinted", jax.jit(per_term), d_idx_t, d_val_t)

    # per_term unrolled (no fori: lets XLA overlap independent scatters? they
    # share the accumulator so they chain; measure anyway)
    def per_term_unrolled(it, vt):
        out = jnp.zeros(n_docs + 1, jnp.float32)
        for t in range(len(dfs)):
            out = out.at[it[t]].add(
                vt[t], mode="drop",
                indices_are_sorted=True, unique_indices=True)
        return out[:n_docs]

    timed("per_term_unrolled", jax.jit(per_term_unrolled), d_idx_t, d_val_t)

    # independent scatters into separate zero vectors summed at the end
    def per_term_indep(it, vt):
        outs = [
            jnp.zeros(n_docs + 1, jnp.float32).at[it[t]].add(
                vt[t], mode="drop",
                indices_are_sorted=True, unique_indices=True)
            for t in range(len(dfs))
        ]
        return sum(outs)[:n_docs]

    timed("per_term_indep", jax.jit(per_term_indep), d_idx_t, d_val_t)

    # ---- dense heavy-term rows + scatter tail -------------------------
    # BM25 posting contributions are commit-static (g(tf,len); idf/boost
    # are per-term scalars), so heavy terms can be precomputed as dense
    # [n_docs] rows at commit; query-time = weighted row-sum + scatter of
    # only the light-term postings. Measure the composite at several
    # density thresholds.
    for n_heavy in (2, 3, 4):
        rows = np.zeros((n_heavy, n_docs), np.float32)
        for t in range(n_heavy):
            rows[t, idx_l[t]] = val_l[t]
        d_rows = jnp.asarray(rows)
        w = jnp.ones(n_heavy, jnp.float32)
        tail_i = jnp.asarray(np.concatenate(idx_l[n_heavy:]))
        tail_v = jnp.asarray(np.concatenate(val_l[n_heavy:]))

        def dense_plus_tail(rw, wts, ti, tv):
            head = jnp.einsum("h,hd->d", wts, rw)
            return head + jax.ops.segment_sum(tv, ti, num_segments=n_docs)

        timed(f"dense{n_heavy}_tail{sum(dfs[n_heavy:])//1000}k",
              jax.jit(dense_plus_tail), d_rows, w, tail_i, tail_v)

    print(json.dumps({
        "bench": "segsum", "postings": int(P), "docs": n_docs,
        "backend": jax.default_backend(), "results": results}))


if __name__ == "__main__":
    main()
