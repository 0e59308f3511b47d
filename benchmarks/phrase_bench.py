"""Phrase reduction microbench: cumsum+bounds-gather vs windowed kernel.

The phrase pass was the #2 device cost in every multi-token p50 at 1M
docs (~21-42 ms at 20M positions, r3 notes). The windowed kernel
(ops/bm25.phrase_boost_docmajor_windowed) replaces the 20M cumsum and
the 1M random bounds-gather with commit-static block windows: Pallas VPU
binning into per-block doc windows + a page one-hot MXU matmul combine.
This bench times both formulations on the same synthetic 1M-doc /
20M-position doc-major stream with ALL iterations inside ONE program
(optimization_barrier loop — per-dispatch relay noise removed), after
validating them against each other bit-for-bit.

Run on the real chip:

    python benchmarks/phrase_bench.py [--docs 1000000] [--positions 20000000]

Prints one JSON object to stdout.
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
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--positions", type=int, default=20_000_000)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--spans", type=int, default=4, help="span bucket")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        cache = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache",
        )
        try:
            jax.config.update("jax_compilation_cache_dir", cache)
        except Exception:
            pass

    from orama_core_tpu.ops import bm25 as b

    rng = np.random.default_rng(0)
    n_docs, pp = args.docs, args.positions
    log(f"synthesizing {pp/1e6:.0f}M positions over {n_docs/1e6:.1f}M docs")
    # doc-major stream: per-doc position runs (Zipf-ish doc lengths)
    lens = rng.integers(8, 33, n_docs).astype(np.int64)
    scale = pp / lens.sum()
    lens = np.maximum((lens * scale).astype(np.int64), 1)
    pp_real = int(lens.sum())
    bounds = np.zeros(n_docs + 1, np.int64)
    np.cumsum(lens, out=bounds[1:])
    docs_col = np.repeat(np.arange(n_docs, dtype=np.int32), lens)
    poss_col = (
        np.arange(pp_real, dtype=np.int64) - bounds[docs_col]
    ).astype(np.int32)
    # terms: Zipf over 50k ids — phrase spans match the head
    terms_col = (
        np.random.default_rng(1).zipf(1.3, pp_real).clip(1, 50_000) - 1
    ).astype(np.int32)

    PB = b._PH_PB * b._PH_GRP
    pp_pad = -(-pp_real // PB) * PB
    d_col = np.full(pp_pad, b.PAD_DOC, np.int32)
    p_col = np.zeros(pp_pad, np.int32)
    t_col = np.zeros(pp_pad, np.int32)
    d_col[:pp_real] = docs_col
    p_col[:pp_real] = poss_col
    t_col[:pp_real] = terms_col

    meta = b.phrase_window_meta(bounds, pp_real, pp_pad)
    assert meta is not None, "windowed path unavailable on this stream"
    w_base, W, wsub = meta
    log(f"window meta: W={W} wsub={wsub} blocks={pp_pad // PB}")

    spans = np.zeros((args.spans, 2), np.int32)
    spans[0] = (0, 2)      # two head terms (heavy)
    spans[1] = (17, 18)    # mid term
    d_dev = jnp.asarray(d_col)
    p_dev = jnp.asarray(p_col)
    t_dev = jnp.asarray(t_col)
    bounds_dev = jnp.asarray(bounds, jnp.int32)
    wb_dev = jnp.asarray(w_base)
    spans_dev = jnp.asarray(spans)
    boost = jnp.float32(1.5)
    interp = jax.default_backend() != "tpu"

    def f_cumsum(d, p, t, bd, sp):
        return b.phrase_boost_docmajor(
            d, p, t, bd, sp, boost, n_docs=n_docs
        )

    # combine= is pinned per leg: the engine default flipped to "segsum",
    # so the onehot baseline must be requested explicitly to stay measured
    def f_windowed(d, p, t, wb, sp):
        return b.phrase_boost_docmajor_windowed(
            d, p, t, wb, sp, boost, n_docs=n_docs, W=W, wsub=wsub,
            interpret=interp, combine="onehot",
        )

    bits_dev = b.phrase_static_bits(d_dev, p_dev)

    def f_windowed_bits(d, p, t, wb, sp):
        return b.phrase_boost_docmajor_windowed(
            d, p, t, wb, sp, boost, n_docs=n_docs, W=W, wsub=wsub,
            interpret=interp, bits=bits_dev, combine="onehot",
        )

    def f_windowed_segsum(d, p, t, wb, sp):
        return b.phrase_boost_docmajor_windowed(
            d, p, t, wb, sp, boost, n_docs=n_docs, W=W, wsub=wsub,
            interpret=interp, bits=bits_dev, combine="segsum",
        )

    results = {"W": W, "wsub": wsub, "positions": pp_real, "docs": n_docs}
    ref = None
    R = args.iters
    for name, fn, xs in (
        ("cumsum", f_cumsum, (d_dev, p_dev, t_dev, bounds_dev, spans_dev)),
        ("windowed", f_windowed, (d_dev, p_dev, t_dev, wb_dev, spans_dev)),
        ("windowed_bits", f_windowed_bits,
         (d_dev, p_dev, t_dev, wb_dev, spans_dev)),
        ("windowed_bits_segsum", f_windowed_segsum,
         (d_dev, p_dev, t_dev, wb_dev, spans_dev)),
    ):
        t0 = time.time()
        out = fn(*xs)
        out.block_until_ready()
        log(f"  [{name}] compile+first: {time.time()-t0:.1f}s")
        if ref is None:
            ref = np.asarray(out)
            err = 0.0
        else:
            err = float(np.max(np.abs(np.asarray(out) - ref)))

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
        log(f"  [{name}] {dt:.2f} ms  max-abs-err {err:.2e}")
        results[name] = {"ms": round(dt, 3), "err": err}

    print(json.dumps(results))


if __name__ == "__main__":
    main()
