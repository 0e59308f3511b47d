"""Exact int8 kNN at 30M vectors on ONE chip (toward BASELINE config 5's
compressed-at-scale story; the sharded variant is parallel/sharded_int8_topk).

30M x 384 int8 = 11.5 GB — fits a single v5e HBM where bf16 (23 GB) cannot.

    python benchmarks/int8_30m_bench.py [--docs 30000000]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=30_000_000)
    ap.add_argument("--dim", type=int, default=384)
    ap.add_argument("--queries", type=int, default=64)
    ap.add_argument("--block", type=int, default=4096)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        cache = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
        )
        try:
            jax.config.update("jax_compilation_cache_dir", cache)
        except Exception:
            pass

    import jax.numpy as jnp

    from orama_core_tpu.ops.pallas_knn import knn_topk_int8

    N, D, QB, K = args.docs, args.dim, args.queries, 10
    BN = args.block
    N_PAD = ((N + BN - 1) // BN) * BN
    log(f"device {jax.devices()[0]}; int8 corpus {N_PAD}x{D} "
        f"({N_PAD*D/1e9:.1f} GB + scales)")

    CHUNK = min(1_000_000, N_PAD)
    while N_PAD % CHUNK:
        CHUNK //= 2

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def fill_chunk(codes, scales, k, start):
        v = jax.random.normal(k, (CHUNK, D), jnp.float32)
        v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
        absmax = jnp.maximum(jnp.max(jnp.abs(v), axis=-1), 1e-9)
        sc = absmax / 127.0
        c8 = jnp.clip(jnp.round(v / sc[:, None]), -127, 127).astype(jnp.int8)
        codes = jax.lax.dynamic_update_slice(codes, c8, (start, 0))
        scales = jax.lax.dynamic_update_slice(scales, sc, (start,))
        return codes, scales

    t0 = time.time()
    codes = jnp.zeros((N_PAD, D), jnp.int8)
    scales = jnp.zeros((N_PAD,), jnp.float32)
    for ci in range(N_PAD // CHUNK):
        codes, scales = fill_chunk(
            codes, scales, jax.random.fold_in(jax.random.PRNGKey(0), ci), ci * CHUNK
        )
    _ = np.asarray(scales[0])
    log(f"corpus built (chunked) in {time.time()-t0:.1f}s")

    queries = jax.random.normal(jax.random.PRNGKey(9), (QB, D), jnp.float32)
    queries = queries / jnp.linalg.norm(queries, axis=-1, keepdims=True)

    @jax.jit
    def chain(c, s, q, carry):
        vv, _ = knn_topk_int8(
            c, s, q + carry * 0.0, k=K, block_rows=BN, n_valid=N,
            interpret=args.cpu,
        )
        return jnp.max(vv)

    t0 = time.time()
    _ = np.asarray(chain(codes, scales, queries, jnp.float32(0.0)))
    log(f"first call (compile+run+sync): {time.time()-t0:.1f}s")

    ITERS = 20
    t0 = time.time()
    carry = jnp.float32(0.0)
    for _ in range(ITERS):
        carry = chain(codes, scales, queries, carry)
    _ = np.asarray(carry)
    dt = time.time() - t0
    qps = QB * ITERS / dt
    log(f"{ITERS} x {QB} queries in {dt:.2f}s")
    print(
        json.dumps(
            {
                "metric": f"int8_exact_knn_qps_{N//1_000_000}Mx{D}_top10",
                "value": round(qps, 1),
                "unit": "qps",
                "ms_per_batch": round(dt / ITERS * 1e3, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
