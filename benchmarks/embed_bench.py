"""Embedding throughput benchmark.

The reference's only concrete published number (BASELINE.md): "up to 1,200
embeddings per second" on an RTX 4080 Super (fastembed/ONNX). This measures
the in-process JAX encoder at BGE-small scale (12 layers, 384 hidden, 33M
params) on the TPU chip.

    python benchmarks/embed_bench.py [--batch 64] [--seq 128]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--seq", type=int, default=128)
    ap.add_argument("--iters", type=int, default=30)
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
    import numpy as np

    from orama_core_tpu.models import encoder as enc

    # BGE-small-en-v1.5 scale
    cfg = enc.EncoderConfig(
        vocab_size=30522, hidden=384, layers=12, heads=12, mlp=1536,
        max_len=512, out_dim=384,
    )
    params = enc.init_params(jax.random.PRNGKey(0), cfg)
    log(f"device: {jax.devices()[0]}, model: L{cfg.layers} H{cfg.hidden} (BGE-small scale)")

    b, l = args.batch, args.seq
    ids = jnp.asarray(
        np.random.default_rng(0).integers(1, cfg.vocab_size, (b, l)), jnp.int32
    )
    mask = jnp.ones((b, l), jnp.float32)

    @jax.jit
    def fwd(p, i, m):
        return enc.encode(p, cfg, i, m)

    @jax.jit
    def chain(p, i, m, carry):
        out = enc.encode(p, cfg, i, m)
        return jnp.sum(out[0]) + carry * 0.0

    t0 = time.time()
    out = fwd(params, ids, mask)
    _ = np.asarray(out)
    log(f"compile+run: {time.time()-t0:.1f}s, out {out.shape}")

    c = np.asarray(chain(params, ids, mask, jnp.float32(0)))
    t0 = time.time()
    carry = jnp.float32(0.0)
    for _ in range(args.iters):
        carry = chain(params, ids, mask, carry)
    _ = np.asarray(carry)
    dt = time.time() - t0
    eps = b * args.iters / dt
    log(f"{args.iters} x {b} texts (seq {l}) in {dt:.2f}s")
    print(
        json.dumps(
            {
                "metric": f"embeddings_per_sec_bge_small_seq{l}",
                "value": round(eps, 1),
                "unit": "embeddings/s",
                "vs_reference_rtx4080": round(eps / 1200.0, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
