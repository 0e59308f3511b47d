#!/bin/bash
# Sequential TPU benchmark chain (one device; avoid tunnel contention).
# Probe-gated: exits early if the relay is down (see BENCH_NOTES relay
# caveats — sessions wedge, worker has multi-hour outages).
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/tpu_benches3.log}

echo "=== probe ===" > "$LOG"
timeout 300 python -u -c "
import numpy as np, time
t0 = time.time()
import jax, jax.numpy as jnp
x = np.asarray(jnp.ones(4) + 1)
print('probe ok', x.sum(), round(time.time() - t0, 1), 's')
" >> "$LOG" 2>&1 || { echo "PROBE FAILED — relay down" >> "$LOG"; exit 1; }

echo "=== bench.py (headline: 1M x 768 exact kNN) ===" >> "$LOG"
timeout 1800 python -u bench.py >> "$LOG" 2>&1

echo "=== engine_bench 100k (BASELINE config 1: fulltext w/ boosts) ===" >> "$LOG"
timeout 1800 python -u benchmarks/engine_bench.py --docs 100000 --queries 200 >> "$LOG" 2>&1

echo "=== embed_bench (embeddings/s vs reference 1200/s claim) ===" >> "$LOG"
timeout 1200 python -u benchmarks/embed_bench.py >> "$LOG" 2>&1

echo "=== pq_100m_bench 30M (config 5 per-chip; rows regenerated on device) ===" >> "$LOG"
timeout 2400 python -u benchmarks/pq_100m_bench.py --docs 30000000 >> "$LOG" 2>&1

echo "=== pq_100m_bench 100M ===" >> "$LOG"
timeout 3600 python -u benchmarks/pq_100m_bench.py --docs 100000000 >> "$LOG" 2>&1

echo "=== ALL DONE ===" >> "$LOG"
