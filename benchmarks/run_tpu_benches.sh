#!/bin/bash
# Sequential TPU benchmark chain (one device; avoid tunnel contention).
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/tpu_benches2.log}
echo "=== hybrid_1m_bench (span path) ===" > "$LOG"
python -u benchmarks/hybrid_1m_bench.py --queries 100 >> "$LOG" 2>&1
echo "=== embed_bench ===" >> "$LOG"
python -u benchmarks/embed_bench.py >> "$LOG" 2>&1
echo "=== engine_bench (span path) ===" >> "$LOG"
python -u benchmarks/engine_bench.py --docs 10000 --queries 60 >> "$LOG" 2>&1
echo "=== ALL DONE ===" >> "$LOG"
