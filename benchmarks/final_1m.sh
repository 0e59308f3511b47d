#!/bin/bash
cd "$(dirname "$0")/.."
python -u benchmarks/hybrid_1m_bench.py --queries 64 2>/tmp/h1m5a.log >/tmp/h1m5a.json
echo PASS1_DONE >> /tmp/h1m5a.log
python -u benchmarks/hybrid_1m_bench.py --queries 64 2>/tmp/h1m5b.log >/tmp/h1m5b.json
echo PASS2_DONE >> /tmp/h1m5b.log
