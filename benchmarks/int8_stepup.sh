#!/bin/bash
# 30M int8 capacity step-up (VERDICT r3 item 6): find the largest corpus
# the relay sustains, recording the exact failure beyond it.
cd /root/repo
for M in 12 16 20 24 30; do
  echo "=== ${M}M ===" >> /tmp/int8_stepup.log
  timeout 2400 python benchmarks/int8_30m_bench.py --docs ${M}000000 --phase1 xla \
    > /tmp/int8_${M}m.json 2>>/tmp/int8_stepup.log
  rc=$?
  echo "exit=${rc}" >> /tmp/int8_stepup.log
  if [ $rc -ne 0 ]; then
    echo "=== ${M}M FAILED (rc=$rc) — stopping step-up ===" >> /tmp/int8_stepup.log
    # probe relay health before giving up entirely
    timeout 300 python -c "import jax, jax.numpy as jnp, numpy as np; print('relay ok', float(np.asarray(jnp.sum(jnp.ones((128,128)) @ jnp.ones((128,128))))))" >> /tmp/int8_stepup.log 2>&1
    break
  fi
done
touch /tmp/int8_stepup_done
