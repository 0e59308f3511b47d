#!/bin/bash
# Round-5 clean-host int8 step-up (VERDICT r4 next #7): re-run the rows
# the r4 table shipped contaminated (16M, 24M ran against a competing
# pytest on the 1-core host) plus the 12M/30M anchors, uncontended, with
# the new DEVICE-ONLY amortized measurement (ms/chunk x N_CHUNKS) that
# isolates device scaling from the relay-flat wall numbers.
cd /root/repo
: > /tmp/int8_stepup_r5.log
for M in 12 16 24 30; do
  echo "=== ${M}M ===" >> /tmp/int8_stepup_r5.log
  timeout 2400 python benchmarks/int8_30m_bench.py --docs ${M}000000 --phase1 xla \
    > /tmp/int8_${M}m_r5.json 2>>/tmp/int8_stepup_r5.log
  rc=$?
  echo "exit=${rc}" >> /tmp/int8_stepup_r5.log
  if [ $rc -ne 0 ]; then
    echo "=== ${M}M FAILED (rc=$rc) — stopping step-up ===" >> /tmp/int8_stepup_r5.log
    timeout 300 python -c "import jax, jax.numpy as jnp, numpy as np; print('relay ok', float(np.asarray(jnp.sum(jnp.ones((128,128)) @ jnp.ones((128,128))))))" >> /tmp/int8_stepup_r5.log 2>&1
    break
  fi
done
touch /tmp/int8_stepup_r5_done
