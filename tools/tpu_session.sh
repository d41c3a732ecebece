#!/bin/bash
# Round-3 TPU measurement sequence: waits for the tunnel, then runs the
# bench (training-res + eval-res configs) and the 3-arch train-step
# timings, serially (CLAUDE.md: concurrent tunnel sessions contend).
cd /root/repo
log=tpu_session.log
echo "=== waiting for tunnel $(date)" >> $log
until timeout 90 python -c "import jax,jax.numpy as j; float(j.ones((4,)).sum())" >/dev/null 2>&1; do
  sleep 180
done
echo "=== tunnel up $(date)" >> $log
echo "--- bench (all configs)" >> $log
WILDMVS_BENCH_EXTRAS=1 WILDMVS_BENCH_EVALRES=1 timeout 5400 python bench.py >> $log 2> >(tail -40 >> $log)
echo "bench rc=$? $(date)" >> $log
for args in "mvsnet bfloat16 batched_bn" "vis_mvsnet bfloat16 batched_bn" "vis_mvsnet float32" "cvp_mvsnet bfloat16 batched_bn" "cvp_mvsnet float32"; do
  echo "--- time_train $args $(date)" >> $log
  timeout 2700 python tools/time_train.py $args >> $log 2>&1
  echo "rc=$?" >> $log
done
echo "=== sequence done $(date)" >> $log
