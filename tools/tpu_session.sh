#!/bin/bash
# Round-3 TPU measurement sequence (serial; CLAUDE.md: concurrent tunnel
# sessions contend). Headline-only bench first for fast signal on the
# dispatch fix, then the full bench (true eval-protocol configs — also
# pre-warms .jax_cache for the driver's run), then train-step timings.
cd /root/repo
log=tpu_session.log
echo "=== session2 start $(date)" >> $log
until timeout 90 python -c "import jax,jax.numpy as j; float(j.ones((4,)).sum())" >/dev/null 2>&1; do
  sleep 180
done
echo "=== tunnel up $(date)" >> $log
echo "--- bench headline-only" >> $log
WILDMVS_BENCH_EXTRAS=0 WILDMVS_BENCH_EVALRES=0 timeout 2400 python bench.py >> $log 2>/dev/null
echo "rc=$? $(date)" >> $log
echo "--- bench full (eval-protocol configs)" >> $log
timeout 9000 python bench.py >> $log 2> >(tail -25 >> $log)
echo "rc=$? $(date)" >> $log
for args in "mvsnet bfloat16 batched_bn" "vis_mvsnet bfloat16 batched_bn" "vis_mvsnet float32" "cvp_mvsnet bfloat16 batched_bn" "cvp_mvsnet float32"; do
  echo "--- time_train $args $(date)" >> $log
  timeout 2700 python tools/time_train.py $args >> $log 2>&1
  echo "rc=$?" >> $log
done
echo "=== sequence done $(date)" >> $log
