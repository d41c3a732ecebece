#!/bin/bash
# Round-3 TPU sequence #3: waits for the in-flight time_train sequence to
# finish, then re-runs the FULL bench with the tier-B kernels + realistic
# DTU rig eval configs (cold compiles — generous timeout; also pre-warms
# .jax_cache for the driver's run).
cd /root/repo
log=tpu_session.log
while pgrep -f "tools/tpu_session.sh" > /dev/null && [ -z "$DONE" ]; do
  # previous sequence still running its time_train tail
  if tail -1 $log | grep -q "sequence done"; then DONE=1; break; fi
  sleep 120
done
echo "=== session3 (tier-B bench) start $(date)" >> $log
until timeout 90 python -c "import jax,jax.numpy as j; float(j.ones((4,)).sum())" >/dev/null 2>&1; do
  sleep 180
done
echo "--- bench full tier-B + realistic rig" >> $log
timeout 10800 python bench.py >> $log 2> >(tail -30 >> $log)
echo "rc=$? $(date)" >> $log
echo "=== session3 done $(date)" >> $log
