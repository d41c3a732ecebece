#!/bin/bash
# DTU 3D evaluation sweep — parity with the reference's scripts/eval3d_dtu.sh
# (fusion depth threshold 0.25, same scan list, extra args pass through),
# driving the native fusion kernel instead of the external fusibile binary.
set -e
MODEL=${1:?usage: eval3d_dtu.sh <model_dir> [data_path] [extra args...]}
DATA=${2:-datasets/dtu_eval}
shift; if [ $# -gt 0 ]; then shift; fi
SCANS="1 4 9 10 11 12 13 15 23 24 29 32 33 34 48 49 62 75 77 110 114 118"
for s in $SCANS; do
  python -m wildmvs.pipeline.reconstruction \
    --dataset dtu --scene scan$s --model "$MODEL" --data_path "$DATA" \
    --work_dir "$DATA" --fusion fusibile --fusion_depth_threshold 0.25 \
    --fusion_num_consistent 3 --compute_metrics --override "$@"
done
