#!/bin/bash
# YFCC in-the-wild evaluation — parity with scripts/eval3d_yfcc.sh: subsets
# of 5/10/20/50 images with matching nviews / num_consistent, native fusion
# replacing the COLMAP stereo_fusion path, --filter on.
MODEL=${1:?usage: eval3d_yfcc.sh <model_dir> [data_path]}
DATA=${2:-datasets/yfcc_subset_dataset}
run_subset () {  # scene_size nviews num_consistent
  local size=$1 nv=$2 nc=$3
  for scene_dir in "$DATA"/sparse/*_"$size"; do
    scene=$(basename "$scene_dir")
    python -m wildmvs.pipeline.reconstruction \
      --dataset yfcc --scene "$scene" --model "$MODEL" --data_path "$DATA" \
      --work_dir "$DATA" --num_consistent "$nc" \
      --fusion_num_consistent "$nc" --compute_metrics
  done
}
run_subset 5 5 3
run_subset 10 5 3
run_subset 20 10 4
run_subset 50 10 5
