#!/usr/bin/env bash
# Two-step MS-CNN training schedule, reproducing the reference's
# examples/*/*/train_mscnn.sh: stage 1 trains the proposal sub-net from
# VGG16 ImageNet weights, stage 2 warm-starts the joint detection net from
# the stage-1 snapshot. Works with the reference's own solver prototxts.
#
# Usage: ./train_mscnn.sh <model_dir> [vgg16.caffemodel]
#   model_dir contains solver_1st.prototxt / solver_2nd.prototxt
#   (e.g. a checkout of the reference's examples/kitti_car/mscnn-8s-768-trainval)

set -euo pipefail
dir="${1:?usage: $0 <model_dir> [vgg16.caffemodel]}"
vgg="${2:-}"

# make the package importable from anywhere, preserving any existing
# PYTHONPATH entries (e.g. a TPU-plugin sitecustomize directory)
repo="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
export PYTHONPATH="${repo}${PYTHONPATH:+:$PYTHONPATH}"

cd "$dir"
w1=()
[ -n "$vgg" ] && w1=(--weights "$vgg")

python -m mscnn_tpu.cli train --solver solver_1st.prototxt "${w1[@]}" \
  2>&1 | tee log_1st.txt

# stage 2 warm-starts from the stage-1 snapshot (snapshot_prefix in
# solver_1st.prototxt); `mscnn train2` runs both stages and wires the
# warm-start automatically — stage 1 above is shown separately only to
# mirror the reference script's two invocations.
python -m mscnn_tpu.cli train --solver solver_2nd.prototxt \
  --weights "$(python - <<'EOF'
from mscnn_tpu.config import prototxt as PB
from mscnn_tpu.io import checkpoint as CKPT
fields = PB.parse_prototxt_file("solver_1st.prototxt")
print(CKPT.latest_snapshot(str(fields.get("snapshot_prefix", "mscnn"))))
EOF
)" 2>&1 | tee log_2nd.txt
