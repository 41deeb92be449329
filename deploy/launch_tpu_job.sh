#!/usr/bin/env bash
# Launch a training job on a Cloud TPU VM (single host or pod slice).
#
# TPU-native replacement for the reference's Vertex AI A100 launcher
# (custom_job_launcher.sh:24-46). Creates a TPU VM, ships the repo, runs the
# config(s), and syncs results to GCS.
#
# Usage:
#   deploy/launch_tpu_job.sh -n my-job -t v5litepod-8 -z us-central2-b \
#       -c config_files/256px_alexander_71pics_sphere_nerf.yaml \
#       -b gs://my-bucket/nerf-results
set -euo pipefail

NAME="nerf-tpu-job"
TYPE="v5litepod-8"           # accelerator type; pods (e.g. v5litepod-64) work too
ZONE="us-central2-b"
VERSION="tpu-ubuntu2204-base"
CONFIG=""
BUCKET=""

while getopts "n:t:z:c:b:" opt; do
  case $opt in
    n) NAME="$OPTARG" ;;
    t) TYPE="$OPTARG" ;;
    z) ZONE="$OPTARG" ;;
    c) CONFIG="$OPTARG" ;;
    b) BUCKET="$OPTARG" ;;
    *) echo "usage: $0 -n name -t type -z zone -c config.yaml [-b gs://bucket]"; exit 1 ;;
  esac
done
[[ -n "$CONFIG" ]] || { echo "missing -c config"; exit 1; }

echo ">> creating TPU VM $NAME ($TYPE in $ZONE)"
gcloud compute tpus tpu-vm create "$NAME" \
  --zone="$ZONE" --accelerator-type="$TYPE" --version="$VERSION"

echo ">> shipping repo"
tar czf /tmp/nerf_tpu_src.tgz nerf_and_dietnerf_tpu tools bench.py config_files Assets 2>/dev/null \
  || tar czf /tmp/nerf_tpu_src.tgz nerf_and_dietnerf_tpu tools bench.py config_files
gcloud compute tpus tpu-vm scp /tmp/nerf_tpu_src.tgz "$NAME":~ --zone="$ZONE" --worker=all

RUN_CMD="tar xzf nerf_tpu_src.tgz && \
  pip install -q 'jax[tpu]' -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    optax orbax-checkpoint h5py imageio opencv-python-headless matplotlib pyyaml safetensors && \
  python -m nerf_and_dietnerf_tpu.main $CONFIG --distributed"
[[ -n "$BUCKET" ]] && RUN_CMD+=" && gsutil -m rsync -r Results $BUCKET/$NAME"

echo ">> running job on all workers"
gcloud compute tpus tpu-vm ssh "$NAME" --zone="$ZONE" --worker=all --command="$RUN_CMD"

echo ">> done; delete with: gcloud compute tpus tpu-vm delete $NAME --zone=$ZONE"
