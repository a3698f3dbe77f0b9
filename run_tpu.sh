#!/bin/bash
# Bootstrap a TPU VM and launch a big_vision_tpu trainer on it.
#
# Usage (on the TPU VM, from the repo root):
#   ./run_tpu.sh big_vision_tpu.train \
#       --config big_vision_tpu/configs/vit_s16_i1k.py --workdir ...
#
# Multi-host: run the same command on every host (gcloud ... --worker=all);
# BV_JAX_INIT=1 makes the trainer call jax.distributed.initialize().

set -e

if [ ! -d "bvt_venv" ]; then
  python3 -m venv bvt_venv
  . bvt_venv/bin/activate
  pip install -U pip
  pip install "jax[tpu]" \
    -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
  pip install flax optax orbax-checkpoint einops ml_collections absl-py \
    pillow numpy
else
  . bvt_venv/bin/activate
fi

if [ $# -ne 0 ]; then
  env PYTHONPATH="$(dirname "$0")" BV_JAX_INIT=1 python3 -m "$@"
fi
