# Container image for nerf_and_dietnerf_tpu.
#
# TPU-native equivalent of the reference's two-stage GPU image
# (contain_dockerfile_for_base_environment/Dockerfile + Dockerfile): instead
# of TF 2.7 + CUDA, a JAX TPU wheel against the libtpu runtime. Run on a
# Cloud TPU VM (the TPU is exposed to the container via /dev and the
# host-side libtpu, --privileged or device mapping).

FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        libgl1 libglib2.0-0 ffmpeg git \
    && rm -rf /var/lib/apt/lists/*

# TPU JAX stack + the framework's dependencies.
RUN pip install --no-cache-dir \
        "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
        optax orbax-checkpoint flax chex einops \
        numpy pyyaml h5py imageio opencv-python-headless matplotlib \
        safetensors

WORKDIR /workspace
COPY nerf_and_dietnerf_tpu ./nerf_and_dietnerf_tpu
COPY tools ./tools
COPY bench.py ./
COPY config_files ./config_files
# Datasets are NOT baked in (unlike the reference, which copies Assets/ into
# the image) — mount them or sync from GCS at startup.

ENV PYTHONPATH=/workspace
ENTRYPOINT ["python", "-m", "nerf_and_dietnerf_tpu.main"]
