# Backend serving image (reference back-end/Dockerfile capability).
# The API itself is stdlib-only; jax/flax provide the compute path.  On a
# real TPU VM, base this on a TPU-enabled jax image instead and the same
# code serves from the chip.
FROM python:3.11-slim

RUN apt-get update \
    && apt-get install -y --no-install-recommends ffmpeg g++ make \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /srv/app
COPY pyproject.toml ./
COPY mmer_tpu ./mmer_tpu
COPY native ./native
RUN pip install --no-cache-dir "jax[cpu]" flax optax orbax-checkpoint \
        opencv-python-headless scikit-learn scipy numpy \
    && pip install --no-cache-dir -e . \
    && make -C native

COPY start.sh ./
RUN chmod +x start.sh
EXPOSE 8000
CMD ["./start.sh"]
