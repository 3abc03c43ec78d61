# Container packaging (reference C15 equivalent). The reference shipped a
# TF-1.x CPU image; this one targets TPU VMs (libtpu wheel) and falls back
# to CPU when no TPU is attached.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make libgl1 libglib2.0-0 && \
    rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml README.md ./
COPY crnn_ocr_tpu ./crnn_ocr_tpu
COPY bench.py ./

# TPU VM: jax[tpu]; elsewhere this resolves to CPU jaxlib.
RUN pip install --no-cache-dir "jax[tpu]" \
        -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    || pip install --no-cache-dir jax
RUN pip install --no-cache-dir . opencv-python-headless && \
    make -C crnn_ocr_tpu/native

ENTRYPOINT ["python", "-m", "crnn_ocr_tpu.cli.train"]
