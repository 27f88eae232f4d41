# islands-tpu container (reference parity: multi-stage Dockerfile).
# Runtime expects a TPU-visible environment (GKE TPU node pool or similar);
# CPU fallback works for the host layers and tests.
FROM python:3.12-slim AS builder
RUN apt-get update && apt-get install -y --no-install-recommends g++ git \
    && rm -rf /var/lib/apt/lists/*
WORKDIR /app
COPY pyproject.toml README.md ./
COPY islands_tpu ./islands_tpu
COPY native ./native
RUN pip install --no-cache-dir "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html || \
    pip install --no-cache-dir jax
RUN pip install --no-cache-dir .

FROM python:3.12-slim
RUN apt-get update && apt-get install -y --no-install-recommends g++ git \
    && rm -rf /var/lib/apt/lists/*
COPY --from=builder /usr/local/lib/python3.12/site-packages /usr/local/lib/python3.12/site-packages
COPY --from=builder /usr/local/bin/islands-tpu /usr/local/bin/islands-tpu
COPY --from=builder /app/native /opt/islands-tpu/native
ENV ISLANDS_BASE_PATH=/data/islands
VOLUME /data
ENTRYPOINT ["islands-tpu"]
CMD ["mcp"]
