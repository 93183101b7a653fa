# gabby_tpu serving image — closes the reference's unchecked "docker
# image" TODO (/root/reference/README.md:28) for the TPU-native stack.
#
# Two-stage build: the C++ front-end (HTTP server + JSON + tokenizer +
# bridge) compiles in a throwaway toolchain layer; the runtime layer
# carries only Python + JAX + the built artifacts. Run on a Cloud TPU VM
# (the host exposes /dev/vfio devices; use `--privileged` or the TPU
# device flags) or anywhere with JAX_PLATFORMS=cpu for a CPU smoke.
#
# NOTE: built and reviewed, but NOT exercised by CI in this repository —
# the build environment has no docker daemon and no network egress.
#
#   docker build -t gabby-tpu .
#   docker run --rm -p 8080:8080 -v $HOME/.cache/huggingface:/models \
#     gabby-tpu --model-dir /models/... --quant 4 --kv-quant
#   # CPU smoke (no TPU):
#   docker run --rm -p 8080:8080 -e JAX_PLATFORMS=cpu \
#     gabby-tpu --preset tiny --random-weights

FROM python:3.12-slim AS native-build
RUN apt-get update && apt-get install -y --no-install-recommends \
    g++ cmake ninja-build && rm -rf /var/lib/apt/lists/*
COPY cpp /src/cpp
RUN cmake -S /src/cpp -B /src/cpp/build -G Ninja \
      -DCMAKE_BUILD_TYPE=Release \
    && cmake --build /src/cpp/build

FROM python:3.12-slim
# jax[tpu] pulls libtpu for TPU VMs; harmless (unused) on CPU-only hosts
RUN pip install --no-cache-dir "jax[tpu]==0.9.0" numpy \
      -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
WORKDIR /app
COPY gabby_tpu /app/gabby_tpu
# gabby_tpu.bridge resolves <repo>/cpp/build/libgabby_bridge.so relative
# to the package (= /app here); the standalone binaries ride along
COPY --from=native-build /src/cpp/build/libgabby_bridge.so /app/cpp/build/
COPY --from=native-build /src/cpp/build/gabby /app/cpp/build/
COPY --from=native-build /src/cpp/build/gabby_tokenize /app/cpp/build/
ENV PYTHONPATH=/app
EXPOSE 8080
ENTRYPOINT ["python", "-m", "gabby_tpu.server", "--port", "8080"]
CMD []
