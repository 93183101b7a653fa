"""gabby_tpu: a TPU-native Llama-3 inference engine.

A from-scratch re-design of the capability surface of dhconnelly/gabby
(an OpenAI-compatible chat-completions inference server; see
/root/reference/src/service.cc, /root/reference/src/main.cc) built
TPU-first: JAX/XLA/Pallas for the compute path, a C++ POSIX HTTP
front-end for serving, jax.sharding for multi-chip scale-out.

Layout:
  config.py      model hyperparameters + HF config.json loading
  models/        Llama-3 forward pass (scanned layers, GQA, RoPE)
  ops/           kernels: attention, norms, rope, quantized matmul (Pallas + jnp reference)
  parallel/      device mesh + tensor-parallel partition rules
  runtime/       KV cache, engine, continuous-batching scheduler, generator seam
  tokenizer.py   byte-level BPE (tiktoken-style) from tokenizer.json + chat template
  loader.py      safetensors -> device arrays (sharded, zero-copy host side)
  server/        ctypes binding to the C++ HTTP front-end (cpp/)
"""

__version__ = "0.1.0"
