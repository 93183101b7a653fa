"""Model-asset loading: HF model dir -> (ModelConfig, params pytree, Tokenizer).

Extends the seam the reference dead-ends at: its Safetensors class mmaps the
file and parses the header but exposes no tensor bytes
(/root/reference/src/inference/safetensors.h:19-24). Here the header's
dtype/shape/offset triples become zero-copy numpy views over a memmap, which
are stacked per-layer and handed to jax.device_put (optionally quantized
first, so INT4/INT8 checkpoints never materialize in bf16 on device).

A C++ mmap safetensors reader with the same semantics serves the native
front-end (cpp/src/inference/safetensors.{h,cc}).
"""

from __future__ import annotations

import json
import os
import struct
from typing import Any, Optional

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np

from gabby_tpu.config import ModelConfig
from gabby_tpu.ops import quant

_DTYPES = {
    "F64": np.float64, "F32": np.float32, "F16": np.float16,
    "BF16": ml_dtypes.bfloat16, "I64": np.int64, "I32": np.int32,
    "I16": np.int16, "I8": np.int8, "U8": np.uint8, "BOOL": np.bool_,
}
_TO_SFT = {np.dtype(v): k for k, v in _DTYPES.items()}


def read_safetensors(path: str) -> dict[str, np.ndarray]:
    """Parse one .safetensors file into name -> zero-copy memmap views."""
    with open(path, "rb") as f:
        header_len = struct.unpack("<Q", f.read(8))[0]
        header = json.loads(f.read(header_len))
    data_start = 8 + header_len
    mm = np.memmap(path, dtype=np.uint8, mode="r")
    out: dict[str, np.ndarray] = {}
    for name, info in header.items():
        if name == "__metadata__":
            continue
        dtype = _DTYPES[info["dtype"]]
        begin, end = info["data_offsets"]
        view = mm[data_start + begin: data_start + end]
        out[name] = view.view(dtype).reshape(info["shape"])
    return out


def write_safetensors(path: str, tensors: dict[str, np.ndarray]) -> None:
    header: dict[str, Any] = {}
    offset = 0
    blobs = []
    for name, arr in tensors.items():
        arr = np.ascontiguousarray(arr)
        blobs.append(arr)
        header[name] = {
            "dtype": _TO_SFT[arr.dtype],
            "shape": list(arr.shape),
            "data_offsets": [offset, offset + arr.nbytes],
        }
        offset += arr.nbytes
    hjson = json.dumps(header).encode()
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(hjson)))
        f.write(hjson)
        for b in blobs:
            f.write(b.tobytes())


def read_model_tensors(model_dir: str) -> dict[str, np.ndarray]:
    """Single- or multi-shard (index.json) safetensors directory."""
    index = os.path.join(model_dir, "model.safetensors.index.json")
    if os.path.exists(index):
        with open(index) as f:
            weight_map: dict[str, str] = json.load(f)["weight_map"]
        tensors: dict[str, np.ndarray] = {}
        for fname in sorted(set(weight_map.values())):
            tensors.update(read_safetensors(os.path.join(model_dir, fname)))
        return tensors
    return read_safetensors(os.path.join(model_dir, "model.safetensors"))


def _maybe_quantize(w: np.ndarray, bits: Optional[int], dtype) -> Any:
    if bits is None:
        return jnp.asarray(w, dtype)
    return quant.quantize(jnp.asarray(w, jnp.float32), bits)


def _stack_q(qs: list) -> Any:
    if isinstance(qs[0], quant.QTensor):
        return quant.QTensor(q=jnp.stack([t.q for t in qs]),
                             scale=jnp.stack([t.scale for t in qs]),
                             bits=qs[0].bits)
    return jnp.stack(qs)


def load_llama_params(model_dir: str, cfg: ModelConfig, *, dtype=jnp.bfloat16,
                      quant_bits: Optional[int] = None,
                      device_put_fn=None) -> dict:
    """HF Llama checkpoint -> our stacked params pytree.

    HF nn.Linear weights are [out, in]; ours are [in, out] (x @ w), so each
    projection is transposed once on the host. `device_put_fn(path, array)`
    lets the caller place each leaf with a NamedSharding (parallel/loader
    integration); default is plain device_put.
    """
    t = read_model_tensors(model_dir)
    put = device_put_fn or (lambda path, x: x)

    def proj(name: str, l: int) -> np.ndarray:
        return np.ascontiguousarray(
            t[f"model.layers.{l}.{name}.weight"].transpose(1, 0))

    names = {
        "wq": "self_attn.q_proj", "wk": "self_attn.k_proj",
        "wv": "self_attn.v_proj", "wo": "self_attn.o_proj",
        "w_gate": "mlp.gate_proj", "w_up": "mlp.up_proj",
        "w_down": "mlp.down_proj",
    }
    blocks: dict[str, Any] = {}
    for ours, hf in names.items():
        per_layer = [_maybe_quantize(proj(hf, l), quant_bits, dtype)
                     for l in range(cfg.num_layers)]
        blocks[ours] = put(("blocks", ours), _stack_q(per_layer))
    for ours, hf in (("attn_norm", "input_layernorm"),
                     ("mlp_norm", "post_attention_layernorm")):
        blocks[ours] = put(("blocks", ours), jnp.stack([
            jnp.asarray(t[f"model.layers.{l}.{hf}.weight"], dtype)
            for l in range(cfg.num_layers)]))

    params: dict[str, Any] = {
        "embed": put(("embed",), jnp.asarray(t["model.embed_tokens.weight"], dtype)),
        "blocks": blocks,
        "final_norm": put(("final_norm",), jnp.asarray(t["model.norm.weight"], dtype)),
        "lm_head": None,
    }
    if not cfg.tie_word_embeddings:
        head = np.ascontiguousarray(t["lm_head.weight"].transpose(1, 0))
        # untied lm_head is still THE unembed stream: route it through the
        # same policy as the tied case (int8 per-channel default, int4 +
        # group scales via GABBY_UNEMBED_BITS=4) instead of per-channel
        # quantization at quant_bits
        params["lm_head"] = put(("lm_head",),
                                quant.quantize_unembed_table(head)
                                if quant_bits else
                                _maybe_quantize(head, quant_bits, dtype))
    elif quant_bits:
        # tied embeddings + quantized serve: give the unembed its own
        # quantized [D, V] copy so decode stops streaming the bf16 table
        # (INT8 default; INT4 + group scales via GABBY_UNEMBED_BITS=4 —
        # see ops/quant.quantize_tree's quantize_unembed note)
        head = np.ascontiguousarray(
            t["model.embed_tokens.weight"].transpose(1, 0))
        params["lm_head"] = put(("lm_head",),
                                quant.quantize_unembed_table(head))
    return params


# ---- pre-quantized checkpoints (quantize once, serve many times) -------

GABBY_META = "gabby.json"


def _flatten_params(params: dict, prefix="") -> tuple[dict[str, np.ndarray],
                                                      dict[str, list]]:
    """Params pytree -> (flat tensors, per-QTensor [bits, group]).
    QTensor leaves become <name>.q / <name>.scale."""
    flat: dict[str, np.ndarray] = {}
    qbits: dict[str, list] = {}
    for k, v in params.items():
        name = f"{prefix}{k}"
        if v is None:
            continue
        if isinstance(v, dict):
            sub, subbits = _flatten_params(v, name + ".")
            flat.update(sub)
            qbits.update(subbits)
        elif isinstance(v, quant.QTensor):
            flat[name + ".q"] = np.asarray(v.q)
            flat[name + ".scale"] = np.asarray(v.scale)
            qbits[name] = [v.bits, v.group]
        else:
            flat[name] = np.asarray(v)
    return flat, qbits


def save_quantized(out_dir: str, cfg: ModelConfig, params: dict,
                   bits: int, *, src_dir: Optional[str] = None) -> None:
    """Writes a pre-quantized checkpoint: the params pytree flattened into
    one safetensors file + gabby.json metadata; tokenizer/config JSONs are
    copied from src_dir when given so the directory serves standalone."""
    import shutil

    os.makedirs(out_dir, exist_ok=True)
    flat, qbits = _flatten_params(params)
    write_safetensors(os.path.join(out_dir, "model.safetensors"), flat)
    with open(os.path.join(out_dir, GABBY_META), "w") as f:
        json.dump({"format": "gabby-quant", "bits": bits, "qbits": qbits,
                   # int4 nibble pairing of quant.pack_int4 (round 4
                   # switched interleaved -> halfsplit); loaders reject
                   # mismatched checkpoints instead of silently decoding
                   # garbage weights
                   "int4_packing": "halfsplit",
                   "config": {k: v for k, v in cfg.__dict__.items()
                              if k != "rope_scaling"},
                   "rope_scaling": (cfg.rope_scaling.__dict__
                                    if cfg.rope_scaling else None)}, f)
    if src_dir:
        for name in ("config.json", "generation_config.json",
                     "tokenizer.json", "tokenizer_config.json",
                     "special_tokens_map.json"):
            src = os.path.join(src_dir, name)
            if os.path.exists(src):
                shutil.copy(src, os.path.join(out_dir, name))


def load_quantized(model_dir: str, *, max_seq_len: Optional[int] = None,
                   dtype=jnp.bfloat16, device_put_fn=None):
    """Loads a save_quantized() directory. Returns (cfg, params, bits)."""
    with open(os.path.join(model_dir, GABBY_META)) as f:
        meta = json.load(f)
    assert meta.get("format") == "gabby-quant", "not a gabby checkpoint"
    # qbits values: [bits, group] (current) or bare int bits (round-2
    # files) — normalize BEFORE inspecting, or legacy files TypeError here
    has_int4 = any(
        (bg[0] if isinstance(bg, (list, tuple)) else bg) == 4
        for bg in meta.get("qbits", {}).values()) or meta.get("bits") == 4
    if has_int4:
        packing = meta.get("int4_packing", "interleaved")
        if packing != "halfsplit":
            raise ValueError(
                f"checkpoint uses int4 packing '{packing}' but this build "
                f"reads 'halfsplit' (round-4 layout change) — re-run "
                f"tools/quantize.py from the original weights")
    from gabby_tpu.config import RopeScaling
    cfg_kv = dict(meta["config"])
    cfg_kv["rope_scaling"] = (RopeScaling(**meta["rope_scaling"])
                              if meta.get("rope_scaling") else None)
    cfg_kv["eos_token_ids"] = tuple(cfg_kv.get("eos_token_ids", ()))
    if max_seq_len is not None:
        cfg_kv["max_seq_len"] = max_seq_len
    cfg = ModelConfig(**cfg_kv)

    flat = read_safetensors(os.path.join(model_dir, "model.safetensors"))
    # qbits values: [bits, group] (current) or bare int bits (round-2 files)
    qbits: dict = {k: (v if isinstance(v, (list, tuple)) else (v, 0))
                   for k, v in meta["qbits"].items()}
    put = device_put_fn or (lambda path, x: x)

    params: dict[str, Any] = {}
    for name in sorted(set(n[:-2] if n.endswith(".q") else
                           n[:-6] if n.endswith(".scale") else n
                           for n in flat)):
        parts = name.split(".")
        node = params
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        path = tuple(parts)
        if name in qbits:
            bits, group = qbits[name]
            leaf = quant.QTensor(q=jnp.asarray(flat[name + ".q"]),
                                 scale=jnp.asarray(flat[name + ".scale"]),
                                 bits=int(bits), group=int(group))
        else:
            arr = flat[name]
            leaf = jnp.asarray(arr).astype(
                dtype if np.issubdtype(arr.dtype, np.floating) else arr.dtype)
        node[parts[-1]] = put(path, leaf)
    params.setdefault("lm_head", None)
    return cfg, params, int(meta["bits"])


def load_model_dir(model_dir: str, *, dtype=jnp.bfloat16,
                   quant_bits: Optional[int] = None,
                   max_seq_len: Optional[int] = None,
                   device_put_fn=None):
    """Load the five HF JSONs + weights, mirroring the reference's
    InferenceConfig aggregation (/root/reference/src/inference/config.cc:11-28)
    but producing live objects instead of parsed DOMs. Directories written
    by save_quantized() load directly (quant_bits then comes from the
    checkpoint's own metadata).

    Returns (cfg, params, tokenizer | None).
    """
    from gabby_tpu.tokenizer import Tokenizer

    if os.path.exists(os.path.join(model_dir, GABBY_META)):
        cfg, params, _bits = load_quantized(
            model_dir, max_seq_len=max_seq_len, dtype=dtype,
            device_put_fn=device_put_fn)
        tok_path = os.path.join(model_dir, "tokenizer.json")
        tokenizer = (Tokenizer.from_file(tok_path)
                     if os.path.exists(tok_path) else None)
        return cfg, params, tokenizer

    overrides: dict[str, Any] = {}
    if max_seq_len is not None:
        overrides["max_seq_len"] = max_seq_len
    cfg = ModelConfig.from_json_file(
        os.path.join(model_dir, "config.json"), **overrides)

    gen_cfg_path = os.path.join(model_dir, "generation_config.json")
    if os.path.exists(gen_cfg_path):
        with open(gen_cfg_path) as f:
            gen = json.load(f)
        eos = gen.get("eos_token_id", list(cfg.eos_token_ids))
        eos = tuple(eos) if isinstance(eos, list) else (eos,)
        cfg = ModelConfig(**{**cfg.__dict__, "eos_token_ids": eos,
                             "bos_token_id": gen.get("bos_token_id", cfg.bos_token_id)})

    params = load_llama_params(model_dir, cfg, dtype=dtype,
                               quant_bits=quant_bits, device_put_fn=device_put_fn)

    tok_path = os.path.join(model_dir, "tokenizer.json")
    tokenizer = Tokenizer.from_file(tok_path) if os.path.exists(tok_path) else None
    return cfg, params, tokenizer
