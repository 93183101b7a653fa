"""Tensor-parallel partition rules for the Llama param tree + KV cache.

Megatron-style layout, expressed as PartitionSpecs and compiled by GSPMD
(XLA inserts the collectives; see SURVEY.md §2b):

  qkv / gate / up : output-dim sharded on "model"  -> heads split per chip
  o / down        : input-dim sharded on "model"   -> one psum per block
  embed           : vocab-sharded on "model"
  lm_head         : vocab(out)-sharded on "model"
  norms           : replicated
  KV cache        : kv-head axis on "model", slot axis on "data"

Weights are stacked [L, in, out], so every weight spec carries a leading
None for the layer axis. QTensor leaves shard their codes like the weight
and their per-out-channel scale like the weight's output axis; INT4 packing
halves the INPUT axis, which is never the sharded axis of a column-sharded
weight and stays divisible for row-sharded ones.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gabby_tpu.config import ModelConfig
from gabby_tpu.ops.quant import QTensor

# logical (in, out) rules for stacked [L, in, out] weights
_COL = P(None, None, "model")  # output-dim sharded
_ROW = P(None, "model", None)  # input-dim sharded

PARAM_RULES: dict[str, P] = {
    "embed": P("model", None),
    "lm_head": P(None, "model"),
    "final_norm": P(None),
    "blocks/attn_norm": P(None, None),
    "blocks/mlp_norm": P(None, None),
    "blocks/wq": _COL,
    "blocks/wk": _COL,
    "blocks/wv": _COL,
    # fused projections (llama.fuse_projections): column-shardable over a
    # model axis of size tp ONLY when the tree was fused with that same tp
    # (per-shard column blocks — see fuse_projections); param_shardings
    # checks the match via its fused_tp argument.
    "blocks/wqkv": _COL,
    "blocks/w_gup": _COL,
    "blocks/wo": _ROW,
    "blocks/w_gate": _COL,
    "blocks/w_up": _COL,
    "blocks/w_down": _ROW,
}


def _qtensor_specs(rule: P, bits: int, group: int = 0) -> QTensor:
    """Spec tree for a stacked QTensor: codes follow the weight rule; the
    [L, out] scale follows the rule's output axis. `bits`/`group` must
    mirror the actual leaf: they are static pytree metadata, and tree.map
    requires the spec tree's treedef to match the param tree's."""
    out_axis = rule[-1]
    if len(rule) == 3:  # stacked [L, in, out] -> scale [L, out]
        return QTensor(q=rule, scale=P(None, out_axis), bits=bits,
                       group=group)
    if group:  # grouped 2-D (the unembed): scale [in/group, out]
        return QTensor(q=rule, scale=P(None, out_axis), bits=bits,
                       group=group)
    return QTensor(q=rule, scale=P(out_axis), bits=bits)  # [in, out] -> [out]


def param_specs(params: dict[str, Any]) -> dict[str, Any]:
    """Pytree of PartitionSpecs matching `params` structure."""

    def visit(path: str, leaf):
        rule = PARAM_RULES[path]
        if isinstance(leaf, QTensor):
            return _qtensor_specs(rule, leaf.bits, leaf.group)
        return rule

    def walk(node, path=""):
        if isinstance(node, dict):
            return {k: walk(v, f"{path}/{k}" if path else k)
                    for k, v in node.items()}
        if node is None:
            return None
        return visit(path, node)

    return walk(params)


def param_shardings(params: dict[str, Any], mesh: Mesh,
                    fused_tp: int = 1) -> dict[str, Any]:
    blocks = params.get("blocks") if isinstance(params, dict) else None
    model = mesh.shape.get("model", 1)
    if (model > 1 and fused_tp != model and isinstance(blocks, dict)
            and ("wqkv" in blocks or "w_gup" in blocks)):
        raise ValueError(
            f"fused projection weights (wqkv/w_gup) fused with tp={fused_tp} "
            f"cannot shard over a model axis of size {model}: each shard "
            f"would mix q/k/v (or gate/up) columns. Re-fuse with "
            f"fuse_projections(params, tp={model}) (and set cfg.fused_tp), "
            f"or keep the tree unfused")
    return jax.tree.map(lambda spec: NamedSharding(mesh, spec), param_specs(params),
                        is_leaf=lambda x: isinstance(x, P))


def shard_params(params: dict[str, Any], mesh: Mesh,
                 fused_tp: int = 1) -> dict[str, Any]:
    """Place (or re-place) every param leaf according to the TP rules."""
    return jax.tree.map(jax.device_put, params,
                        param_shardings(params, mesh, fused_tp))


def sharded_device_put_fn(mesh: Mesh):
    """A `device_put_fn` for loader.load_llama_params: places each leaf on
    its TP sharding AS IT IS LOADED, so a large checkpoint never has to fit
    unsharded on one device (the 8B/70B multi-chip loading path)."""

    def put(path: tuple, leaf):
        rule = PARAM_RULES["/".join(str(p) for p in path)]
        if isinstance(leaf, QTensor):
            spec = _qtensor_specs(rule, leaf.bits, leaf.group)
            return QTensor(
                q=jax.device_put(leaf.q, NamedSharding(mesh, spec.q)),
                scale=jax.device_put(leaf.scale,
                                     NamedSharding(mesh, spec.scale)),
                bits=leaf.bits, group=leaf.group,
            )
        return jax.device_put(leaf, NamedSharding(mesh, rule))

    return put


def cache_specs(quantized: bool):
    """Specs for KVCache fields, head-major layout [L, B, K, S, H]
    (+ [L, B, K, S] scales): kv-head axis on "model", slot axis on "data"."""
    from gabby_tpu.runtime.kv_cache import KVCache

    kv = P(None, "data", "model", None, None)
    sc = P(None, "data", "model", None) if quantized else None
    return KVCache(k=kv, v=kv, k_scale=sc, v_scale=sc)


def cache_shardings(mesh: Mesh, quantized: bool):
    return jax.tree.map(lambda spec: NamedSharding(mesh, spec),
                        cache_specs(quantized),
                        is_leaf=lambda x: isinstance(x, P))


def paged_cache_specs(quantized: bool):
    """Specs for PagedKVCache fields, page-major pools [P, L, Nk, page, H]
    (+ [P, L, Nk, page] scales): the kv-head axis shards on "model" — the
    same Megatron split as the dense cache, so a TP engine can serve off
    the paged pool (VERDICT r2 weak #6). The page table is replicated
    (every chip resolves the same physical page for its head shard); the
    PAGE axis is deliberately unsharded — pages are the capacity unit and
    the allocator is host-global."""
    from gabby_tpu.runtime.paged import PagedKVCache

    kv = P(None, None, "model", None, None)
    sc = P(None, None, "model", None) if quantized else None
    return PagedKVCache(k=kv, v=kv, k_scale=sc, v_scale=sc,
                        page_table=P(None, None))


def paged_cache_shardings(mesh: Mesh, quantized: bool):
    return jax.tree.map(lambda spec: NamedSharding(mesh, spec),
                        paged_cache_specs(quantized),
                        is_leaf=lambda x: isinstance(x, P))


# Activation/IO specs for the serving step
TOKENS_SPEC = P("data")          # [B]
TOKENS_2D_SPEC = P("data", None)  # [B, T]
LOGITS_SPEC = P("data", "model")  # [B, V] — vocab stays sharded off lm_head
