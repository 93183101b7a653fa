"""Shared test utilities: tiny configs and HF-torch golden models.

The reference's CI tests against the real downloaded Llama-3.2-1B
(/root/reference/src/test/env.h:8); this environment has no network, so
golden tests instead build a tiny randomly-initialized HF LlamaForCausalLM
(torch, CPU) and assert logit parity with our JAX forward pass — a stronger
check than the reference ever had (its tokenizer/generator tests assert
stub behavior only).
"""

from __future__ import annotations

import numpy as np

from gabby_tpu import config as cfglib


def tiny_cfg(**kw):
    return cfglib.tiny(**kw)


def hf_config_from(cfg):
    from transformers import LlamaConfig

    return LlamaConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        num_key_value_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim,
        rms_norm_eps=cfg.rms_norm_eps,
        rope_theta=cfg.rope_theta,
        max_position_embeddings=cfg.max_seq_len,
        tie_word_embeddings=cfg.tie_word_embeddings,
        attention_bias=False,
        mlp_bias=False,
        bos_token_id=cfg.bos_token_id,
        eos_token_id=list(cfg.eos_token_ids),
    )


def torch_model_from_params(cfg, params):
    """Build an HF LlamaForCausalLM and load OUR params into it (transposed:
    HF Linear stores [out, in]; we store [in, out])."""
    import torch
    from transformers import LlamaForCausalLM

    model = LlamaForCausalLM(hf_config_from(cfg))
    model.eval()

    def t(x):  # jax/np -> torch tensor, f32
        return torch.tensor(np.asarray(x, dtype=np.float32))

    sd = {}
    sd["model.embed_tokens.weight"] = t(params["embed"])
    blk = params["blocks"]
    for l in range(cfg.num_layers):
        p = f"model.layers.{l}."
        sd[p + "input_layernorm.weight"] = t(blk["attn_norm"][l])
        sd[p + "post_attention_layernorm.weight"] = t(blk["mlp_norm"][l])
        sd[p + "self_attn.q_proj.weight"] = t(blk["wq"][l]).T.contiguous()
        sd[p + "self_attn.k_proj.weight"] = t(blk["wk"][l]).T.contiguous()
        sd[p + "self_attn.v_proj.weight"] = t(blk["wv"][l]).T.contiguous()
        sd[p + "self_attn.o_proj.weight"] = t(blk["wo"][l]).T.contiguous()
        sd[p + "mlp.gate_proj.weight"] = t(blk["w_gate"][l]).T.contiguous()
        sd[p + "mlp.up_proj.weight"] = t(blk["w_up"][l]).T.contiguous()
        sd[p + "mlp.down_proj.weight"] = t(blk["w_down"][l]).T.contiguous()
    sd["model.norm.weight"] = t(params["final_norm"])
    if cfg.tie_word_embeddings:
        sd["lm_head.weight"] = sd["model.embed_tokens.weight"]
    else:
        sd["lm_head.weight"] = t(params["lm_head"]).T.contiguous()
    model.load_state_dict(sd)
    return model
