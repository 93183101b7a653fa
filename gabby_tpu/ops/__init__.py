from gabby_tpu.ops.norms import rms_norm
from gabby_tpu.ops.rope import rope_inv_freq, apply_rope
from gabby_tpu.ops.attention import causal_attention, cache_attention

__all__ = [
    "rms_norm",
    "rope_inv_freq",
    "apply_rope",
    "causal_attention",
    "cache_attention",
]
