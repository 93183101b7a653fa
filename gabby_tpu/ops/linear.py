"""Linear projection with dtype-aware dispatch.

All model matmuls route through `linear()` so that quantized weights
(QTensor: int8/int4 + per-channel scales, see gabby_tpu/ops/quant.py) and
full-precision weights share one call site. Accumulation is always f32 on the
MXU (`preferred_element_type`), output returns to the activation dtype.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def linear(x: jnp.ndarray, w, layer=None) -> jnp.ndarray:
    """x: [..., in_dim] @ w: [in_dim, out_dim] -> [..., out_dim].

    layer: for STACKED [L, in, out] weights, the (traced) layer index —
    quantized weights reach the Pallas kernels stacked (the layer rides in
    by scalar prefetch, avoiding a per-layer slice copy); dense weights
    are sliced here and XLA fuses the slice into its dot."""
    from gabby_tpu.ops import quant  # local import: quant imports nothing heavy

    x = quant.maybe_fp8_activation(x)  # no-op unless FP8 activations are on
    if isinstance(w, quant.QTensor):
        return quant.qlinear(x, w, layer=layer)
    if layer is not None and w.ndim == 3:
        w = jax.lax.dynamic_index_in_dim(w, layer, 0, keepdims=False)
    out = jax.lax.dot_general(
        x, w,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return out.astype(x.dtype)
