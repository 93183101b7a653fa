"""RMSNorm.

Kept as a plain jnp function: XLA fuses the reduction + rescale into the
surrounding elementwise graph on TPU, so a hand-written Pallas kernel buys
nothing here (the op is trivially VPU-bound). Accumulation is forced to f32
regardless of activation dtype, matching the HF Llama reference semantics.
"""

import jax
import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    return (normed * weight.astype(jnp.float32)).astype(dtype)
