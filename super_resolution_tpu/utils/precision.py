"""Mixed-precision inference policy.

The reference runs CUDA fp32 (AMP only inside ESC's ESRModel training,
ref: esc/models/esr_model.py:45-49); on TPU the single biggest inference
lever is bfloat16 — the MXU runs bf16 matmuls/convs at full rate and HBM
traffic halves. Policy (matches standard flash-attention practice):

- parameters and activations are cast to bfloat16;
- attention scores + softmax stay float32 (ops/attention.py requests
  ``preferred_element_type=float32`` from the MXU and normalizes in f32);
- LayerNorm statistics stay float32 (flax computes norm stats in f32);
- the network output is cast back to float32 before metrics/IO.

The PSNR cost of this policy is pinned by tests/test_precision.py to the
<= 0.01 dB parity budget (BASELINE.md north star).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_DTYPES = {
    "float32": jnp.float32, "fp32": jnp.float32, "f32": jnp.float32,
    "bfloat16": jnp.bfloat16, "bf16": jnp.bfloat16,
    "float16": jnp.float16, "fp16": jnp.float16,
}


def resolve_dtype(name):
    """None / '' -> None (full precision); else a jnp dtype."""
    if name is None or name == "" or name is jnp.float32:
        return None
    if isinstance(name, str):
        try:
            dt = _DTYPES[name.lower()]
        except KeyError:
            raise ValueError(f"unknown inference_dtype {name!r}; "
                             f"one of {sorted(_DTYPES)}") from None
        return None if dt == jnp.float32 else dt
    return jnp.dtype(name).type


def cast_floating(tree, dtype):
    """Cast every floating leaf of a pytree to `dtype` (ints/bools kept)."""
    def cast(a):
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating):
            return a.astype(dtype)
        return a

    return jax.tree_util.tree_map(cast, tree)


def wrap_apply(apply_fn, dtype):
    """Wrap a (params, x) -> y apply so activations run in `dtype` and the
    output returns to float32. Params must already be cast (cast_floating) —
    casting them here would re-cast per lax.map iteration in tile mode."""
    if dtype is None:
        return apply_fn

    def fwd(params, x):
        return apply_fn(params, x.astype(dtype)).astype(jnp.float32)

    return fwd
