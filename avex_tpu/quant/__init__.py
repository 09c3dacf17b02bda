"""Post-training int8 quantization (W8A8) for TPU inference.

The dense projections (QKV/out, fc1/fc2) carry ~90% of a BEATs-family
encoder's FLOPs and ~all of its weight bytes. Quantizing them W8A8 halves
the encoder-weight footprint (HBM + artifact — the multi-model-hosting
budget) and puts the contraction on the int8 MXU path. Measured envelope on
v5e (docs/architecture.md): XLA lowers the s8 dot at the bf16 rate (1.04x a
bf16 matmul), so throughput is roughly neutral — 0.92x bf16 at B=128
(quant/dequant overhead), 1.03x at serving batches 1-8 — at ~1.2e-2 pooled
relative error. The subsystem keeps the compute path ready for
hardware/compiler generations that do double the int8 MXU rate.

This has no reference equivalent (the reference serves fp32/AMP torch —
avex/models/beats/backbone.py:378-574 is its hot path); it is an
avex-tpu serving-mode extension. Scheme:

- **Weights**: symmetric per-output-channel int8, folded offline by
  :func:`quantize_params` (pure pytree transform — works on unrolled and
  nn.scan-stacked layouts alike). Halves weight bytes in HBM as a side
  effect.
- **Activations**: dynamic symmetric per-row (per-token) int8, computed
  in-graph in fp32 (bf16 lacks the mantissa to hold 127 levels near the
  clip point) and fused by XLA into the surrounding elementwise stream.
- **Accumulation**: int32 on the MXU via ``lax.dot_general`` with
  ``preferred_element_type=int32``, rescaled once by
  ``row_scale x col_scale``.

Quantized models are inference-only: int8 kernels are not trainable and
carry no gradient path. Quality is validated in tests (pooled-embedding
relative error bounds) and reported by the bench's ``int8_bf16_rel_err``
field.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "quantize_kernel",
    "dynamic_int8_matmul",
    "Int8Dense",
    "quantize_params",
    "QUANT_FIELDS",
]

#: Param-dict fields that mark an already-quantized Dense subtree.
QUANT_FIELDS = ("kernel_q", "kernel_scale")

_EPS = 1e-8


def _backend_is_tpu() -> bool:
    """True when the default jax backend is a TPU (trace-time decision)."""
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover - backend init failure
        return False


def quantize_kernel(kernel: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-output-channel int8 quantization of a dense kernel.

    ``kernel`` is ``[..., K, N]`` (leading axes allowed — nn.scan stacks a
    layer axis in front). The scale is the per-column absmax over the
    contraction axis only, so every output channel keeps its own dynamic
    range: ``scale[..., n] = max_k |kernel[..., k, n]| / 127``.

    Returns ``(kernel_q int8 [..., K, N], scale f32 [..., N])`` with
    ``kernel ~= kernel_q * scale[..., None, :]``.
    """
    kernel = jnp.asarray(kernel, jnp.float32)
    amax = jnp.max(jnp.abs(kernel), axis=-2)
    scale = jnp.maximum(amax, _EPS) / 127.0
    q = jnp.clip(jnp.round(kernel / scale[..., None, :]), -127, 127).astype(jnp.int8)
    return q, scale


def dynamic_int8_matmul(
    x: jnp.ndarray,
    kernel_q: jnp.ndarray,
    kernel_scale: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    out_dtype: Optional[Any] = None,
) -> jnp.ndarray:
    """``x @ dequant(kernel)`` with the contraction on the int8 MXU path.

    ``x``: ``[..., K]`` float; ``kernel_q``: ``[K, N]`` int8;
    ``kernel_scale``: ``[N]`` f32. The activation is quantized per row
    (symmetric absmax over the K axis) in fp32, the matmul accumulates in
    int32, and a single fused rescale ``row_scale * col_scale`` restores the
    float result. All-zero rows quantize to zero rows (guarded scale).
    """
    out_dtype = out_dtype or x.dtype
    xf = x.astype(jnp.float32)
    row_amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    row_scale = jnp.maximum(row_amax, _EPS) / 127.0
    xq = jnp.clip(jnp.round(xf / row_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq,
        kernel_q,
        (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * (row_scale * kernel_scale.astype(jnp.float32))
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(out_dtype)


class Int8Dense(nn.Module):
    """Drop-in ``nn.Dense`` twin whose kernel lives in HBM as int8.

    Parameter names (``kernel_q``/``kernel_scale``/``bias``) are the contract
    :func:`quantize_params` produces, so a module tree built with
    ``Int8Dense`` in place of ``nn.Dense`` loads a quantized pytree directly.
    Init produces zero kernels (unit scales): quantized modules are made by
    converting trained fp weights, never trained from scratch.
    """

    features: int
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = x.shape[-1]
        kernel_q = self.param(
            "kernel_q", lambda _rng, shape: jnp.zeros(shape, jnp.int8), (k, self.features)
        )
        kernel_scale = self.param(
            "kernel_scale", lambda _rng, shape: jnp.ones(shape, jnp.float32), (self.features,)
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        # A fused Mosaic kernel (ops/pallas_int8.int8_dynamic_dense) wins the
        # ISOLATED fc1-shape microbench (1.25-1.28x the bf16 dot vs 1.11x for
        # this jnp lowering) but LOSES end-to-end: full int8 BEATs at B=128
        # measured 0.83x bf16 with the kernel vs 0.92x with the jnp path
        # (round 4, scripts/bench_int8.py). The opaque pallas_call is a
        # fusion barrier — XLA fuses this path's quant/rescale into the
        # surrounding GELU/residual streams, and that cross-op fusion is
        # worth more than the kernel's in-VMEM chain. Same verdict shape as
        # Pallas attention v3 (docs/architecture.md). Off by default;
        # AVEX_INT8_PALLAS=1 re-enables it for future toolchains.
        if (
            os.environ.get("AVEX_INT8_PALLAS") == "1"
            and _backend_is_tpu()
            and kernel_q.ndim == 2
            and self.features % 128 == 0
        ):
            from avex_tpu.ops.pallas_int8 import int8_dynamic_dense

            return int8_dynamic_dense(
                x, kernel_q, kernel_scale, bias, out_dtype=self.dtype
            )
        return dynamic_int8_matmul(x, kernel_q, kernel_scale, bias, out_dtype=self.dtype)


def _is_dense_leaf(node: Any) -> bool:
    return isinstance(node, dict) and "kernel" in node and getattr(
        node["kernel"], "ndim", 0
    ) >= 2


def quantize_params(
    params: Dict[str, Any],
    *,
    include: Callable[[Tuple[str, ...]], bool],
) -> Dict[str, Any]:
    """Quantize every Dense kernel whose path satisfies ``include``.

    Walks a flax param pytree; each ``{"kernel", ["bias"]}`` dict whose
    dotted path (tuple of keys) passes the predicate is replaced by
    ``{"kernel_q", "kernel_scale", ["bias"]}``. Leading stacked axes
    (nn.scan layouts) are preserved — scales are per (stack, channel).
    Everything else is returned untouched (same object, no copies).
    """

    def walk(node: Any, path: Tuple[str, ...]) -> Any:
        if _is_dense_leaf(node) and include(path):
            q, scale = quantize_kernel(node["kernel"])
            out = {"kernel_q": q, "kernel_scale": scale}
            if "bias" in node:
                out["bias"] = jnp.asarray(node["bias"], jnp.float32)
            return out
        if isinstance(node, dict):
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        return node

    return walk(params, ())


def dense_path_matcher(substrings: Sequence[str]) -> Callable[[Tuple[str, ...]], bool]:
    """Predicate matching paths whose final component is in ``substrings``."""
    targets = frozenset(substrings)
    return lambda path: bool(path) and path[-1] in targets


def int8_error_report(
    fp_out: np.ndarray, q_out: np.ndarray
) -> Dict[str, float]:
    """Relative L2 / max-abs error between float and quantized outputs."""
    fp = np.asarray(fp_out, np.float64)
    q = np.asarray(q_out, np.float64)
    denom = float(np.linalg.norm(fp)) or 1.0
    return {
        "rel_l2": float(np.linalg.norm(q - fp)) / denom,
        "max_abs": float(np.max(np.abs(q - fp))),
    }
