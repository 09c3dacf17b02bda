"""Pallas TPU kernels for int8 matmuls (W8A8 serving path).

Round-3 measurement left one open question (docs/architecture.md): XLA
lowers the ``s8 x s8 -> s32`` `dot_general` at the *bf16* MXU rate on v5e
(193 vs 185 TF/s), leaving the chip's nominal ~2x int8 MXU rate on the
floor. These kernels exist to answer whether that ceiling is XLA's
scheduling or the hardware path itself: a hand-tiled Mosaic matmul emits
the int8 dot directly, with block shapes chosen for the MXU (lane 128,
int8 sublane 32) instead of whatever XLA's fusion heuristics pick.

Two entry points:

- :func:`int8_matmul` — raw ``s8[M,K] x s8[K,N] -> s32[M,N]``, the isolated
  rate experiment (``scripts/bench_int8_matmul.py``).
- :func:`int8_dynamic_dense` — the production shape: bf16 activations are
  per-row quantized *inside the kernel* (fp32 VPU), contracted against the
  resident int8 weight block on the MXU with int32 accumulation, and
  rescaled ``row_scale x col_scale`` to bf16 before leaving VMEM. Fusing
  the quant/rescale into the matmul removes the int32/fp32 intermediate
  HBM streams that made XLA's dynamic-quant path 0.92x bf16 at B=128.

Reference hot path these serve: the BEATs encoder dense projections
(/root/reference/avex/models/beats/backbone.py:541-568 and the fc1/fc2
around it) — ~90% of encoder FLOPs.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["int8_matmul", "int8_dynamic_dense"]

_EPS = 1e-8


def _round_up(value: int, multiple: int) -> int:
    return -(-value // multiple) * multiple


def _mm_kernel(x_ref, w_ref, out_ref):
    """One (i, j) cell: full-K int8 contraction, int32 accumulation."""
    out_ref[:] = jax.lax.dot_general(
        x_ref[:],
        w_ref[:],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "interpret"))
def int8_matmul(
    xq: jnp.ndarray,
    wq: jnp.ndarray,
    *,
    block_m: int = 512,
    block_n: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """``s8[M,K] @ s8[K,N] -> s32[M,N]`` as a hand-tiled Mosaic kernel.

    K stays resident per cell (the encoder shapes have K <= 3072, so an
    entire ``[block_m, K]`` x ``[K, block_n]`` pair fits VMEM without a
    reduction grid axis). M is zero-padded up to ``block_m`` if needed;
    N must divide ``block_n`` exactly (true for all encoder shapes).
    """
    m, k = xq.shape
    k2, n = wq.shape
    assert k == k2, (k, k2)
    assert n % block_n == 0, (n, block_n)
    m_pad = _round_up(m, block_m)
    if m_pad != m:
        xq = jnp.pad(xq, ((0, m_pad - m), (0, 0)))
    out = pl.pallas_call(
        _mm_kernel,
        grid=(m_pad // block_m, n // block_n),
        in_specs=[
            pl.BlockSpec((block_m, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, block_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_m, block_n), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * k * n,
            bytes_accessed=m_pad * k + k * n + m_pad * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xq, wq)
    return out[:m] if m_pad != m else out


def _dyn_kernel(x_ref, w_ref, cs_ref, bias_ref, out_ref):
    """Fused dynamic-quant dense cell: quantize rows -> int8 dot -> rescale.

    The row quantization runs on the VPU in fp32 (bf16 lacks the mantissa
    for 127 levels near the clip point); it is recomputed per N-block,
    which costs O(M*K) VPU work against O(M*K*block_n) MXU work — noise.
    """
    xf = x_ref[:].astype(jnp.float32)
    amax = jnp.maximum(jnp.max(jnp.abs(xf), axis=1, keepdims=True), _EPS)
    rscale = amax / 127.0
    xq = jnp.clip(jnp.round(xf / rscale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq,
        w_ref[:],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * (rscale * cs_ref[:])
    if bias_ref is not None:
        out = out + bias_ref[:]
    out_ref[:] = out.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_m", "block_n", "out_dtype", "interpret")
)
def int8_dynamic_dense(
    x: jnp.ndarray,
    kernel_q: jnp.ndarray,
    kernel_scale: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    *,
    block_m: int = 512,
    block_n: int = 1024,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """W8A8 dense with in-kernel dynamic activation quantization.

    ``x``: ``[..., K]`` float; ``kernel_q``: ``[K, N]`` int8;
    ``kernel_scale``: ``[N]`` f32. Matches
    :func:`avex_tpu.quant.dynamic_int8_matmul` numerically (same scheme:
    symmetric per-row activation scales, symmetric per-column weight
    scales, int32 accumulation) but keeps quant, dot, and rescale in one
    VMEM-resident kernel.
    """
    lead = x.shape[:-1]
    k = x.shape[-1]
    n = kernel_q.shape[-1]
    x2 = x.reshape(-1, k)
    m = x2.shape[0]
    bn = min(block_n, n)
    if n % bn != 0:  # keep the whole N resident rather than tile unevenly
        bn = n
    # Small-batch path (serving bucket-1): don't pad M up to a full 512-row
    # block — that would run 2x the FLOPs for a T=248 lone request.
    block_m = min(block_m, _round_up(m, 32))
    m_pad = _round_up(m, block_m)
    if m_pad != m:
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))
    cs = kernel_scale.astype(jnp.float32).reshape(1, n)
    operands = [x2, kernel_q, cs]
    in_specs = [
        pl.BlockSpec((block_m, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((k, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
    ]
    if bias is not None:
        operands.append(bias.astype(jnp.float32).reshape(1, n))
        in_specs.append(
            pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM)
        )
        kernel = _dyn_kernel
    else:

        def kernel(x_ref, w_ref, cs_ref, out_ref):
            _dyn_kernel(x_ref, w_ref, cs_ref, None, out_ref)
    out = pl.pallas_call(
        kernel,
        grid=(m_pad // block_m, n // bn),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (block_m, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * k * n,
            bytes_accessed=m_pad * k * x.dtype.itemsize + k * n + m_pad * n * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)
    if m_pad != m:
        out = out[:m]
    return out.reshape(*lead, n)
