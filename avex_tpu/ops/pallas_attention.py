"""Pallas TPU kernel: attention fused with gated relative-position bias.

The BEATs attention (backbone.py:541-568) applies a per-layer gate to a
shared T5 bias: ``softmax(q·kᵀ·scale + gate ⊙ pos_bias + pad) · v``. The XLA
path cannot fuse across the two matmuls, so every layer streams the
``[B, H, T, T]`` logits and probability tensors through HBM (~4 passes over
~190 MB each at B=128/T=248 in bf16) — together the dominant HBM traffic of
the whole model, since the matmuls themselves are small at these sequence
lengths.

This kernel keeps the whole chain in VMEM: for each (head, batch-block) grid
cell it loads q/k/v tiles and the *shared* ``[T, T]`` bias slice, applies the
scalar-per-query gate and padding mask in registers, and runs
logits→softmax→PV without touching HBM. Sequence lengths here are short
(≤ ~1k tokens), so the full ``[T, T]`` logits tile fits VMEM and no
online-softmax tiling is needed.

v3 design notes (what the 0.66x round-2 version got wrong):

- **Dots run in bf16 with fp32 accumulation.** v2 cast q/k to fp32 before
  ``dot_general``; fp32 MXU passes run at ~1/4 the bf16 rate, which made the
  kernel compute-bound at ~26 TF/s.
- **Grid order is (heads, batch)** — the innermost (fastest) grid axis is
  batch, so the shared bias block index is unchanged between consecutive
  steps and Pallas elides the re-fetch; v2 iterated heads fastest and
  re-copied the [T, T] slice every step.
- Softmax stays fp32 (max-subtracted), probabilities cast to the value dtype
  for the PV matmul — numerically at least as accurate as the XLA
  ``fast_attention`` path (which runs the whole logits chain in bf16).

The wrappers are differentiable. The split-input variant uses a
``custom_vjp`` that recomputes the backward through the mathematically
identical jnp formulation (the standard XLA path). The fused-QKV variants
got their own **VMEM backward kernels** (rounds 5b/5c,
``_fused_qkv_bwd_kernel`` / ``_fused_qkv_gated_bwd_kernel``): the jnp
recompute backward measured a 24% EAT train-step REGRESSION (the
recomputed ``[B,H,T,T]`` P and its cotangents stream through HBM — XLA's
own autodiff at least *saves* P), while the flash-style cell — P
recomputed in-register, then
``dV = Pᵀ dO, dP = dO Vᵀ, dS = P∘(dP−Δ), dQ = dS K, dK = dSᵀ Q`` as five
MXU passes with zero ``[T,T]`` HBM traffic — flips a full EAT AdamW step
to **+44% vs XLA** (341 vs 237 clips/s, B=64/T=513; neutral at T=249;
on-chip bf16 grad parity 3.8e-3; ``AVEX_FUSED_BWD_XLA=1`` restores the
jnp backward). The GATED backward kernel (adds ``dgate``/``dbias``, the
latter accumulated across the batch grid axis) is numerically proven
(on-chip rel ~2.1e-3) but does NOT flip BEATs training — XLA 607 vs 516
clips/s at B=64/T=248 (0.85x), the same verdict as gated inference — so
it stays a pinned best-known-variant and ``fused_qkv`` remains opt-in.

Measured crossover on v5e (rounds 3-4, bf16, H=12/D=64, constant B*T,
``scripts/bench_attention.py --dtype bfloat16``; "flash" is JAX's stock TPU
flash-attention kernel with the gate x bias materialized as its ``ab``
input — it loses everywhere, 0.72-0.89x):

====  =====  ==============  =================
T     B      pallas vs XLA   flash vs XLA
====  =====  ==============  =================
248   128    0.966x          0.44x (round 3)
384   96     1.154x          --
512   64     1.324x          0.715x
1024  16     1.352x          0.891x
2048  4      1.260x          0.863x
====  =====  ==============  =================

The bias-free cell at B=128 (round 4): T=496 1.31x, 513 1.33x, 520 1.36x,
544 1.35x, 576 1.36x — the win is flat across UNALIGNED lengths too, but
only after the round-4 wrapper fix: v3 padded odd T to a sublane multiple in
HLO (``jnp.pad`` q/k/v + out slice), and those four full-tensor round-trips
+ relayouts cost ~1/3 of the kernel's runtime (T=513 measured 0.86x with
HLO padding, 1.33x without). Mosaic masks unaligned block shapes internally
at zero HBM cost (on-chip max|Δ| vs the jnp reference at T=513: 6.1e-5), so
the wrapper now passes logical shapes straight through.

At the 5 s-clip BEATs shape (T=248) XLA still wins by ~3%: its unfused
schedule overlaps the [T,64] MXU passes of *different* layers' projections
with the softmax VPU work, which a single-kernel grid cannot. Past T~384 the
quadratically growing [B,H,T,T] logits/softmax HBM streams dominate and the
in-VMEM chain wins by 15-35% *in isolation* — but the round-5 IN-MODEL
measurements split the verdict by attention flavour:

- **bias-free cells (EAT / Bird-MAE / ATST / AVES)**: the fused-QKV
  boundary variant (``fused_qkv_attention``) wins +49% end-to-end at T=513,
  +17% at T=250 (ATST 10 s), +7% at T=249 (AVES) and loses at T=125 (ATST
  5 s, 0.92x) — those models auto-enable it for real-TPU traces at
  T >= 248, the measured in-model crossover
  (``scripts/bench_fused_qkv_ab.py``).
- **gated-bias cells (BEATs)**: XLA wins in-model at EVERY measured length —
  full BEATs bf16 B=128 on v5e: T=248 XLA 1,822 clips/s vs 1,482 fused-QKV
  gated kernel; T=496 XLA 753 vs 688 fused vs 588 split-input (the round-4
  T>=384 auto-enable was a 22% regression for windowed BEATs and is now
  removed — ``models/beats.py`` auto resolves to XLA; explicit
  ``use_pallas=True`` still forces the kernel). The gated chain gives XLA
  extra fusible elementwise work (gate x bias, the [B,H,T,T] product) that
  its scheduler overlaps across layers; inside one kernel grid the same work
  serializes against the MXU passes.

Cells at T > 512 raise Mosaic's scoped-VMEM limit (measured need: 24.3 MB at
T=1024, 28 MB at T=2048 — v5e has 128 MB); the gated fused-QKV cell crosses
16 MB already at T=496 (19.4 MB). In-model the isolated 1.33x of the
SPLIT-input bias-free kernel dilutes to +3% end-to-end for EAT/Bird-MAE:
XLA's baseline inside the model fuses the QKV split/transpose into the
attention chain, which the pallas_call boundary prevents — the fused-QKV
boundary variants exist exactly to reclaim that (round 5, +49%).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "gated_bias_attention",
    "fused_qkv_attention",
    "fused_qkv_gated_attention",
    "fused_qkv_compatible",
]


def _attention_kernel(q_ref, k_ref, v_ref, bias_ref, gate_ref, pad_ref, out_ref, *, scale):
    """One (head, batch-block) cell: ``block_b`` batch items share one bias load.

    Per item: QK^T (bf16 in, fp32 out) -> scale + gate*bias + pad -> fp32
    softmax -> PV (bf16). The per-item bodies are independent, so Mosaic's
    dataflow scheduling can overlap item i's VPU softmax with item i+1's MXU
    matmuls.
    """
    nb = q_ref.shape[0]
    bias = bias_ref[0].astype(jnp.float32)  # [T, T], resident across the cell

    for i in range(nb):  # static unroll
        q = q_ref[i, 0]  # [T, D] compute dtype (bf16 on the fast path)
        k = k_ref[i, 0]
        v = v_ref[i, 0]
        logits = jax.lax.dot_general(
            q,
            k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        logits = logits * scale
        gate = gate_ref[i, 0].astype(jnp.float32)  # [T, 1]
        logits = logits + gate * bias
        logits = logits + pad_ref[i].astype(jnp.float32)  # [1, T] over keys

        weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out_ref[i, 0] = jax.lax.dot_general(
            weights,
            v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(out_ref.dtype)


def _plain_attention_kernel(q_ref, k_ref, v_ref, pad_ref, out_ref, *, scale):
    """Bias-free cell (ViT-style attention: EAT / Bird-MAE blocks).

    Same structure as :func:`_attention_kernel` minus the shared-bias load and
    the gate — the fusion win is the same (the [T, T] logits/softmax chain
    never leaves VMEM), and at the T≈513 ViT shapes these models run at, the
    measured T-crossover (header table) puts the kernel 1.3x ahead of XLA.
    """
    nb = q_ref.shape[0]
    for i in range(nb):  # static unroll
        q = q_ref[i, 0]
        k = k_ref[i, 0]
        v = v_ref[i, 0]
        logits = jax.lax.dot_general(
            q,
            k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        logits = logits * scale
        logits = logits + pad_ref[i].astype(jnp.float32)  # [1, T] over keys

        weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out_ref[i, 0] = jax.lax.dot_general(
            weights,
            v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(out_ref.dtype)


def _attention_reference(q, k, v, pos_bias, gate, key_padding_mask, scale):
    """jnp twin of the kernel (same math; used for the custom backward)."""
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if pos_bias is not None:
        bias = pos_bias[None].astype(jnp.float32)
        if gate is not None:
            bias = gate[..., None].astype(jnp.float32) * bias
        logits = logits + bias
    if key_padding_mask is not None:
        logits = jnp.where(key_padding_mask[:, None, None, :], -jnp.inf, logits)
    weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v)


def _forward(q, k, v, pos_bias, gate, key_padding_mask, scale, interpret, block_b):
    bsz, heads, seq, dim = q.shape
    if interpret is None:
        # Mosaic kernels only compile for TPU; anywhere else (CPU tests,
        # use_pallas=True models under the virtual mesh) runs the interpreter.
        interpret = jax.default_backend() != "tpu"
    while bsz % block_b:
        block_b //= 2
    block_b = max(block_b, 1)

    # NO explicit sequence padding: Mosaic masks unaligned block shapes
    # internally (VMEM buffers round up to the (8, 128) tile grid with
    # semantics-preserving edge masking in dots and reductions). The v1-v3
    # kernels padded to a sublane multiple in HLO instead, and the
    # pad-then-slice round-trips + relayouts of q/k/v/out cost ~1/3 of the
    # kernel's runtime at odd lengths — measured T=513 (EAT's token count,
    # pads 7 rows): 0.86x XLA with HLO padding vs 1.36x at the identical
    # compute shape without it (T=520, round 4, scripts/bench_attention.py).
    seq_p = seq

    # Additive key mask from the caller's padding mask only.
    if key_padding_mask is not None:
        pad_bias = jnp.where(key_padding_mask, -jnp.inf, 0.0).astype(jnp.float32)[:, None, :]
    else:
        pad_bias = jnp.zeros((bsz, 1, seq_p), jnp.float32)

    # heads OUTER, batch INNER: the bias block index only changes when the
    # head does, so Pallas keeps the [T, T] slice resident across the batch.
    grid = (heads, bsz // block_b)
    nb = block_b
    # Mosaic's default scoped-VMEM limit is 16 MB — enough for BEATs-size
    # tiles but not the long-sequence cells this kernel exists for (measured:
    # T=1024/nb=4 needs 24.3 MB, T=2048/nb=2 needs 28 MB). v5e has 128 MB of
    # VMEM, so raise the cap for T > 512; the limit is a check, not an
    # allocation, and short-T cells keep the default pipelining budget.
    compiler_params = None
    if seq_p > 512:
        compiler_params = pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20)

    qkv_spec = pl.BlockSpec(
        (nb, 1, seq_p, dim), lambda h, b: (b, h, 0, 0), memory_space=pltpu.VMEM
    )
    pad_spec = pl.BlockSpec((nb, 1, seq_p), lambda h, b: (b, 0, 0), memory_space=pltpu.VMEM)
    common = dict(
        grid=grid,
        out_specs=pl.BlockSpec(
            (nb, 1, seq_p, dim), lambda h, b: (b, h, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, heads, seq_p, dim), v.dtype),
        interpret=interpret,
        compiler_params=compiler_params,
    )
    if pos_bias is None:
        # Bias-free ViT attention (EAT / Bird-MAE): no shared-bias load, no gate.
        out = pl.pallas_call(
            functools.partial(_plain_attention_kernel, scale=scale),
            in_specs=[qkv_spec, qkv_spec, qkv_spec, pad_spec],
            **common,
        )(q, k, v, pad_bias)
    else:
        if gate is None:
            gate_arr = jnp.ones((bsz, heads, seq_p), q.dtype)
        else:
            gate_arr = gate
        gate_arr = gate_arr[..., None]  # [B, H, T, 1]
        out = pl.pallas_call(
            functools.partial(_attention_kernel, scale=scale),
            in_specs=[
                qkv_spec,
                qkv_spec,
                qkv_spec,
                pl.BlockSpec((1, seq_p, seq_p), lambda h, b: (h, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((nb, 1, seq_p, 1), lambda h, b: (b, h, 0, 0), memory_space=pltpu.VMEM),
                pad_spec,
            ],
            **common,
        )(q, k, v, pos_bias, gate_arr, pad_bias)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _gated_bias_attention(q, k, v, pos_bias, gate, key_padding_mask, scale, interpret, block_b):
    return _forward(q, k, v, pos_bias, gate, key_padding_mask, scale, interpret, block_b)


def _fwd(q, k, v, pos_bias, gate, key_padding_mask, scale, interpret, block_b):
    out = _forward(q, k, v, pos_bias, gate, key_padding_mask, scale, interpret, block_b)
    return out, (q, k, v, pos_bias, gate, key_padding_mask)


def _bwd(scale, _interpret, _block_b, residuals, g):
    q, k, v, pos_bias, gate, key_padding_mask = residuals
    has_gate = gate is not None
    has_bias = pos_bias is not None

    def ref(q, k, v, pos_bias, gate):
        return _attention_reference(
            q,
            k,
            v,
            pos_bias if has_bias else None,
            gate if has_gate else None,
            key_padding_mask,
            scale,
        )

    # Recompute-based backward through the identical jnp math (the standard
    # XLA path); the boolean mask is non-differentiable (float0 cotangent).
    # Absent optional inputs ride through jax.vjp as unused 0-d placeholders
    # so the output structure matches the primal's (None cotangents back).
    _, vjp = jax.vjp(
        ref,
        q,
        k,
        v,
        pos_bias if has_bias else jnp.zeros(()),
        gate if has_gate else jnp.zeros(()),
    )
    dq, dk, dv, dbias, dgate = vjp(g)
    dmask = (
        None
        if key_padding_mask is None
        else np.zeros(key_padding_mask.shape, dtype=jax.dtypes.float0)
    )
    return (
        dq,
        dk,
        dv,
        dbias if has_bias else None,
        dgate if has_gate else None,
        dmask,
    )


_gated_bias_attention.defvjp(_fwd, _bwd)


def _fused_qkv_kernel(
    qkv_q_ref, qkv_k_ref, qkv_v_ref, pad_ref, out_ref, *, scale, head_dim
):
    """Bias-free cell over the RAW fused-QKV gemm output.

    The round-4 finding: the isolated 1.33x of the bias-free kernel diluted
    to +3% in-model because XLA fuses the ``[B,T,3E] -> 3x[B,H,T,dh]``
    split/transpose (and the output merge) into its attention chain, while
    the ``pallas_call`` boundary forces them to materialize in HBM. This
    cell widens the boundary: the inputs are three BlockSpec VIEWS of the
    same ``[B, T, 3E]`` tensor (column slices at offsets ``g·W``,
    ``E + g·W``, ``2E + g·W``) and the output block writes the ``[T, W]``
    slice of a ``[B, T, E]`` result directly — the split, the four
    transposes, and the merge all become free VMEM addressing.

    Mosaic requires the block's last dim to be a lane multiple (128), so one
    grid cell covers a GROUP of ``W / head_dim`` adjacent heads (e.g. 2
    64-wide ViT heads per 128-wide block) and unrolls over them.
    """
    nb = qkv_q_ref.shape[0]
    width = qkv_q_ref.shape[-1]
    heads_per_block = width // head_dim
    for i in range(nb):  # static unroll over batch items
        for j in range(heads_per_block):  # and over the head group
            sl = slice(j * head_dim, (j + 1) * head_dim)
            q = qkv_q_ref[i, :, sl]  # [T, dh] head slice, compute dtype
            k = qkv_k_ref[i, :, sl]
            v = qkv_v_ref[i, :, sl]
            logits = jax.lax.dot_general(
                q,
                k,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            logits = logits * scale
            logits = logits + pad_ref[i].astype(jnp.float32)  # [1, T] over keys
            weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
            out_ref[i, :, sl] = jax.lax.dot_general(
                weights,
                v,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(out_ref.dtype)


def _fused_qkv_gated_kernel(
    qkv_q_ref, qkv_k_ref, qkv_v_ref, bias_ref, gate_ref, pad_ref, out_ref, *, scale, head_dim
):
    """Gated-bias cell over the RAW fused-QKV gemm output (the BEATs chain).

    The round-5 EAT result showed the round-4 "kernel ~ XLA" verdicts were
    really measuring the relayout tax at the ``pallas_call`` boundary: the
    bias-free fused-boundary cell turned a +3% into +49%. This cell is the
    same widened boundary for the *gated* attention BEATs runs at T=248 —
    three BlockSpec views of one ``[B, T, 3E]`` tensor in, merged
    ``[B, T, E]`` out, with the per-layer gate and the shared T5 bias applied
    in registers. One grid cell covers ``width/head_dim`` adjacent heads
    (Mosaic's 128-lane block constraint), so the bias block is
    ``[heads_per_block, T, T]`` and stays resident across the inner batch
    grid axis.
    """
    nb = qkv_q_ref.shape[0]
    width = qkv_q_ref.shape[-1]
    heads_per_block = width // head_dim
    for j in range(heads_per_block):  # static unroll over the head group
        bias = bias_ref[j].astype(jnp.float32)  # [T, T], resident for the j-loop
        sl = slice(j * head_dim, (j + 1) * head_dim)
        for i in range(nb):  # and over batch items
            q = qkv_q_ref[i, :, sl]  # [T, dh] head slice, compute dtype
            k = qkv_k_ref[i, :, sl]
            v = qkv_v_ref[i, :, sl]
            logits = jax.lax.dot_general(
                q,
                k,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            logits = logits * scale
            gate = gate_ref[i, j].astype(jnp.float32)  # [T, 1]
            logits = logits + gate * bias
            logits = logits + pad_ref[i].astype(jnp.float32)  # [1, T] over keys
            weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
            out_ref[i, :, sl] = jax.lax.dot_general(
                weights,
                v,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(out_ref.dtype)


def _fused_qkv_reference(qkv, heads, key_padding_mask, scale):
    """jnp twin of the fused-QKV cell (used for the custom backward)."""
    bsz, seq, three_e = qkv.shape
    dim = three_e // 3
    head_dim = dim // heads
    parts = qkv.reshape(bsz, seq, 3, heads, head_dim)
    q, k, v = (parts[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    out = _attention_reference(q, k, v, None, None, key_padding_mask, scale)
    return out.transpose(0, 2, 1, 3).reshape(bsz, seq, dim)


def _heads_per_block(heads: int, head_dim: int) -> int:
    """Adjacent heads per grid cell so the column block is a 128-lane
    multiple (Mosaic's last-dim constraint). 0 = incompatible shape.

    The smallest ``hb`` with ``hb·head_dim % 128 == 0`` is
    ``lcm(head_dim, 128) / head_dim``; the head count must tile into those
    groups. dh=64 → hb=2 (ViT-base), dh=80 → hb=8 (Bird-MAE huge: 640-lane
    blocks, head slices land at 80-element offsets inside the block —
    Mosaic relayouts them in-register)."""
    if head_dim <= 0:
        return 0
    hb = math.lcm(head_dim, 128) // head_dim
    return hb if heads % hb == 0 else 0


def fused_qkv_compatible(dim: int, heads: int) -> bool:
    """True when ``fused_qkv_attention`` can lower for these shapes on a
    real TPU (head groups tile to a 128-lane multiple). ViT-base (dh=64,
    2-head groups) and Bird-MAE huge (dh=80, 8-head groups) both qualify;
    a head count that doesn't divide into lcm-groups (e.g. 12 heads of
    dh=80) falls back to the split-input kernel."""
    head_dim = dim // heads
    return _heads_per_block(heads, head_dim) > 0


def _fused_qkv_forward(qkv, heads, key_padding_mask, scale, interpret, block_b):
    bsz, seq, three_e = qkv.shape
    dim = three_e // 3
    head_dim = dim // heads
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    hb = _heads_per_block(heads, head_dim)
    if hb == 0:
        if not interpret:
            raise ValueError(
                f"fused_qkv_attention: head_dim {head_dim} x heads {heads} "
                "does not tile to 128 lanes (see fused_qkv_compatible); use "
                "the split-input gated_bias_attention path"
            )
        hb = 1  # interpreter has no lane constraint
    while bsz % block_b:
        block_b //= 2
    nb = max(block_b, 1)
    width = hb * head_dim  # block column width (a 128 multiple on TPU)
    groups = heads // hb

    if key_padding_mask is not None:
        pad_bias = jnp.where(key_padding_mask, -jnp.inf, 0.0).astype(jnp.float32)[:, None, :]
    else:
        pad_bias = jnp.zeros((bsz, 1, seq), jnp.float32)

    grid = (groups, bsz // nb)
    compiler_params = None
    if seq > 512:
        compiler_params = pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20)

    # Three views of ONE array: block index g on the last axis selects the
    # g-th head-group column slice; q/k/v differ only by a `groups` offset.
    def _slice_spec(part):
        return pl.BlockSpec(
            (nb, seq, width),
            lambda g, b, part=part: (b, 0, part * groups + g),
            memory_space=pltpu.VMEM,
        )

    pad_spec = pl.BlockSpec((nb, 1, seq), lambda g, b: (b, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fused_qkv_kernel, scale=scale, head_dim=head_dim),
        grid=grid,
        in_specs=[_slice_spec(0), _slice_spec(1), _slice_spec(2), pad_spec],
        out_specs=pl.BlockSpec(
            (nb, seq, width), lambda g, b: (b, 0, g), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, seq, dim), qkv.dtype),
        interpret=interpret,
        compiler_params=compiler_params,
    )(qkv, qkv, qkv, pad_bias)


def _fused_qkv_bwd_kernel(
    qkv_q_ref, qkv_k_ref, qkv_v_ref, dout_ref, pad_ref,
    dq_ref, dk_ref, dv_ref, *, scale, head_dim
):
    """Flash-style backward cell over the raw fused-QKV layout.

    The jnp recompute backward streams the recomputed ``[B,H,T,T]`` P and
    its cotangents through HBM — measured a 24% EAT train-step regression
    vs plain XLA (which at least *saves* P instead of re-streaming it).
    This cell keeps the whole backward chain in VMEM: P is recomputed
    in-register from the qkv views (one extra QK^T — FLOPs are cheap, HBM
    is not), then

        dV = Pᵀ·dO,  dP = dO·Vᵀ,  Δ = rowsum(P ∘ dP),
        dS = P ∘ (dP − Δ) · scale,  dQ = dS·K,  dK = dSᵀ·Q

    run as five MXU passes per (item, head) with no ``[T, T]`` HBM traffic.
    Outputs are the three column groups of ``dqkv`` (q|k|v layout), written
    as separate arrays and concatenated in HLO (one linear pass — the
    quadratic streams are what mattered).
    """
    nb = qkv_q_ref.shape[0]
    width = qkv_q_ref.shape[-1]
    heads_per_block = width // head_dim
    for i in range(nb):  # static unroll over batch items
        for j in range(heads_per_block):  # and over the head group
            sl = slice(j * head_dim, (j + 1) * head_dim)
            q = qkv_q_ref[i, :, sl]  # [T, dh] compute dtype
            k = qkv_k_ref[i, :, sl]
            v = qkv_v_ref[i, :, sl]
            do = dout_ref[i, :, sl]
            logits = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            logits = logits * scale + pad_ref[i].astype(jnp.float32)  # [T, T]
            p32 = jax.nn.softmax(logits, axis=-1)
            p = p32.astype(v.dtype)
            # dV = P^T dO  (contract over queries)
            dv = jax.lax.dot_general(
                p, do, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            # dP = dO V^T
            dp = jax.lax.dot_general(
                do, v, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            delta = jnp.sum(p32 * dp, axis=-1, keepdims=True)  # [T, 1]
            ds = (p32 * (dp - delta) * scale).astype(q.dtype)  # [T, T]
            dq = jax.lax.dot_general(
                ds, k, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            # dK = dS^T Q (contract over queries)
            dk = jax.lax.dot_general(
                ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dq_ref[i, :, sl] = dq.astype(dq_ref.dtype)
            dk_ref[i, :, sl] = dk.astype(dk_ref.dtype)
            dv_ref[i, :, sl] = dv.astype(dv_ref.dtype)


def _fused_qkv_backward(qkv, dout, heads, key_padding_mask, scale, interpret, block_b):
    """dqkv for :func:`_fused_qkv_forward` via the VMEM backward kernel."""
    bsz, seq, three_e = qkv.shape
    dim = three_e // 3
    head_dim = dim // heads
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    hb = _heads_per_block(heads, head_dim)
    if hb == 0:
        if not interpret:
            raise ValueError(
                f"fused_qkv_attention backward: head_dim {head_dim} x heads "
                f"{heads} does not tile to 128 lanes"
            )
        hb = 1
    while bsz % block_b:
        block_b //= 2
    nb = max(block_b, 1)
    width = hb * head_dim
    groups = heads // hb

    if key_padding_mask is not None:
        pad_bias = jnp.where(key_padding_mask, -jnp.inf, 0.0).astype(jnp.float32)[:, None, :]
    else:
        pad_bias = jnp.zeros((bsz, 1, seq), jnp.float32)

    grid = (groups, bsz // nb)
    # The backward cell carries ~4 [T, T] fp32 temporaries on top of the
    # 7 in/out views — past Mosaic's 16 MB default well before the forward
    # does; the limit is a check, not an allocation.
    compiler_params = None
    if seq > 128:
        compiler_params = pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20)

    def _slice_spec(part):
        return pl.BlockSpec(
            (nb, seq, width),
            lambda g, b, part=part: (b, 0, part * groups + g),
            memory_space=pltpu.VMEM,
        )

    out_view = pl.BlockSpec((nb, seq, width), lambda g, b: (b, 0, g), memory_space=pltpu.VMEM)
    pad_spec = pl.BlockSpec((nb, 1, seq), lambda g, b: (b, 0, 0), memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_fused_qkv_bwd_kernel, scale=scale, head_dim=head_dim),
        grid=grid,
        in_specs=[_slice_spec(0), _slice_spec(1), _slice_spec(2), out_view, pad_spec],
        out_specs=[out_view, out_view, out_view],
        out_shape=[jax.ShapeDtypeStruct((bsz, seq, dim), qkv.dtype)] * 3,
        interpret=interpret,
        compiler_params=compiler_params,
    )(qkv, qkv, qkv, dout, pad_bias)
    return jnp.concatenate([dq, dk, dv], axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 3, 4, 5))
def _fused_qkv_attention(qkv, heads, key_padding_mask, scale, interpret, block_b):
    return _fused_qkv_forward(qkv, heads, key_padding_mask, scale, interpret, block_b)


def _fused_qkv_fwd(qkv, heads, key_padding_mask, scale, interpret, block_b):
    out = _fused_qkv_forward(qkv, heads, key_padding_mask, scale, interpret, block_b)
    return out, (qkv, key_padding_mask)


def _fused_qkv_bwd(heads, scale, interpret, block_b, residuals, g):
    qkv, key_padding_mask = residuals
    import os

    if os.environ.get("AVEX_FUSED_BWD_XLA") == "1":
        # Escape hatch: the pre-round-5b jnp recompute backward (XLA path).
        def ref(qkv):
            return _fused_qkv_reference(qkv, heads, key_padding_mask, scale)

        _, vjp = jax.vjp(ref, qkv)
        (dqkv,) = vjp(g)
    else:
        dqkv = _fused_qkv_backward(
            qkv, g, heads, key_padding_mask, scale, interpret, block_b
        )
    dmask = (
        None
        if key_padding_mask is None
        else np.zeros(key_padding_mask.shape, dtype=jax.dtypes.float0)
    )
    return (dqkv, dmask)


_fused_qkv_attention.defvjp(_fused_qkv_fwd, _fused_qkv_bwd)


def _fused_qkv_gated_reference(qkv, heads, pos_bias, gate, key_padding_mask, scale):
    """jnp twin of the fused-QKV gated cell (used for the custom backward)."""
    bsz, seq, three_e = qkv.shape
    dim = three_e // 3
    head_dim = dim // heads
    parts = qkv.reshape(bsz, seq, 3, heads, head_dim)
    q, k, v = (parts[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    out = _attention_reference(q, k, v, pos_bias, gate, key_padding_mask, scale)
    return out.transpose(0, 2, 1, 3).reshape(bsz, seq, dim)


def _fused_qkv_gated_forward(
    qkv, pos_bias, gate, key_padding_mask, heads, scale, interpret, block_b
):
    bsz, seq, three_e = qkv.shape
    dim = three_e // 3
    head_dim = dim // heads
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    hb = _heads_per_block(heads, head_dim)
    if hb == 0:
        if not interpret:
            raise ValueError(
                f"fused_qkv_gated_attention: head_dim {head_dim} x heads {heads} "
                "does not tile to 128 lanes (see fused_qkv_compatible); use "
                "the split-input gated_bias_attention path"
            )
        hb = 1  # interpreter has no lane constraint
    while bsz % block_b:
        block_b //= 2
    nb = max(block_b, 1)
    width = hb * head_dim  # block column width (a 128 multiple on TPU)
    groups = heads // hb

    if key_padding_mask is not None:
        pad_bias = jnp.where(key_padding_mask, -jnp.inf, 0.0).astype(jnp.float32)[:, None, :]
    else:
        pad_bias = jnp.zeros((bsz, 1, seq), jnp.float32)
    if gate is None:
        gate_arr = jnp.ones((bsz, heads, seq), qkv.dtype)
    else:
        gate_arr = gate
    gate_arr = gate_arr[..., None]  # [B, H, T, 1]

    # head-groups OUTER, batch INNER: the bias block index only changes when
    # the group does, so the [hb, T, T] slice stays resident across the batch.
    grid = (groups, bsz // nb)
    compiler_params = None
    if seq > 256:
        # The gated cell carries an [hb, T, T] fp32 bias block on top of the
        # qkv views — it crosses Mosaic's 16 MB default scoped-VMEM limit
        # already at T=496 (measured: 19.4 MB needed); v5e has 128 MB.
        compiler_params = pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20)

    def _slice_spec(part):
        return pl.BlockSpec(
            (nb, seq, width),
            lambda g, b, part=part: (b, 0, part * groups + g),
            memory_space=pltpu.VMEM,
        )

    bias_spec = pl.BlockSpec((hb, seq, seq), lambda g, b: (g, 0, 0), memory_space=pltpu.VMEM)
    gate_spec = pl.BlockSpec(
        (nb, hb, seq, 1), lambda g, b: (b, g, 0, 0), memory_space=pltpu.VMEM
    )
    pad_spec = pl.BlockSpec((nb, 1, seq), lambda g, b: (b, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fused_qkv_gated_kernel, scale=scale, head_dim=head_dim),
        grid=grid,
        in_specs=[
            _slice_spec(0),
            _slice_spec(1),
            _slice_spec(2),
            bias_spec,
            gate_spec,
            pad_spec,
        ],
        out_specs=pl.BlockSpec(
            (nb, seq, width), lambda g, b: (b, 0, g), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, seq, dim), qkv.dtype),
        interpret=interpret,
        compiler_params=compiler_params,
    )(qkv, qkv, qkv, pos_bias, gate_arr, pad_bias)


def _fused_qkv_gated_bwd_kernel(
    qkv_q_ref, qkv_k_ref, qkv_v_ref, bias_ref, gate_ref, pad_ref, dout_ref,
    dq_ref, dk_ref, dv_ref, dbias_ref, dgate_ref, *, scale, head_dim
):
    """VMEM backward for the *gated* fused-QKV cell (the BEATs train chain).

    Same flash-style recompute as ``_fused_qkv_bwd_kernel`` — P rebuilt
    in-register from the qkv views, five MXU passes, no ``[T, T]`` HBM
    traffic — extended with the gated-bias chain rule. With
    ``L = qkᵀ·scale + gate ⊙ bias + pad`` and ``dL = P ∘ (dP − Δ)``:

        dgate[t] = Σ_k bias[t,k]·dL[t,k],   dbias += gate ⊙ dL,
        dQ = (dL·scale)·K,  dK = (dL·scale)ᵀ·Q,  dV = Pᵀ·dO

    ``dbias`` is the cotangent of the SHARED T5 bias: it sums over the
    batch, which spans grid steps. Its output block index depends only on
    the head-group axis (outer), so the buffer stays resident across the
    inner batch axis and accumulates with a ``pl.when`` init on the first
    batch step (the TPU grid is sequential, so this is race-free).
    """
    nb = qkv_q_ref.shape[0]
    width = qkv_q_ref.shape[-1]
    heads_per_block = width // head_dim
    first_batch_step = pl.program_id(1) == 0
    for j in range(heads_per_block):  # static unroll over the head group
        bias = bias_ref[j].astype(jnp.float32)  # [T, T], resident for the j-loop
        sl = slice(j * head_dim, (j + 1) * head_dim)
        dbias_acc = jnp.zeros_like(bias)
        for i in range(nb):  # and over batch items
            q = qkv_q_ref[i, :, sl]  # [T, dh] compute dtype
            k = qkv_k_ref[i, :, sl]
            v = qkv_v_ref[i, :, sl]
            do = dout_ref[i, :, sl]
            gate = gate_ref[i, j].astype(jnp.float32)  # [T, 1]
            logits = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            logits = logits * scale + gate * bias
            logits = logits + pad_ref[i].astype(jnp.float32)  # [1, T] over keys
            p32 = jax.nn.softmax(logits, axis=-1)
            p = p32.astype(v.dtype)
            # dV = P^T dO  (contract over queries)
            dv = jax.lax.dot_general(
                p, do, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            # dP = dO V^T
            dp = jax.lax.dot_general(
                do, v, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            delta = jnp.sum(p32 * dp, axis=-1, keepdims=True)  # [T, 1]
            dl = p32 * (dp - delta)  # pre-softmax logits cotangent, fp32
            dgate_ref[i, j] = jnp.sum(bias * dl, axis=-1, keepdims=True).astype(
                dgate_ref.dtype
            )
            dbias_acc = dbias_acc + gate * dl
            ds = (dl * scale).astype(q.dtype)  # [T, T], qk-branch only
            dq = jax.lax.dot_general(
                ds, k, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            # dK = dS^T Q (contract over queries)
            dk = jax.lax.dot_general(
                ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dq_ref[i, :, sl] = dq.astype(dq_ref.dtype)
            dk_ref[i, :, sl] = dk.astype(dk_ref.dtype)
            dv_ref[i, :, sl] = dv.astype(dv_ref.dtype)

        @pl.when(first_batch_step)
        def _(j=j, acc=dbias_acc):
            dbias_ref[j] = acc

        @pl.when(jnp.logical_not(first_batch_step))
        def _(j=j, acc=dbias_acc):
            dbias_ref[j] = dbias_ref[j] + acc


def _fused_qkv_gated_backward(
    qkv, pos_bias, gate, key_padding_mask, dout, heads, scale, interpret, block_b
):
    """(dqkv, dbias, dgate) for the gated fused-QKV cell via the VMEM kernel."""
    bsz, seq, three_e = qkv.shape
    dim = three_e // 3
    head_dim = dim // heads
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    hb = _heads_per_block(heads, head_dim)
    if hb == 0:
        if not interpret:
            raise ValueError(
                f"fused_qkv_gated_attention backward: head_dim {head_dim} x "
                f"heads {heads} does not tile to 128 lanes"
            )
        hb = 1
    while bsz % block_b:
        block_b //= 2
    nb = max(block_b, 1)
    width = hb * head_dim
    groups = heads // hb

    if key_padding_mask is not None:
        pad_bias = jnp.where(key_padding_mask, -jnp.inf, 0.0).astype(jnp.float32)[:, None, :]
    else:
        pad_bias = jnp.zeros((bsz, 1, seq), jnp.float32)
    has_gate = gate is not None
    if has_gate:
        gate_arr = gate[..., None]  # [B, H, T, 1]
    else:
        gate_arr = jnp.ones((bsz, heads, seq, 1), qkv.dtype)

    # head-groups OUTER, batch INNER: the [hb, T, T] bias block and the
    # dbias accumulator stay resident across the whole batch sweep.
    grid = (groups, bsz // nb)
    # bias + dbias [hb, T, T] fp32 blocks + ~4 [T, T] temporaries on top of
    # the 7 qkv/dout views — past Mosaic's 16 MB default well before the
    # forward; the limit is a check, not an allocation.
    compiler_params = None
    if seq > 128:
        compiler_params = pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20)

    def _slice_spec(part):
        return pl.BlockSpec(
            (nb, seq, width),
            lambda g, b, part=part: (b, 0, part * groups + g),
            memory_space=pltpu.VMEM,
        )

    out_view = pl.BlockSpec((nb, seq, width), lambda g, b: (b, 0, g), memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((hb, seq, seq), lambda g, b: (g, 0, 0), memory_space=pltpu.VMEM)
    gate_spec = pl.BlockSpec(
        (nb, hb, seq, 1), lambda g, b: (b, g, 0, 0), memory_space=pltpu.VMEM
    )
    pad_spec = pl.BlockSpec((nb, 1, seq), lambda g, b: (b, 0, 0), memory_space=pltpu.VMEM)
    dq, dk, dv, dbias, dgate = pl.pallas_call(
        functools.partial(_fused_qkv_gated_bwd_kernel, scale=scale, head_dim=head_dim),
        grid=grid,
        in_specs=[
            _slice_spec(0),
            _slice_spec(1),
            _slice_spec(2),
            bias_spec,
            gate_spec,
            pad_spec,
            out_view,
        ],
        out_specs=[out_view, out_view, out_view, bias_spec, gate_spec],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, seq, dim), qkv.dtype),
            jax.ShapeDtypeStruct((bsz, seq, dim), qkv.dtype),
            jax.ShapeDtypeStruct((bsz, seq, dim), qkv.dtype),
            jax.ShapeDtypeStruct((heads, seq, seq), jnp.float32),
            jax.ShapeDtypeStruct((bsz, heads, seq, 1), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=compiler_params,
    )(qkv, qkv, qkv, pos_bias, gate_arr, pad_bias, dout)
    dqkv = jnp.concatenate([dq, dk, dv], axis=-1)
    dbias = dbias.astype(pos_bias.dtype)
    dgate_out = dgate[..., 0].astype(gate.dtype) if has_gate else None
    return dqkv, dbias, dgate_out


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _fused_qkv_gated_attention(
    qkv, pos_bias, gate, key_padding_mask, heads, scale, interpret, block_b
):
    return _fused_qkv_gated_forward(
        qkv, pos_bias, gate, key_padding_mask, heads, scale, interpret, block_b
    )


def _fused_qkv_gated_fwd(qkv, pos_bias, gate, key_padding_mask, heads, scale, interpret, block_b):
    out = _fused_qkv_gated_forward(
        qkv, pos_bias, gate, key_padding_mask, heads, scale, interpret, block_b
    )
    return out, (qkv, pos_bias, gate, key_padding_mask)


def _fused_qkv_gated_bwd(heads, scale, interpret, block_b, residuals, g):
    qkv, pos_bias, gate, key_padding_mask = residuals
    has_gate = gate is not None
    import os

    if os.environ.get("AVEX_FUSED_BWD_XLA") == "1":
        # Escape hatch: the pre-round-5c jnp recompute backward (XLA path).
        def ref(qkv, pos_bias, gate):
            return _fused_qkv_gated_reference(
                qkv, heads, pos_bias, gate if has_gate else None, key_padding_mask, scale
            )

        _, vjp = jax.vjp(ref, qkv, pos_bias, gate if has_gate else jnp.zeros(()))
        dqkv, dbias, dgate = vjp(g)
        if not has_gate:
            dgate = None
    else:
        dqkv, dbias, dgate = _fused_qkv_gated_backward(
            qkv, pos_bias, gate, key_padding_mask, g, heads, scale, interpret, block_b
        )
    dmask = (
        None
        if key_padding_mask is None
        else np.zeros(key_padding_mask.shape, dtype=jax.dtypes.float0)
    )
    return (dqkv, dbias, dgate, dmask)


_fused_qkv_gated_attention.defvjp(_fused_qkv_gated_fwd, _fused_qkv_gated_bwd)


def fused_qkv_gated_attention(
    qkv: jnp.ndarray,
    heads: int,
    pos_bias: jnp.ndarray,
    gate: Optional[jnp.ndarray] = None,
    key_padding_mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    interpret: Optional[bool] = None,
    block_b: int = 8,
) -> jnp.ndarray:
    """Gated-bias SDPA over the raw fused-QKV gemm output (BEATs chain).

    ``softmax(q·kᵀ·scale + gate ⊙ pos_bias + pad) · v`` where q/k/v are
    column views of the direct ``Dense(3E)`` output — the split, the four
    transposes, the [B,H,T,T] gate×bias product, and the head-merge all stay
    inside the kernel boundary (see ``_fused_qkv_gated_kernel``). Mirrors the
    reference BEATs attention (backbone.py:541-568) like
    :func:`gated_bias_attention`, with the round-5 widened boundary of
    :func:`fused_qkv_attention`.

    Args:
        qkv: ``[B, T, 3·E]`` raw fused-QKV gemm output (``q | k | v`` column
            order, each ``[heads, head_dim]``-major).
        heads: attention head count.
        pos_bias: shared T5 bias ``[H, T, T]`` (batch-independent).
        gate: per-query gate ``[B, H, T]`` (or None for ungated bias).
        key_padding_mask: ``[B, T]`` boolean, True = padded key.
        scale: logit scale, default ``1/sqrt(head_dim)``.

    Returns ``[B, T, E]`` — heads already merged; feed the out-projection.
    """
    dim = qkv.shape[-1] // 3
    head_dim = dim // heads
    scale = scale if scale is not None else 1.0 / math.sqrt(head_dim)
    return _fused_qkv_gated_attention(
        qkv, pos_bias, gate, key_padding_mask, heads, scale, interpret, block_b
    )


def fused_qkv_attention(
    qkv: jnp.ndarray,
    heads: int,
    key_padding_mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    interpret: Optional[bool] = None,
    block_b: int = 8,
) -> jnp.ndarray:
    """Bias-free SDPA over the raw fused-QKV gemm output.

    Args:
        qkv: ``[B, T, 3·E]`` — the direct ``Dense(3E)`` output, column order
            ``q | k | v`` each ``[heads, head_dim]``-major (the standard ViT
            fused-qkv layout).
        heads: attention head count (``E = qkv.shape[-1] // 3`` divides it).
        key_padding_mask: ``[B, T]`` boolean, True = padded key.
        scale: logit scale, default ``1/sqrt(head_dim)``.

    Returns ``[B, T, E]`` — heads already merged; feed the out-projection
    directly. Equal to split-transpose + ``gated_bias_attention(pos_bias=
    None)`` + merge, with all of those data movements inside the kernel
    boundary (see ``_fused_qkv_kernel``).
    """
    dim = qkv.shape[-1] // 3
    head_dim = dim // heads
    scale = scale if scale is not None else 1.0 / math.sqrt(head_dim)
    return _fused_qkv_attention(qkv, heads, key_padding_mask, scale, interpret, block_b)


def gated_bias_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    pos_bias: Optional[jnp.ndarray],
    gate: Optional[jnp.ndarray] = None,
    key_padding_mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    interpret: Optional[bool] = None,
    block_b: int = 8,
) -> jnp.ndarray:
    """Fused ``softmax(q·kᵀ·scale + gate ⊙ bias + pad) · v``.

    Args:
        q, k, v: ``[B, H, T, D]``.
        pos_bias: shared bias ``[H, T, T]`` (batch-independent), or None for
            plain bias-free attention (the EAT / Bird-MAE ViT blocks) — a
            simplified kernel cell skips the bias load and the gate entirely.
        gate: per-query gate ``[B, H, T]`` (or None for plain bias).
        key_padding_mask: ``[B, T]`` boolean, True = padded key.
        scale: logit scale, default ``1/sqrt(D)``.
        interpret: run in the Pallas interpreter (CPU testing).
        block_b: batch items per grid cell (shared-bias amortization).

    Returns:
        ``[B, H, T, D]`` in the dtype of ``v``.
    """
    dim = q.shape[-1]
    scale = scale if scale is not None else 1.0 / math.sqrt(dim)
    return _gated_bias_attention(
        q, k, v, pos_bias, gate, key_padding_mask, scale, interpret, block_b
    )
