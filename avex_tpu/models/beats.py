"""BEATs (Bidirectional Encoder representation from Audio Transformers) in JAX.

TPU-first re-design of the reference implementation
(avex/models/beats/{beats,backbone,modules}.py and avex/models/beats_model.py):

- the Kaldi frontend is the fused single-conv op (`avex_tpu.ops.fbank`),
  pinned to fp32 exactly like the reference (beats.py:304-323);
- the encoder works in ``[B, T, C]`` throughout (no T-B-C transposes);
- the T5 relative-position bucket matrix is computed in-graph from iota
  (an exact twin of the numpy construction, pinned by test), so neither it
  nor the fbank constants bloat the serialized program;
- intermediate activations ("hooks") are first-class functional outputs: the
  model returns ``(output, aux)`` where ``aux["intermediates"]`` maps
  reference-compatible layer names (``backbone.post_extract_proj``,
  ``backbone.encoder.layers.{i}.fc2``) to activations — jit-safe, no mutation;
- weight-normed pos_conv weights are folded at conversion time;
- LayerDrop (backbone.py:190-213) is an explicit rng-driven branch, disabled
  for deterministic/fingerprint paths.

Weight conversion from reference torch checkpoints lives in
:func:`convert_beats_state_dict`.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from pydantic import BaseModel, ConfigDict

from avex_tpu.ops.attention import (
    dot_product_attention,
    grad_multiply,
    relative_position_bucket_jnp,
)
from avex_tpu.ops.fbank import KaldiFbank, beats_fbank

__all__ = [
    "BEATsConfig",
    "BEATsBackbone",
    "BEATsModel",
    "Model",
    "convert_beats_state_dict",
]


class BEATsConfig(BaseModel):
    """BEATs architecture hyper-parameters (field surface ≈ beats.py:166-228).

    Defaults match the iter3+AS2M SSL variant; official ESP checkpoints ship a
    full ``init_config`` dict that parses into this model unchanged.
    """

    model_config = ConfigDict(extra="allow")

    input_patch_size: int = 16
    embed_dim: int = 512
    conv_bias: bool = False

    encoder_layers: int = 12
    encoder_embed_dim: int = 768
    encoder_ffn_embed_dim: int = 3072
    encoder_attention_heads: int = 12
    activation_fn: str = "gelu"

    layer_wise_gradient_decay_ratio: float = 1.0
    layer_norm_first: bool = False
    deep_norm: bool = True

    dropout: float = 0.1
    attention_dropout: float = 0.1
    activation_dropout: float = 0.0
    encoder_layerdrop: float = 0.05
    dropout_input: float = 0.0

    conv_pos: int = 128
    conv_pos_groups: int = 16

    relative_position_embedding: bool = True
    num_buckets: int = 320
    max_distance: int = 800
    gru_rel_pos: bool = True

    sample_frequency: float = 16000.0
    num_mel_bins: int = 128
    frame_length: float = 25.0
    frame_shift: float = 10.0
    fbank_mean: float = 15.41663
    fbank_std: float = 6.55582

    finetuned_model: bool = False
    predictor_dropout: float = 0.0
    predictor_class: int = 527


def downsample_padding_mask(padding_mask: jnp.ndarray, target_len: int) -> jnp.ndarray:
    """All-pool a boolean padding mask down to ``target_len`` positions.

    Replicates ``BEATs.forward_padding_mask`` (beats.py:283-302): trim the
    remainder, reshape to ``(B, target_len, -1)``, and mark a position padded
    only when every pooled element is padded.
    """
    bsz, n = padding_mask.shape
    extra = n % target_len
    if extra:
        padding_mask = padding_mask[:, :-extra]
    return jnp.all(padding_mask.reshape(bsz, target_len, -1), axis=-1)


def _gelu(x: jnp.ndarray) -> jnp.ndarray:
    # torch nn.GELU default = exact erf formulation.
    return jax.nn.gelu(x, approximate=False)


class _GatedRelPosAttention(nn.Module):
    """Self-attention with GRU-gated T5 relative position bias.

    Mirrors ``_MultiheadAttention`` (backbone.py:378-574). The shared bias
    (``[1, H, T, T]``) is computed by the encoder once and passed in; the gate
    (a function of this layer's raw Q) modulates it per layer
    (backbone.py:543-551).
    """

    embed_dim: int
    num_heads: int
    gru_rel_pos: bool = True
    dropout: float = 0.0
    #: Pallas attention kernel. None = auto: always XLA for this GATED
    #: attention — the round-3/4 isolated crossover (1.15x at T=384, 1.32x at
    #: 512) did NOT survive in-model: full-BEATs bf16 B=128 on v5e measured
    #: XLA 753 clips/s vs 588 split-kernel vs 688 fused-QKV-boundary kernel
    #: at T=496, and 1,822 vs 1,482 (fused) at T=248 (round 5,
    #: AVEX_BENCH_CLIP_S=10 AVEX_ABLATE=xlaattn,full,fusedpallas
    #: scripts/bench_ablation.py; docs/architecture.md). XLA's schedule
    #: overlaps the gate/bias streams with other layers' projections, which a
    #: single-kernel grid cannot. The bias-FREE cells (EAT/Bird-MAE/ATST/
    #: AVES) are where the kernel wins — they auto-enable at T>=248.
    #: Explicit True forces the kernel (split input, or the fused-QKV
    #: boundary when fused_qkv=True and shapes tile).
    use_pallas: Optional[bool] = None
    #: run the [B, H, T, T] logits/softmax chain in the compute dtype instead
    #: of fp32 — halves the dominant HBM stream of the whole model (measured
    #: +33%% end-to-end on v5e at B=128/T=248). None = auto: on for bfloat16
    #: compute, off (fp32 parity softmax) otherwise.
    fast_attention: Optional[bool] = None
    #: single 3*E-wide QKV gemm instead of three E-wide ones — identical
    #: numerics (the converter concatenates the three kernels). Measured a
    #: 9% LOSS on v5e at B=128/T=248 (78.0 vs 70.8 ms/batch: the fused
    #: output's [.., 3, H, dh] split forces a layout change that breaks
    #: XLA's projection→attention fusion), so it stays OFF by default;
    #: reproduce with AVEX_ABLATE=fusedqkv scripts/bench_ablation.py.
    fused_qkv: bool = False
    #: W8A8 dynamic int8 projections (q/k/v/out) on the 2x-rate int8 MXU
    #: path — serving mode, converted via Model.quantize() (avex_tpu.quant).
    quantize: bool = False
    #: ring attention (ops/ring_attention.py): shard the sequence axis over
    #: this mesh's ``ring_axis`` and rotate K/V chunks via ppermute — the
    #: long-window inference mode (the [B,H,T,T] score matrix never
    #: materializes; the gate applies per ring step so the gated bias never
    #: does either). T pads to a ring multiple with -inf-masked keys when it
    #: does not divide (exact).
    ring_mesh: Any = None
    ring_axis: str = "model"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        position_bias: Optional[jnp.ndarray],
        key_padding_mask: Optional[jnp.ndarray],
        deterministic: bool = True,
    ) -> jnp.ndarray:
        bsz, seq, _ = x.shape
        head_dim = self.embed_dim // self.num_heads
        if self.quantize:
            from avex_tpu.quant import Int8Dense

            dense = lambda name: Int8Dense(self.embed_dim, dtype=self.dtype, name=name)  # noqa: E731
        else:
            dense = lambda name: nn.Dense(self.embed_dim, dtype=self.dtype, name=name)  # noqa: E731

        # Auto resolves to XLA at every length: the in-model measurements
        # (round 5, see the use_pallas field comment) put XLA ahead of both
        # kernel variants for this gated attention at T=248 AND T=496 — the
        # isolated-microbench crossover did not survive the model context.
        use_pallas = bool(self.use_pallas)

        fused_kernel = False
        qkv_raw = None
        if self.fused_qkv and not self.quantize:
            from avex_tpu.ops.pallas_attention import fused_qkv_compatible

            qkv_raw = nn.Dense(3 * self.embed_dim, dtype=self.dtype, name="qkv_proj")(x)
            # Widened kernel boundary (round 5): consume the raw [B, T, 3E]
            # gemm output; split/transpose + gate x bias + head-merge all
            # live inside the Pallas call (ops/pallas_attention.py).
            fused_kernel = (
                self.ring_mesh is None
                and use_pallas
                and position_bias is not None
                and fused_qkv_compatible(self.embed_dim, self.num_heads)
            )
            if not fused_kernel:
                qkv = qkv_raw.reshape(bsz, seq, 3, self.num_heads, head_dim)
                q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        else:
            q = dense("q_proj")(x).reshape(bsz, seq, self.num_heads, head_dim).transpose(0, 2, 1, 3)
            k = dense("k_proj")(x).reshape(bsz, seq, self.num_heads, head_dim).transpose(0, 2, 1, 3)
            v = dense("v_proj")(x).reshape(bsz, seq, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        gate = None
        if position_bias is not None and self.gru_rel_pos:
            grep_a = self.param(
                "grep_a", nn.initializers.ones, (1, self.num_heads, 1, 1), jnp.float32
            )
            if fused_kernel:
                # Same grep math from the q column view of the fused gemm —
                # the [B,H,T,dh] transpose only happens on this tiny 8-wide
                # projection output, never on q itself.
                gq = qkv_raw[..., : self.embed_dim].reshape(bsz, seq, self.num_heads, head_dim)
                gates = nn.Dense(8, dtype=self.dtype, name="grep_linear")(gq)
                gates = jax.nn.sigmoid(
                    gates.reshape(bsz, seq, self.num_heads, 2, 4).sum(-1).astype(jnp.float32)
                ).transpose(0, 2, 1, 3)  # [B, H, T, 2]
            else:
                gates = nn.Dense(8, dtype=self.dtype, name="grep_linear")(q)
                gates = jax.nn.sigmoid(
                    gates.reshape(bsz, self.num_heads, seq, 2, 4).sum(-1).astype(jnp.float32)
                )
            gate_a, gate_b = gates[..., 0:1], gates[..., 1:2]
            gate = gate_a * (gate_b * grep_a - 1.0) + 2.0  # [B, H, T, 1]

        if fused_kernel:
            from avex_tpu.ops.pallas_attention import fused_qkv_gated_attention

            out = fused_qkv_gated_attention(
                qkv_raw,
                heads=self.num_heads,
                pos_bias=position_bias[0],
                gate=None if gate is None else gate[..., 0],
                key_padding_mask=key_padding_mask,
                scale=head_dim**-0.5,
            )
            return dense("out_proj")(out)

        ring = self.ring_mesh
        if ring is not None:
            from avex_tpu.ops.ring_attention import ring_attention

            # Pad to a ring multiple when T doesn't divide: padded keys get
            # -inf via the mask (exact), padded query rows are sliced off.
            pad_len = (-seq) % int(ring.shape[self.ring_axis])
            rq, rk, rv, rbias, rgate, rmask = q, k, v, position_bias, gate, key_padding_mask
            if pad_len:
                grow = ((0, 0), (0, 0), (0, pad_len), (0, 0))
                rq, rk, rv = (jnp.pad(t, grow) for t in (q, k, v))
                if rbias is not None:
                    rbias = jnp.pad(rbias, ((0, 0), (0, 0), (0, pad_len), (0, pad_len)))
                if rgate is not None:
                    rgate = jnp.pad(rgate, ((0, 0), (0, 0), (0, pad_len), (0, 0)))
                if rmask is None:
                    rmask = jnp.zeros((bsz, seq), bool)
                rmask = jnp.pad(rmask, ((0, 0), (0, pad_len)), constant_values=True)
            out = ring_attention(
                rq,
                rk,
                rv,
                bias=rbias,
                gate=rgate,
                key_padding_mask=rmask,
                scale=head_dim**-0.5,
                mesh=ring,
                axis=self.ring_axis,
            )[:, :, :seq]
            out = out.transpose(0, 2, 1, 3).reshape(bsz, seq, self.embed_dim)
            return dense("out_proj")(out)

        if use_pallas and position_bias is not None:
            # Fused kernel: gate x shared-bias never materializes in HBM
            # (avex_tpu/ops/pallas_attention.py).
            from avex_tpu.ops.pallas_attention import gated_bias_attention

            out = gated_bias_attention(
                q,
                k,
                v,
                pos_bias=position_bias[0],
                gate=None if gate is None else gate[..., 0],
                key_padding_mask=key_padding_mask,
                scale=head_dim**-0.5,
            )
        else:
            bias = None
            if position_bias is not None:
                bias = gate * position_bias if gate is not None else position_bias
            if key_padding_mask is not None:
                pad = jnp.where(key_padding_mask[:, None, None, :], -jnp.inf, 0.0)
                bias = pad if bias is None else bias + pad
            fast = self.fast_attention
            if fast is None:  # auto: reduced-precision softmax iff bf16 compute
                fast = self.dtype == jnp.bfloat16
            logits_dtype = self.dtype if fast else jnp.float32
            out = dot_product_attention(
                q, k, v, bias=bias, scale=head_dim**-0.5, logits_dtype=logits_dtype
            )
        out = out.transpose(0, 2, 1, 3).reshape(bsz, seq, self.embed_dim)
        return dense("out_proj")(out)


class _EncoderLayer(nn.Module):
    """One BEATs block: gated-bias attention + FFN with DeepNorm residuals.

    Mirrors ``_TransformerSentenceEncoderLayer`` (backbone.py:224-375). Only
    the post-LN (+DeepNorm) and pre-LN orderings used by the reference are
    implemented. Returns ``(x, fc2_out)`` where ``fc2_out`` is the raw fc2
    activation — the tensor the reference captures via its fc2 forward hook.
    """

    cfg: BEATsConfig
    dtype: Any = jnp.float32
    ring_mesh: Any = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        position_bias: Optional[jnp.ndarray],
        key_padding_mask: Optional[jnp.ndarray],
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.cfg
        alpha = math.pow(2 * cfg.encoder_layers, 0.25) if cfg.deep_norm else 1.0
        quantize = bool(getattr(cfg, "quantize_encoder", False))
        attn = _GatedRelPosAttention(
            embed_dim=cfg.encoder_embed_dim,
            num_heads=cfg.encoder_attention_heads,
            gru_rel_pos=cfg.gru_rel_pos,
            dropout=cfg.attention_dropout,
            use_pallas=getattr(cfg, "use_pallas", None),
            fast_attention=getattr(cfg, "fast_attention", None),
            fused_qkv=bool(getattr(cfg, "fused_qkv", False)),
            quantize=quantize,
            ring_mesh=self.ring_mesh,
            dtype=self.dtype,
            name="self_attn",
        )
        ln_attn = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="self_attn_layer_norm")
        ln_final = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="final_layer_norm")
        if quantize:
            from avex_tpu.quant import Int8Dense

            fc1 = Int8Dense(cfg.encoder_ffn_embed_dim, dtype=self.dtype, name="fc1")
            fc2 = Int8Dense(cfg.encoder_embed_dim, dtype=self.dtype, name="fc2")
        else:
            fc1 = nn.Dense(cfg.encoder_ffn_embed_dim, dtype=self.dtype, name="fc1")
            fc2 = nn.Dense(cfg.encoder_embed_dim, dtype=self.dtype, name="fc2")
        drop = nn.Dropout(cfg.dropout)
        drop_act = nn.Dropout(cfg.activation_dropout)

        if cfg.layer_norm_first:
            residual = x
            h = ln_attn(x)
            h = attn(h, position_bias, key_padding_mask, deterministic)
            x = residual + drop(h, deterministic=deterministic)
            residual = x
            h = ln_final(x)
            h = _gelu(fc1(h))
            h = drop_act(h, deterministic=deterministic)
            fc2_out = fc2(h)
            x = residual + drop(fc2_out, deterministic=deterministic)
        else:
            h = attn(x, position_bias, key_padding_mask, deterministic)
            x = x * alpha + drop(h, deterministic=deterministic)
            x = ln_attn(x)
            residual = x
            h = _gelu(fc1(x))
            h = drop_act(h, deterministic=deterministic)
            fc2_out = fc2(h)
            x = residual * alpha + drop(fc2_out, deterministic=deterministic)
            x = ln_final(x)
        return x, fc2_out


class _TransformerEncoder(nn.Module):
    """BEATs encoder stack: conv positional embedding + N gated-bias layers.

    Mirrors ``TransformerEncoder`` (backbone.py:38-221). The relative position
    bias table lives here (single owner — the reference aliases layer 0's table
    into every layer, backbone.py:100-103) and is looked up once per forward.
    """

    cfg: BEATsConfig
    dtype: Any = jnp.float32
    # Optional pipeline-parallel runner for the scanned layer stack
    # (parallel/pipeline.make_pipeline_runner); None = run layers in-process.
    layer_runner: Optional[Callable] = None
    # Ring-attention mesh (long-window inference; see _GatedRelPosAttention).
    ring_mesh: Any = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        padding_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        disable_layerdrop: bool = True,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        cfg = self.cfg
        bsz, seq, dim = x.shape

        if padding_mask is not None:
            x = jnp.where(padding_mask[:, :, None], 0.0, x)

        # Grouped conv positional embedding (weight norm folded at load);
        # even kernel → SamePad trims the final position (backbone.py:52-68).
        pos = nn.Conv(
            features=dim,
            kernel_size=(cfg.conv_pos,),
            feature_group_count=cfg.conv_pos_groups,
            padding=[(cfg.conv_pos // 2, cfg.conv_pos // 2)],
            dtype=self.dtype,
            name="pos_conv",
        )(x)
        if cfg.conv_pos % 2 == 0:
            pos = pos[:, :-1, :]
        x = x + _gelu(pos)

        if not cfg.layer_norm_first:
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm")(x)
        x = nn.Dropout(cfg.dropout)(x, deterministic=deterministic)

        position_bias = None
        if cfg.relative_position_embedding:
            table = nn.Embed(
                cfg.num_buckets, cfg.encoder_attention_heads, name="rel_attn_bias"
            )
            # In-graph bucket computation (exact twin of the numpy version,
            # pinned by test) keeps the ~250 KB dense matrix out of the
            # serialized compile payload.
            buckets = relative_position_bucket_jnp(
                seq, seq, cfg.num_buckets, cfg.max_distance
            )
            # [T, T, H] -> [1, H, T, T]
            position_bias = table(buckets).transpose(2, 0, 1)[None].astype(jnp.float32)

        # Gradient checkpointing: rematerialize each block in the backward
        # pass (the jax analogue of torch.utils.checkpoint on encoder layers).
        # remat_policy selects what the backward keeps: None/"nothing" =
        # recompute everything (minimum memory), "dots" = save matmul outputs
        # and recompute the elementwise chains (dots_with_no_batch_dims_
        # saveable — the usual TPU memory/FLOPs sweet spot).
        layer_cls = _EncoderLayer
        if getattr(cfg, "remat", False):
            policy_name = getattr(cfg, "remat_policy", None)
            if policy_name in (None, "nothing"):
                policy = None
            elif policy_name == "dots":
                policy = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
            else:
                raise ValueError(
                    f"Unknown remat_policy {policy_name!r} (None, 'nothing', 'dots')"
                )
            layer_cls = nn.remat(_EncoderLayer, static_argnums=(4,), policy=policy)

        use_layerdrop = (
            not disable_layerdrop and cfg.encoder_layerdrop > 0 and not deterministic
        )

        intermediates: Dict[str, jnp.ndarray] = {}
        if (
            self.layer_runner is not None
            and getattr(cfg, "scan_layers", False)
            and not self.is_initializing()
        ):
            # Runner-driven layer stack: pipeline parallelism (the stacked
            # params shard one GPipe stage per device and microbatches stream
            # via ppermute — parallel/pipeline.py) or sequence parallelism
            # (activations re-shard [B, T, E] on T at layer boundaries —
            # parallel/sequence.py). Deterministic-only: per-layer dropout
            # rngs do not thread through the runner contract.
            if use_layerdrop:
                raise ValueError("runner-driven encoder does not support layerdrop")
            if not deterministic and max(
                cfg.dropout, cfg.attention_dropout, cfg.activation_dropout
            ) > 0:
                raise ValueError(
                    "runner-driven encoder (pipeline/sequence-parallel) is "
                    "deterministic-only; set the encoder dropout rates to 0 "
                    "to train with it"
                )
            stacked = self.get_variable("params", "layers")
            has_mask = padding_mask is not None
            has_bias = position_bias is not None
            ratio = cfg.layer_wise_gradient_decay_ratio
            # parent=None: a free-standing functional twin of the scanned
            # layer (constructing it inside this compact method would
            # auto-register it as a child and forbid .apply on it).
            layer_module = _EncoderLayer(cfg=cfg, dtype=self.dtype, ring_mesh=self.ring_mesh, parent=None)

            def layer_fn(p, h, *extras):
                mask = extras[0] if has_mask else None
                bias = extras[-1] if has_bias else None
                if ratio != 1.0:
                    h = grad_multiply(h, ratio)
                new_h, _fc2 = layer_module.apply({"params": p}, h, bias, mask, True)
                return new_h

            batched = (padding_mask,) if has_mask else ()
            shared = (position_bias,) if has_bias else ()
            x = self.layer_runner(layer_fn, stacked, x, batched, shared)
            # fc2 intermediates are not captured under pipelining: only the
            # final activations cross stage boundaries.
        elif getattr(cfg, "scan_layers", False):
            # Compile-time optimization: one traced layer body scanned L times
            # (params stacked on a leading layer axis). Semantics identical to
            # the unrolled loop; weight conversion stacks per-layer tensors
            # (convert_beats_state_dict(scan_layers=True)).
            # Measured on v5e (B=128, 5s clips, fp32): scan compiles 1.6x
            # faster (15.4s vs 25.2s; init 5.8s vs 17.1s) but runs ~6% slower
            # (1374 vs 1469 clips/s) — XLA specializes each unrolled layer.
            # Unrolled therefore stays the throughput default; flip this on
            # for compile-latency-sensitive workflows (interactive, sweeps).
            def body(layer_module, carry, _xs):
                x = carry
                if cfg.layer_wise_gradient_decay_ratio != 1.0:
                    x = grad_multiply(x, cfg.layer_wise_gradient_decay_ratio)
                new_x, fc2_out = layer_module(
                    x, position_bias, padding_mask, deterministic
                )
                if use_layerdrop:
                    keep = (
                        jax.random.uniform(layer_module.make_rng("layerdrop"), ())
                        > cfg.encoder_layerdrop
                    )
                    new_x = jnp.where(keep, new_x, x)
                    fc2_out = jnp.where(keep, fc2_out, jnp.zeros_like(fc2_out))
                return new_x, fc2_out

            rng_collections = {"params": True, "dropout": True, "layerdrop": True}
            scanned = nn.scan(
                body,
                variable_axes={"params": 0},
                split_rngs=rng_collections,
                length=cfg.encoder_layers,
            )
            x, fc2_stack = scanned(
                layer_cls(cfg=cfg, dtype=self.dtype, ring_mesh=self.ring_mesh, name="layers"), x, None
            )
            for i in range(cfg.encoder_layers):
                intermediates[f"encoder.layers.{i}.fc2"] = fc2_stack[i]
        else:
            for i in range(cfg.encoder_layers):
                if cfg.layer_wise_gradient_decay_ratio != 1.0:
                    x = grad_multiply(x, cfg.layer_wise_gradient_decay_ratio)
                layer = layer_cls(cfg=cfg, dtype=self.dtype, ring_mesh=self.ring_mesh, name=f"layers_{i}")
                new_x, fc2_out = layer(x, position_bias, padding_mask, deterministic)
                if use_layerdrop:
                    # LayerDrop: keep the layer with prob (1 - layerdrop)
                    # (backbone.py:190-213).
                    keep = (
                        jax.random.uniform(self.make_rng("layerdrop"), ())
                        > cfg.encoder_layerdrop
                    )
                    new_x = jnp.where(keep, new_x, x)
                    fc2_out = jnp.where(keep, fc2_out, jnp.zeros_like(fc2_out))
                x = new_x
                intermediates[f"encoder.layers.{i}.fc2"] = fc2_out

        if cfg.layer_norm_first:
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm")(x)
        return x, intermediates


class BEATsBackbone(nn.Module):
    """Full BEATs backbone: fbank frontend → patch embed → encoder.

    Mirrors ``BEATs`` (beats.py:231-402). ``__call__`` is the feature path
    (``extract_features`` with ``feature_only=True``); pass
    ``apply_predictor=True`` for the fine-tuned 527-class AudioSet head with
    masked-mean logits pooling (beats.py:369-381).
    """

    cfg: BEATsConfig
    dtype: Any = jnp.float32
    layer_runner: Optional[Callable] = None
    ring_mesh: Any = None

    @nn.compact
    def __call__(
        self,
        source: jnp.ndarray,
        padding_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        disable_layerdrop: bool = True,
        apply_predictor: bool = False,
    ) -> Tuple[jnp.ndarray, Dict[str, Any]]:
        cfg = self.cfg
        fbank = KaldiFbank(
            num_mel_bins=cfg.num_mel_bins,
            sample_frequency=cfg.sample_frequency,
            frame_length_ms=cfg.frame_length,
            frame_shift_ms=cfg.frame_shift,
        )
        # The fbank's ~1 MB of dense constants (fused framing kernel + mel
        # bank) live in a non-trainable variable collection so they enter the
        # program as runtime inputs, not embedded constants — identical
        # numerics, ~95% smaller compile payload (the remote-compile
        # transport rejects large bodies).
        kernel_np, mel_np = fbank.constants()
        if self.is_initializing() or self.has_variable("constants", "fbank_kernel"):
            kernel = self.variable(
                "constants", "fbank_kernel", lambda: jnp.asarray(kernel_np)
            ).value
            mel_fb = self.variable("constants", "fbank_mel", lambda: jnp.asarray(mel_np)).value
        else:
            # apply() without the collection (hand-built {"params": ...}
            # dicts, oracle tests): fall back to embedded constants —
            # identical values either way.
            kernel, mel_fb = jnp.asarray(kernel_np), jnp.asarray(mel_np)
        # fp32-pinned frontend (beats.py:304-323).
        feats = beats_fbank(
            source, cfg.fbank_mean, cfg.fbank_std, fbank=fbank,
            constants=(kernel, mel_fb),
        )

        if padding_mask is not None:
            padding_mask = downsample_padding_mask(padding_mask, feats.shape[1])

        # Patch embedding: NHWC conv, stride = kernel = patch size; flatten
        # order (time-patch major, then freq patch) matches the reference's
        # NCHW reshape+transpose (beats.py:349-352).
        x = feats[:, :, :, None].astype(self.dtype)
        x = nn.Conv(
            features=cfg.embed_dim,
            kernel_size=(cfg.input_patch_size, cfg.input_patch_size),
            strides=(cfg.input_patch_size, cfg.input_patch_size),
            use_bias=cfg.conv_bias,
            padding="VALID",
            dtype=self.dtype,
            name="patch_embedding",
        )(x)
        bsz, tp, fp, c = x.shape
        x = x.reshape(bsz, tp * fp, c)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm")(x)

        if padding_mask is not None:
            padding_mask = downsample_padding_mask(padding_mask, x.shape[1])

        if cfg.embed_dim != cfg.encoder_embed_dim:
            x = nn.Dense(cfg.encoder_embed_dim, dtype=self.dtype, name="post_extract_proj")(x)
        intermediates = {"post_extract_proj": x}

        x = nn.Dropout(cfg.dropout_input)(x, deterministic=deterministic)

        x, enc_inter = _TransformerEncoder(
            cfg=cfg, dtype=self.dtype, layer_runner=self.layer_runner,
            ring_mesh=self.ring_mesh, name="encoder"
        )(
            x,
            padding_mask=padding_mask,
            deterministic=deterministic,
            disable_layerdrop=disable_layerdrop,
        )
        intermediates.update(enc_inter)
        aux: Dict[str, Any] = {"intermediates": intermediates, "padding_mask": padding_mask}

        if apply_predictor and cfg.finetuned_model:
            h = nn.Dropout(cfg.predictor_dropout)(x, deterministic=deterministic)
            logits = nn.Dense(cfg.predictor_class, dtype=self.dtype, name="predictor")(h)
            if padding_mask is not None:
                logits = jnp.where(padding_mask[:, :, None], 0.0, logits)
                denom = jnp.maximum(jnp.sum(~padding_mask, axis=1, keepdims=True), 1)
                pooled = logits.sum(axis=1) / denom
            else:
                pooled = logits.mean(axis=1)
            return pooled, aux
        elif cfg.finetuned_model:
            # Instantiate the predictor so checkpoints load even when the
            # feature path is used (parameters must exist to receive weights).
            _ = nn.Dense(cfg.predictor_class, dtype=self.dtype, name="predictor")

        return x, aux


class BEATsModel(nn.Module):
    """BEATs wrapper with optional classifier (≈ avex/models/beats_model.py).

    Forward: raw waveform → backbone features → masked mean pool → classifier
    logits (beats_model.py:232-277). ``num_classes=None`` returns frame-level
    features. ``use_naturelm`` clamps the waveform to [-1, 1] first
    (beats_model.py:431-435). Intermediates are exposed under
    reference-compatible names prefixed with ``backbone.``.
    """

    cfg: BEATsConfig
    num_classes: Optional[int] = None
    use_naturelm: bool = False
    dtype: Any = jnp.float32
    layer_runner: Optional[Callable] = None
    ring_mesh: Any = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        padding_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        disable_layerdrop: bool = True,
    ) -> Tuple[jnp.ndarray, Dict[str, Any]]:
        if self.use_naturelm:
            x = jnp.clip(x, -1.0, 1.0)
        features, aux = BEATsBackbone(
            cfg=self.cfg, dtype=self.dtype, layer_runner=self.layer_runner,
            ring_mesh=self.ring_mesh, name="backbone",
        )(
            x,
            padding_mask=padding_mask,
            deterministic=deterministic,
            disable_layerdrop=disable_layerdrop,
        )
        aux["intermediates"] = {
            f"backbone.{k}": v for k, v in aux["intermediates"].items()
        }
        aux["features"] = features

        frame_mask = aux.get("padding_mask")
        if frame_mask is not None:
            masked = jnp.where(frame_mask[:, :, None], 0.0, features)
            denom = jnp.maximum(jnp.sum(~frame_mask, axis=1, keepdims=True), 1)
            pooled = masked.sum(axis=1) / denom
        else:
            pooled = features.mean(axis=1)
        aux["pooled"] = pooled

        if self.num_classes is None:
            return features, aux
        logits = nn.Dense(self.num_classes, dtype=self.dtype, name="classifier")(pooled)
        return logits, aux


# ---------------------------------------------------------------------------
# Weight conversion (reference torch checkpoints → flax params)
# ---------------------------------------------------------------------------


def _fold_weight_norm(g: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Fold torch ``parametrizations.weight_norm(dim=2)`` into a plain kernel.

    ``w[:, :, k] = g[0, 0, k] * v[:, :, k] / ||v[:, :, k]||`` — the norm runs
    over all axes except dim 2 (backbone.py:64-67 uses dim=2 on a conv1d
    weight of shape ``[out, in/groups, K]``).
    """
    norm = np.sqrt(np.sum(np.square(v), axis=(0, 1), keepdims=True))
    return g * v / norm


def convert_beats_state_dict(
    state: Dict[str, np.ndarray],
    cfg: BEATsConfig,
    num_classes: Optional[int] = None,
    scan_layers: Optional[bool] = None,
) -> Dict[str, Any]:
    """Convert a reference BEATs torch state dict into flax param pytree.

    Accepts wrapper-level checkpoints (keys prefixed ``backbone.``, optional
    ``classifier.``) as produced by the official ESP safetensors exports, or
    bare-backbone checkpoints (no prefix), which are treated as
    ``backbone.``-rooted. Weight-normed pos_conv parametrizations are folded.
    With ``scan_layers`` (default: follow ``cfg``), per-layer tensors stack on
    a leading layer axis to match the nn.scan encoder layout.
    """
    # Normalize to wrapper-rooted keys.
    if not any(k.startswith("backbone.") for k in state):
        state = {f"backbone.{k}": v for k, v in state.items()}

    # Fold pos_conv weight norm (either parametrized or legacy g/v naming).
    state = dict(state)
    pos_prefixes = set()
    for key in list(state):
        if "pos_conv" in key and ("original0" in key or "weight_g" in key):
            pos_prefixes.add(key.rsplit(".", 1)[0].replace(".parametrizations.weight", ""))
    for prefix in pos_prefixes:
        para = f"{prefix}.parametrizations.weight"
        if f"{para}.original0" in state:
            g, v = state.pop(f"{para}.original0"), state.pop(f"{para}.original1")
        else:
            g, v = state.pop(f"{prefix}.weight_g"), state.pop(f"{prefix}.weight_v")
        state[f"{prefix}.weight"] = _fold_weight_norm(g, v)

    params: Dict[str, Any] = {}

    def put(path: Tuple[str, ...], value: np.ndarray) -> None:
        node = params
        for part in path[:-1]:
            node = node.setdefault(part, {})
        node[path[-1]] = jnp.asarray(np.asarray(value, dtype=np.float32))

    heads = cfg.encoder_attention_heads

    for key, value in state.items():
        parts = key.split(".")
        if parts[0] != "backbone":
            if parts[0] == "classifier" and num_classes is not None:
                if parts[1] == "weight":
                    put(("classifier", "kernel"), value.T)
                else:
                    put(("classifier", "bias"), value)
            continue
        rest = parts[1:]
        name = ".".join(rest)

        if name.startswith("fbank."):
            continue  # frontend constants are rebuilt analytically
        if name == "patch_embedding.weight":
            put(("backbone", "patch_embedding", "kernel"), value.transpose(2, 3, 1, 0))
        elif name == "patch_embedding.bias":
            put(("backbone", "patch_embedding", "bias"), value)
        elif name in ("layer_norm.weight", "layer_norm.bias"):
            put(("backbone", "layer_norm", "scale" if name.endswith("weight") else "bias"), value)
        elif name.startswith("post_extract_proj."):
            which = "kernel" if name.endswith("weight") else "bias"
            put(("backbone", "post_extract_proj", which), value.T if which == "kernel" else value)
        elif name.startswith("predictor."):
            which = "kernel" if name.endswith("weight") else "bias"
            put(("backbone", "predictor", which), value.T if which == "kernel" else value)
        elif name.startswith("encoder.pos_conv"):
            if name.endswith("weight"):
                put(("backbone", "encoder", "pos_conv", "kernel"), value.transpose(2, 1, 0))
            else:
                put(("backbone", "encoder", "pos_conv", "bias"), value)
        elif name in ("encoder.layer_norm.weight", "encoder.layer_norm.bias"):
            put(
                ("backbone", "encoder", "layer_norm", "scale" if name.endswith("weight") else "bias"),
                value,
            )
        elif "relative_attention_bias" in name:
            # The reference aliases every layer to layer 0's table
            # (backbone.py:100-103); keep only the canonical copy.
            if "layers.0." in name and name.endswith("weight"):
                put(("backbone", "encoder", "rel_attn_bias", "embedding"), value)
        elif name.startswith("encoder.layers."):
            idx = rest[2]
            sub = rest[3:]
            base = ("backbone", "encoder", f"layers_{idx}")
            if sub[0] == "self_attn":
                if sub[1] in ("q_proj", "k_proj", "v_proj", "out_proj", "grep_linear"):
                    which = "kernel" if sub[2] == "weight" else "bias"
                    put(base + ("self_attn", sub[1], which), value.T if which == "kernel" else value)
                elif sub[1] == "grep_a":
                    put(base + ("self_attn", "grep_a"), value.reshape(1, heads, 1, 1))
            elif sub[0] in ("fc1", "fc2"):
                which = "kernel" if sub[1] == "weight" else "bias"
                put(base + (sub[0], which), value.T if which == "kernel" else value)
            elif sub[0] in ("self_attn_layer_norm", "final_layer_norm"):
                which = "scale" if sub[1] == "weight" else "bias"
                put(base + (sub[0], which), value)

    if bool(getattr(cfg, "fused_qkv", False)):
        # Fold the three projections into the single 3E-wide qkv gemm. The
        # fused output reshapes as [..., 3, H, dh], so columns concatenate in
        # q|k|v order — identical numerics, one MXU pass.
        encoder = params.get("backbone", {}).get("encoder", {})
        for name, layer in encoder.items():
            attn = layer.get("self_attn") if isinstance(layer, dict) else None
            if not attn or "q_proj" not in attn:
                continue
            attn["qkv_proj"] = {
                "kernel": jnp.concatenate(
                    [attn["q_proj"]["kernel"], attn["k_proj"]["kernel"], attn["v_proj"]["kernel"]],
                    axis=1,
                ),
                "bias": jnp.concatenate(
                    [attn["q_proj"]["bias"], attn["k_proj"]["bias"], attn["v_proj"]["bias"]]
                ),
            }
            for old in ("q_proj", "k_proj", "v_proj"):
                del attn[old]

    if scan_layers is None:
        scan_layers = bool(getattr(cfg, "scan_layers", False))
    if scan_layers:
        encoder = params.get("backbone", {}).get("encoder", {})
        layer_keys = sorted(
            (k for k in encoder if k.startswith("layers_")),
            key=lambda name: int(name.split("_")[1]),
        )
        if layer_keys:
            subtrees = [encoder.pop(k) for k in layer_keys]
            encoder["layers"] = jax.tree_util.tree_map(
                lambda *leaves: jnp.stack(leaves), *subtrees
            )
    return {"params": params}


#: Encoder dense layers eligible for int8 (everything on the MXU hot path;
#: grep_linear, pos_conv, patch embed, classifier stay float).
ENCODER_QUANT_DENSES = frozenset({"q_proj", "k_proj", "v_proj", "out_proj", "fc1", "fc2"})


def quantize_beats_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """Quantize a BEATs param pytree's encoder denses to int8 (W8 half).

    Works on both the unrolled (``layers_{i}``) and nn.scan-stacked
    (``layers`` with a leading layer axis) layouts — per-channel scales are
    computed per stacked layer.
    """
    from avex_tpu.quant import quantize_params

    return quantize_params(
        params,
        include=lambda path: "encoder" in path and path[-1] in ENCODER_QUANT_DENSES,
    )


# ---------------------------------------------------------------------------
# Registered wrapper (architecture name: "beats")
# ---------------------------------------------------------------------------

from avex_tpu.models.base import ModelBase  # noqa: E402  (wrapper layer import)
from avex_tpu.utils.tree import merge_converted_params  # noqa: E402


class Model(ModelBase):
    """BEATs wrapper registered as ``beats`` (≈ avex/models/beats_model.py).

    Constructor surface mirrors the reference factory call
    (avex/models/utils/factory.py:19-167 forwards device/num_classes/
    pretrained/audio_config plus BEATs-specific spec fields). ``pretrained``
    weights come from checkpoints via :meth:`load_state_dict` — there is no
    implicit network fetch here.
    """

    def __init__(
        self,
        device: str = "tpu",
        num_classes: Optional[int] = None,
        pretrained: bool = True,
        audio_config: Optional[Dict[str, Any]] = None,
        init_config: Optional[Dict[str, Any]] = None,
        use_naturelm: Optional[bool] = None,
        fine_tuned: Optional[bool] = None,
        return_features_only: bool = False,
        compute_dtype: str = "float32",
        seed: int = 0,
    ) -> None:
        super().__init__(device=device, audio_config=audio_config)
        cfg = BEATsConfig(**(init_config or {}))
        if use_naturelm:
            cfg = cfg.model_copy(update={"finetuned_model": True})
        self.cfg = cfg
        self.use_naturelm = bool(use_naturelm)
        self.fine_tuned = bool(fine_tuned)
        self.disable_layerdrop = True
        self.num_classes = num_classes if not return_features_only else None
        self._return_features_only = return_features_only

        dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
        self.module = BEATsModel(
            cfg=cfg,
            num_classes=self.num_classes,
            use_naturelm=self.use_naturelm,
            dtype=dtype,
        )
        dummy = jnp.zeros((1, int(cfg.sample_frequency)), dtype=jnp.float32)
        self.variables = self._init_variables(dummy, seed=seed)

        if pretrained:
            # pretrained=True resolves the Microsoft BEATs base weights
            # (SSL or AS2M-finetuned) like the reference
            # (beats_model.py:28-69); offline builds warn and keep the
            # random init (load_model applies official checkpoints on top).
            self._load_reference_base_checkpoint()

    def _load_reference_base_checkpoint(self) -> None:
        """Fetch + convert the BEATs iter3+AS2M base checkpoint if reachable."""
        import logging

        from avex_tpu.api.reference_checkpoints import resolve_beats_base_checkpoint
        from avex_tpu.utils.loaders import process_state_dict, universal_load

        entry = resolve_beats_base_checkpoint(fine_tuned=self.fine_tuned)
        try:
            state = process_state_dict(universal_load(entry["checkpoint_path"]))
            self.load_state_dict(state)
        except Exception as err:
            logging.getLogger(__name__).warning(
                "Could not load BEATs base checkpoint %s (%s); keeping random init",
                entry["checkpoint_path"],
                err,
            )

    def _apply_kwargs(self) -> Dict[str, Any]:
        return {"deterministic": True, "disable_layerdrop": self.disable_layerdrop}

    def _discover_embedding_layers(self) -> None:
        """post_extract_proj + per-layer fc2 (beats_model.py:206-227)."""
        if not self._layer_names:
            self._layer_names = ["backbone.post_extract_proj"] + [
                f"backbone.encoder.layers.{i}.fc2" for i in range(self.cfg.encoder_layers)
            ]

    def load_state_dict(self, state: Dict[str, np.ndarray], strict: bool = False) -> None:
        """Load a converted BEATs checkpoint (SSL/finetuned/NatureLM naming)."""
        converted = convert_beats_state_dict(state, self.cfg, num_classes=self.num_classes)
        self.variables = merge_converted_params(self.variables, converted, strict=strict)
        self._jit_cache.clear()

    def enable_gradient_checkpointing(self) -> None:
        """Rebuild the module with per-layer rematerialization (nn.remat)."""
        self.cfg = self.cfg.model_copy(update={"remat": True})
        self.module = BEATsModel(
            cfg=self.cfg,
            num_classes=self.num_classes,
            use_naturelm=self.use_naturelm,
            dtype=self.module.dtype,
        )
        self._jit_cache.clear()

    def enable_pipeline(self, mesh, num_microbatches: Optional[int] = None) -> None:
        """Rebuild the module to run the encoder layer stack pipeline-parallel
        over ``mesh``'s model axis (GPipe schedule — parallel/pipeline.py):
        each device holds ``encoder_layers / stages`` consecutive layers and
        microbatches stream through via ppermute.

        Requires the nn.scan parameter layout (``scan_layers=True`` — stages
        shard the stacked layer axis) and a deterministic encoder (encoder
        dropout rates must be 0 to train pipelined).
        """
        from avex_tpu.parallel.pipeline import make_pipeline_runner

        if not getattr(self.cfg, "scan_layers", False):
            raise ValueError(
                "pipeline parallelism needs the stacked (scan_layers=True) "
                "parameter layout; construct the model with "
                'init_config={"scan_layers": True}'
            )
        self.module = BEATsModel(
            cfg=self.cfg,
            num_classes=self.num_classes,
            use_naturelm=self.use_naturelm,
            dtype=self.module.dtype,
            layer_runner=make_pipeline_runner(mesh, num_microbatches=num_microbatches),
        )
        self._jit_cache.clear()

    def enable_sequence_parallel(self, mesh) -> None:
        """Rebuild the module with Megatron-SP sequence parallelism: encoder
        activations re-shard ``[B, T(model axis), E]`` at every layer
        boundary (parallel/sequence.py), so LayerNorm/residual/FFN work runs
        sequence-sharded and XLA gathers only for attention. Values are
        unchanged (GSPMD). Requires the scanned (``scan_layers=True``)
        encoder, like :meth:`enable_pipeline`.
        """
        from avex_tpu.parallel.sequence import make_sequence_parallel_runner

        if not getattr(self.cfg, "scan_layers", False):
            raise ValueError(
                "sequence parallelism needs the stacked (scan_layers=True) "
                "parameter layout; construct the model with "
                'init_config={"scan_layers": True}'
            )
        self.module = BEATsModel(
            cfg=self.cfg,
            num_classes=self.num_classes,
            use_naturelm=self.use_naturelm,
            dtype=self.module.dtype,
            layer_runner=make_sequence_parallel_runner(mesh),
        )
        self._jit_cache.clear()

    def enable_ring_attention(self, mesh, axis: str = "model") -> None:
        """Rebuild the module with ring attention (ops/ring_attention.py):
        the encoder's attention shards its sequence axis over ``mesh``'s
        ``axis`` and K/V chunks rotate via ppermute, so windows whose
        [B,H,T,T] score matrix (and gated bias) would not fit one device run
        exactly — the long-window inference mode behind
        ``embed --windowed`` (exceeds the reference's center-crop handling,
        avex/models/perch.py:153-185). T pads to a ring multiple with
        -inf-masked keys when it does not divide (exact)."""
        self.module = BEATsModel(
            cfg=self.cfg,
            num_classes=self.num_classes,
            use_naturelm=self.use_naturelm,
            dtype=self.module.dtype,
            layer_runner=self.module.layer_runner,
            ring_mesh=mesh,
        )
        self._jit_cache.clear()

    def quantize(self, mode: str = "int8") -> None:
        """Convert to W8A8 dynamic-int8 encoder inference (serving mode).

        Folds every encoder dense projection (q/k/v/out, fc1, fc2) to
        symmetric per-channel int8 and rebuilds the module on the int8 MXU
        path (``avex_tpu.quant``). One-way and inference-only: quantized
        kernels carry no gradients. The frontend, patch embed, pos_conv,
        rel-pos table, gate, and classifier stay in float — they are a few
        percent of the FLOPs and the quality-sensitive parts.
        """
        if mode != "int8":
            raise ValueError(f"Unsupported quantization mode: {mode!r} (only 'int8')")
        if getattr(self.cfg, "quantize_encoder", False):
            return  # already quantized
        if bool(getattr(self.cfg, "fused_qkv", False)):
            raise ValueError("quantize() is incompatible with fused_qkv; rebuild without it.")
        self.cfg = self.cfg.model_copy(update={"quantize_encoder": True})
        self.module = BEATsModel(
            cfg=self.cfg,
            num_classes=self.num_classes,
            use_naturelm=self.use_naturelm,
            dtype=self.module.dtype,
        )
        self.variables = dict(self.variables)
        self.variables["params"] = quantize_beats_params(self.variables["params"])
        self._jit_cache.clear()
