"""EAT (Efficient Audio Transformer / data2vec-2.0 image encoder) in Flax.

TPU-native counterpart of ``avex/models/eat_hf.py`` (which wraps the HF
remote-code Data2Vec-multi backbone ``worstchan/EAT-base_epoch30_pretrain``):

- frontend: batched Hann-window Kaldi fbank normalized with AudioSet stats
  (``avex_tpu.ops.fbank.eat_fbank`` — the reference loops per-sample on CPU,
  eat/audio_processor.py:102-126; here it is one fused TPU conv);
- backbone: ViT-base over the (1, 128, 1024) spectrogram image — 16x16 conv
  patch embed, fixed 2-D sin-cos positions (MAE convention), prepended CLS
  token, 12 pre-norm blocks (fused-qkv attention, 4x GELU MLP), final norm;
- embedding taps: ``backbone.model.blocks.{i}.attn.proj`` outputs
  (eat_hf.py:220-236).

Weight conversion accepts both the ESP wrapper export naming
(``backbone.model.blocks...``) and raw fairseq data2vec naming
(``modality_encoders.IMAGE...``, the remapping mirrored from
eat_hf.py:43-103).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from avex_tpu.models.base import ModelBase
from avex_tpu.ops.attention import dot_product_attention
from avex_tpu.ops.fbank import KaldiFbank, eat_fbank
from avex_tpu.utils.tree import merge_converted_params

__all__ = [
    "EATModel",
    "Model",
    "convert_eat_state_dict",
    "sincos_2d_positions",
    "apply_vit_blocks",
]


def sincos_2d_positions(embed_dim: int, grid_h: int, grid_w: int) -> np.ndarray:
    """MAE-style fixed 2-D sin-cos positional table ``[grid_h*grid_w, dim]``."""

    def _1d(dim: int, positions: np.ndarray) -> np.ndarray:
        omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
        omega = 1.0 / 10000**omega
        out = np.einsum("p,d->pd", positions.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    grid = np.meshgrid(np.arange(grid_w, dtype=np.float64), np.arange(grid_h, dtype=np.float64))
    grid = np.stack(grid)  # [2, h, w] (w-coordinate first, MAE convention)
    emb_h = _1d(embed_dim // 2, grid[0])
    emb_w = _1d(embed_dim // 2, grid[1])
    return np.concatenate([emb_h, emb_w], axis=1).astype(np.float32)


class _Block(nn.Module):
    """Pre-norm ViT block with fused-qkv attention (data2vec AltBlock)."""

    dim: int = 768
    heads: int = 12
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32
    #: fused Pallas attention (bias-free cell of ops/pallas_attention.py).
    #: None = auto: on for real-TPU traces at T >= 248 — the fused-QKV
    #: boundary's measured in-model crossover (round 5, v5e bf16 B=128:
    #: inference +49% at EAT's native T=513, +17% at T=250 on the identical
    #: ATST block, +7% at T=249 on AVES, 0.92x at T=125). Training routes
    #: the VMEM backward kernel (P recomputed in-register, dq/dk/dv with no
    #: [T,T] HBM traffic): full EAT AdamW step +44% at T=513 (341 vs 237
    #: clips/s B=64), neutral at AVES' T=249 — scripts/bench_fused_qkv_ab.py.
    use_pallas: Optional[bool] = None
    #: ring attention over this mesh's model axis (ops/ring_attention.py) —
    #: long-window inference: the [B,H,T,T] score matrix never materializes.
    #: T pads to a ring multiple with -inf-masked keys (exact).
    ring_mesh: Any = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        bsz, seq, dim = x.shape
        head_dim = dim // self.heads

        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        qkv_raw = nn.Dense(3 * dim, dtype=self.dtype, name="qkv")(h)
        ring = self.ring_mesh
        use_pallas = self.use_pallas
        if use_pallas is None:
            use_pallas = seq >= 248 and jax.default_backend() == "tpu"
        from avex_tpu.ops.pallas_attention import fused_qkv_compatible

        if ring is None and use_pallas and fused_qkv_compatible(dim, self.heads):
            # Widened kernel boundary: the split/transpose and head-merge
            # live INSIDE the Pallas call as BlockSpec views, so XLA sees
            # gemm -> pallas -> gemm with no HBM-materialized relayouts
            # (the round-4 1.33x-isolated -> +3%-in-model dilution was
            # exactly those relayouts; see ops/pallas_attention.py). Shapes
            # whose head groups don't tile to 128 lanes (Bird-MAE huge,
            # dh=80) take the split-input kernel below instead.
            from avex_tpu.ops.pallas_attention import fused_qkv_attention

            attn = fused_qkv_attention(qkv_raw, heads=self.heads, scale=head_dim**-0.5)
        else:
            qkv = qkv_raw.reshape(bsz, seq, 3, self.heads, head_dim)
            q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
            if ring is not None:
                from avex_tpu.ops.ring_attention import ring_attention

                # The CLS token makes T = grid + 1, never a ring multiple —
                # pad K/V/Q to one and mask the padded keys (exact: masked
                # keys get -inf, padded query rows are sliced off).
                pad_len = (-seq) % int(ring.shape["model"])
                mask = None
                if pad_len:
                    grow = ((0, 0), (0, 0), (0, pad_len), (0, 0))
                    q, k, v = (jnp.pad(t, grow) for t in (q, k, v))
                    mask = jnp.zeros((bsz, seq + pad_len), bool).at[:, seq:].set(True)
                attn = ring_attention(
                    q, k, v, scale=head_dim**-0.5, mesh=ring, key_padding_mask=mask
                )[:, :, :seq]
            elif use_pallas:
                # Pallas-profitable shape that can't take the fused-QKV
                # boundary: the round-4 split-input kernel.
                from avex_tpu.ops.pallas_attention import gated_bias_attention

                attn = gated_bias_attention(q, k, v, pos_bias=None, scale=head_dim**-0.5)
            else:
                # bf16 compute runs the softmax chain in bf16 too (the
                # [B,H,T,T] stream dominates HBM traffic; fp32 keeps the
                # parity softmax).
                attn = dot_product_attention(
                    q, k, v, scale=head_dim**-0.5,
                    logits_dtype=jnp.float32 if self.dtype == jnp.float32 else self.dtype,
                )
            attn = attn.transpose(0, 2, 1, 3).reshape(bsz, seq, dim)
        proj_out = nn.Dense(dim, dtype=self.dtype, name="proj")(attn)
        x = x + proj_out

        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(int(dim * self.mlp_ratio), dtype=self.dtype, name="fc1")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(dim, dtype=self.dtype, name="fc2")(h)
        x = x + h
        return x, proj_out


def apply_vit_blocks(
    mod: nn.Module,
    tokens: jnp.ndarray,
    *,
    key_prefix: str,
    deterministic: bool = True,
) -> tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Run a plain pre-norm ViT block stack in one of three layouts.

    Shared by the EAT and Bird-MAE encoders (both are unadorned ``_Block``
    stacks — no per-layer masks or biases, so the generic form is simpler
    than BEATs'). ``mod`` supplies ``depth``/``dim``/``heads``/``dtype`` plus
    two optional fields:

    - ``scan_layers``: stack per-block params on a leading layer axis and run
      the stack as one ``nn.scan`` (required for pipeline/SP — the stacked
      layout is what stage-shards);
    - ``layer_runner``: the generic parallelism hook (same contract as
      ``models/beats.py``) — gets ``(layer_fn, stacked_params, x, batched,
      shared)`` and owns the loop (``parallel/pipeline.py`` GPipe or
      ``parallel/sequence.py`` Megatron-SP). Runner-driven stacks skip
      per-block intermediates: only final activations cross stage boundaries.

    Must be called from inside the parent module's ``@nn.compact`` ``__call__``
    (child blocks register in the live module context).
    """
    depth, dim, heads, dtype = mod.depth, mod.dim, mod.heads, mod.dtype
    scan = bool(getattr(mod, "scan_layers", False))
    runner = getattr(mod, "layer_runner", None)
    ring_mesh = getattr(mod, "ring_mesh", None)
    use_pallas = getattr(mod, "use_pallas", None)
    intermediates: Dict[str, jnp.ndarray] = {}

    if runner is not None and scan and not mod.is_initializing():
        # parent=None: free-standing functional twin of the scanned block
        # (constructing it inside the compact method would auto-register it
        # as a child and forbid .apply on it).
        block = _Block(dim=dim, heads=heads, dtype=dtype, ring_mesh=ring_mesh,
                       use_pallas=use_pallas, parent=None)

        def layer_fn(p, h):
            new_h, _proj = block.apply({"params": p}, h, True)
            return new_h

        stacked = mod.get_variable("params", "blocks")
        tokens = runner(layer_fn, stacked, tokens, (), ())
    elif scan:
        def body(block, carry, _xs):
            return block(carry, deterministic)

        scanned = nn.scan(
            body,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=depth,
        )
        tokens, proj_stack = scanned(
            _Block(dim=dim, heads=heads, dtype=dtype, ring_mesh=ring_mesh,
                   use_pallas=use_pallas, name="blocks"), tokens, None
        )
        for i in range(depth):
            intermediates[f"{key_prefix}{i}.attn.proj"] = proj_stack[i]
    else:
        for i in range(depth):
            block = _Block(dim=dim, heads=heads, dtype=dtype, ring_mesh=ring_mesh,
                           use_pallas=use_pallas, name=f"blocks_{i}")
            tokens, proj_out = block(tokens, deterministic)
            intermediates[f"{key_prefix}{i}.attn.proj"] = proj_out
    return tokens, intermediates


class EATModel(nn.Module):
    """EAT backbone + optional classifier, ``(output, aux)`` contract.

    Input is raw waveform ``(B, T)``; the fbank frontend runs inside the
    module (fp32-pinned) so the whole path is one compiled program.
    """

    num_classes: Optional[int] = None
    target_length: int = 1024
    norm_mean: float = -4.268
    norm_std: float = 4.569
    depth: int = 12
    dim: int = 768
    heads: int = 12
    patch_size: int = 16
    pooling: str = "cls"
    dtype: Any = jnp.float32
    #: nn.scan-stacked block params (leading layer axis) — the layout
    #: pipeline/sequence parallelism shard.
    scan_layers: bool = False
    #: optional layer-stack runner (parallel/pipeline.py, parallel/sequence.py).
    layer_runner: Optional[Callable] = None
    #: ring-attention mesh for long windows (see _Block.ring_mesh).
    ring_mesh: Any = None
    #: fused-QKV Pallas attention override (see _Block.use_pallas; None=auto).
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        padding_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        if x.ndim == 2:  # raw waveform
            fbank = KaldiFbank(window_type="hanning")
            spec = eat_fbank(
                x,
                target_length=self.target_length,
                norm_mean=self.norm_mean,
                norm_std=self.norm_std,
                fbank=fbank,
            )  # (B, 128, T)
        else:
            spec = x
        # (B, F, T) -> NHWC image (B, F, T, 1)
        img = spec[:, :, :, None].astype(self.dtype)
        h = nn.Conv(
            self.dim,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            dtype=self.dtype,
            name="patch_embed",
        )(img)
        bsz, gh, gw, _ = h.shape
        tokens = h.reshape(bsz, gh * gw, self.dim)

        pos = jnp.asarray(sincos_2d_positions(self.dim, gh, gw))
        tokens = tokens + pos[None].astype(self.dtype)

        tokens = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="pre_norm")(tokens)

        cls = self.param(
            "cls_token", nn.initializers.normal(0.02), (1, 1, self.dim), jnp.float32
        )
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype), (bsz, 1, self.dim)), tokens], axis=1
        )

        tokens, intermediates = apply_vit_blocks(
            self,
            tokens,
            key_prefix="backbone.model.blocks.",
            deterministic=deterministic,
        )

        tokens = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(tokens)
        aux = {"intermediates": intermediates, "features": tokens}
        aux["pooled"] = tokens[:, 0] if self.pooling == "cls" else tokens.mean(axis=1)

        if self.num_classes is None:
            return tokens, aux
        logits = nn.Dense(self.num_classes, dtype=self.dtype, name="classifier")(aux["pooled"])
        return logits, aux


def convert_eat_state_dict(
    state: Dict[str, np.ndarray],
    num_classes: Optional[int] = None,
    scan_layers: bool = False,
) -> Dict[str, Any]:
    """ESP-wrapper / fairseq EAT state dict → flax variables.

    Key normalization mirrors the reference's fairseq→HF remapping
    (eat_hf.py:53-75): ``modality_encoders.IMAGE.context_encoder.norm`` →
    ``pre_norm``, the IMAGE modality prefix and bare keys both root at
    ``model.``; wrapper exports arrive as ``backbone.model.*``. With
    ``scan_layers``, per-block tensors stack on a leading layer axis to
    match the ``nn.scan`` block layout (``apply_vit_blocks``).
    """
    normalized: Dict[str, np.ndarray] = {}
    for key, value in state.items():
        if key.startswith("_ema") or ".decoder." in key or key.startswith("decoder."):
            continue
        k = key
        if k.startswith("backbone."):
            k = k[len("backbone.") :]
        if k == "modality_encoders.IMAGE.context_encoder.norm.weight":
            k = "model.pre_norm.weight"
        elif k == "modality_encoders.IMAGE.context_encoder.norm.bias":
            k = "model.pre_norm.bias"
        elif k.startswith("modality_encoders.IMAGE."):
            k = "model." + k[len("modality_encoders.IMAGE.") :]
        elif not k.startswith(("model.", "classifier.")):
            k = "model." + k
        normalized[k] = value

    params: Dict[str, Any] = {}

    def put(path, value):
        node = params
        for part in path[:-1]:
            node = node.setdefault(part, {})
        node[path[-1]] = jnp.asarray(np.asarray(value, np.float32))

    for key, value in normalized.items():
        if key in ("model.local_encoder.proj.weight", "model.patch_embed.proj.weight"):
            put(("patch_embed", "kernel"), np.transpose(value, (2, 3, 1, 0)))
        elif key in ("model.local_encoder.proj.bias", "model.patch_embed.proj.bias"):
            put(("patch_embed", "bias"), value)
        elif key == "model.extra_tokens":
            put(("cls_token",), np.asarray(value).reshape(1, 1, -1))
        elif key == "model.cls_token":
            put(("cls_token",), np.asarray(value).reshape(1, 1, -1))
        elif key.startswith("model.pre_norm."):
            put(("pre_norm", "scale" if key.endswith("weight") else "bias"), value)
        elif key.startswith("model.norm."):
            put(("norm", "scale" if key.endswith("weight") else "bias"), value)
        elif key.startswith("model.blocks."):
            parts = key.split(".")
            idx, sub = parts[2], parts[3:]
            base = (f"blocks_{idx}",)
            if sub[0] in ("norm1", "norm2"):
                put(base + (sub[0], "scale" if sub[1] == "weight" else "bias"), value)
            elif sub[0] == "attn" and sub[1] in ("qkv", "proj"):
                which = "kernel" if sub[2] == "weight" else "bias"
                put(base + (sub[1], which), value.T if which == "kernel" else value)
            elif sub[0] == "mlp" and sub[1] in ("fc1", "fc2"):
                which = "kernel" if sub[2] == "weight" else "bias"
                put(base + (sub[1], which), value.T if which == "kernel" else value)
        elif key.startswith("classifier.") and num_classes is not None:
            which = "kernel" if key.endswith("weight") else "bias"
            put(("classifier", which), value.T if which == "kernel" else value)

    if scan_layers:
        params = stack_block_params(params)
    return {"params": params}


def stack_block_params(params: Dict[str, Any], marker: str = "blocks") -> Dict[str, Any]:
    """Restack ``{marker}_{i}`` subtrees into one ``{marker}`` tree with a
    leading layer axis (the ``nn.scan`` layout pipeline/SP shard)."""
    block_keys = sorted(
        (k for k in params if k.startswith(f"{marker}_")),
        key=lambda name: int(name.rsplit("_", 1)[1]),
    )
    if block_keys:
        params = dict(params)
        subtrees = [params.pop(k) for k in block_keys]
        params[marker] = jax.tree_util.tree_map(
            lambda *leaves: jnp.stack(leaves), *subtrees
        )
    return params


class Model(ModelBase):
    """EAT wrapper registered as ``eat_hf`` (≈ avex/models/eat_hf.py)."""

    def __init__(
        self,
        device: str = "tpu",
        num_classes: Optional[int] = None,
        pretrained: bool = False,
        audio_config: Optional[Dict[str, Any]] = None,
        eat_norm_mean: float = -4.268,
        eat_norm_std: float = 4.569,
        target_length: int = 1024,
        pooling: str = "cls",
        return_features_only: bool = False,
        compute_dtype: str = "float32",
        depth: int = 12,
        dim: int = 768,
        heads: int = 12,
        scan_layers: bool = False,
        seed: int = 0,
    ) -> None:
        super().__init__(device=device, audio_config=audio_config)
        self.num_classes = None if return_features_only else num_classes
        self.depth = depth
        self.scan_layers = bool(scan_layers)
        dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
        self._module_kwargs = dict(
            num_classes=self.num_classes,
            target_length=target_length,
            norm_mean=eat_norm_mean,
            norm_std=eat_norm_std,
            pooling=pooling,
            depth=depth,
            dim=dim,
            heads=heads,
            dtype=dtype,
            scan_layers=self.scan_layers,
        )
        self.module = EATModel(**self._module_kwargs)
        # Init on a short clip: param shapes are length-independent (fixed
        # sincos positions are computed per grid at trace time).
        dummy = jnp.zeros((1, 16000), jnp.float32)
        self.variables = self._init_variables(dummy, seed=seed)

    def _apply_kwargs(self) -> Dict[str, Any]:
        return {"deterministic": True}

    def _discover_embedding_layers(self) -> None:
        if not self._layer_names:
            self._layer_names = [
                f"backbone.model.blocks.{i}.attn.proj" for i in range(self.depth)
            ]

    def _require_scan_layout(self, what: str) -> None:
        if not self.scan_layers:
            raise ValueError(
                f"{what} needs the stacked (scan_layers=True) parameter "
                "layout; construct the model with "
                'init_config={"scan_layers": True}'
            )

    def enable_pipeline(self, mesh, num_microbatches: Optional[int] = None) -> None:
        """Rebuild the module to run the block stack pipeline-parallel over
        ``mesh``'s model axis (GPipe — parallel/pipeline.py). Requires the
        nn.scan layout (``scan_layers=True``); same contract as
        ``models/beats.py`` ``enable_pipeline``."""
        from avex_tpu.parallel.pipeline import make_pipeline_runner

        self._require_scan_layout("pipeline parallelism")
        self.module = EATModel(
            **{**self._module_kwargs,
               "layer_runner": make_pipeline_runner(mesh, num_microbatches=num_microbatches)}
        )
        self._jit_cache.clear()

    def enable_sequence_parallel(self, mesh) -> None:
        """Rebuild the module with Megatron-SP sequence parallelism
        (parallel/sequence.py): block activations re-shard ``[B, T(model), E]``
        at every block boundary. Requires ``scan_layers=True``."""
        from avex_tpu.parallel.sequence import make_sequence_parallel_runner

        self._require_scan_layout("sequence parallelism")
        self.module = EATModel(
            **{**self._module_kwargs, "layer_runner": make_sequence_parallel_runner(mesh)}
        )
        self._jit_cache.clear()

    def enable_ring_attention(self, mesh, axis: str = "model") -> None:
        """Rebuild the module with ring attention over ``mesh``'s model axis
        (ops/ring_attention.py) — long-window inference mode; see
        ``models/beats.py`` ``enable_ring_attention``."""
        self.module = EATModel(**{**self._module_kwargs, "ring_mesh": mesh})
        self._jit_cache.clear()

    def load_state_dict(self, state: Dict[str, np.ndarray], strict: bool = False) -> None:
        """Load an EAT checkpoint (fairseq or HF naming, remapped)."""
        converted = convert_eat_state_dict(
            state, num_classes=self.num_classes, scan_layers=self.scan_layers
        )
        self.variables = merge_converted_params(self.variables, converted, strict=strict)
        self._jit_cache.clear()
