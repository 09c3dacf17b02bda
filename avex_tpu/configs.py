"""Configuration schemas for avex-tpu.

Pydantic-v2 models mirroring the reference config surface (field names and
semantics follow ``/root/reference/avex/configs.py``) so that existing YAML
configs keep working, while device/distribution fields are re-interpreted for
TPU (JAX mesh) execution.

Key reference anchors:
  - TrainingParams          ≈ avex/configs.py:47
  - NoiseAugment/Mixup      ≈ avex/configs.py:126-162
  - AudioConfig             ≈ avex/configs.py:170
  - ModelSpec               ≈ avex/configs.py:231
  - ProbeConfig             ≈ avex/configs.py:380 (+ PROBE_CONFIGS presets :666)
  - SchedulerConfig         ≈ avex/configs.py:718
  - BaseCLIConfig           ≈ avex/configs.py:728-764 (YAML + CLI deep-merge)
  - RunConfig               ≈ avex/configs.py:786
  - ExperimentConfig        ≈ avex/configs.py:955
  - EvaluateConfig          ≈ avex/configs.py:1212
"""

from __future__ import annotations

import copy
from pathlib import Path
from typing import Any, Dict, List, Literal, Optional, Tuple, Union

import yaml
from pydantic import BaseModel, ConfigDict, Field, field_validator, model_validator


# ---------------------------------------------------------------------------
# Training
# ---------------------------------------------------------------------------


class TrainingParams(BaseModel):
    """Optimization hyper-parameters for a training run (≈ configs.py:47)."""

    model_config = ConfigDict(extra="forbid")

    train_epochs: int = Field(..., ge=1, description="Number of training epochs")
    lr: float = Field(..., gt=0, description="Peak learning rate")
    batch_size: int = Field(..., ge=1, description="Global batch size")
    optimizer: Literal["adamw", "adam", "adamw8bit"] = "adamw"
    weight_decay: float = Field(0.0, ge=0)
    adam_betas: Optional[Tuple[float, float]] = None
    # On TPU, "amp" means compute in bfloat16 with fp32 params/frontend.
    amp: bool = False
    amp_dtype: Literal["bf16", "fp16"] = "bf16"
    log_steps: int = Field(100, ge=1)
    gradient_checkpointing: bool = Field(
        False, description="Rematerialize transformer blocks (jax.checkpoint)"
    )
    gradient_clip_val: Optional[float] = Field(None, description="Global-norm gradient clip")
    freeze_backbone_epochs: int = Field(
        0,
        ge=0,
        description="Two-stage fine-tuning: freeze the backbone for the first N "
        "epochs, then unfreeze at a reduced LR (≈ train.py:704-751)",
    )
    second_stage_lr: Optional[float] = Field(
        None, description="LR for stage two; defaults to 0.1 * lr when None"
    )
    second_stage_warmup_steps: Optional[int] = None
    skip_validation: bool = False
    warmup_epochs: int = Field(0, ge=0)
    scheduler_type: Literal["none", "cosine", "linear", "step"] = "none"


class NoiseAugment(BaseModel):
    """Additive noise augmentation from noise files (≈ configs.py:126)."""

    model_config = ConfigDict(extra="forbid")

    kind: Literal["noise"] = "noise"
    noise_dirs: List[str]
    snr_db_range: Tuple[float, float]
    augmentation_prob: float = Field(..., ge=0, le=1)
    mask_signal_prob: float = Field(0.0, ge=0, le=1)


class MixupAugment(BaseModel):
    """Batch-level mixup augmentation (≈ configs.py:147)."""

    model_config = ConfigDict(extra="forbid")

    kind: Literal["mixup"] = "mixup"
    alpha: float = Field(..., gt=0)
    n_mixup: int = Field(1, ge=1)
    augmentation_prob: float = Field(..., ge=0, le=1)


Augment = Union[NoiseAugment, MixupAugment]


# ---------------------------------------------------------------------------
# Audio
# ---------------------------------------------------------------------------


class AudioConfig(BaseModel):
    """How raw audio is converted into the model input (≈ configs.py:170)."""

    model_config = ConfigDict(extra="forbid")

    sample_rate: int = 16000
    n_fft: int = 2048
    hop_length: Optional[int] = None
    win_length: Optional[int] = None
    window: Literal["hann", "hamming"] = "hann"
    n_mels: int = 128
    representation: Literal["spectrogram", "mel_spectrogram", "raw"] = "mel_spectrogram"
    normalize: bool = True
    target_length_seconds: Optional[float] = None
    window_selection: Literal["random", "center"] = "random"
    center: bool = True
    extra_config: Optional[Dict[str, Any]] = None

    @property
    def target_length_samples(self) -> Optional[int]:
        """Target clip length in samples (sample_rate x target_length_seconds)."""
        if self.target_length_seconds is None:
            return None
        return int(round(self.target_length_seconds * self.sample_rate))


# ---------------------------------------------------------------------------
# Model spec
# ---------------------------------------------------------------------------


class ModelSpec(BaseModel):
    """Architecture + weights selector consumed by the model factory.

    Field surface mirrors the reference ModelSpec (configs.py:231-305) so
    packaged/official YAML specs parse unchanged. ``device`` is advisory on
    TPU — placement is controlled by the active jax mesh.
    """

    model_config = ConfigDict(extra="forbid", protected_namespaces=())

    name: str
    pretrained: bool = True
    device: str = "tpu"
    audio_config: Optional[AudioConfig] = None

    # CLIP/CLAP
    text_model_name: Optional[str] = None
    projection_dim: Optional[int] = None
    temperature: Optional[float] = None

    # EAT
    eat_cfg: Optional[Dict[str, Any]] = None
    pretraining_mode: Optional[bool] = None
    handle_padding: Optional[bool] = None
    fairseq_weights_path: Optional[str] = None
    eat_norm_mean: Optional[float] = None
    eat_norm_std: Optional[float] = None

    # EfficientNet
    efficientnet_variant: Literal["b0", "b1"] = "b0"

    # BEATs
    use_naturelm: Optional[bool] = None
    fine_tuned: Optional[bool] = None
    init_config: Optional[Dict[str, Any]] = None

    # BirdNet
    language: Optional[str] = None

    # BirdMAE / HF-hosted models
    model_id: Optional[str] = None

    # Free-form escape hatch
    extra_config: Optional[Dict[str, Any]] = None

    # avex-tpu extension: numeric policy for the backbone compute.
    compute_dtype: Literal["float32", "bfloat16"] = "float32"


# ---------------------------------------------------------------------------
# Probes
# ---------------------------------------------------------------------------


class ProbeConfig(BaseModel):
    """Configuration for transfer-learning probe heads (≈ configs.py:380)."""

    model_config = ConfigDict(extra="forbid")

    probe_type: Literal["linear", "mlp", "lstm", "attention", "transformer", "moe"] = "linear"
    aggregation: Literal["mean", "max", "cls_token", "none"] = "mean"
    input_processing: Literal["flatten", "sequence", "pooled", "none"] = "flatten"
    target_layers: List[Union[str, int]] = Field(default_factory=lambda: ["last_layer"])
    freeze_backbone: bool = True

    # MLP
    hidden_dims: Optional[List[int]] = None
    dropout_rate: float = Field(0.1, ge=0, le=1)
    activation: Literal["relu", "gelu", "tanh", "swish"] = "relu"

    # Attention / transformer
    num_heads: Optional[int] = None
    attention_dim: Optional[int] = None
    num_layers: Optional[int] = None

    # LSTM
    lstm_hidden_size: Optional[int] = None
    bidirectional: bool = False

    # MoE (avex-tpu extension: expert-parallel routed MLP head, ops/moe.py)
    num_experts: Optional[int] = None
    moe_hidden_dim: Optional[int] = None
    moe_k: Optional[int] = None
    capacity_factor: Optional[float] = None

    # Sequence handling
    max_sequence_length: Optional[int] = None
    use_positional_encoding: bool = False
    target_length: Optional[int] = None

    online_training: Optional[bool] = None
    extra_config: Optional[Dict[str, Any]] = None

    @field_validator("target_layers", mode="before")
    @classmethod
    def _canonicalize_layers(cls, v: Any) -> Any:
        # Pydantic can coerce bools to int (bool subclasses int); reject them
        # so `target_layers: [true]` fails loudly (≈ configs.py:500-506).
        if isinstance(v, list):
            for item in v:
                if isinstance(item, bool):
                    raise ValueError("target_layers entries must be str or int, not bool")
        return v


#: Named probe presets (≈ configs.py:666-716).
PROBE_CONFIGS: Dict[str, ProbeConfig] = {
    "linear": ProbeConfig(probe_type="linear", aggregation="mean", input_processing="flatten"),
    "mlp": ProbeConfig(
        probe_type="mlp", aggregation="mean", input_processing="flatten", hidden_dims=[512, 256]
    ),
    "lstm": ProbeConfig(
        probe_type="lstm",
        aggregation="none",
        input_processing="sequence",
        lstm_hidden_size=256,
        num_layers=1,
    ),
    "attention": ProbeConfig(
        probe_type="attention",
        aggregation="none",
        input_processing="sequence",
        num_heads=8,
        num_layers=2,
    ),
    "transformer": ProbeConfig(
        probe_type="transformer",
        aggregation="none",
        input_processing="sequence",
        num_heads=8,
        num_layers=2,
        use_positional_encoding=True,
    ),
}


# ---------------------------------------------------------------------------
# Scheduler
# ---------------------------------------------------------------------------


class SchedulerConfig(BaseModel):
    """LR schedule selector (≈ configs.py:718)."""

    model_config = ConfigDict(extra="forbid")

    name: Literal["cosine", "linear", "none"] = "none"
    warmup_steps: int = Field(0, ge=0)
    min_lr: float = Field(0.0, ge=0)


# ---------------------------------------------------------------------------
# Datasets (local replacement for the private esp_data dependency)
# ---------------------------------------------------------------------------


class DatasetConfig(BaseModel):
    """A single dataset source.

    The reference delegates to the private ``esp_data`` package; avex-tpu
    ships a small local backend instead (``avex_tpu.data``) supporting:
      - ``kind="hf"``: a HuggingFace ``datasets`` dataset (audio column)
      - ``kind="local"``: a directory of audio files + a metadata csv/jsonl
      - ``kind="manifest"``: a JSONL/CSV manifest at any fsspec path (local,
        ``gs://``, …) whose rows reference audio under ``data_root`` — the
        BirdSet legacy-split shape (reference birdset_train_splits.py)
      - ``kind="synthetic"``: deterministic synthetic audio for tests/benches
    """

    model_config = ConfigDict(extra="allow")

    name: str
    kind: Literal["hf", "local", "manifest", "synthetic"] = "local"
    path: Optional[str] = None
    data_root: Optional[str] = None  # manifest backend: root for audio paths
    subset: Optional[str] = None  # HF config name (e.g. a BirdSet task code)
    split: Optional[str] = None
    label_column: str = "label"
    audio_column: str = "audio"
    text_column: Optional[str] = None
    sample_rate: int = 16000
    audio_max_length_seconds: Optional[float] = None
    # synthetic backend knobs
    num_samples: int = 64
    num_classes: int = 4
    clip_seconds: float = 1.0
    seed: int = 0
    transformations: List[Dict[str, Any]] = Field(default_factory=list)

    @model_validator(mode="before")
    @classmethod
    def _esp_data_style_compat(cls, data: Any) -> Any:
        """Accept the reference's esp_data dataset stanzas (``dataset_name`` +
        ``split`` like ``dogs_train``): BEANS tasks route onto the HF-backed
        preset, anything else keeps its fields via ``extra="allow"`` so the
        config at least parses (reference data_configs/*.yml)."""
        if not isinstance(data, dict) or "name" in data or "dataset_name" not in data:
            return data
        data = dict(data)
        dsname = str(data.pop("dataset_name"))
        split = str(data.get("split") or "")
        data["name"] = f"{dsname}_{split}" if split else dsname
        if dsname == "beans" and "_" in split:
            from avex_tpu.data.beans import BEANS_TASKS

            task, _, part = split.rpartition("_")
            if task in BEANS_TASKS:
                data.setdefault("kind", "hf")
                data.setdefault("path", BEANS_TASKS[task][0])
                data["split"] = part
                data.setdefault("label_column", BEANS_TASKS[task][1])
        elif dsname == "birdset_train" and split:
            # The reference's registered legacy dataset
            # (birdset_train_splits.py:1-25): named splits resolve against
            # the GCS JSONL manifest registry via the manifest backend. An
            # unknown split raises (the reference's _load does the same with
            # LookupError) instead of silently falling through to a broken
            # kind="local" config.
            from avex_tpu.data.birdset import birdset_train_config

            preset = birdset_train_config(split, data_root=data.get("data_root"))
            for key, value in preset.model_dump(exclude_none=True).items():
                if key not in ("name",):
                    data.setdefault(key, value)
            data["kind"] = preset.kind
            data["path"] = data.get("path") or preset.path
        elif dsname == "birdset" and "-" in split:
            # esp_data split naming 'POW-train' → our HF preset (task subset
            # + split); label column follows the preset, not esp_data's
            # labels_as_list transform column.
            from avex_tpu.data.birdset import BIRDSET_TASKS, birdset_config

            task, _, part = split.partition("-")
            if task.upper() in BIRDSET_TASKS:
                preset = birdset_config(task, part)
                for key, value in preset.model_dump(exclude_none=True).items():
                    if key not in ("name",):
                        data.setdefault(key, value)
                data["kind"] = preset.kind
                data["split"] = preset.split
                data["label_column"] = preset.label_column
        return data


class DatasetCollectionConfig(BaseModel):
    """Train/val/test dataset lists + concat policy (≈ data/configs.py:22)."""

    model_config = ConfigDict(extra="forbid")

    train_datasets: List[DatasetConfig] = Field(default_factory=list)
    val_datasets: List[DatasetConfig] = Field(default_factory=list)
    test_datasets: List[DatasetConfig] = Field(default_factory=list)
    concat_policy: Literal["hard", "overlap", "soft"] = "hard"
    transformations: List[Dict[str, Any]] = Field(default_factory=list)

    @model_validator(mode="before")
    @classmethod
    def _reference_concat_compat(cls, data: Any) -> Any:
        """Reference spellings (data/configs.py:44-75): ``concatenate_method``
        → concat_policy; the per-split ``concatenate_{train,val,test}``
        booleans are accepted and dropped (splits always concatenate here);
        None dataset lists normalize to empty."""
        if not isinstance(data, dict):
            return data
        data = dict(data)
        if "concatenate_method" in data and "concat_policy" not in data:
            data["concat_policy"] = data.pop("concatenate_method")
        for key in ("concatenate_train", "concatenate_val", "concatenate_test", "concatenate"):
            data.pop(key, None)
        for key in ("train_datasets", "val_datasets", "test_datasets"):
            if data.get(key) is None:
                data[key] = []
        return data


class EvaluationSet(BaseModel):
    """A named train/val/test triplet used by the eval harness (≈ data/configs.py:102)."""

    model_config = ConfigDict(extra="forbid")

    name: str
    train: Optional[DatasetConfig] = None
    val: Optional[DatasetConfig] = None
    test: Optional[DatasetConfig] = None
    metrics: List[str] = Field(default_factory=lambda: ["accuracy"])
    retrieval_mode: Literal["test_vs_test", "train_vs_test"] = "test_vs_test"
    multilabel: bool = False

    @model_validator(mode="before")
    @classmethod
    def _reference_field_compat(cls, data: Any) -> Any:
        """Reference spellings: ``validation:`` → ``val``; per-dataset
        ``multi_label`` bubbles up to the set-level flag (data/configs.py:102)."""
        if not isinstance(data, dict):
            return data
        data = dict(data)
        if "validation" in data and "val" not in data:
            data["val"] = data.pop("validation")
        if "multilabel" not in data:
            for key in ("train", "val", "test"):
                stanza = data.get(key)
                if isinstance(stanza, dict) and stanza.get("multi_label"):
                    data["multilabel"] = True
                    break
        return data


class BenchmarkEvaluationConfig(BaseModel):
    """A benchmark = list of evaluation sets (≈ data/configs.py:144)."""

    model_config = ConfigDict(extra="forbid")

    name: str = "benchmark"
    evaluation_sets: List[EvaluationSet] = Field(default_factory=list)

    @model_validator(mode="before")
    @classmethod
    def _benchmark_name_alias(cls, data: Any) -> Any:
        """Reference spelling: ``benchmark_name`` → ``name``."""
        if isinstance(data, dict) and "benchmark_name" in data and "name" not in data:
            data = dict(data)
            data["name"] = data.pop("benchmark_name")
        return data


# ---------------------------------------------------------------------------
# YAML + CLI source merging
# ---------------------------------------------------------------------------


def _resolve_nested_config_paths(data: Dict[str, Any], base_dir: Path) -> None:
    """Resolve nested-config path strings against the referencing file's
    directory when they don't exist from the CWD (the reference's configs
    use repo-root-relative paths; resolving sibling-relative makes a config
    tree relocatable)."""
    keys = ("dataset_config", "run_config", "probe_config")

    def fix(d: Dict[str, Any]) -> None:
        for key in keys:
            value = d.get(key)
            if isinstance(value, str) and not Path(value).exists():
                candidate = base_dir / value
                if candidate.exists():
                    d[key] = str(candidate)
        for exp in d.get("experiments") or []:
            if isinstance(exp, dict):
                fix(exp)

    if isinstance(data, dict):
        fix(data)


def deep_update(base: Dict[str, Any], patch: Dict[str, Any]) -> Dict[str, Any]:
    """Recursively merge ``patch`` into ``base`` (patch wins); returns a new dict."""
    out = copy.deepcopy(base)
    for key, value in patch.items():
        if key in out and isinstance(out[key], dict) and isinstance(value, dict):
            out[key] = deep_update(out[key], value)
        else:
            out[key] = copy.deepcopy(value)
    return out


def _parse_cli_value(raw: str) -> Any:
    """Parse a `key=value` CLI value with YAML semantics (numbers, bools, lists)."""
    try:
        return yaml.safe_load(raw)
    except yaml.YAMLError:
        return raw


def _patch_to_nested(key: str, value: Any) -> Dict[str, Any]:
    """Expand a dotted key like ``training_params.lr`` into a nested dict."""
    parts = key.split(".")
    node: Dict[str, Any] = {parts[-1]: value}
    for part in reversed(parts[:-1]):
        node = {part: node}
    return node


class BaseCLIConfig(BaseModel):
    """Config loadable from a YAML file plus ``key=value`` CLI patches.

    Mirrors ``BaseCLIConfig.from_sources`` (configs.py:733-764): the YAML
    file is loaded first, then each CLI patch is deep-merged on top (CLI
    wins). Dotted patch keys address nested fields.
    """

    model_config = ConfigDict(extra="forbid")

    @classmethod
    def from_sources(
        cls,
        yaml_path: Optional[Union[str, Path]] = None,
        cli_patches: Optional[List[str]] = None,
    ):
        """Build the config from a YAML file deep-merged with key=value CLI patches (CLI wins; ≈ configs.py:733-764)."""
        data: Dict[str, Any] = {}
        if yaml_path is not None:
            from avex_tpu.io import read_text

            data = yaml.safe_load(read_text(str(yaml_path))) or {}
            _resolve_nested_config_paths(data, Path(str(yaml_path)).parent)
        for patch in cli_patches or []:
            if "=" not in patch:
                raise ValueError(f"CLI patch must be key=value, got: {patch!r}")
            key, _, raw = patch.partition("=")
            data = deep_update(data, _patch_to_nested(key.strip(), _parse_cli_value(raw)))
        return cls.model_validate(data)


# ---------------------------------------------------------------------------
# Run / experiment / evaluate configs
# ---------------------------------------------------------------------------


class ClusteringEvalConfig(BaseModel):
    """During-training clustering evaluation (≈ configs.py:767)."""

    model_config = ConfigDict(extra="forbid")

    enabled: bool = False
    frequency: int = Field(5, ge=1)
    layers: str = "last_layer"
    use_validation_set: bool = True
    max_samples: Optional[int] = Field(None, ge=100)
    run_before_training: bool = False


class MeshConfig(BaseModel):
    """TPU device-mesh layout (avex-tpu extension; replaces nccl DDP fields).

    Axis sizes of -1 mean "use all remaining devices". The default is pure
    data parallelism over every addressable device.
    """

    model_config = ConfigDict(extra="forbid")

    data: int = -1
    model: int = 1
    axis_names: Tuple[str, str] = ("data", "model")
    #: "replicated" = DDP layout; "fsdp" = ZeRO-3 layout (large params +
    #: optimizer state sharded over the data axis; XLA rewrites the gradient
    #: psum as reduce-scatter + all-gather).
    param_sharding: Literal["replicated", "fsdp"] = "replicated"
    #: tensors with fewer elements stay replicated under fsdp (biases, norms)
    fsdp_min_size: int = 2**16
    #: > 0 enables pipeline parallelism over the ``model`` axis for models
    #: with a scanned layer stack (GPipe schedule, parallel/pipeline.py): the
    #: stacked layer axis shards one stage per device and the batch splits
    #: into this many microbatches. 0 = off.
    pipeline_microbatches: int = 0
    #: Megatron-SP sequence parallelism over the ``model`` axis
    #: (parallel/sequence.py): encoder activations re-shard [B, T, E] on T at
    #: every layer boundary, so elementwise/LN/FFN work runs sequence-sharded
    #: (composes with tensor-parallel kernel sharding on the same axis).
    sequence_parallel: bool = False


class RunConfig(BaseCLIConfig):
    """Top-level training-run config (≈ configs.py:786)."""

    model_config = ConfigDict(extra="forbid", validate_assignment=True, protected_namespaces=())

    model_spec: ModelSpec
    training_params: TrainingParams
    dataset_config: DatasetCollectionConfig
    output_dir: str

    preprocessing: Optional[str] = None
    sr: int = 16000
    logging: Literal["mlflow", "wandb", "none"] = "none"
    logging_uri: str = "http://127.0.0.1:5000/"
    label_type: Literal["supervised", "text", "self_supervised"] = "supervised"
    resume_from_checkpoint: Optional[str] = None
    #: Periodic checkpoint cadence in epochs (reference ``checkpoint_freq``,
    #: train.py:450-453). Default 1 matches reference semantics — configs
    #: that rely on the default keep their per-epoch checkpoints; 0 disables.
    checkpoint_freq: int = 1
    #: Step-level (mid-epoch) checkpoint cadence — preemption recovery for
    #: TPU jobs, beyond the reference's epoch-granular resume. Saves a
    #: rolling ``step_checkpoint`` every N train steps including the data
    #: iterator state (exact with the grain pipeline; the native loader
    #: resumes by deterministic batch skip). 0 disables.
    checkpoint_every_steps: int = 0
    #: Install a SIGTERM handler during training that saves a final
    #: ``step_checkpoint`` and exits the epoch loop cleanly — TPU
    #: preemptions deliver SIGTERM before eviction.
    save_on_preemption: bool = True

    # TPU-native distribution: a mesh instead of nccl process groups.
    distributed: bool = False
    mesh: MeshConfig = Field(default_factory=MeshConfig)

    augmentations: List[Augment] = Field(default_factory=list)
    #: reference aliases accepted and normalized: binary_cross_entropy → bce,
    #: contrastive → clip (reference configs.py:830-837).
    loss_function: Literal[
        "cross_entropy", "bce", "binary_cross_entropy", "focal", "clip", "contrastive"
    ] = "cross_entropy"
    multilabel: bool = False
    metrics: List[str] = Field(default_factory=lambda: ["accuracy"])
    device: str = "tpu"
    seed: int = 42
    num_workers: int = 4
    #: "native" = avex_tpu.data.DataLoader (threads/process+shm workers);
    #: "grain" = the jax-ecosystem grain pipeline (checkpointable iterators)
    data_pipeline: Literal["native", "grain"] = "native"
    run_name: Optional[str] = None
    wandb_project: str = "audio-experiments"
    scheduler: SchedulerConfig = Field(default_factory=SchedulerConfig)
    clustering_eval: Optional[ClusteringEvalConfig] = None
    debug_mode: bool = False

    @field_validator("loss_function", mode="after")
    @classmethod
    def _normalize_loss_alias(cls, v: str) -> str:
        """Collapse the reference's loss-name aliases to canonical values."""
        return {"binary_cross_entropy": "bce", "contrastive": "clip"}.get(v, v)

    @field_validator("augmentations", mode="before")
    @classmethod
    def _flatten_augments(cls, raw: Any) -> Any:
        """Accept the reference's single-key YAML augmentation style
        (``- noise: {...}`` / ``- mixup: {...}``) by flattening it into the
        ``kind``-discriminated dicts the union parses (≈ configs.py:879-913)."""
        if not raw:
            return raw
        processed = []
        for item in raw:
            if isinstance(item, dict) and len(item) == 1 and "kind" not in item:
                aug_type, params = next(iter(item.items()))
                params = dict(params or {})
                params["kind"] = aug_type
                processed.append(params)
            else:
                processed.append(item)
        return processed

    @model_validator(mode="before")
    @classmethod
    def _load_nested_dataset_config(cls, data: Any) -> Any:
        # `dataset_config: path/to.yml` auto-loads the nested file
        # (≈ configs.py:863-874).
        if isinstance(data, dict):
            ds = data.get("dataset_config")
            if isinstance(ds, str):
                from avex_tpu.io import read_text

                data = dict(data)
                data["dataset_config"] = yaml.safe_load(read_text(ds))
        return data

    @model_validator(mode="after")
    def _check_loss_consistency(self) -> "RunConfig":
        # multilabel ⇒ bce/focal; clip loss ⇒ text labels (≈ configs.py:918-952).
        if self.multilabel and self.loss_function not in ("bce", "focal"):
            raise ValueError("multilabel=True requires loss_function in {'bce','focal'}")
        if self.loss_function == "clip" and self.label_type != "text":
            raise ValueError("loss_function='clip' requires label_type='text'")
        return self


class ExperimentConfig(BaseModel):
    """One experiment row inside an EvaluateConfig (≈ configs.py:955)."""

    model_config = ConfigDict(extra="forbid")

    run_name: str
    run_config: RunConfig
    pretrained: bool = True
    layers: Optional[str] = None  # legacy alias → probe_config.target_layers
    probe_config: Optional[ProbeConfig] = None
    checkpoint_path: Optional[str] = None
    frozen: Optional[bool] = None  # legacy alias → probe_config.freeze_backbone

    @model_validator(mode="before")
    @classmethod
    def _load_nested_run_config(cls, data: Any) -> Any:
        if isinstance(data, dict):
            rc = data.get("run_config")
            if isinstance(rc, str):
                from avex_tpu.io import read_text

                data = dict(data)
                data["run_config"] = yaml.safe_load(read_text(rc))
        return data

    @model_validator(mode="after")
    def _migrate_legacy_fields(self) -> "ExperimentConfig":
        # Legacy `layers`/`frozen` migrate into probe_config
        # (≈ configs.py:955-1209).
        if self.probe_config is None:
            self.probe_config = ProbeConfig()
        if self.layers is not None:
            self.probe_config.target_layers = [self.layers]
        if self.frozen is not None:
            self.probe_config.freeze_backbone = self.frozen
        return self


class OfflineEmbeddingsConfig(BaseModel):
    """Embedding-cache behavior for offline probing (≈ configs.py:1255)."""

    model_config = ConfigDict(extra="forbid")

    enabled: bool = True
    save_dir: Optional[str] = None
    overwrite: bool = False
    memory_limit_gb: float = 8.0
    chunk_size: Optional[int] = None

    @model_validator(mode="before")
    @classmethod
    def _reference_overwrite_alias(cls, data: Any) -> Any:
        """Reference spelling: ``overwrite_embeddings`` → ``overwrite``
        (configs.py:1270)."""
        if not isinstance(data, dict):
            return data
        data = dict(data)
        if "overwrite_embeddings" in data and "overwrite" not in data:
            data["overwrite"] = data.pop("overwrite_embeddings")
        # The reference's manual streaming/chunking knobs (configs.py:1255-1334)
        # tune its hand-rolled HDF5 writer; h5py's resizable datasets handle
        # chunk sizing here and streaming is decided from memory_limit_gb, so
        # these are accepted and dropped for config compatibility.
        for key in (
            "use_streaming_embeddings", "streaming_chunk_size", "hdf5_compression",
            "hdf5_compression_level", "auto_chunk_size", "max_chunk_size",
            "min_chunk_size", "batch_chunk_size", "cache_size_limit_gb",
            "probe_storage_aggregation",
        ):
            data.pop(key, None)
        return data


class EvaluateConfig(BaseCLIConfig):
    """Benchmark-evaluation config (≈ configs.py:1212)."""

    model_config = ConfigDict(extra="forbid")

    experiments: List[ExperimentConfig]
    dataset_config: BenchmarkEvaluationConfig
    save_dir: str
    training_params: TrainingParams = Field(
        default_factory=lambda: TrainingParams(train_epochs=10, lr=1e-3, batch_size=32)
    )
    device: str = "tpu"
    seed: int = 42
    num_workers: int = 0
    probe_num_workers: int = 0
    eval_modes: List[Literal["probe", "retrieval", "clustering"]] = Field(
        default_factory=lambda: ["probe"]
    )
    offline_embeddings: OfflineEmbeddingsConfig = Field(default_factory=OfflineEmbeddingsConfig)
    results_csv_path: Optional[str] = None
    disable_tqdm: bool = False

    @model_validator(mode="before")
    @classmethod
    def _load_nested_dataset_config(cls, data: Any) -> Any:
        if isinstance(data, dict):
            ds = data.get("dataset_config")
            if isinstance(ds, str):
                from avex_tpu.io import read_text

                data = dict(data)
                data["dataset_config"] = yaml.safe_load(read_text(ds))
        return data
