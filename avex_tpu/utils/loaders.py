"""Universal checkpoint loading: torch / safetensors / orbax → numpy state dicts.

TPU-native counterpart of ``avex/utils/utils.py:421`` (``universal_torch_load``)
and ``:509-570`` (``_process_state_dict``): any supported checkpoint resolves to
a flat ``{name: np.ndarray}`` state dict with reference-compatible prefix
normalization, ready for conversion into JAX pytrees.
"""

from __future__ import annotations

import io as _io
import logging
import os
from typing import Any, Dict, Optional

import numpy as np

from avex_tpu.io import cached_download

logger = logging.getLogger(__name__)

#: Guard against truncated/empty published safetensors files
#: (≈ avex/utils/safetensors_validation.py:13-17).
MIN_PUBLISHED_SAFETENSORS_BYTES = 1024

StateDict = Dict[str, np.ndarray]


def _to_numpy(value: Any) -> Any:
    """Convert torch tensors (incl. bf16) to numpy; leave other values alone."""
    try:
        import torch

        if isinstance(value, torch.Tensor):
            t = value.detach().cpu()
            if t.dtype == torch.bfloat16:
                t = t.float()
            return t.numpy()
    except ImportError:
        pass
    return value


def _flatten_numeric(tree: Dict[str, Any], prefix: str = "") -> StateDict:
    out: StateDict = {}
    for key, value in tree.items():
        full = f"{prefix}{key}"
        if isinstance(value, dict):
            out.update(_flatten_numeric(value, prefix=full + "."))
        else:
            value = _to_numpy(value)
            if isinstance(value, np.ndarray):
                out[full] = value
    return out


def load_safetensors(path: str) -> StateDict:
    """Load a safetensors file into numpy arrays (no torch required)."""
    from safetensors.numpy import load_file

    size = os.path.getsize(path)
    if size < MIN_PUBLISHED_SAFETENSORS_BYTES:
        raise ValueError(
            f"safetensors file {path} is suspiciously small ({size} bytes); "
            "refusing to load what looks like an empty upload"
        )
    try:
        return dict(load_file(path))
    except Exception:
        # bf16 tensors can't round-trip through safetensors.numpy; fall back
        # to the torch loader which handles every dtype.
        from safetensors.torch import load_file as torch_load_file

        return {k: _to_numpy(v) for k, v in torch_load_file(path).items()}


def load_torch_checkpoint(path: str) -> StateDict:
    """Load a torch ``.pt``/``.ckpt`` pickle into a flat numpy state dict."""
    import torch

    with open(path, "rb") as f:
        payload = torch.load(_io.BytesIO(f.read()), map_location="cpu", weights_only=False)
    if isinstance(payload, dict):
        # Checkpoints commonly nest the weights under one of these keys.
        for key in ("model_state_dict", "state_dict", "model", "module"):
            if key in payload and isinstance(payload[key], dict):
                payload = payload[key]
                break
        return _flatten_numeric(payload)
    raise TypeError(f"Unsupported torch checkpoint payload type: {type(payload)!r}")


def universal_load(path: str) -> StateDict:
    """Load any supported checkpoint (local or remote URI) into numpy arrays.

    Remote paths (``hf://``, ``gs://``, …) are fetched through the TTL cache
    first. Format is selected by extension, falling back to content sniffing.
    """
    local = cached_download(path)
    lower = local.lower()
    if lower.endswith(".safetensors"):
        return load_safetensors(local)
    if lower.endswith((".pt", ".pth", ".ckpt", ".bin")):
        return load_torch_checkpoint(local)
    # Content sniff: safetensors starts with a little-endian u64 header length
    # followed by a JSON header.
    with open(local, "rb") as f:
        head = f.read(16)
    if len(head) >= 9 and head[8:9] in (b"{", b" "):
        return load_safetensors(local)
    return load_torch_checkpoint(local)


#: Prefixes stripped from checkpoint keys (≈ utils/utils.py:509-570).
_STRIP_PREFIXES = ("module.", "model.", "_orig_mod.")


def process_state_dict(
    state: StateDict,
    drop_classifier: bool = False,
    classifier_keys: tuple = ("classifier.", "predictor.", "head.", "fc."),
    adapt_prefix: Optional[str] = None,
) -> StateDict:
    """Normalize checkpoint key prefixes and optionally drop classifier heads.

    - strips DDP/compile wrappers (``module.``/``model.``/``_orig_mod.``)
    - when ``drop_classifier``, removes final-head parameters so a checkpoint
      trained with a different label space can still initialize a backbone
    - when ``adapt_prefix`` is given (e.g. ``"backbone."``), keys are made
      consistent with the target model's naming: if most keys already carry the
      prefix it is kept, otherwise it is added (≈ load.py:521-571 semantics).
    """
    out: StateDict = {}
    for key, value in state.items():
        new_key = key
        changed = True
        while changed:
            changed = False
            for prefix in _STRIP_PREFIXES:
                if new_key.startswith(prefix):
                    new_key = new_key[len(prefix) :]
                    changed = True
        if drop_classifier and any(part in new_key for part in classifier_keys):
            continue
        out[new_key] = value

    if adapt_prefix:
        has_prefix = sum(1 for k in out if k.startswith(adapt_prefix))
        if 0 < has_prefix < len(out):
            logger.debug("checkpoint has mixed %r prefixing (%d/%d)", adapt_prefix, has_prefix, len(out))
        if has_prefix == 0:
            out = {adapt_prefix + k: v for k, v in out.items()}
    return out


def extract_num_classes(state: StateDict) -> Optional[int]:
    """Infer the classifier output width from checkpoint weights.

    Mirrors ``_extract_num_classes_from_checkpoint`` (load.py:314-420): look
    for a final linear-classifier weight and report its output dimension.
    """
    candidates = [
        "classifier.weight",
        "predictor.weight",
        "head.weight",
        "fc.weight",
        "classifier.kernel",
        "predictor.kernel",
    ]
    normalized = process_state_dict(state)
    for name in candidates:
        for key, value in normalized.items():
            if key == name or key.endswith("." + name):
                if value.ndim == 2:
                    # torch Linear stores (out, in); flax Dense stores (in, out).
                    return int(value.shape[0] if key.endswith("weight") else value.shape[1])
    return None
