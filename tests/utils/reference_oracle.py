"""Load pieces of the read-only reference implementation as test oracles.

The reference package as a whole pulls in dependencies we don't ship
(torchaudio, esp_data), so we materialize just the torch-only subpackages we
need (e.g. the BEATs model) as synthetic modules. The reference is used
strictly as a *behavioral oracle* in tests — avex_tpu contains no code from it.
"""

from __future__ import annotations

import importlib.machinery
import importlib.util
import sys
import types
from pathlib import Path

REFERENCE_ROOT = Path("/root/reference")


def _load_module(name: str, path: Path, package: str | None = None):
    spec = importlib.util.spec_from_file_location(name, path)
    module = importlib.util.module_from_spec(spec)
    if package is not None:
        module.__package__ = package
    sys.modules[name] = module
    spec.loader.exec_module(module)
    return module


def load_reference_atst():
    """Return the reference ATST-Frame module (FrameAST & friends) for use as
    a numerical oracle.

    ``atst_frame.py`` imports torchaudio / torchvision / pytorch_lightning /
    avex.utils, none of which we need for the FrameAST forward path — they are
    stubbed with minimal placeholder modules before loading.
    """
    name = "_refatst"
    if name in sys.modules:
        return sys.modules[name]

    def _stub(mod_name: str, **attrs):
        if mod_name in sys.modules:
            return sys.modules[mod_name]
        mod = types.ModuleType(mod_name)
        # A real ModuleSpec: modules left in sys.modules with __spec__=None
        # make importlib.util.find_spec raise for unrelated packages later
        # (e.g. HF datasets probing for torchvision).
        mod.__spec__ = importlib.machinery.ModuleSpec(mod_name, loader=None)
        for key, value in attrs.items():
            setattr(mod, key, value)
        sys.modules[mod_name] = mod
        return mod

    class _LightningModule:  # placeholder base class; never exercised
        def __init__(self, *a, **k):
            pass

        @classmethod
        def load_from_checkpoint(cls, *a, **k):  # pragma: no cover
            raise RuntimeError("lightning stub")

    import torch

    _stub("torchaudio", transforms=types.SimpleNamespace())
    _stub(
        "torchvision",
        transforms=types.SimpleNamespace(Compose=lambda t: t),
    )
    _stub("torchvision.transforms", Compose=lambda t: t)
    _stub(
        "pytorch_lightning",
        LightningModule=_LightningModule,
    )
    _stub("avex", __path__=[])
    _stub("avex.utils", universal_torch_load=lambda *a, **k: {})

    module = _load_module(
        name, REFERENCE_ROOT / "avex" / "models" / "atst_frame" / "atst_frame.py"
    )
    assert hasattr(module, "FrameAST")
    _ = torch  # keep the import explicit for readers
    return module


def load_reference_beats():
    """Return the reference BEATs modules as a namespace.

    Provides ``.beats`` (BEATs, BEATsConfig, _BatchedFbank) and ``.backbone``
    (TransformerEncoder, attention) loaded from
    /root/reference/avex/models/beats/ without importing the avex package.
    """
    pkg_name = "_refbeats"
    if pkg_name in sys.modules:
        return sys.modules[pkg_name]
    root = REFERENCE_ROOT / "avex" / "models" / "beats"
    pkg = types.ModuleType(pkg_name)
    pkg.__spec__ = importlib.machinery.ModuleSpec(pkg_name, loader=None, is_package=True)
    pkg.__path__ = [str(root)]
    sys.modules[pkg_name] = pkg
    _load_module(f"{pkg_name}.modules", root / "modules.py", pkg_name)
    backbone = _load_module(f"{pkg_name}.backbone", root / "backbone.py", pkg_name)
    beats = _load_module(f"{pkg_name}.beats", root / "beats.py", pkg_name)
    pkg.modules = sys.modules[f"{pkg_name}.modules"]
    pkg.backbone = backbone
    pkg.beats = beats
    return pkg
