"""Load pieces of the read-only reference implementation as test oracles.

The reference package as a whole pulls in dependencies we don't ship
(torchaudio, esp_data), so we materialize just the torch-only subpackages we
need (e.g. the BEATs model) as synthetic modules. The reference is used
strictly as a *behavioral oracle* in tests — avex_tpu contains no code from it.
"""

from __future__ import annotations

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
    pkg.__path__ = [str(root)]
    sys.modules[pkg_name] = pkg
    _load_module(f"{pkg_name}.modules", root / "modules.py", pkg_name)
    backbone = _load_module(f"{pkg_name}.backbone", root / "backbone.py", pkg_name)
    beats = _load_module(f"{pkg_name}.beats", root / "beats.py", pkg_name)
    pkg.modules = sys.modules[f"{pkg_name}.modules"]
    pkg.backbone = backbone
    pkg.beats = beats
    return pkg
