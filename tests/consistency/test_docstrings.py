"""Docstring coverage enforcement (≈ reference tests/consistency/test_docstrings.py).

Every public module, class, and public function/method in avex_tpu must carry
a docstring. Private names (leading underscore) are exempt.
"""

import importlib
import inspect
import pkgutil

import pytest

import avex_tpu


def _iter_modules():
    for info in pkgutil.walk_packages(avex_tpu.__path__, prefix="avex_tpu."):
        # CLI imports click lazily; birdnet needs optional deps at call time only.
        yield info.name


def _public_members(module):
    for name, obj in vars(module).items():
        if name.startswith("_"):
            continue
        if getattr(obj, "__module__", None) != module.__name__:
            continue
        if inspect.isclass(obj) or inspect.isfunction(obj):
            yield name, obj


def test_all_public_symbols_have_docstrings():
    missing = []
    for mod_name in _iter_modules():
        module = importlib.import_module(mod_name)
        if not module.__doc__:
            missing.append(mod_name)
        for name, obj in _public_members(module):
            if not inspect.getdoc(obj):
                missing.append(f"{mod_name}.{name}")
            if inspect.isclass(obj):
                for meth_name, meth in vars(obj).items():
                    if meth_name.startswith("_") or not inspect.isfunction(meth):
                        continue
                    if not inspect.getdoc(meth):
                        missing.append(f"{mod_name}.{name}.{meth_name}")
    assert not missing, "Missing docstrings:\n" + "\n".join(sorted(set(missing)))
