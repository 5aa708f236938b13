"""Stub-module hygiene: installing reference stubs must not poison later
real-library imports.

Regression for VERDICT r4 weak #7: ``tests/reference_stubs.py`` installed
bare ``types.ModuleType`` stubs with ``__spec__ = None``; transformers'
lazy import machinery calls ``importlib.util.find_spec("timm")`` which
raises ``ValueError: timm.__spec__ is None`` for such modules, so any
pytest collection order that ran a stub-installing test file before
``test_camera_independent.py`` died at collection. The full suite survived
only because alphabetical order imported transformers first.
"""

from __future__ import annotations

import importlib.util

import pytest

from tests.reference_stubs import install_reference_stubs


def test_find_spec_on_stubs_after_install():
    install_reference_stubs()
    # Exactly the call transformers makes on an already-imported module.
    for name in ("timm", "timm.models", "spconv", "torchvision", "mmcv"):
        spec = importlib.util.find_spec(name)
        assert spec is not None, name


def test_transformers_imports_after_stubs():
    install_reference_stubs()
    transformers = pytest.importorskip("transformers")
    # The failing path was transformers' availability probe of optional
    # backends (timm among them); touching a lazy symbol exercises it.
    assert hasattr(transformers, "EfficientNetConfig")
