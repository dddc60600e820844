"""REGISTRY.md must stay in sync with the live registry — it is
generated, and a stale map is worse than none (it claims coverage or
record status that moved)."""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent
                       / "scripts"))

import registry_map  # noqa: E402


def test_registry_md_is_current():
    out = registry_map.REPO / "REGISTRY.md"
    assert out.exists(), "REGISTRY.md missing — run scripts/registry_map.py"
    assert out.read_text() == registry_map.generate(), (
        "REGISTRY.md stale — run scripts/registry_map.py"
    )
