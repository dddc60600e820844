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


def test_registry_md_has_certification_column():
    # The parity-certification stamp (round-5 verdict task 7): backlog
    # confidence must be readable off the artifact itself.
    text = (registry_map.REPO / "REGISTRY.md").read_text()
    assert "| certified |" in text
    assert "sf1(r05)" in text  # the round-5 full-sf1 sweep is stamped


def test_registry_md_survives_later_driver_artifact():
    """The driver writes CORRECTNESS_r{N}.json AFTER the builder's final
    commit; the generator must ignore rounds past _RECORDED_THROUGH so
    that write can never invalidate the committed REGISTRY.md (the
    round-5/6 red-test recurrence)."""
    fake = registry_map.REPO / "CORRECTNESS_r99.json"
    assert not fake.exists()
    before = registry_map.generate()
    fake.write_text(
        '{"agg_group": {"rows_match": true, "schema_match": true, '
        '"hash_match": true, "spark_rows": 1, "oracle_rows": 1, '
        '"err": null}}'
    )
    try:
        assert registry_map.generate() == before
    finally:
        fake.unlink()
