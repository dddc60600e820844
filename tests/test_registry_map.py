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


def test_registry_md_survives_later_parity_artifact():
    """Round 9's recurrence: the harness's end-of-round snapshot commit
    added a PARITY_r09_*.json the builder hadn't folded, and the glob
    picked it up — reddening the committed map.  Discovery now reads
    only PARITY_MANIFEST.json, so an un-folded artifact (any name, any
    round) must leave generation byte-identical."""
    fakes = [
        registry_map.REPO / "PARITY_r99_sample_sf1.json",
        registry_map.REPO / "PARITY_r99_wave1_sf10.json",
    ]
    assert not any(f.exists() for f in fakes)
    before = registry_map.generate()
    for f in fakes:
        f.write_text(
            '{"sf_dir": "/root/testdata/sf1", "selector": "named", '
            '"passed": 1, "total": 1, "results": {"agg_group": '
            '{"ok": true, "rows": 1, "mode": "oracle", "sec": 0.1}}}'
        )
    try:
        assert registry_map.generate() == before
    finally:
        for f in fakes:
            f.unlink()


def test_parity_manifest_lists_only_existing_artifacts():
    import json

    mf = registry_map.REPO / "PARITY_MANIFEST.json"
    names = json.loads(mf.read_text())
    assert names == sorted(names)
    missing = [n for n in names if not (registry_map.REPO / n).exists()]
    assert not missing, missing
