"""SSSOM map-file loading parity (reference utils/normalize_utils.py):
11-line header skip, subject_id->object_id extraction, and the
empty-mapping-keeps-id rule applied through the engine's canonicalize
stage."""

from __future__ import annotations

import pyarrow as pa

from kg_covid_19_ray.sources.sssom import (
    load_ids_from_map,
    load_sssom_map,
    read_sssom,
    write_sssom,
)

ROWS = [
    {"subject_id": "DRUGBANK:DB00945", "predicate_id": "skos:exactMatch",
     "object_id": "CHEBI:15365", "match_type": "HumanCurated"},
    {"subject_id": "MESH:D018352", "predicate_id": "skos:exactMatch",
     "object_id": "MONDO:0005091", "match_type": "HumanCurated"},
    # present-but-empty mapping: the reference KEEPS the original id
    {"subject_id": "CHEMBL.COMPOUND:CHEMBL25", "predicate_id": "",
     "object_id": "", "match_type": ""},
]


def _fixture(tmp_path) -> str:
    path = str(tmp_path / "fixture.sssom.tsv")
    write_sssom(path, ROWS)
    return path


def test_load_sssom_map_skips_header_and_keeps_empties(tmp_path):
    path = _fixture(tmp_path)
    m = load_sssom_map(path)
    assert m == {
        "DRUGBANK:DB00945": "CHEBI:15365",
        "MESH:D018352": "MONDO:0005091",
        "CHEMBL.COMPOUND:CHEMBL25": "",
    }


def test_load_ids_from_map_prefix_filter(tmp_path):
    path = _fixture(tmp_path)
    assert load_ids_from_map(path, "MESH") == ["MESH:D018352"]
    assert load_ids_from_map(path, "DRUGBANK") == ["DRUGBANK:DB00945"]
    assert load_ids_from_map(path, "NOPE") == []


def test_normalize_semantics_through_canonicalize(ray_session, tmp_path):
    """The reference's normalize_curies contract (normalize_utils:36-45)
    replayed through make_canonicalize fed by the FILE loader: mapped id
    replaced, empty-mapped id kept, unmapped id kept."""
    import ray.data

    from kg_covid_19_ray.stages.linking import make_canonicalize

    path = _fixture(tmp_path)
    fn = make_canonicalize(load_sssom_map(path), {}, column="id")
    ds = ray.data.from_arrow(pa.table({"id": pa.array([
        "DRUGBANK:DB00945",        # mapped -> CHEBI:15365
        "CHEMBL.COMPOUND:CHEMBL25",  # empty mapping -> kept
        "UniProtKB:P35499",          # absent -> kept
    ])}))
    out = ds.map_batches(fn, batch_format="pyarrow").to_pandas()
    assert list(out["id"]) == [
        "CHEBI:15365", "CHEMBL.COMPOUND:CHEMBL25", "UniProtKB:P35499"]


def test_read_sssom_dataset_path(ray_session, tmp_path):
    path = _fixture(tmp_path)
    df = read_sssom(path).to_pandas()
    assert list(df.columns) == ["subject_id", "object_id"]
    assert len(df) == 3
    got = dict(zip(df["subject_id"], df["object_id"]))
    assert got["CHEMBL.COMPOUND:CHEMBL25"] == ""
    assert got["DRUGBANK:DB00945"] == "CHEBI:15365"
