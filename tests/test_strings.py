"""Unit tests for the scalar string/record helpers (SURVEY §2.8,
M5/M16/M18/M19/M20 semantics pinned against the reference)."""

import pytest

from kg_covid_19_ray.functions import strings as s


def test_pipe_join_split_roundtrip():
    assert s.pipe_join(["a", "b"]) == "a|b"
    assert s.pipe_split("a|b") == ["a", "b"]
    assert s.pipe_split("") == []
    assert s.pipe_split("x") == ["x"]


def test_strip_quotes_and_scrub():
    assert s.strip_quotes('"quoted"') == "quoted"
    assert s.strip_quotes('in"side') == 'in"side'
    assert s.scrub_whitespace("a\nb\tc") == "a b c"


def test_get_item_by_priority():
    rec = {"a": "", "b": "val", "c": "other"}
    assert s.get_item_by_priority(rec, ["a", "b", "c"]) == "val"
    with pytest.raises(KeyError):
        s.get_item_by_priority(rec, ["a", "missing"])


def test_preferred_xref_priority_order():
    xs = ["PubChem Compound:99", "DrugBank:DB01", "CHEBI:15377",
          "CHEBI:99999"]
    assert s.preferred_xref(xs) == "CHEBI:15377"  # first within prefix
    assert s.preferred_xref(["DrugBank:DB01", "PubChem Compound:99"]) \
        == "DrugBank:DB01"
    assert s.preferred_xref(["Other:1"], fallback="pharmgkb.drug:X") \
        == "pharmgkb.drug:X"
    assert s.preferred_xref([]) is None


def test_flatten_json_allowed_remap_and_dup_join():
    rec = {
        "molecule": {"pref_name": "Water", "chebi": "CHEBI:15377"},
        "synonyms": [{"name": "H2O"}, {"name": "oxidane"}],
        "ignored": {"deep": {"skip_me": "x"}},
    }
    flat = s.flatten_json(rec, allowed=["pref_name", "chebi", "name"],
                          remap={"pref_name": "name_pref"})
    assert flat == {"name_pref": "Water", "chebi": "CHEBI:15377",
                    "name": "H2O|oxidane"}


def test_flatten_json_no_filter_keeps_all_leaves():
    assert s.flatten_json({"a": 1, "b": [2, 3]}) == {"a": "1", "b": "2|3"}
