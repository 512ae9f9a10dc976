"""Web-corpus operators: URL canonicalization + dedup, CCNet-style
line-level boilerplate removal (pipelines/webops)."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from kg_covid_19_ray.pipelines import webops


def test_canonicalize_urls_cases():
    urls = pd.Series([
        "https://WWW.Site.Example.com:443/p/1?utm_source=feed&b=2&a=1#frag",
        "https://www.site.example.com/p/1?a=1&b=2",
        "http://host.example/x",                       # no query, no frag
        "https://h.example/p?utm_a=1&utm_b=2",         # all params dropped
        "https://h.example:4430/p",                    # NOT the default port
    ])
    got = list(webops.canonicalize_urls(urls))
    assert got[0] == "https://www.site.example.com/p/1?a=1&b=2"
    assert got[0] == got[1]                      # messy == already-clean
    assert got[2] == "http://host.example/x"
    assert got[3] == "https://h.example/p"
    assert got[4] == "https://h.example:4430/p"  # 4430 endswith 443: kept


def test_web_url_dedup_finds_planted_dupes(ray_session):
    out = webops.web_url_dedup("/root/testdata/sf0.001").to_pandas()
    assert (out["n_docs"] >= 1).all()
    assert (out["n_docs"] > 1).any()             # real collisions exist
    # keep_doc_id is the min of its group: every kept id is distinct
    # and the kept ids of dupe groups are smaller than the group size
    assert out["keep_doc_id"].is_unique
    assert out["n_docs"].sum() == 500            # every doc accounted for


def test_text_line_dedup_planted_boilerplate(ray_session, tmp_path):
    """Two docs share an 8-token line (boilerplate at MIN_DOCS=2); a
    third is unique. Kept text hashes match a hand computation."""
    boiler = "b0 b1 b2 b3 b4 b5 b6 b7"
    uniq1 = "u0 u1 u2 u3 u4 u5 u6 u7"
    uniq2 = "v0 v1 v2 v3 v4 v5 v6 v7"
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": [f"{boiler} {uniq1}", f"{boiler} {uniq2}", uniq1],
        "lang": "x", "source": "s0", "n_chars": 1,
    })
    docs.to_parquet(tmp_path / "documents.parquet")
    out = webops.text_line_dedup(str(tmp_path)).to_pandas() \
        .set_index("doc_id").sort_index()
    assert list(out["n_lines"]) == [2, 2, 1]
    # boiler line is in docs 0 and 1 (dropped); uniq1 is ALSO in two
    # docs (doc 0's second line and doc 2's only line) -> dropped too
    assert list(out["n_kept"]) == [0, 1, 0]
    assert out.loc[1, "clean_fp"] == hashlib.md5(uniq2.encode()).hexdigest()
    assert out.loc[0, "clean_fp"] == hashlib.md5(b"").hexdigest()


def test_text_line_dedup_null_text_absent(ray_session, tmp_path):
    docs = pd.DataFrame({
        "doc_id": [0, 1],
        "text": ["a b c", None],
        "lang": "x", "source": "s0", "n_chars": 1,
    })
    docs.to_parquet(tmp_path / "documents.parquet")
    out = webops.text_line_dedup(str(tmp_path)).to_pandas()
    assert list(out["doc_id"]) == [0]            # NULL text emits no row


def test_text_scrub_pii_masks_and_counts(ray_session):
    out = webops.text_scrub_pii("/root/testdata/sf0.001").to_pandas() \
        .set_index("doc_id").sort_index()
    # injection schedule: email for doc_id%4==0, phone for %5==0
    assert out.loc[0, "n_emails"] == 1 and out.loc[0, "n_phones"] == 1
    assert out.loc[4, "n_emails"] == 1 and out.loc[4, "n_phones"] == 0
    assert out.loc[1, "n_emails"] == 0 and out.loc[1, "n_phones"] == 0
    # scrubbed text of a PII doc differs from the no-PII fingerprint
    # of the same doc only by the injected-and-masked suffix: every
    # clean_fp is a valid md5 and PII docs' fps differ from doc 1's
    assert out["clean_fp"].str.len().eq(32).all()
    assert out.loc[0, "clean_fp"] != out.loc[1, "clean_fp"]


def test_text_quality_filter_rules(ray_session, tmp_path):
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4],
        "text": [
            "the quick brown fox jumps over a lazy dog " * 6,  # pass
            "the a short",                        # < 50 tokens
            " ".join(["the", "a"] + ["ok"] * 60)  # symbols over ratio
            + " " + " ".join(["#"] * 20),
            " ".join(["123", "456"] * 30),        # no alpha, no stop
            None,                                 # dropped entirely
        ],
        "lang": "x", "source": "s0", "n_chars": 1,
    })
    docs.loc[0, "text"] = docs.loc[0, "text"].strip()
    docs.to_parquet(tmp_path / "documents.parquet")
    out = webops.text_quality_filter(str(tmp_path)).to_pandas() \
        .set_index("doc_id").sort_index()
    assert list(out.index) == [0, 1, 2, 3]       # null text emits no row
    assert out.loc[0, "keep"] == 1
    assert out.loc[1, "keep"] == 0               # word-count rule
    assert out.loc[2, "keep"] == 0               # symbol-ratio rule
    assert out.loc[2, "symbol_ratio"] > 0.1
    assert out.loc[3, "keep"] == 0               # alpha + stopword rules
    assert out.loc[3, "frac_alpha"] == 0.0
    # metric sanity on the passing doc
    assert out.loc[0, "n_tokens"] == 54
    assert out.loc[0, "n_stop"] == 12
