"""Mention detector at realistic gazetteer sizes (round-3 item 2).

The token-hash dictionary path must agree EXACTLY with brute-force
RE2 ``\\b<surface>\\b`` per-term matching — at 2k+ surface forms,
with duplicate surfaces, multi-word phrases and hyphenated forms
(slow path), punctuation-adjacent tokens, and null text.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from kg_covid_19_ray.stages.mentions import MentionDetector


def _brute_force(entries, texts, doc_ids):
    hits = set()
    for idx, (surface, _, _, _) in enumerate(entries):
        pat = re.compile(rf"\b{re.escape(surface)}\b")
        for d, t in zip(doc_ids, texts):
            if t is not None and pat.search(t):
                hits.add((d, idx))
    return hits


def _detector_hits(det, texts, doc_ids):
    batch = pa.table({
        "doc_id": pa.array(doc_ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    out = det(batch)
    return set(zip(out["doc_id"].to_pylist(), out["gaz_idx"].to_pylist()))


def test_detector_parity_2k_terms():
    rng = np.random.RandomState(42)
    vocab = [f"term{i:04d}" for i in range(3000)]
    entries = [(vocab[i], f"RAW:{i}", "", "") for i in range(2000)]
    # duplicate surface -> two entries (CSR expansion path)
    entries.append((vocab[7], "RAW:dup", "", ""))
    # slow-path surfaces: multi-word + hyphenated
    entries.append(("term0001 term0002", "RAW:phrase", "", ""))
    entries.append(("spike-protein", "RAW:hyphen", "", ""))

    texts, doc_ids = [], []
    for d in range(300):
        words = list(rng.choice(vocab, size=40))
        if d % 7 == 0:
            words.insert(3, "term0001 term0002")  # phrase hit
        if d % 11 == 0:
            words.append("spike-protein")
        if d % 13 == 0:
            words.append("term0007,")  # punctuation-adjacent: \b match
        texts.append(" ".join(words))
        doc_ids.append(d)
    texts.append(None)  # null text must not crash or match
    doc_ids.append(999)

    det = MentionDetector(entries)
    assert _detector_hits(det, texts, doc_ids) == \
        _brute_force(entries, texts, doc_ids)


def test_detector_duplicate_surface_emits_all_entries(monkeypatch):
    # force the token-hash path despite the tiny gazetteer (below the
    # size threshold it would take the per-term sweep)
    monkeypatch.setenv("KG_RAY_SMALL_GAZETTEER_MAX", "0")
    entries = [("alpha", "RAW:1", "", ""), ("alpha", "RAW:2", "", ""),
               ("beta", "RAW:3", "", "")]
    det = MentionDetector(entries)
    assert len(det.fast_value_set) == 2  # token-hash path active
    got = _detector_hits(det, ["alpha beta", "gamma alpha", "delta"],
                         [0, 1, 2])
    assert got == {(0, 0), (0, 1), (0, 2), (1, 0), (1, 1)}


def test_detector_token_boundary_not_substring(monkeypatch):
    # 'spark' must not match inside 'sparkle' (\b semantics), on BOTH
    # matching engines
    texts = ["sparkle plug", "a spark here", "spark,end", "espark"]
    entries = [("spark", "RAW:1", "", "")]
    for small_max in ("0", "32"):
        monkeypatch.setenv("KG_RAY_SMALL_GAZETTEER_MAX", small_max)
        det = MentionDetector(entries)
        got = _detector_hits(det, texts, [0, 1, 2, 3])
        assert got == {(1, 0), (2, 0)}, f"small_max={small_max}"

def test_detector_non_ascii_surface_falls_to_sweep(monkeypatch):
    # Python \w accepts 'naïve' but RE2 \W+ tokenization (ASCII) splits
    # it into 'na'/'ve' — the token-hash path could never match it.
    # The fast-path gate must be ASCII-only so such surfaces take the
    # RE2 sweep and still match (round-3 ADVICE).
    monkeypatch.setenv("KG_RAY_SMALL_GAZETTEER_MAX", "0")
    entries = [("naïve", "RAW:1", "", ""), ("plain", "RAW:2", "", "")]
    det = MentionDetector(entries)
    # the non-ASCII surface must NOT be in the fast set
    assert det.fast_value_set.to_pylist() == ["plain"]
    got = _detector_hits(det, ["a naïve idea", "plain text", "naive"],
                         [0, 1, 2])
    assert got == {(0, 0), (1, 1)}


def test_pure_wordspace_gate_and_space_tokenizer_parity(monkeypatch):
    # Round-5: a batch whose text is pure [A-Za-z0-9_ ] takes the
    # plain-space tokenizer (8x cheaper than the \W+ regex split); the
    # purity gate is byte-exact, so one punctuation char routes the
    # batch back to the regex path. Hits must be identical either way.
    from kg_covid_19_ray.stages.mentions import _pure_wordspace

    monkeypatch.setenv("KG_RAY_SMALL_GAZETTEER_MAX", "0")
    entries = [(f"w{i:03d}", f"RAW:{i}", "", "") for i in range(50)]
    det = MentionDetector(entries)

    pure = ["w001 w002  w003", "  w004 ", "w005_x w006", "", "w007"]
    assert _pure_wordspace(pa.array(pure, pa.string()))
    impure = list(pure) + ["w008, w009"]
    assert not _pure_wordspace(pa.array(impure, pa.string()))

    ids_p = list(range(len(pure)))
    assert _detector_hits(det, pure, ids_p) == \
        _brute_force(entries, pure, ids_p)
    ids_i = list(range(len(impure)))
    assert _detector_hits(det, impure, ids_i) == \
        _brute_force(entries, impure, ids_i)

    # null text: fill_null("") keeps the batch pure -> space path; the
    # sliced-buffer fallback (offset view) must stay conservative
    with_null = ["w010 w011", None, "w012"]
    assert _detector_hits(det, with_null, [0, 1, 2]) == \
        _brute_force(entries, with_null, [0, 1, 2])
    sliced = pa.array(impure, pa.string()).slice(0, len(pure))
    # slice still sees the full buffer -> conservatively impure
    assert not _pure_wordspace(sliced)
