"""ES scroll connector (reference utils/download_utils.py:69-127):
scroll protocol against a faithful in-memory fake transport —
pagination, scroll-cursor continuation + clearing, retry on transient
failures, sliced parallel reads, and the reference-exact
accumulate-to-JSON pull."""

from __future__ import annotations

import json

import pytest

from kg_covid_19_ray.sources.es_scroll import (
    fetch_all_records,
    read_es_scroll,
    scroll_pages,
)

DOCS = [{"_id": str(i), "_source": {"k": i, "name": f"doc{i}"}}
        for i in range(57)]


class FakeES:
    """In-memory stand-in for the three scroll endpoints. Supports
    sliced scrolls (disjoint round-robin by numeric _id, as ES splits
    an index) and optional transient failures."""

    def __init__(self, docs=DOCS, fail_every: int | None = None,
                 lose_response_at: int | None = None):
        self.docs = docs
        self.cursors: dict[str, list] = {}
        self.cleared: list[str] = []
        self.calls = 0
        self.fail_every = fail_every
        # scroll call number whose RESPONSE is lost AFTER the server
        # advanced the cursor (the non-idempotent failure mode)
        self.lose_response_at = lose_response_at
        self.scroll_calls = 0
        self._next = 0

    def __call__(self, op: str, **kw):
        self.calls += 1
        if self.fail_every and self.calls % self.fail_every == 0:
            raise ConnectionError("transient")
        if op == "search":
            body = kw["body"]
            size = body["size"]
            docs = self.docs
            if "slice" in body:
                s = body["slice"]
                docs = [d for d in docs
                        if int(d["_id"]) % s["max"] == s["id"]]
            sid = f"cursor-{self._next}"
            self._next += 1
            self.cursors[sid] = docs[size:]
            return {"_scroll_id": sid,
                    "hits": {"hits": docs[:size]}}
        if op == "scroll":
            sid = kw["scroll_id"]
            self.scroll_calls += 1
            rest = self.cursors.get(sid, [])
            # ES keeps the page size of the original search; fake: 10
            page, self.cursors[sid] = rest[:10], rest[10:]
            if self.scroll_calls == self.lose_response_at:
                # cursor already advanced; only the response is lost
                raise ConnectionError("response lost")
            return {"_scroll_id": sid, "hits": {"hits": page}}
        if op == "clear":
            self.cleared.append(kw["scroll_id"])
            return {}
        raise ValueError(op)


def test_scroll_pages_paginates_and_clears():
    es = FakeES()
    pages = list(scroll_pages(es, "idx", {"query": {}}, page_size=10))
    got = [h["_id"] for p in pages for h in p]
    assert got == [d["_id"] for d in DOCS]  # order preserved
    assert all(len(p) <= 10 for p in pages)
    assert es.cleared  # cursor cleared after exhaustion


def test_scroll_retries_transient_failures():
    # one transient scroll failure mid-stream: the slice restarts from
    # the initial search and fast-forwards, so the stream is complete,
    # in order, and duplicate-free
    es = FakeES(lose_response_at=2)
    records = fetch_all_records(es, "idx", {"query": {}}, page_size=10)
    assert [r["_id"] for r in records] == [d["_id"] for d in DOCS]
    assert es.cleared  # the broken cursor was cleared on restart


def test_scroll_restart_does_not_skip_advanced_page():
    # THE non-idempotent case (ADVICE r2): the server advances the
    # cursor but the response is lost. A naive scroll retry would
    # silently skip that page; the restart-from-search path must not.
    es = FakeES(lose_response_at=3)
    records = fetch_all_records(es, "idx", {"query": {}}, page_size=10)
    assert [r["_id"] for r in records] == [d["_id"] for d in DOCS]


def test_fetch_all_records_json_dump(tmp_path):
    es = FakeES()
    out = tmp_path / "records.json"
    records = fetch_all_records(es, "idx", {"query": {}},
                                page_size=25, outfile=str(out))
    assert len(records) == len(DOCS)
    assert json.loads(out.read_text()) == records


def test_read_es_scroll_sliced_dataset(ray_session):
    ds = read_es_scroll(FakeES, "idx", {"query": {}},
                        num_slices=4, page_size=10)
    df = ds.to_pandas()
    ids = sorted(json.loads(r)["_id"] for r in df["record"])
    assert ids == sorted(d["_id"] for d in DOCS)  # disjoint + complete


def test_scroll_gives_up_after_max_retries():
    def always_fail(op, **kw):
        raise ConnectionError("down")
    with pytest.raises(ConnectionError):
        list(scroll_pages(always_fail, "idx", {"query": {}}))
