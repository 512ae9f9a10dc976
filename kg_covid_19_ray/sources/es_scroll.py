"""Elasticsearch scroll connector (reference S2:
utils/download_utils.py:69-127).

The reference opens one ES connection, runs ``elasticsearch.helpers
.scan`` (scroll API: an initial search returns a ``_scroll_id`` +
first page; repeated ``scroll`` calls page through; the scroll is
cleared at the end) and accumulates EVERY record into one JSON file —
single connection, single list, driver memory.

Engine shape — the connector itself is Ray-native:

- ``scroll_pages``: the scroll protocol against an INJECTABLE transport
  (initial search -> scroll loop -> clear), with bounded retries per
  page. The transport is any callable speaking the three ES endpoints;
  the real ``elasticsearch`` client (absent in this sandbox, and the
  live service needs network) plugs in without code changes, and tests
  run a faithful in-memory fake.
- ``read_es_scroll``: a SLICED-scroll Dataset — ES's native parallel-
  reader mechanism (``slice: {id, max}`` on the initial search splits
  the index into disjoint shards-of-a-scroll). One Ray read task per
  slice, each holding only its own scroll cursor: records stream into
  blocks instead of a driver-side list, so the 100-TB version of the
  reference's "accumulate all records" is a streaming read.
- ``fetch_all_records``: the reference-exact convenience (one scroll,
  one list, preserve_order) for fixture-sized pulls + its JSON-file
  dump, feeding the existing canned-records ChEMBL path.
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable
from typing import Any

import ray
import ray.data

# A transport is callable(op, **kwargs) -> dict mimicking the three ES
# endpoints used by the scroll protocol:
#   op="search":  kwargs(index, body, scroll) -> {_scroll_id, hits:{hits:[...]}}
#   op="scroll":  kwargs(scroll_id, scroll)   -> {_scroll_id, hits:{hits:[...]}}
#   op="clear":   kwargs(scroll_id)           -> {}
Transport = Callable[..., dict]

DEFAULT_SCROLL = "1m"  # download_utils.py:96 default
DEFAULT_PAGE_SIZE = 1000
MAX_RETRIES = 3


def scroll_pages(transport: Transport, index: str, query: dict, *,
                 scroll: str = DEFAULT_SCROLL,
                 page_size: int = DEFAULT_PAGE_SIZE,
                 slice_id: int | None = None,
                 slice_max: int | None = None):
    """Yield lists of hit records, one list per scroll page, clearing
    the scroll cursor on exhaustion (and on error).

    Failure handling: the initial ``search`` is idempotent and retried
    in place with backoff. A ``scroll`` call is NOT idempotent — the
    server may have advanced the cursor and only the response was lost,
    so blindly re-calling it would silently skip a page. On any scroll
    failure the old cursor is cleared and the slice RESTARTS from the
    initial search, fast-forwarding past the pages already yielded
    (scroll order is stable within a scroll context; a restart opens a
    new snapshot, so a concurrently-mutating index may still shift
    records across page boundaries — the standard ES scroll caveat).
    Up to MAX_RETRIES restarts without progress (the budget resets
    whenever a new page is delivered)."""
    body = dict(query)
    body.setdefault("size", page_size)
    if slice_id is not None:
        body["slice"] = {"id": slice_id, "max": slice_max}

    def search_with_retry() -> dict:
        last: Exception | None = None
        for attempt in range(MAX_RETRIES):
            try:
                return transport("search", index=index, body=body,
                                 scroll=scroll)
            except Exception as exc:  # transient transport failure
                last = exc
                time.sleep(min(2 ** attempt * 0.1, 2.0))
        raise last  # type: ignore[misc]

    def clear(scroll_id) -> None:
        if scroll_id is not None:
            try:
                transport("clear", scroll_id=scroll_id)
            except Exception:
                pass  # cursor will expire on its own

    pages_done = 0  # pages already yielded (skip count after restart)
    restarts = 0
    sid = None
    try:
        while True:
            resp = search_with_retry()
            sid = resp.get("_scroll_id")
            page_no = 0
            try:
                while True:
                    hits = resp.get("hits", {}).get("hits", [])
                    if not hits:
                        return
                    if page_no >= pages_done:  # not a replay page
                        yield hits
                        pages_done += 1
                        restarts = 0  # progress resets the budget
                    page_no += 1
                    if sid is None:
                        return
                    resp = transport("scroll", scroll_id=sid,
                                     scroll=scroll)
                    sid = resp.get("_scroll_id", sid)
            except Exception:
                restarts += 1
                if restarts >= MAX_RETRIES:
                    raise
                clear(sid)
                sid = None
                time.sleep(min(2 ** restarts * 0.1, 2.0))
                # loop back: fresh search, skip pages_done pages
    finally:
        clear(sid)


def fetch_all_records(transport: Transport, index: str, query: dict, *,
                      scroll: str = DEFAULT_SCROLL,
                      page_size: int = DEFAULT_PAGE_SIZE,
                      outfile: str | None = None) -> list[dict]:
    """Reference-exact accumulate-everything pull
    (elastic_search_query + download_from_api json.dump): one ordered
    scroll, all records in one list, optional JSON file dump. For
    fixture-sized queries; use ``read_es_scroll`` at scale."""
    records: list[dict] = []
    for page in scroll_pages(transport, index, query, scroll=scroll,
                             page_size=page_size):
        records.extend(page)
    if outfile is not None:
        with open(outfile, "w") as fh:
            json.dump(records, fh)
    return records


def read_es_scroll(transport_factory: Callable[[], Transport],
                   index: str, query: dict, *,
                   num_slices: int = 8,
                   scroll: str = DEFAULT_SCROLL,
                   page_size: int = DEFAULT_PAGE_SIZE) -> ray.data.Dataset:
    """Sliced-scroll Dataset: ``num_slices`` Ray tasks each drive one
    ES scroll slice and emit its records — the distributed form of the
    reference's single-scroll accumulate. ``transport_factory`` must be
    serializable and open a fresh connection per task (a connection
    object itself cannot ship across processes).

    Records are emitted as one JSON string column ``record`` (ES hit
    dicts are heterogeneous; downstream parsers project typed columns,
    as the ChEMBL pipeline does from its canned records)."""

    def read_slice(row: dict):
        transport = transport_factory()
        for page in scroll_pages(transport, index, query, scroll=scroll,
                                 page_size=page_size,
                                 slice_id=int(row["slice_id"]),
                                 slice_max=num_slices):
            for hit in page:
                yield {"record": json.dumps(hit, sort_keys=True)}

    # one slice id per block -> one scroll cursor per read task; the
    # records stream through flat_map blocks, never onto the driver
    slices = ray.data.from_items(
        [{"slice_id": i} for i in range(num_slices)]) \
        .repartition(num_slices)
    return slices.flat_map(read_slice)
