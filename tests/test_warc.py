"""WARC reader/writer (sources/warc.py): record round-trip (plain and
multi-member gzip), non-response skipping, framing errors, and
end-to-end byte-identity of the WARC ingestion path against the
Parquet pages path."""

from __future__ import annotations

import gzip
from datetime import datetime

import pandas as pd
import pytest

from kg_covid_19_ray.sources import warc as W

PAGES = [
    {"url": "https://a.example/doc-00000001",
     "warc_ts": datetime(2026, 3, 1, 12, 30, 45, 123456),
     "html": b"<html><title>T</title><body>hello \r\n\r\n world</body></html>",
     "lang": "en"},
    {"url": "https://b.example/doc-00000002",
     "warc_ts": datetime(2026, 3, 2, 0, 0, 0, 1),
     "html": "<html><body>café</body></html>".encode(),
     "lang": "fr"},
]


@pytest.mark.parametrize("gz", [True, False])
def test_round_trip(tmp_path, gz):
    p = str(tmp_path / ("t.warc.gz" if gz else "t.warc"))
    W.write_warc(p, PAGES, gzip_members=gz)
    data = open(p, "rb").read()
    if gz:  # multi-member: warcinfo + 2 responses = 3 members
        assert data.count(b"\x1f\x8b\x08") >= 3
    rows = W.parse_warc(data)
    assert len(rows) == 2  # warcinfo skipped
    for got, want in zip(rows, PAGES):
        assert got["url"] == want["url"]
        assert got["warc_ts"] == want["warc_ts"]  # microsecond exact
        assert got["html"] == want["html"]  # payload with \r\n\r\n intact
        assert got["lang"] == want["lang"]


def test_malformed_framing_raises():
    with pytest.raises(ValueError, match="not a WARC record"):
        W.parse_warc(b"HTTP/1.1 200 OK\r\n\r\n")
    rec = W._warc_record("response", [
        ("WARC-Target-URI", PAGES[0]["url"]),
        ("WARC-Date", PAGES[0]["warc_ts"].strftime(W._TS_FMT)),
    ], b"HTTP/1.1 200 OK\r\n\r\n" + PAGES[0]["html"])
    with pytest.raises(ValueError, match="truncated"):
        W.parse_warc(rec[:-20])


def test_warc_path_matches_parquet_path(ray_session, tmp_path):
    # the driver-query property at test scale: pages read back from
    # .warc.gz are byte-identical to the synthesized Parquet pages
    from kg_covid_19_ray.sources.pages import read_pages

    sf = "/root/testdata/sf0.001"
    out = W.write_warc_fixture(sf, str(tmp_path / "warc"), num_files=4)
    got = W.read_warc(out).to_pandas()
    want = read_pages(sf).to_pandas()

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values("url").reset_index(drop=True)[
            ["url", "warc_ts", "html", "lang"]]

    g, w = canon(got), canon(want)
    assert g["html"].map(bytes).equals(w["html"].map(bytes))
    assert g.drop(columns="html").equals(w.drop(columns="html"))


def test_second_precision_dates_and_missing_http_terminator():
    # real Common Crawl WARCs carry second-precision WARC-Date
    rec = W._warc_record("response", [
        ("WARC-Target-URI", "https://cc.example/doc-1"),
        ("WARC-Date", "2017-10-24T00:03:29Z"),
    ], b"HTTP/1.1 200 OK\r\nContent-Language: en\r\n\r\n<html/>")
    rows = W.parse_warc(rec)
    assert rows[0]["warc_ts"] == datetime(2017, 10, 24, 0, 3, 29)
    assert rows[0]["html"] == b"<html/>"

    # a response payload without an HTTP header terminator must raise,
    # not emit garbage html
    bad = W._warc_record("response", [
        ("WARC-Target-URI", "https://cc.example/doc-2"),
        ("WARC-Date", "2017-10-24T00:03:29Z"),
    ], b"HTTP/1.1 200 OK")
    with pytest.raises(ValueError, match="no HTTP header terminator"):
        W.parse_warc(bad)


def test_cli_transform_from_warc_dir(ray_session, tmp_path, capsys):
    """`cli transform --input <warc dir>` auto-detects the crawl-dump
    format and lands the same edge count as the Parquet path."""
    import json

    from kg_covid_19_ray import cli

    sf = "/root/testdata/sf0.001"
    dump = W.write_warc_fixture(sf, str(tmp_path / "dump"), num_files=4)
    assert cli._is_warc_dir(dump) and not cli._is_warc_dir(sf)

    p = cli.build_parser()
    args = p.parse_args(["transform", "--input", dump,
                         "--output-dir", str(tmp_path / "out")])
    assert args.fn(args) == 0
    out = json.loads(capsys.readouterr().out)["web_pages"]
    assert out["input_format"] == "warc"

    import ray.data
    from kg_covid_19_ray.pipelines.flagship import build_kg
    got = ray.data.read_parquet(out["edges"]).count()
    assert got == build_kg(sf)[1].count()


def test_on_error_skip_salvages_well_framed_records(ray_session, tmp_path):
    """Crawl-scale salvage: a record with a malformed HTTP payload is
    dropped and parsing continues; once framing is lost the rest of
    the file is abandoned with earlier records kept; a corrupt gzip
    file yields zero rows instead of killing the job."""
    import gzip as _gz

    good = W._warc_record("response", [
        ("WARC-Target-URI", PAGES[0]["url"]),
        ("WARC-Date", PAGES[0]["warc_ts"].strftime("%Y-%m-%dT%H:%M:%S.%fZ")),
        ("Content-Type", "application/http;msgtype=response"),
    ], b"HTTP/1.1 200 OK\r\nContent-Language: en\r\n\r\n<html>ok</html>")
    bad_payload = W._warc_record("response", [
        ("WARC-Target-URI", "https://bad.example/x"),
        ("WARC-Date", "2026-01-01T00:00:00Z"),
    ], b"HTTP payload without header terminator")
    good2 = W._warc_record("response", [
        ("WARC-Target-URI", PAGES[1]["url"]),
        ("WARC-Date", PAGES[1]["warc_ts"].strftime("%Y-%m-%dT%H:%M:%S.%fZ")),
        ("Content-Type", "application/http;msgtype=response"),
    ], b"HTTP/1.1 200 OK\r\n\r\n<html>two</html>")

    # payload-malformed record dropped, both neighbors kept
    data = good + bad_payload + good2
    with pytest.raises(ValueError):
        W.parse_warc(data)
    rows = W.parse_warc(data, on_error="skip")
    assert [r["url"] for r in rows] == [PAGES[0]["url"], PAGES[1]["url"]]

    # framing lost mid-file: earlier records salvaged, rest abandoned
    data = good + b"GARBAGE-NOT-A-RECORD" + good2
    rows = W.parse_warc(data, on_error="skip")
    assert [r["url"] for r in rows] == [PAGES[0]["url"]]

    # end-to-end through the datasource: one good file + one corrupt
    # gzip file -> only the good file's page
    d = tmp_path / "dump"
    d.mkdir()
    (d / "crawl-0.warc.gz").write_bytes(_gz.compress(good))
    (d / "crawl-1.warc.gz").write_bytes(b"\x1f\x8bnot really gzip")
    with pytest.raises(Exception):
        W.read_warc(str(d)).count()
    got = W.read_warc(str(d), on_error="skip").to_pandas()
    assert list(got["url"]) == [PAGES[0]["url"]]


def test_salvage_metrics_on_corrupted_dump(ray_session, tmp_path):
    """Round-4 VERDICT item 8: skipped members used to be silent. With
    metrics_run_id set, each read task taps the shared metrics actor
    with (pages emitted, records skipped, framing lost), so ingest
    loss on a deliberately-corrupted dump is observable."""
    import gzip as _gz

    from kg_covid_19_ray.state.metrics import Metrics

    good = W._warc_record("response", [
        ("WARC-Target-URI", PAGES[0]["url"]),
        ("WARC-Date", PAGES[0]["warc_ts"].strftime("%Y-%m-%dT%H:%M:%S.%fZ")),
        ("Content-Type", "application/http;msgtype=response"),
    ], b"HTTP/1.1 200 OK\r\nContent-Language: en\r\n\r\n<html>ok</html>")
    bad_payload = W._warc_record("response", [
        ("WARC-Target-URI", "https://bad.example/x"),
        ("WARC-Date", "2026-01-01T00:00:00Z"),
    ], b"HTTP payload without header terminator")

    d = tmp_path / "dump"
    d.mkdir()
    # file 0: one good + one payload-bad record -> 1 page, 1 record skip
    (d / "crawl-0.warc.gz").write_bytes(_gz.compress(good + bad_payload))
    # file 1: good record then garbage -> 1 page, 1 framing loss
    (d / "crawl-1.warc.gz").write_bytes(
        _gz.compress(good + b"GARBAGE-NOT-A-RECORD"))
    # file 2: corrupt gzip -> 0 pages, 1 framing loss
    (d / "crawl-2.warc.gz").write_bytes(b"\x1f\x8bnot really gzip")

    m = Metrics("warc_salvage_test")
    m.reset()
    got = W.read_warc(str(d), on_error="skip",
                      metrics_run_id="warc_salvage_test").to_pandas()
    assert len(got) == 2
    snap = m.snapshot()
    assert snap["warc_pages"]["rows"] == 2
    assert snap["warc_records_skipped"]["rows"] == 1
    assert snap["warc_framing_lost"]["rows"] == 2
    m.reset()
