"""S1 manifest downloader parity (download_utils.py:16-66): YAML list
parsing, local_name defaulting, skip-if-cached / ignore_cache,
missing-url warn-and-skip, API routing, parallel staging."""

from __future__ import annotations

import os

import pytest

from kg_covid_19_ray.sources.manifest import (
    download_from_manifest,
    local_file_fetcher,
)

MANIFEST = """
-
  url: http://example.org/data/alpha.tsv
  local_name: alpha_renamed.tsv
-
  url: http://example.org/data/beta.txt
-
  note: this item has no url and must be skipped with a warning
-
  url: http://example.org/api/chembl
  api: elasticsearch
  local_name: chembl_records.json
"""


@pytest.fixture
def staged(tmp_path):
    src = tmp_path / "remote"
    src.mkdir()
    (src / "alpha.tsv").write_bytes(b"a\t1\n")
    (src / "beta.txt").write_bytes(b"beta")
    mf = tmp_path / "download.yaml"
    mf.write_text(MANIFEST)
    out = tmp_path / "raw"
    return mf, out, local_file_fetcher(str(src))


def _fake_api(item, outfile):
    with open(outfile, "w") as fh:
        fh.write('[{"_id": "1"}]')


def test_download_semantics(staged):
    mf, out, fetcher = staged
    report = download_from_manifest(str(mf), str(out), fetcher=fetcher,
                                    api_fetcher=_fake_api)
    actions = [r["action"] for r in report]
    assert actions == ["downloaded", "downloaded", "skipped_no_url",
                       "downloaded_api"]
    # local_name honored; default = url basename
    assert (out / "alpha_renamed.tsv").read_bytes() == b"a\t1\n"
    assert (out / "beta.txt").read_bytes() == b"beta"
    assert (out / "chembl_records.json").exists()


def test_cache_skip_and_ignore(staged):
    mf, out, fetcher = staged
    download_from_manifest(str(mf), str(out), fetcher=fetcher,
                           api_fetcher=_fake_api)
    # second run: everything cached
    r2 = download_from_manifest(str(mf), str(out), fetcher=fetcher,
                                api_fetcher=_fake_api)
    assert [r["action"] for r in r2] == \
        ["cached", "cached", "skipped_no_url", "cached"]
    # poke the cached file, then ignore_cache must re-fetch it
    (out / "beta.txt").write_bytes(b"stale")
    r3 = download_from_manifest(str(mf), str(out), fetcher=fetcher,
                                api_fetcher=_fake_api, ignore_cache=True)
    assert all(r["action"] != "cached" for r in r3)
    assert (out / "beta.txt").read_bytes() == b"beta"


def test_parallel_staging(ray_session, staged):
    mf, out, fetcher = staged
    report = download_from_manifest(str(mf), str(out), fetcher=fetcher,
                                    api_fetcher=_fake_api, parallelism=4)
    assert sorted(os.listdir(out)) == [
        "alpha_renamed.tsv", "beta.txt", "chembl_records.json"]
    assert len(report) == 4
