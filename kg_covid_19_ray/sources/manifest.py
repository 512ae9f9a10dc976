"""YAML-manifest-driven source staging (reference S1:
download.py:6-22 + utils/download_utils.py:16-66, download.yaml).

Reference semantics, re-derived:

- the manifest is a YAML LIST of items; each needs ``url`` (an item
  without one is warned about and skipped, download_utils.py:39-41);
- the local file name is ``local_name``, defaulting to the URL's last
  path segment (:42-47);
- SKIP-IF-CACHED: an existing output file short-circuits the fetch
  unless ``ignore_cache`` (then it is deleted and re-fetched, :49-56)
  — this cache is the reference's only resume mechanism;
- items carrying ``api`` route to the API path (Elasticsearch scroll,
  :58-59 -> sources/es_scroll); everything else is a plain URL fetch.

Engine shape: the byte-fetching is an INJECTED callable (the sandbox
has no network; a urllib/requests fetcher plugs in unchanged), and
items can be staged in parallel as Ray tasks — each item is an
independent fetch-to-file, the embarrassingly parallel case the
reference runs serially."""

from __future__ import annotations

import logging
import os
from collections.abc import Callable

import yaml

Fetcher = Callable[[str], bytes]


def _out_name(item: dict) -> str:
    return item.get("local_name") or item["url"].split("/")[-1]


def _stage_one(item: dict, output_dir: str, fetcher: Fetcher,
               api_fetcher, ignore_cache: bool) -> dict:
    if "url" not in item:
        logging.warning("Couldn't find url for source in %s", item)
        return {"item": item, "action": "skipped_no_url", "outfile": None}
    outfile = os.path.join(output_dir, _out_name(item))
    if os.path.exists(outfile):
        if ignore_cache:
            os.remove(outfile)
        else:
            return {"item": item, "action": "cached", "outfile": outfile}
    if "api" in item:
        if api_fetcher is None:
            raise RuntimeError(f"API {item['api']!r} needs an api_fetcher")
        api_fetcher(item, outfile)
        return {"item": item, "action": "downloaded_api",
                "outfile": outfile}
    data = fetcher(item["url"])
    with open(outfile, "wb") as fh:
        fh.write(data)
    return {"item": item, "action": "downloaded", "outfile": outfile}


def download_from_manifest(yaml_file: str, output_dir: str, *,
                           fetcher: Fetcher,
                           api_fetcher=None,
                           ignore_cache: bool = False,
                           parallelism: int = 1) -> list[dict]:
    """Stage every manifest item into ``output_dir``; returns one
    report dict per item ({item, action, outfile}) in manifest order.
    ``parallelism > 1`` fans the fetches out as Ray tasks (fetcher and
    api_fetcher must then be serializable)."""
    os.makedirs(output_dir, exist_ok=True)
    with open(yaml_file) as fh:
        items = yaml.safe_load(fh) or []

    if parallelism <= 1:
        return [_stage_one(i, output_dir, fetcher, api_fetcher,
                           ignore_cache) for i in items]

    import ray

    stage = ray.remote(_stage_one)
    refs = [stage.remote(i, output_dir, fetcher, api_fetcher,
                         ignore_cache) for i in items]
    return ray.get(refs)


def local_file_fetcher(base_dir: str) -> Fetcher:
    """Fixture fetcher: resolves a URL's basename under ``base_dir`` —
    the no-network stand-in used by tests; a real deployment passes a
    urllib/requests-backed callable instead."""
    def fetch(url: str) -> bytes:
        with open(os.path.join(base_dir, url.split("/")[-1]), "rb") as fh:
            return fh.read()
    return fetch
