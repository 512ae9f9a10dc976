"""Deterministic large-corpus generator for scale benchmarks: expands
the driver's documents table by a replica factor with CONTROLLED
duplicate structure, so dedup operators can be exercised at 10^6+ docs
with known ground truth (no external data; everything derives from the
seeded sf tables, mirroring sources/pages.write_pages_parquet).

Per (replica r, doc d):

- ``r == 0``: the original text (the base corpus);
- ``r % 100 == 1``: EXACT duplicate of the original;
- ``r % 100 == 2``: NEAR duplicate — only the last token replaced
  (shingle Jaccard stays >= ~0.9 for typical lengths);
- otherwise: heavy deterministic mutation — every 2nd token rewritten
  to a replica-specific surrogate, destroying shingle similarity.

doc_id = r * base_n + original doc_id, so ground-truth cluster = id %
base_n. Generation runs as a Ray job (one task per replica) and is
cached on disk by the caller.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import ray.data


def _mutate(text: str, r: int, doc_id: int) -> str:
    toks = text.split(" ")
    kind = r % 100
    if r == 0 or kind == 1:
        return text
    if kind == 2:
        toks[-1] = f"m{r % 7}"
        return " ".join(toks)
    # heavy mutation: deterministic, replica+doc specific
    h = (r * 1_000_003 + doc_id) & 0x7FFFFFFF
    for i in range(0, len(toks), 2):
        toks[i] = f"t{(h + i * 2654435761) & 0xFFFFF:x}"
    return " ".join(toks)


def write_documents_parquet(sf_dir: str, out_dir: str, *,
                            replicas: int) -> int:
    """Expand documents.parquet by ``replicas`` into ``out_dir``;
    returns total rows. One Ray task per replica (parallel, deterministic)."""
    base = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "source"])
    base_ids = base["doc_id"].to_numpy()
    base_texts = base["text"].to_pylist()
    base_src = base["source"].to_pylist()
    n = len(base_ids)
    base_ref = ray.put((base_ids, base_texts, base_src))

    def one_replica(row: dict) -> list[dict]:
        r = row["id"]
        ids, texts, srcs = ray.get(base_ref)
        out_rows = []
        for d, t, s in zip(ids, texts, srcs):
            out_rows.append({
                "doc_id": int(r) * n + int(d),
                "text": _mutate(t, int(r), int(d)),
                "source": s,
            })
        return out_rows

    ds = ray.data.range(replicas).flat_map(one_replica)
    ds.write_parquet(out_dir)
    return replicas * n
