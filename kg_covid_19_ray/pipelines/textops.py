"""Text-analysis operators over the documents table (training-data
pipeline suite): token counting, quality scoring, language ID,
document fingerprinting.

All stages are vectorized ``map_batches`` transforms (numpy / pandas
string kernels); language ID keeps its marker tables as stage state.
Rounding uses half-away-from-zero to match the DuckDB oracle.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from kg_covid_19_ray.functions.arrow_meta import read_parquet_clean

STOPWORDS = ("the", "a")

# marker-word profiles for the language-ID heuristic; tie-break order is
# the tuple order (en > de > es > fr), ties with zero evidence -> 'und'
LANG_MARKERS: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("en", ("the", "a", "and", "of")),
    ("de", ("der", "die", "das", "und")),
    ("es", ("el", "los", "las", "y")),
    ("fr", ("le", "les", "des", "et")),
)


def _round_half_away(arr: np.ndarray, ndigits: int) -> np.ndarray:
    scale = 10.0 ** ndigits
    return np.sign(arr) * np.floor(np.abs(arr) * scale + 0.5) / scale


def _tokens(series: pd.Series) -> pd.Series:
    return series.str.split(" ")


# one C-regex scan per doc replaces splitting into Python token lists:
# leading separator consumed, trailing via lookahead so adjacent
# stopwords all count ("a a the" -> 3)
_STOP_RE = ("(?:^| )(?:" + "|".join(re.escape(w) for w in STOPWORDS)
            + ")(?= |$)")


def _token_and_stop_counts(text: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized split(' ') semantics WITHOUT materializing token
    lists: n_tokens = spaces + 1 (equals len(string_split(text, ' ')),
    the SQL oracle's count, including empty tokens), n_stop = stopword
    TOKEN count via one compiled-regex pass."""
    n_tokens = (text.str.count(" ") + 1).to_numpy(dtype=np.int64)
    n_stop = text.str.count(_STOP_RE).to_numpy(dtype=np.int64)
    return n_tokens, n_stop


def text_stats(sf_dir: str) -> ray.data.Dataset:
    """Per-document token count, stopword ratio, average token length,
    and a bounded quality score (length x non-stopword density)."""
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def stats(batch: pd.DataFrame) -> pd.DataFrame:
        n_tokens, n_stop = _token_and_stop_counts(batch["text"])
        n_chars = batch["text"].str.len().to_numpy(dtype=np.int64)
        safe_tokens = np.maximum(n_tokens, 1)
        stop_ratio = n_stop / safe_tokens
        # tokens are single-space-joined: total token chars = len - (n-1)
        avg_token_len = (n_chars - (n_tokens - 1)) / safe_tokens
        quality = np.minimum(n_tokens, 100) / 100.0 * (1.0 - stop_ratio)
        return pd.DataFrame({
            "doc_id": batch["doc_id"],
            "n_tokens": n_tokens,
            "n_chars_text": n_chars,
            "stop_ratio": _round_half_away(stop_ratio, 6),
            "avg_token_len": _round_half_away(avg_token_len, 6),
            "quality": _round_half_away(quality, 6),
        })

    return ds.map_batches(stats, batch_format="pandas")


TEXT_STATS_SQL = f"""
SELECT doc_id,
       length(string_split(text, ' ')) AS n_tokens,
       length(text) AS n_chars_text,
       round(length(list_filter(string_split(text, ' '),
                    x -> x IN ('{STOPWORDS[0]}', '{STOPWORDS[1]}')))
             / greatest(length(string_split(text, ' ')), 1)::DOUBLE, 6)
           AS stop_ratio,
       round((length(text) - (length(string_split(text, ' ')) - 1))
             / greatest(length(string_split(text, ' ')), 1)::DOUBLE, 6)
           AS avg_token_len,
       round(least(length(string_split(text, ' ')), 100) / 100.0
             * (1.0 - length(list_filter(string_split(text, ' '),
                             x -> x IN ('{STOPWORDS[0]}', '{STOPWORDS[1]}')))
               / greatest(length(string_split(text, ' ')), 1)::DOUBLE), 6)
           AS quality
FROM documents
"""


class LangId:
    """Marker-word language identifier. Actor-pool-shaped stage: marker
    sets are built once per worker; scoring is per-batch vectorized.
    Prediction = argmax marker count, ties broken by LANG_MARKERS order,
    zero evidence -> 'und'."""

    def __init__(self):
        self.langs = [lang for lang, _ in LANG_MARKERS]
        # one compiled boundary-regex per language: counts marker TOKENS
        # exactly like set membership over split(' ') (prefix
        # alternatives disambiguated by the lookahead + backtracking),
        # without materializing token lists
        self.pats = [re.compile(
            "(?:^| )(?:" + "|".join(re.escape(m) for m in ms)
            + ")(?= |$)") for _, ms in LANG_MARKERS]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"]
        counts = np.stack(
            [text.str.count(p).to_numpy(dtype=np.int64)
             for p in self.pats], axis=1)
        best = counts.argmax(axis=1)  # first max wins = tuple order
        pred = np.where(counts.max(axis=1) > 0,
                        np.array(self.langs)[best], "und")
        return pd.DataFrame({"doc_id": batch["doc_id"], "pred_lang": pred})


def text_langid(sf_dir: str) -> ray.data.Dataset:
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return ds.map_batches(LangId, batch_format="pandas",
                          concurrency=(1, 4), num_cpus=1)


def _marker_count_sql(markers: tuple[str, ...]) -> str:
    in_list = ", ".join(f"'{m}'" for m in markers)
    return (f"length(list_filter(string_split(text, ' '), "
            f"x -> x IN ({in_list})))")


TEXT_LANGID_SQL = """
SELECT doc_id,
       CASE
         WHEN en_c = 0 AND de_c = 0 AND es_c = 0 AND fr_c = 0 THEN 'und'
         WHEN en_c >= de_c AND en_c >= es_c AND en_c >= fr_c THEN 'en'
         WHEN de_c >= es_c AND de_c >= fr_c THEN 'de'
         WHEN es_c >= fr_c THEN 'es'
         ELSE 'fr'
       END AS pred_lang
FROM (
    SELECT doc_id,
           {en} AS en_c, {de} AS de_c, {es} AS es_c, {fr} AS fr_c
    FROM documents
)
""".format(**{lang: _marker_count_sql(ms) for lang, ms in LANG_MARKERS})


def md5_fingerprints(sf_dir: str) -> ray.data.Dataset:
    """Exact content fingerprint per document (md5 of the text bytes)."""
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def fp(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": batch["doc_id"],
            "fp": [hashlib.md5(t.encode()).hexdigest()
                   for t in batch["text"]],
        })

    return ds.map_batches(fp, batch_format="pandas")


MD5_FINGERPRINTS_SQL = "SELECT doc_id, md5(text) AS fp FROM documents"

_ROLLING_BASE = 1_000_003
_ROLLING_MOD = (1 << 61) - 1


def rolling_fingerprint(text: str) -> int:
    """Polynomial rolling hash over the token stream (library function;
    the window-free whole-document variant). Used by dedup tooling when
    a cheap non-cryptographic fingerprint suffices."""
    h = 0
    for tok in text.split(" "):
        for b in tok.encode():
            h = (h * _ROLLING_BASE + b) % _ROLLING_MOD
        h = (h * _ROLLING_BASE + 0x1F) % _ROLLING_MOD
    return h


TOKEN_FREQ_K = 100


def token_freq(sf_dir: str) -> ray.data.Dataset:
    """Top-K corpus token frequencies: the pipe-split/row-explode
    operator (M5, drug_central.py:167-195 analog) fused with a partial
    count combiner — the explode never leaves the batch; the shuffle
    moves one row per distinct token per block."""
    from ray.data.aggregate import Sum

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                               columns=["text"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        counts = batch["text"].str.split(" ").explode().value_counts()
        return pd.DataFrame({"token": counts.index.to_numpy(),
                             "n": counts.to_numpy(dtype=np.int64)})

    totals = ds.map_batches(partial, batch_format="pandas") \
               .groupby("token").aggregate(Sum("n", alias_name="n"))
    return totals.sort(["n", "token"], descending=[True, False]) \
                 .limit(TOKEN_FREQ_K)


TOKEN_FREQ_SQL = f"""
SELECT tok AS token, count(*) AS n
FROM documents, unnest(string_split(text, ' ')) AS t(tok)
GROUP BY tok
ORDER BY n DESC, token
LIMIT {TOKEN_FREQ_K}
"""


CLEAN_MIN_TOKENS = 20
CLEAN_MAX_STOP_RATIO = 0.25


def clean_corpus(sf_dir: str) -> ray.data.Dataset:
    """The composed training-data cleaning pipeline — the flow a
    corpus-prep user actually runs, fused into ONE streaming job:

      read -> quality stats -> quality gate -> language gate ->
      exact-dedup keep-first -> retained doc list

    Quality + language run fused in one ``map_batches`` (no
    intermediate materialization); dedup is the only shuffle, on the
    md5 fingerprint with doc_id as the deterministic keep-first order
    key. Output: (doc_id, source, n_tokens) of retained docs."""
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text", "source"])
    lang = LangId()

    def gate(batch: pd.DataFrame) -> pd.DataFrame:
        n_tokens, n_stop = _token_and_stop_counts(batch["text"])
        stop_ratio = n_stop / np.maximum(n_tokens, 1)
        pred = lang(batch)["pred_lang"].to_numpy()
        keep = ((n_tokens >= CLEAN_MIN_TOKENS)
                & (stop_ratio <= CLEAN_MAX_STOP_RATIO)
                & (pred == "en"))
        out = pd.DataFrame({
            "doc_id": batch["doc_id"].to_numpy()[keep],
            "source": batch["source"].to_numpy()[keep],
            "n_tokens": n_tokens[keep],
            "fp": [hashlib.md5(t.encode()).hexdigest()
                   for t in batch["text"].to_numpy()[keep]],
        })
        return out

    gated = ds.map_batches(gate, batch_format="pandas")
    from kg_covid_19_ray.stages.dedup import first_wins
    kept = first_wins(gated, ["fp"], "doc_id")
    return kept.select_columns(["doc_id", "source", "n_tokens"])


# "prediction == en" in marker terms: en has evidence and wins every
# tie (LANG_MARKERS order makes en the tie-break winner)
CLEAN_CORPUS_SQL = f"""
WITH lang AS (
    SELECT doc_id, source, text,
           {_marker_count_sql(LANG_MARKERS[0][1])} AS en_c,
           {_marker_count_sql(LANG_MARKERS[1][1])} AS de_c,
           {_marker_count_sql(LANG_MARKERS[2][1])} AS es_c,
           {_marker_count_sql(LANG_MARKERS[3][1])} AS fr_c
    FROM documents
), gated AS (
    SELECT doc_id, source,
           length(string_split(text, ' ')) AS n_tokens,
           md5(text) AS fp
    FROM lang
    WHERE length(string_split(text, ' ')) >= {CLEAN_MIN_TOKENS}
      AND length(list_filter(string_split(text, ' '),
                 x -> x IN ('{STOPWORDS[0]}', '{STOPWORDS[1]}')))
          / greatest(length(string_split(text, ' ')), 1)::DOUBLE
          <= {CLEAN_MAX_STOP_RATIO}
      AND en_c > 0 AND en_c >= de_c AND en_c >= es_c AND en_c >= fr_c
)
SELECT doc_id, source, n_tokens FROM gated
QUALIFY row_number() OVER (PARTITION BY fp ORDER BY doc_id) = 1
"""


# BPE-ish subword segmentation regex (GPT-2-style, simplified to the
# common RE2/PCRE subset both engines implement identically: no
# lookahead): contraction suffixes, space-prefixed letter runs, digit
# runs, punctuation runs, whitespace runs.
BPE_PATTERN = (r"'(?:s|t|re|ve|m|ll|d)"
               r"| ?[A-Za-z]+"
               r"| ?[0-9]+"
               r"| ?[^A-Za-z0-9\s']+"
               r"|\s+")


def token_count_bpe(sf_dir: str) -> ray.data.Dataset:
    """Tokenizer-cost estimation: per-document BPE-ish token count
    (the pretokenizer split a byte-pair tokenizer would see) next to
    the whitespace count, plus their ratio — the standard
    chars-per-token-style corpus costing signal. One vectorized
    ``str.count`` per batch."""
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def count(batch: pd.DataFrame) -> pd.DataFrame:
        n_bpe = batch["text"].str.count(BPE_PATTERN) \
            .to_numpy(dtype=np.int64)
        n_ws = _tokens(batch["text"]).str.len().to_numpy(dtype=np.int64)
        ratio = n_bpe / np.maximum(n_ws, 1)
        return pd.DataFrame({
            "doc_id": batch["doc_id"],
            "n_bpe_tokens": n_bpe,
            "n_ws_tokens": n_ws,
            "bpe_per_ws": _round_half_away(ratio, 6),
        })

    return ds.map_batches(count, batch_format="pandas")


_BPE_SQL_PATTERN = BPE_PATTERN.replace("'", "''")

TOKEN_COUNT_BPE_SQL = f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{_BPE_SQL_PATTERN}'))
           AS n_bpe_tokens,
       len(string_split(text, ' ')) AS n_ws_tokens,
       round(len(regexp_extract_all(text, '{_BPE_SQL_PATTERN}'))::DOUBLE
             / greatest(len(string_split(text, ' ')), 1), 6)
           AS bpe_per_ws
FROM documents
"""


def text_repetition(sf_dir: str) -> ray.data.Dataset:
    """Token-repetition quality signal (the Gopher-style "fraction of
    duplicate n-grams" family at n=1): per document, total vs distinct
    token counts — highly repetitive machine-generated pages score a
    low distinct ratio. Exact integers; the ratio division is the
    consumer's.

    Vectorized distinct-per-row: explode all tokens with their row
    index, lexsort (row, token-code), and count run starts — zero
    per-row Python (a per-row ``set(tokens)`` loop is the hot-path
    anti-pattern this module already evicted from LangId)."""
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def rep(batch: pd.DataFrame) -> pd.DataFrame:
        toks = _tokens(batch["text"])
        n_tok = toks.str.len().to_numpy(dtype=np.int64)
        flat = toks.explode()
        rows = flat.index.to_numpy(dtype=np.int64)
        codes = pd.factorize(flat.to_numpy(dtype=object))[0]
        order = np.lexsort((codes, rows))
        r, c = rows[order], codes[order]
        new_run = np.empty(len(r), np.bool_)
        if len(r):
            new_run[0] = True
            new_run[1:] = (r[1:] != r[:-1]) | (c[1:] != c[:-1])
        n_distinct = np.bincount(
            r[new_run], minlength=len(batch)).astype(np.int64) \
            if len(r) else np.zeros(len(batch), np.int64)
        return pd.DataFrame({
            "doc_id": batch["doc_id"],
            "n_tokens": n_tok,
            "n_distinct_tokens": n_distinct,
        })

    return ds.map_batches(rep, batch_format="pandas")


TEXT_REPETITION_SQL = """
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       len(list_distinct(string_split(text, ' ')))
           AS n_distinct_tokens
FROM documents
"""


TFIDF_K = 3


def _collect_token_values(ds: "ray.data.Dataset",
                          value_col: str) -> tuple:
    """Driver-side collect of a (token, <value_col>) side table as two
    COLUMNAR arrays via Arrow batches. ``take_all()`` converts every
    row to a Python dict on the driver — measured minutes of
    single-thread CPU at the multi-million-token vocabularies the
    salted 1M-doc bench corpus produces (~3.5M distinct tokens), which
    is pure overhead before the broadcast even happens. Arrow batches
    concat + ``to_pandas``/``to_numpy`` keep the whole collect
    vectorized."""
    import pyarrow as pa
    tabs = [t for t in ds.iter_batches(batch_format="pyarrow")
            if t.num_rows]
    if not tabs:
        return pd.Series([], dtype=object), np.empty(0, np.int64)
    t = pa.concat_tables(tabs)
    return (t.column("token").to_pandas(),
            t.column(value_col).to_numpy(zero_copy_only=False)
            .astype(np.int64, copy=False))


def _broadcast_token_values(tokens, values: np.ndarray):
    """Broadcast a token -> int64 side table. A Python dict in the
    object store is re-DESERIALIZED by every map task (pickle has no
    zero-copy path for dicts — seconds per task at 10^6 entries), so
    when the 64-bit token hashes are collision-free (checked here,
    deterministically per corpus) the table ships as two primitive
    numpy arrays instead — those ARE zero-copy reads from shared
    memory. Falls back to the dict on a hash collision."""
    import ray

    h = pd.util.hash_pandas_object(pd.Series(tokens),
                                   index=False).to_numpy()
    order = np.argsort(h)
    hs = h[order]
    if len(hs) == 0 or bool((hs[1:] != hs[:-1]).all()):
        return ray.put(("hash", hs,
                        np.asarray(values, np.int64)[order]))
    return ray.put(("dict", dict(zip(tokens, np.asarray(values))), None))


def _lookup_token_values(table, tok: pd.Series) -> np.ndarray:
    """Vectorized lookup against a `_broadcast_token_values` table.
    Every queried token must exist (the tables are built from the same
    corpus); a miss raises rather than mis-mapping — on BOTH paths: a
    miss in the dict fallback becomes NaN, and an unchecked
    float->int64 cast would silently yield INT64_MIN garbage
    (round-4 ADVICE)."""
    kind, a, b = table
    if kind == "dict":
        mapped = tok.map(a)
        if mapped.isna().any():
            raise KeyError("token absent from broadcast side table")
        return mapped.to_numpy(np.int64)
    th = pd.util.hash_pandas_object(tok, index=False).to_numpy()
    idx = np.searchsorted(a, th)
    idx = np.minimum(idx, len(a) - 1)
    if not (a[idx] == th).all():
        raise KeyError("token absent from broadcast side table")
    return b[idx]


def _drop_null_text(batch: pd.DataFrame) -> pd.DataFrame:
    """NULL text tokenizes to ZERO tokens — DuckDB's
    ``unnest(string_split(NULL, ' '))`` emits no rows — so the
    tfidf/surprisal explode stages drop null-text rows up front
    instead of fillna('')-ing them into one '' token (round-4 ADVICE:
    the '' token would appear in engine output while being absent
    from the oracle). Empty-string text still yields one '' token on
    both sides."""
    if batch["text"].isna().any():
        return batch[batch["text"].notna()]
    return batch


def _sum_token_counts(partials: ray.data.Dataset,
                      num_buckets: int | None = None,
                      extra_sums: tuple[str, ...] = ()
                      ) -> ray.data.Dataset:
    """Sum per-block (token, n[, *extra_sums]) partials into global
    counts with a hash-bucket exchange + ONE pyarrow group_by per
    bucket. Real corpora have million-token vocabularies (every
    typo/id is a token), where Ray's ``groupby().aggregate(Sum)`` pays
    per-GROUP Python — measured minutes vs seconds on the 1M-doc bench
    corpus (the NOTES.md reduce rule)."""
    from kg_covid_19_ray.stages.dedup import resolve_num_buckets
    num_buckets = resolve_num_buckets(num_buckets)

    def bucketed(batch: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(batch["token"],
                                       index=False).to_numpy()
        return batch.assign(
            __bucket=(h % np.uint64(num_buckets)).astype(np.int64))

    def reduce_bucket(t: pa.Table) -> pa.Table:
        agg = t.group_by(["token"], use_threads=False) \
            .aggregate([("n", "sum")]
                       + [(c, "sum") for c in extra_sums])
        cols = {"token": agg["token"], "n": agg["n_sum"]}
        for c in extra_sums:
            cols[c] = agg[f"{c}_sum"]
        return pa.table(cols)

    return partials.map_batches(bucketed, batch_format="pandas") \
        .groupby("__bucket").map_groups(reduce_bucket,
                                        batch_format="pyarrow")


def _tfidf_join(ds: ray.data.Dataset, freq: ray.data.Dataset,
                n_docs: float,
                num_buckets: int | None = None) -> ray.data.Dataset:
    """tfidf's larger-than-heap plan: per-batch (doc, term, tf)
    combiners meet the df table in token-hash buckets, scores are
    computed in-bucket, and one doc-keyed exchange takes the per-doc
    top-k (union-safe: the cut order is the rounded total order)."""
    from kg_covid_19_ray.stages.dedup import resolve_num_buckets
    num_buckets = resolve_num_buckets(num_buckets)

    def route_tf(batch: pd.DataFrame) -> pd.DataFrame:
        batch = _drop_null_text(batch)
        e = pd.DataFrame({
            "doc_id": batch["doc_id"],
            "term": batch["text"].str.split(" "),
        }).explode("term")
        g = e.groupby(["doc_id", "term"], sort=False) \
             .size().rename("tf").reset_index()
        h = pd.util.hash_pandas_object(g["term"], index=False).to_numpy()
        return g.assign(
            n=np.zeros(len(g), np.int64), kind="t",
            __bucket=(h % np.uint64(num_buckets)).astype(np.int64))

    def route_freq(batch: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(batch["token"],
                                       index=False).to_numpy()
        return pd.DataFrame({
            "doc_id": np.zeros(len(batch), np.int64),
            "term": batch["token"].to_numpy(),
            "tf": np.zeros(len(batch), np.int64),
            "n": batch["n"].to_numpy(np.int64),
            "kind": np.full(len(batch), "f"),
            "__bucket": (h % np.uint64(num_buckets)).astype(np.int64),
        })

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        f = g[g["kind"] == "f"]
        dfs = pd.Series(f["n"].to_numpy(np.int64), index=f["term"])
        t = g[g["kind"] == "t"]
        df_col = t["term"].map(dfs).to_numpy(np.int64)
        sc = _round_half_away(
            t["tf"].to_numpy(np.int64) * np.log(n_docs / df_col), 6)
        h = pd.util.hash_pandas_object(t["doc_id"],
                                       index=False).to_numpy()
        return pd.DataFrame({
            "doc_id": t["doc_id"].to_numpy(np.int64),
            "term": t["term"].to_numpy(),
            "tf": t["tf"].to_numpy(np.int64),
            "df": df_col, "score": sc,
            "__bucket": (h % np.uint64(num_buckets)).astype(np.int64),
        })

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "score", "term"],
                          ascending=[True, False, True],
                          kind="mergesort")
        out = g.groupby("doc_id", sort=False).head(TFIDF_K)
        return out[["doc_id", "term", "tf", "df", "score"]] \
            .reset_index(drop=True)

    both = ds.map_batches(route_tf, batch_format="pandas").union(
        freq.map_batches(route_freq, batch_format="pandas"))
    scored = both.groupby("__bucket").map_groups(
        attach, batch_format="pandas")
    return scored.groupby("__bucket").map_groups(
        topk, batch_format="pandas")


def tfidf_topterms(sf_dir: str,
                   broadcast_max: int | None = None) -> ray.data.Dataset:
    """Per-document top-``TFIDF_K`` characteristic terms (keyword
    extraction / doc characterization): score = tf * ln(N/df), rounded
    half-away at 6dp BEFORE the per-doc cut so the (score desc, term)
    total order is the oracle's (the similarity-suite rounding rule).

    One explode+combine pass builds per-block document-frequency
    partials (a doc lives wholly in one batch, so per-batch
    (doc, token) distinct is globally exact), summed by the bucketed
    pyarrow reduce. Two physical plans behind one semantic (web vocab
    is NOT bounded): df tables up to ``broadcast_max`` tokens are
    broadcast via ``ray.put`` and scoring is one streaming pass;
    larger tables stay distributed through the two bucketed exchanges
    of ``_tfidf_join`` (value-identical; plan-parity pinned in
    tests)."""
    import ray

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def df_partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = _drop_null_text(batch)
        e = pd.DataFrame({
            "doc_id": batch["doc_id"],
            "tok": batch["text"].str.split(" "),
        }).explode("tok").drop_duplicates()
        cnt = e["tok"].value_counts()
        return pd.DataFrame({"token": cnt.index.to_numpy(),
                             "n": cnt.to_numpy(dtype=np.int64)})

    freq_ds = _sum_token_counts(
        ds.map_batches(df_partial, batch_format="pandas")).materialize()
    n_docs = float(ds.count())

    if broadcast_max is None:
        broadcast_max = _env_broadcast_max("KG_RAY_TFIDF_BROADCAST_MAX")
    if freq_ds.count() > broadcast_max:
        return _tfidf_join(ds, freq_ds, n_docs)

    df_tokens, df_ns = _collect_token_values(freq_ds, "n")
    df_ref = _broadcast_token_values(df_tokens, df_ns)

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(df_ref)  # zero-copy shared-memory read (numeric)
        batch = _drop_null_text(batch)
        e = pd.DataFrame({
            "doc_id": batch["doc_id"],
            "term": batch["text"].str.split(" "),
        }).explode("term")
        g = e.groupby(["doc_id", "term"], sort=False) \
             .size().rename("tf").reset_index()
        df_col = _lookup_token_values(m, g["term"])
        sc = _round_half_away(
            g["tf"].to_numpy(np.int64) * np.log(n_docs / df_col), 6)
        g = g.assign(df=df_col, score=sc)
        g = g.sort_values(["doc_id", "score", "term"],
                          ascending=[True, False, True], kind="mergesort")
        out = g.groupby("doc_id", sort=False).head(TFIDF_K)
        return pd.DataFrame({
            "doc_id": out["doc_id"].to_numpy(),
            "term": out["term"].to_numpy(),
            "tf": out["tf"].to_numpy(np.int64),
            "df": out["df"].to_numpy(np.int64),
            "score": out["score"].to_numpy(np.float64),
        })

    return ds.map_batches(score, batch_format="pandas")


TFIDF_TOPTERMS_SQL = f"""
WITH tok AS (
    SELECT doc_id, tok
    FROM documents, unnest(string_split(text, ' ')) AS t(tok)
), tf AS (
    SELECT doc_id, tok, count(*)::BIGINT AS tf
    FROM tok GROUP BY doc_id, tok
), dfreq AS (
    SELECT tok, count(DISTINCT doc_id)::BIGINT AS df
    FROM tok GROUP BY tok
), n AS (SELECT count(*)::DOUBLE AS n FROM documents)
SELECT tf.doc_id, tf.tok AS term, tf.tf, dfreq.df,
       round(tf.tf * ln((SELECT n FROM n) / dfreq.df), 6) AS score
FROM tf JOIN dfreq ON dfreq.tok = tf.tok
QUALIFY row_number() OVER (
    PARTITION BY tf.doc_id
    ORDER BY round(tf.tf * ln((SELECT n FROM n) / dfreq.df), 6) DESC,
             tf.tok) <= {TFIDF_K}
"""


DECON_NGRAM = 5
DECON_BENCH_DOCS = 10  # stand-in eval set: the first N doc_ids


def _doc_ngrams(batch: pd.DataFrame, n: int) -> pd.DataFrame:
    """-> (doc_id, g): every length-``n`` token window per doc,
    duplicates kept (positions, not a set). Fully vectorized: explode
    tokens, then shift-and-concat with run-boundary masking (no
    per-doc Python loop)."""
    e = pd.DataFrame({
        "doc_id": batch["doc_id"],
        "tok": batch["text"].fillna("").str.split(" "),
    }).explode("tok").reset_index(drop=True)
    g = e["tok"].astype(str)
    ok = pd.Series(True, index=e.index)
    for k in range(1, n):
        g = g + " " + e["tok"].shift(-k).astype(str)
        ok &= e["doc_id"].shift(-k).to_numpy() == e["doc_id"].to_numpy()
    return pd.DataFrame({"doc_id": e["doc_id"].to_numpy(),
                         "g": g.to_numpy()})[ok.to_numpy()]


# Bloom plan sizing: bits-per-gram (16 -> ~0.05% fp rate with k=4)
# and hash count. fp's are removed by exact verification, so these
# only tune how much of the corpus survives the prefilter.
_BLOOM_BITS_PER_GRAM = 16
_BLOOM_K = 4
DECON_BROADCAST_MAX = 5_000_000  # bench grams; above -> bloom plan


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mix (public-domain splitmix64 finalizer):
    derives the second hash for double hashing from the first."""
    x = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    x = ((x ^ (x >> np.uint64(30)))
         * np.uint64(0xBF58476D1CE4E5B9)).astype(np.uint64)
    x = ((x ^ (x >> np.uint64(27)))
         * np.uint64(0x94D049BB133111EB)).astype(np.uint64)
    return (x ^ (x >> np.uint64(31))).astype(np.uint64)


def _bloom_positions(grams: pd.Series, bits_log2: int,
                     h1: np.ndarray | None = None) -> np.ndarray:
    """(n, _BLOOM_K) bit positions via double hashing h1 + i*h2.
    ``h1`` lets the caller reuse an existing hash pass (string hashing
    dominates the prefilter cost at corpus scale)."""
    if h1 is None:
        h1 = pd.util.hash_pandas_object(grams, index=False).to_numpy()
    h2 = _splitmix64(h1) | np.uint64(1)  # odd -> full cycle
    i = np.arange(_BLOOM_K, dtype=np.uint64)
    mask = np.uint64((1 << bits_log2) - 1)
    return ((h1[:, None] + i[None, :] * h2[:, None]) & mask)


def _bloom_build(grams: pd.Series) -> tuple[np.ndarray, int]:
    """-> (uint64 word array, bits_log2). Size = next power of two of
    _BLOOM_BITS_PER_GRAM x n_grams (>= 2^16)."""
    n = max(len(grams), 1)
    bits_log2 = max(16, int(np.ceil(np.log2(n * _BLOOM_BITS_PER_GRAM))))
    words = np.zeros(1 << (bits_log2 - 6), dtype=np.uint64)
    pos = _bloom_positions(grams, bits_log2).reshape(-1)
    np.bitwise_or.at(words, (pos >> np.uint64(6)).astype(np.int64),
                     np.uint64(1) << (pos & np.uint64(63)))
    return words, bits_log2


def _bloom_member(words: np.ndarray, bits_log2: int,
                  grams: pd.Series,
                  h1: np.ndarray | None = None) -> np.ndarray:
    pos = _bloom_positions(grams, bits_log2, h1)
    bit = (words[(pos >> np.uint64(6)).astype(np.int64)]
           >> (pos & np.uint64(63))) & np.uint64(1)
    return bit.all(axis=1)


def _decon_bench_grams_ds(sf_dir: str) -> ray.data.Dataset:
    """The benchmark gram set as a DATASET (distinct grams), for the
    bloom plan's exact-verification side — never driver-collected."""
    bench = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
        filter=(pc.field("doc_id") < DECON_BENCH_DOCS))

    def grams(batch: pd.DataFrame) -> pd.DataFrame:
        g = _doc_ngrams(batch, DECON_NGRAM)[["g"]].drop_duplicates()
        return g

    from kg_covid_19_ray.stages.dedup import distinct
    return distinct(bench.map_batches(grams, batch_format="pandas"),
                    ["g"])


def text_decontaminate(sf_dir: str, *,
                       broadcast_max: int | None = None
                       ) -> ray.data.Dataset:
    """Benchmark DECONTAMINATION: per doc, how many of its
    ``DECON_NGRAM``-token windows appear in the benchmark set's
    n-grams (the GPT-3/Llama-style eval-overlap check; a training
    pipeline drops or scrubs docs with hits). The stand-in benchmark
    is the first ``DECON_BENCH_DOCS`` documents — deterministic and
    SQL-reproducible; a real eval set slots in as the same small
    side. Output: one (doc_id, n_hits) row per document (benchmark
    docs self-hit).

    Dual physical plan, routed by benchmark gram count
    (``KG_RAY_DECON_BROADCAST_MAX``): at or below the threshold the
    exact gram set is broadcast via ``ray.put`` and the corpus pass is
    one streaming window scan (no joins). Above it — eval suites too
    large for every worker's heap — a BLOOM prefilter (numeric uint64
    word array, cheap to ship and deserialize) marks candidate
    windows, and only candidates flow through a hash(gram)-bucketed
    exact verification against the distributed bench-gram table, so
    false positives are removed and the plans are value-identical
    (plan parity pinned by test)."""
    import os

    import ray

    import pyarrow.dataset as pads
    bench_tbl = pads.dataset(f"{sf_dir}/documents.parquet").to_table(
        columns=["doc_id", "text"],
        filter=pads.field("doc_id") < DECON_BENCH_DOCS)
    bench_gram_series = _doc_ngrams(
        bench_tbl.to_pandas(), DECON_NGRAM)["g"].drop_duplicates()
    if broadcast_max is None:
        broadcast_max = int(os.environ.get("KG_RAY_DECON_BROADCAST_MAX")
                            or DECON_BROADCAST_MAX)

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    if len(bench_gram_series) > broadcast_max:
        return _decontaminate_bloom(sf_dir, ds, bench_gram_series)

    bench_ref = ray.put(frozenset(bench_gram_series))

    def hits(batch: pd.DataFrame) -> pd.DataFrame:
        bench = ray.get(bench_ref)
        grams = _doc_ngrams(batch, DECON_NGRAM)
        hit = grams[grams["g"].isin(bench)]
        n = hit.groupby("doc_id", sort=False).size()
        out = n.reindex(batch["doc_id"], fill_value=0)
        return pd.DataFrame({"doc_id": batch["doc_id"].to_numpy(),
                             "n_hits": out.to_numpy(np.int64)})

    return ds.map_batches(hits, batch_format="pandas")


def _decontaminate_bloom(sf_dir: str, ds: ray.data.Dataset,
                         bench_gram_series: pd.Series
                         ) -> ray.data.Dataset:
    """The larger-than-heap plan: Bloom prefilter + exact verify.
    NOTE the bloom ARRAY is built driver-side from the bench gram
    stream (one pass; only the fixed-size bit array is retained and
    broadcast — at 16 bits/gram a 1B-gram eval suite is a 2GB array,
    sharded ``ray.put`` territory but never a Python set). Candidate
    (doc_id, gram) windows — true hits plus the bloom's ~0.05% false
    positives — are verified exactly against the distributed bench
    gram table in hash(gram) buckets; per-doc counts finish with a
    combiner + bucketed reduce; docs with zero candidates are restored
    via a left reindex against the corpus doc_ids."""
    import ray

    from kg_covid_19_ray.stages.dedup import resolve_num_buckets
    words, bits_log2 = _bloom_build(bench_gram_series)
    bloom_ref = ray.put(words)
    num_buckets = resolve_num_buckets()

    def candidates(batch: pd.DataFrame) -> pd.DataFrame:
        w = ray.get(bloom_ref)
        grams = _doc_ngrams(batch, DECON_NGRAM)
        # ONE string-hash pass: h1 drives the bloom probes AND the
        # bucket routing of the survivors (string hashing dominates
        # the prefilter at corpus scale)
        h1 = pd.util.hash_pandas_object(grams["g"],
                                        index=False).to_numpy()
        member = _bloom_member(w, bits_log2, grams["g"], h1)
        cand = grams[member]
        return pd.DataFrame({
            "doc_id": cand["doc_id"].to_numpy(),
            "g": cand["g"].to_numpy(),
            "side": np.int8(0),
            "__bucket": (h1[member]
                         % np.uint64(num_buckets)).astype(np.int64),
        })

    def bench_side(batch: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(batch["g"],
                                       index=False).to_numpy()
        return pd.DataFrame({
            "doc_id": np.full(len(batch), -1, np.int64),
            "g": batch["g"],
            "side": np.int8(1),
            "__bucket": (h % np.uint64(num_buckets)).astype(np.int64),
        })

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        bench = set(g.loc[g["side"] == 1, "g"])
        rows = g[g["side"] == 0]
        hit = rows[rows["g"].isin(bench)]
        n = hit.groupby("doc_id", sort=False).size().reset_index(
            name="n_hits")
        n["n_hits"] = n["n_hits"].astype(np.int64)
        return n

    routed = ds.map_batches(candidates, batch_format="pandas").union(
        _decon_bench_grams_ds(sf_dir).map_batches(
            bench_side, batch_format="pandas"))
    partial = routed.groupby("__bucket").map_groups(
        verify, batch_format="pandas")

    # per-doc sum across buckets + restore zero-hit docs
    def add_doc_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(batch["doc_id"],
                                       index=False).to_numpy()
        batch = batch.copy()
        batch["__bucket"] = (h % np.uint64(num_buckets)).astype(np.int64)
        return batch

    def reduce_doc(t: pa.Table) -> pa.Table:
        agg = t.group_by("doc_id", use_threads=False).aggregate(
            [("n_hits", "sum")])
        return pa.table({"doc_id": agg["doc_id"],
                         "n_hits": pc.cast(agg["n_hits_sum"],
                                           pa.int64())})

    counts = partial.map_batches(add_doc_bucket, batch_format="pandas") \
        .groupby("__bucket").map_groups(reduce_doc,
                                        batch_format="pyarrow")

    def zero_fill(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": batch["doc_id"].astype(np.int64),
                             "side": np.int8(0)})

    # left join counts onto the full doc_id set via one more bucketed
    # co-route (docs without candidates must appear with n_hits = 0)
    def route_counts(batch: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(batch["doc_id"],
                                       index=False).to_numpy()
        return pd.DataFrame({
            "doc_id": batch["doc_id"].astype(np.int64),
            "n_hits": batch["n_hits"].astype(np.int64),
            "__bucket": (h % np.uint64(num_buckets)).astype(np.int64),
        })

    def route_docs(batch: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(batch["doc_id"],
                                       index=False).to_numpy()
        return pd.DataFrame({
            "doc_id": batch["doc_id"].astype(np.int64),
            "n_hits": np.full(len(batch), -1, np.int64),  # marker
            "__bucket": (h % np.uint64(num_buckets)).astype(np.int64),
        })

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        counts_g = g[g["n_hits"] >= 0]
        docs_g = g.loc[g["n_hits"] < 0, ["doc_id"]]
        m = dict(zip(counts_g["doc_id"], counts_g["n_hits"]))
        out = docs_g["doc_id"].map(m).fillna(0).astype(np.int64)
        return pd.DataFrame({"doc_id": docs_g["doc_id"].to_numpy(),
                             "n_hits": out.to_numpy()})

    all_docs = read_parquet_clean(f"{sf_dir}/documents.parquet",
                                  columns=["doc_id"])
    merged = counts.map_batches(route_counts, batch_format="pandas") \
        .union(all_docs.map_batches(route_docs, batch_format="pandas"))
    return merged.groupby("__bucket").map_groups(
        finish, batch_format="pandas")


TEXT_DECONTAMINATE_SQL = f"""
WITH docs AS (
    SELECT doc_id, string_split(text, ' ') AS ts FROM documents
), pos AS (
    SELECT doc_id, ts, unnest(range(len(ts) - {DECON_NGRAM - 1})) AS i
    FROM docs WHERE len(ts) >= {DECON_NGRAM}
), grams AS (
    SELECT doc_id,
           ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3] || ' ' ||
           ts[i+4] || ' ' || ts[i+5] AS g
    FROM pos
), bench AS (
    SELECT DISTINCT g FROM grams WHERE doc_id < {DECON_BENCH_DOCS}
), hit AS (
    SELECT grams.doc_id, count(*)::BIGINT AS n_hits
    FROM grams JOIN bench USING (g) GROUP BY grams.doc_id
)
SELECT d.doc_id, coalesce(h.n_hits, 0)::BIGINT AS n_hits
FROM documents d LEFT JOIN hit h ON h.doc_id = d.doc_id
"""


# Above this many distinct tokens a token side table no longer belongs
# in every worker's heap: tfidf/surprisal switch from the ray.put
# broadcast to bucketed exchanges. Each operator has its own env knob
# (KG_RAY_TFIDF_BROADCAST_MAX / KG_RAY_SURPRISAL_BROADCAST_MAX) with a
# shared KG_RAY_TEXT_BROADCAST_MAX fallback — round-4 ADVICE: tfidf
# borrowing the surprisal-specific knob silently switched both plans.
SURPRISAL_BROADCAST_MAX = 4_000_000


def _env_broadcast_max(specific_env: str) -> int:
    import os
    v = os.environ.get(specific_env) \
        or os.environ.get("KG_RAY_TEXT_BROADCAST_MAX")
    return int(v) if v else SURPRISAL_BROADCAST_MAX


def _lm_surprisal_join(ds: ray.data.Dataset,
                       freq: ray.data.Dataset, total: float,
                       num_buckets: int | None = None) -> ray.data.Dataset:
    """The larger-than-heap plan: exploded (doc_id, token) rows meet
    the unigram table in token-hash buckets (the merge_kg._subst
    bucketed-merge shape — never Dataset.join); each bucket attaches
    the per-token micro-nat surprisal and pre-sums per doc (combiner),
    then one doc-keyed exchange finishes the exact int64 reduce.
    Value-identical to the broadcast plan (same per-token rounding,
    integer sums)."""
    from kg_covid_19_ray.stages.dedup import resolve_num_buckets
    num_buckets = resolve_num_buckets(num_buckets)

    def route_tokens(batch: pd.DataFrame) -> pd.DataFrame:
        batch = _drop_null_text(batch)
        e = pd.DataFrame({
            "doc_id": batch["doc_id"],
            "tok": batch["text"].str.split(" "),
        }).explode("tok")
        h = pd.util.hash_pandas_object(e["tok"], index=False).to_numpy()
        return pd.DataFrame({
            "doc_id": e["doc_id"].to_numpy(np.int64),
            "tok": e["tok"].to_numpy(),
            "n": np.zeros(len(e), np.int64),
            "kind": np.full(len(e), "t"),
            "__bucket": (h % np.uint64(num_buckets)).astype(np.int64),
        })

    def route_freq(batch: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(batch["token"],
                                       index=False).to_numpy()
        return pd.DataFrame({
            "doc_id": np.zeros(len(batch), np.int64),
            "tok": batch["token"].to_numpy(),
            "n": batch["n"].to_numpy(np.int64),
            "kind": np.full(len(batch), "f"),
            "__bucket": (h % np.uint64(num_buckets)).astype(np.int64),
        })

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        f = g[g["kind"] == "f"]
        s = pd.Series(
            np.floor(np.log(total / f["n"].to_numpy(np.int64))
                     * 1e6 + 0.5).astype(np.int64),
            index=f["tok"])
        t = g[g["kind"] == "t"]
        per_tok = t["tok"].map(s).to_numpy(np.int64)
        part = pd.DataFrame({"doc_id": t["doc_id"].to_numpy(),
                             "s": per_tok}) \
            .groupby("doc_id", sort=False)["s"].agg(["count", "sum"]) \
            .reset_index()
        h = pd.util.hash_pandas_object(part["doc_id"],
                                       index=False).to_numpy()
        return pd.DataFrame({
            "doc_id": part["doc_id"].to_numpy(np.int64),
            "cnt": part["count"].to_numpy(np.int64),
            "s": part["sum"].to_numpy(np.int64),
            "__bucket": (h % np.uint64(num_buckets)).astype(np.int64),
        })

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("doc_id", sort=False)[["cnt", "s"]].sum() \
            .reset_index()
        return pd.DataFrame({
            "doc_id": out["doc_id"].to_numpy(np.int64),
            "n_tokens": out["cnt"].to_numpy(np.int64),
            "surprisal_fp": out["s"].to_numpy(np.int64),
        })

    both = ds.map_batches(route_tokens, batch_format="pandas").union(
        freq.map_batches(route_freq, batch_format="pandas"))
    partials = both.groupby("__bucket").map_groups(
        attach, batch_format="pandas")
    return partials.groupby("__bucket").map_groups(
        finish, batch_format="pandas")


def text_lm_surprisal(sf_dir: str,
                      broadcast_max: int | None = None
                      ) -> ray.data.Dataset:
    """CCNet-style unigram-LM quality score: per document, the summed
    token surprisal ``sum(ln(T / n_tok))`` under the corpus's own
    unigram model (high = rare-token-heavy = candidate junk; a real
    KenLM slots in as the same broadcast side table). EXACT int64
    fixed-point: each token's surprisal is rounded half-away to
    micro-nats ONCE, then summed with integer addition — associative
    and order-independent, so the result is bit-identical under any
    partitioning and the DuckDB oracle can value-hash it (a float
    mean would diverge in the last ulp per summation order — the
    pagerank arithmetic rule applied to LM scoring).

    Two physical plans behind one semantic (the remap_node_identifier
    pattern — web vocab is NOT bounded, every id/typo is a token):
    unigram tables up to ``broadcast_max`` distinct tokens are
    collected and broadcast via ``ray.put`` (~50MB per 1M tokens), and
    scoring is one streaming pass; larger tables stay distributed and
    score through two bucketed exchanges (``_lm_surprisal_join``).
    Both paths share the exact-int arithmetic, so they are
    value-identical (pinned by test_lm_surprisal_join_plan_matches)."""
    import ray

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def tok_partial(batch: pd.DataFrame) -> pd.DataFrame:
        counts = _drop_null_text(batch)["text"].str.split(" ") \
            .explode().value_counts()
        return pd.DataFrame({"token": counts.index.to_numpy(),
                             "n": counts.to_numpy(dtype=np.int64)})

    freq_ds = _sum_token_counts(
        ds.map_batches(tok_partial, batch_format="pandas")).materialize()
    totals = freq_ds.map_batches(
        lambda b: pd.DataFrame({"t": [int(b["n"].sum())]}),
        batch_format="pandas").take_all()
    total = float(sum(r["t"] for r in totals))

    if broadcast_max is None:
        broadcast_max = _env_broadcast_max(
            "KG_RAY_SURPRISAL_BROADCAST_MAX")
    if freq_ds.count() > broadcast_max:
        return _lm_surprisal_join(ds, freq_ds, total)

    freq_tokens, counts = _collect_token_values(freq_ds, "n")
    surp_ref = _broadcast_token_values(
        freq_tokens,
        np.floor(np.log(total / counts) * 1e6 + 0.5).astype(np.int64))

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(surp_ref)
        batch = _drop_null_text(batch)
        e = pd.DataFrame({
            "doc_id": batch["doc_id"],
            "tok": batch["text"].str.split(" "),
        }).explode("tok")
        e["s"] = _lookup_token_values(m, e["tok"])
        g = e.groupby("doc_id", sort=False)["s"].agg(["count", "sum"])
        g = g.reindex(batch["doc_id"])
        return pd.DataFrame({
            "doc_id": batch["doc_id"].to_numpy(),
            "n_tokens": g["count"].to_numpy(np.int64),
            "surprisal_fp": g["sum"].to_numpy(np.int64),
        })

    return ds.map_batches(score, batch_format="pandas")


IMPORTANCE_TOPK = 100


def _round_signed_i64(x: np.ndarray) -> np.ndarray:
    """DuckDB ``round()`` is half-AWAY-FROM-ZERO; ``floor(x + 0.5)``
    (the surprisal form, valid there because surprisals are >= 0)
    differs on negative halves, and importance log-ratios ARE signed —
    the sign-aware form keeps the int64 oracle exact. Distinct name:
    the module-level two-arg ``_round_half_away(arr, ndigits)`` above
    is resolved at call time inside map_batches closures, so reusing
    that name here would shadow it for every other kernel."""
    return np.where(x >= 0.0, np.floor(x + 0.5),
                    np.ceil(x - 0.5)).astype(np.int64)


def _importance_join(ds: ray.data.Dataset, lam_ds: ray.data.Dataset,
                     num_buckets: int | None = None) -> ray.data.Dataset:
    """Larger-than-heap plan: exploded (doc_id, token) rows meet the
    precomputed per-token lambda table in token-hash buckets (the
    _lm_surprisal_join shape, simpler because the side rows already
    carry their final int64 value), pre-sum per doc (combiner), then
    one doc-keyed exchange finishes the exact reduce."""
    from kg_covid_19_ray.stages.dedup import resolve_num_buckets
    num_buckets = resolve_num_buckets(num_buckets)

    def route_tokens(batch: pd.DataFrame) -> pd.DataFrame:
        batch = _drop_null_text(batch)
        e = pd.DataFrame({
            "doc_id": batch["doc_id"],
            "tok": batch["text"].str.split(" "),
        }).explode("tok")
        h = pd.util.hash_pandas_object(e["tok"], index=False).to_numpy()
        return pd.DataFrame({
            "doc_id": e["doc_id"].to_numpy(np.int64),
            "tok": e["tok"].to_numpy(),
            "v": np.zeros(len(e), np.int64),
            "kind": np.full(len(e), "t"),
            "__bucket": (h % np.uint64(num_buckets)).astype(np.int64),
        })

    def route_lam(batch: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(batch["token"],
                                       index=False).to_numpy()
        return pd.DataFrame({
            "doc_id": np.zeros(len(batch), np.int64),
            "tok": batch["token"].to_numpy(),
            "v": batch["lam"].to_numpy(np.int64),
            "kind": np.full(len(batch), "f"),
            "__bucket": (h % np.uint64(num_buckets)).astype(np.int64),
        })

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        f = g[g["kind"] == "f"]
        s = pd.Series(f["v"].to_numpy(np.int64), index=f["tok"])
        t = g[g["kind"] == "t"]
        per_tok = t["tok"].map(s).to_numpy(np.int64)
        part = pd.DataFrame({"doc_id": t["doc_id"].to_numpy(),
                             "s": per_tok}) \
            .groupby("doc_id", sort=False)["s"].agg(["count", "sum"]) \
            .reset_index()
        h = pd.util.hash_pandas_object(part["doc_id"],
                                       index=False).to_numpy()
        return pd.DataFrame({
            "doc_id": part["doc_id"].to_numpy(np.int64),
            "cnt": part["count"].to_numpy(np.int64),
            "s": part["sum"].to_numpy(np.int64),
            "__bucket": (h % np.uint64(num_buckets)).astype(np.int64),
        })

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("doc_id", sort=False)[["cnt", "s"]].sum() \
            .reset_index()
        return pd.DataFrame({
            "doc_id": out["doc_id"].to_numpy(np.int64),
            "n_tokens": out["cnt"].to_numpy(np.int64),
            "importance_fp": out["s"].to_numpy(np.int64),
        })

    both = ds.map_batches(route_tokens, batch_format="pandas").union(
        lam_ds.map_batches(route_lam, batch_format="pandas"))
    partials = both.groupby("__bucket").map_groups(
        attach, batch_format="pandas")
    return partials.groupby("__bucket").map_groups(
        finish, batch_format="pandas")


def text_importance_sample(sf_dir: str, *,
                           target_col: str = "lang",
                           target_val: str = "en",
                           topk: int = IMPORTANCE_TOPK,
                           broadcast_max: int | None = None
                           ) -> ray.data.Dataset:
    """DSIR-style importance sampling (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling"): score
    every document by the log-likelihood RATIO of a target-domain
    unigram LM (here: docs with ``target_col == target_val``,
    add-one-smoothed) over the raw-corpus unigram LM, and keep the
    top-``topk`` — the cheap, deterministic skeleton of "pick web
    pages that look like the domain you care about". Per-token

        lambda(tok) = round((ln((n_t+1)/(T_t+V)) - ln(n/T_r)) * 1e6)

    is fixed to int64 micro-nats ONCE and summed with integer addition
    (the pagerank/surprisal arithmetic rule), so the score is
    bit-identical under any partitioning and the DuckDB oracle can
    value-hash it. Both unigram models come from ONE corpus pass
    (per-batch value_counts carrying an is-target sum).

    Plans: the (token, lambda) side table broadcasts below
    ``broadcast_max`` (``KG_RAY_IMPORTANCE_BROADCAST_MAX``, sharing
    the zero-copy numeric side-table transport); above it the scoring
    runs through token-hash-bucketed exchanges (``_importance_join``)
    — web vocabularies are unbounded, same reasoning as surprisal.
    Selection is a per-batch partial top-k, then a single tiny final
    reduce over <= blocks x topk rows (never a full sort).

    Output: (doc_id, n_tokens, importance_fp), ties at the boundary
    broken by doc_id ascending — fully deterministic."""
    import ray

    ds = read_parquet_clean(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", target_col])

    def tok_partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = _drop_null_text(batch)
        e = pd.DataFrame({
            "tok": batch["text"].str.split(" "),
            "is_t": (batch[target_col] == target_val)
            .to_numpy(np.int64),
        }).explode("tok")
        g = e.groupby("tok", sort=False)["is_t"].agg(["size", "sum"])
        return pd.DataFrame({
            "token": g.index.to_numpy(),
            "n": g["size"].to_numpy(np.int64),
            "n_t": g["sum"].to_numpy(np.int64),
        })

    freq_ds = _sum_token_counts(
        ds.map_batches(tok_partial, batch_format="pandas"),
        extra_sums=("n_t",)).materialize()
    tot_rows = freq_ds.map_batches(
        lambda b: pd.DataFrame({"t": [int(b["n"].sum())],
                                "tt": [int(b["n_t"].sum())],
                                "v": [len(b)]}),
        batch_format="pandas").take_all()
    t_raw = float(sum(r["t"] for r in tot_rows))
    t_tgt = float(sum(r["tt"] for r in tot_rows))
    vocab = float(sum(r["v"] for r in tot_rows))

    def lam_batch(batch: pd.DataFrame) -> pd.DataFrame:
        n = batch["n"].to_numpy(np.int64)
        n_t = batch["n_t"].to_numpy(np.int64)
        lam = (np.log((n_t + 1).astype(np.float64) / (t_tgt + vocab))
               - np.log(n.astype(np.float64) / t_raw))
        return pd.DataFrame({"token": batch["token"].to_numpy(),
                             "lam": _round_signed_i64(lam * 1e6)})

    if broadcast_max is None:
        broadcast_max = _env_broadcast_max(
            "KG_RAY_IMPORTANCE_BROADCAST_MAX")

    body = ds.select_columns(["doc_id", "text"])
    if freq_ds.count() > broadcast_max:
        scored = _importance_join(
            body, freq_ds.map_batches(lam_batch, batch_format="pandas"))
    else:
        lam_tokens, lam_vals = _collect_token_values(
            freq_ds.map_batches(lam_batch, batch_format="pandas"),
            "lam")
        lam_ref = _broadcast_token_values(lam_tokens, lam_vals)

        def score(batch: pd.DataFrame) -> pd.DataFrame:
            m = ray.get(lam_ref)
            batch = _drop_null_text(batch)
            e = pd.DataFrame({
                "doc_id": batch["doc_id"],
                "tok": batch["text"].str.split(" "),
            }).explode("tok")
            e["s"] = _lookup_token_values(m, e["tok"])
            g = e.groupby("doc_id", sort=False)["s"] \
                .agg(["count", "sum"]).reindex(batch["doc_id"])
            return pd.DataFrame({
                "doc_id": batch["doc_id"].to_numpy(),
                "n_tokens": g["count"].to_numpy(np.int64),
                "importance_fp": g["sum"].to_numpy(np.int64),
            })

        scored = body.map_batches(score, batch_format="pandas")

    def partial_topk(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.sort_values(["importance_fp", "doc_id"],
                                 ascending=[False, True]).head(topk)

    def final_topk(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.sort_values(["importance_fp", "doc_id"],
                                 ascending=[False, True]).head(topk)

    return scored.map_batches(partial_topk, batch_format="pandas") \
        .repartition(1) \
        .map_batches(final_topk, batch_format="pandas")


def _importance_sql(target_col: str = "lang", target_val: str = "en",
                    topk: int = IMPORTANCE_TOPK) -> str:
    return f"""
WITH tok AS (
    SELECT doc_id, tok, {target_col}
    FROM documents, unnest(string_split(text, ' ')) AS t(tok)
), freq AS (
    SELECT tok, count(*)::BIGINT AS n,
           sum(CASE WHEN {target_col} = '{target_val}'
               THEN 1 ELSE 0 END)::BIGINT AS n_t
    FROM tok GROUP BY tok
), tots AS (
    SELECT sum(n)::DOUBLE AS tr, sum(n_t)::DOUBLE AS tt,
           count(*)::DOUBLE AS v
    FROM freq
), lam AS (
    SELECT tok,
           round((ln((n_t + 1)::DOUBLE / (tt + v))
                  - ln(n::DOUBLE / tr)) * 1e6)::BIGINT AS l
    FROM freq, tots
)
SELECT tok.doc_id, count(*)::BIGINT AS n_tokens,
       sum(lam.l)::BIGINT AS importance_fp
FROM tok JOIN lam USING (tok)
GROUP BY tok.doc_id
ORDER BY importance_fp DESC, doc_id ASC
LIMIT {topk}
"""


TEXT_IMPORTANCE_SQL = _importance_sql()


TEXT_LM_SURPRISAL_SQL = """
WITH tok AS (
    SELECT doc_id, tok
    FROM documents, unnest(string_split(text, ' ')) AS t(tok)
), freq AS (
    SELECT tok, count(*)::BIGINT AS n FROM tok GROUP BY tok
), tot AS (SELECT count(*)::DOUBLE AS t FROM tok)
SELECT tok.doc_id, count(*)::BIGINT AS n_tokens,
       sum(round(ln((SELECT t FROM tot) / freq.n) * 1e6)::BIGINT)::BIGINT
           AS surprisal_fp
FROM tok JOIN freq USING (tok)
GROUP BY tok.doc_id
"""


# ------------------------------------------ quality percentile


def _mean_surprisal_batch(batch: pd.DataFrame) -> pd.DataFrame:
    s = batch["surprisal_fp"].to_numpy(np.int64)
    n = batch["n_tokens"].to_numpy(np.int64)
    return pd.DataFrame({
        "doc_id": batch["doc_id"].to_numpy(np.int64),
        "mean_surprisal_fp": _round_signed_i64(s / n),
    })


def _mean_hist_partial(batch: pd.DataFrame) -> pd.DataFrame:
    counts = batch["mean_surprisal_fp"].value_counts()
    return pd.DataFrame({"token": counts.index.to_numpy(np.int64),
                         "n": counts.to_numpy(np.int64)})


def text_quality_percentile(sf_dir: str,
                            broadcast_max: int | None = None
                            ) -> ray.data.Dataset:
    """CCNet-style quality terciles (Wenzek et al. 2020: split a crawl
    corpus into head/middle/tail by per-document LM perplexity and
    keep the head). Per document: mean token surprisal in micro-nats
    (exact int64, from text_lm_surprisal's unigram LM — a real KenLM
    slots into the same side table), its percent_rank over the corpus,
    and the tercile bucket; LOW mean surprisal = common-token-heavy =
    'head'.

    Shape at scale: the per-doc (doc_id, mean) table is 16 bytes/doc,
    materialized once and streamed twice (histogram pass + rank pass).
    The histogram is the _sum_token_counts bucketed combiner reduce
    keyed by the int64 score, and its OUTPUT is bounded by the score's
    VALUE RANGE — mean micro-nats per token <= ln(total_tokens)*1e6,
    ~4e7 distinct values no matter how many documents exist — so the
    driver-side cumulative step is corpus-size-independent. The
    (sorted scores, ranks-below) table broadcasts as ONE 2xK int64
    numpy array (zero-copy shared-memory reads per task, the
    _broadcast_token_values rule) and each batch resolves ranks with
    np.searchsorted; no per-doc exchange beyond surprisal's own.

    Oracle exactness: percent_rank = (count strictly below) / (N - 1)
    is one correctly-rounded IEEE division of the same integers DuckDB
    divides, and the tercile cut compares the UNROUNDED rank against
    1.0/3.0 and 2.0/3.0 (identical doubles on both sides), so bucket
    labels value-hash exactly. broadcast_max forwards to
    text_lm_surprisal's dual-plan router. Engine-added capability:
    the reference has no corpus-relative scoring."""
    import ray

    mean_ds = text_lm_surprisal(sf_dir, broadcast_max=broadcast_max) \
        .map_batches(_mean_surprisal_batch, batch_format="pandas") \
        .materialize()

    hist = _sum_token_counts(
        mean_ds.map_batches(_mean_hist_partial, batch_format="pandas"))
    scores, counts = _collect_token_values(hist, "n")
    u = scores.to_numpy().astype(np.int64, copy=False)
    order = np.argsort(u, kind="stable")
    u, c = u[order], counts[order]
    # empty corpus: cumsum()[:-1] is shape (0,) but the [0] seed makes
    # below shape (1,) — keep both arrays the same length for stack
    below = (np.concatenate(([0], np.cumsum(c)[:-1])) if c.size
             else np.empty(0)).astype(np.int64)
    n_docs = int(c.sum())
    rank_ref = ray.put(np.stack([u, below]))

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(rank_ref)  # zero-copy shared-memory read
        s = batch["mean_surprisal_fp"].to_numpy(np.int64)
        blw = m[1][np.searchsorted(m[0], s)]
        pr = (blw / (n_docs - 1) if n_docs > 1
              else np.zeros(len(s), np.float64))
        return pd.DataFrame({
            "doc_id": batch["doc_id"].to_numpy(np.int64),
            "mean_surprisal_fp": s,
            "pct_rank": _round_half_away(pr, 6),
            "bucket": np.where(pr < 1.0 / 3.0, "head",
                               np.where(pr < 2.0 / 3.0, "middle",
                                        "tail")),
        })

    return mean_ds.map_batches(finish, batch_format="pandas")


TEXT_QUALITY_PCT_SQL = """
WITH tok AS (
    SELECT doc_id, tok
    FROM documents, unnest(string_split(text, ' ')) AS t(tok)
), freq AS (
    SELECT tok, count(*)::BIGINT AS n FROM tok GROUP BY tok
), tot AS (SELECT count(*)::DOUBLE AS t FROM tok
), s AS (
    SELECT tok.doc_id, count(*)::BIGINT AS n_tokens,
           sum(round(ln((SELECT t FROM tot) / freq.n)
                     * 1e6)::BIGINT)::BIGINT AS surprisal_fp
    FROM tok JOIN freq USING (tok)
    GROUP BY tok.doc_id
), r AS (
    SELECT doc_id,
           round(surprisal_fp / n_tokens::DOUBLE)::BIGINT
               AS mean_surprisal_fp
    FROM s
), p AS (
    SELECT doc_id, mean_surprisal_fp,
           percent_rank() OVER (ORDER BY mean_surprisal_fp) AS pr
    FROM r
)
SELECT doc_id, mean_surprisal_fp,
       round(pr, 6) AS pct_rank,
       CASE WHEN pr < 1.0/3.0 THEN 'head'
            WHEN pr < 2.0/3.0 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM p
"""


REGISTRY = {
    "text_stats": (text_stats, TEXT_STATS_SQL),
    "text_tfidf_topterms": (tfidf_topterms, TFIDF_TOPTERMS_SQL),
    "text_decontaminate": (text_decontaminate, TEXT_DECONTAMINATE_SQL),
    "text_lm_surprisal": (text_lm_surprisal, TEXT_LM_SURPRISAL_SQL),
    "text_token_bpe": (token_count_bpe, TOKEN_COUNT_BPE_SQL),
    "text_langid": (text_langid, TEXT_LANGID_SQL),
    "text_fingerprint": (md5_fingerprints, MD5_FINGERPRINTS_SQL),
    "text_token_freq": (token_freq, TOKEN_FREQ_SQL),
    "text_clean_corpus": (clean_corpus, CLEAN_CORPUS_SQL),
    "text_repetition": (text_repetition, TEXT_REPETITION_SQL),
    "text_importance_sample": (text_importance_sample,
                               TEXT_IMPORTANCE_SQL),
    "text_quality_percentile": (text_quality_percentile,
                                TEXT_QUALITY_PCT_SQL),
}
