"""Semantic tests for the training-data operator suites (textops,
dedup_ops, similarity): planted near-duplicates must be found, sketches
must be deterministic, the LSH ANN must recall exact-top-k neighbors
for planted high-cosine vectors."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

from kg_covid_19_ray.pipelines import dedup_ops, similarity, textops


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory) -> str:
    """A tiny corpus with planted exact dups, near-dups and distinct
    docs, plus embeddings with planted high-cosine neighbors."""
    d = tmp_path_factory.mktemp("planted")
    base = ("the quick brown fox jumps over the lazy dog and runs far "
            "away into the deep green forest tonight").split(" ")
    docs = {
        0: " ".join(base),
        1: " ".join(base),                       # exact dup of 0
        2: " ".join(base[:-1] + ["yesterday"]),  # near dup of 0
        3: "completely different content about databases and queries",
        4: "unrelated text mentioning graphs nodes edges and rays",
    }
    pd.DataFrame({
        "doc_id": list(docs),
        "text": list(docs.values()),
        "lang": "en",
        "source": "s0",
        "n_chars": [len(t) for t in docs.values()],
    }).to_parquet(os.path.join(d, "documents.parquet"))

    rng = np.random.RandomState(0)
    vecs = rng.standard_normal((20, 16)).astype(np.float32)
    vecs[1] = vecs[0] + 0.01 * rng.standard_normal(16)  # ~1.0 cosine
    vecs[2] = vecs[0] * 2.5                             # exactly 1.0
    pd.DataFrame({
        "vec_id": np.arange(20, dtype=np.int64),
        "embedding": [v for v in vecs],
        "label": np.zeros(20, dtype=np.int32),
    }).to_parquet(os.path.join(d, "embeddings.parquet"))
    return str(d)


def test_exact_dedup_groups_planted_dup(ray_session, planted_dir):
    out = dedup_ops.exact_dedup(planted_dir).to_pandas()
    assert len(out) == 4  # 5 docs, one exact-dup pair
    dup = out[out["n_docs"] == 2]
    assert len(dup) == 1 and dup.iloc[0]["keep_doc_id"] == 0


def test_minhash_finds_planted_near_dup(ray_session, planted_dir):
    out = dedup_ops.minhash_near_dups(planted_dir, threshold=0.5).to_pandas()
    pairs = set(zip(out["doc_a"], out["doc_b"]))
    assert (0, 1) in pairs  # exact dup -> jaccard 1.0
    assert (0, 2) in pairs and (1, 2) in pairs  # one-shingle change
    assert all(a < b for a, b in pairs)
    got = out[(out["doc_a"] == 0) & (out["doc_b"] == 1)]["jaccard"].iloc[0]
    assert got == 1.0


def test_simhash_identical_docs_hamming_zero(ray_session, planted_dir):
    out = dedup_ops.simhash_near_dups(planted_dir).to_pandas()
    row = out[(out["doc_a"] == 0) & (out["doc_b"] == 1)]
    assert len(row) == 1 and row.iloc[0]["hamming"] == 0
    # each qualifying pair reported once despite multi-segment collisions
    assert not out.duplicated(["doc_a", "doc_b"]).any()


def test_simhash64_deterministic():
    t = "alpha beta gamma delta"
    assert dedup_ops.simhash64(t) == dedup_ops.simhash64(t, cache={})
    assert 0 <= dedup_ops.simhash64(t) < (1 << 64)
    # near doc differs in few bits, unrelated doc in many
    near = dedup_ops.simhash64("alpha beta gamma epsilon")
    far = dedup_ops.simhash64("totally unrelated words here now")
    ham = lambda a, b: bin(a ^ b).count("1")
    assert ham(dedup_ops.simhash64(t), near) < ham(dedup_ops.simhash64(t), far)


def test_rolling_fingerprint_deterministic():
    assert (textops.rolling_fingerprint("a b c")
            == textops.rolling_fingerprint("a b c"))
    assert (textops.rolling_fingerprint("a b c")
            != textops.rolling_fingerprint("a b d"))


def test_ann_bruteforce_planted_neighbors(ray_session, planted_dir):
    out = similarity.ann_bruteforce(planted_dir).to_pandas()
    # 16 queries x up to k neighbors; planted: vec 1 & 2 top for query 0
    q0 = out[out["q_id"] == 0].sort_values("cos", ascending=False)
    assert set(q0.head(2)["n_id"]) == {1, 2}
    assert q0.iloc[0]["cos"] >= 0.999
    # symmetric: query 1's best neighbor is 0 or 2
    q1 = out[out["q_id"] == 1].sort_values("cos", ascending=False)
    assert q1.iloc[0]["n_id"] in (0, 2)


def test_ann_lsh_recalls_planted_neighbors(ray_session, planted_dir):
    """High-cosine vectors collide in nearly every random-hyperplane
    table: the planted pair must be recalled."""
    out = similarity.ann_lsh(planted_dir).to_pandas()
    q0 = set(out[out["q_id"] == 0]["n_id"])
    assert 1 in q0 and 2 in q0
    assert not out.duplicated(["q_id", "n_id"]).any()


def test_embedding_pair_topk_planted(ray_session, planted_dir):
    out = similarity.embedding_pair_topk(planted_dir).to_pandas()
    top = out.iloc[0]
    assert (top["vec_a"], top["vec_b"]) in {(0, 1), (0, 2), (1, 2)}
    assert top["cos"] >= 0.999
    assert (out["cos"].is_monotonic_decreasing
            or out["cos"].round(6).is_monotonic_decreasing)


def test_embedding_pair_topk_lsh_planted(ray_session, planted_dir):
    """The LSH-candidate variant recalls the planted near-identical
    pairs (they collide in nearly every table) and never reports a
    pair the exact all-pairs scorer doesn't have — candidates are a
    SUBSET, and scores are the same exact rounded cosine."""
    exact = similarity.embedding_pair_topk(planted_dir).to_pandas()
    lsh = similarity.embedding_pair_topk_lsh(planted_dir).to_pandas()
    top = lsh.iloc[0]
    assert (top["vec_a"], top["vec_b"]) in {(0, 1), (0, 2), (1, 2)}
    assert top["cos"] >= 0.999
    assert not lsh.duplicated(["vec_a", "vec_b"]).any()
    exact_scores = {(r.vec_a, r.vec_b): r.cos for r in exact.itertuples()}
    for r in lsh.itertuples():
        # every reported pair exists in the exact ranking with the
        # same rounded score wherever the exact cut kept it
        if (r.vec_a, r.vec_b) in exact_scores:
            assert abs(exact_scores[(r.vec_a, r.vec_b)] - r.cos) < 1e-9


def test_langid_marker_tiebreak(ray_session, tmp_path):
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["the cat and a dog of note",   # en
                 "der hund und die katze",      # de
                 "xyzzy plugh qwerty",          # no markers -> und
                 "the der"],                    # tie en/de -> en (order)
        "lang": "x", "source": "s0", "n_chars": 1,
    })
    docs.to_parquet(tmp_path / "documents.parquet")
    out = textops.text_langid(str(tmp_path)).to_pandas() \
        .set_index("doc_id")["pred_lang"]
    assert out[0] == "en" and out[1] == "de"
    assert out[2] == "und" and out[3] == "en"


def test_tfidf_topterms_hand_computed(ray_session, tmp_path):
    """3 docs, tiny vocab: 'rare' appears only in doc 0, so it must be
    doc 0's top term; a corpus-universal token has idf=ln(1)=0."""
    import numpy as np
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["rare common common", "common common x", "common x x"],
        "lang": "x", "source": "s0", "n_chars": 1,
    })
    docs.to_parquet(tmp_path / "documents.parquet")
    out = textops.tfidf_topterms(str(tmp_path)).to_pandas()
    d0 = out[out["doc_id"] == 0].sort_values("score", ascending=False)
    assert d0.iloc[0]["term"] == "rare"
    assert abs(d0.iloc[0]["score"] - round(np.log(3 / 1), 6)) < 1e-6
    common = out[(out["doc_id"] == 0) & (out["term"] == "common")]
    assert common.iloc[0]["score"] == 0.0  # df == N -> idf 0
    assert (out.groupby("doc_id").size() <= textops.TFIDF_K).all()


def test_decontaminate_hand_computed(ray_session, tmp_path):
    """Doc sharing a 5-gram window with a benchmark doc is flagged
    with the exact position count; short docs produce no windows."""
    bench_text = "a b c d e f"              # grams: 'a b c d e', 'b c d e f'
    docs = pd.DataFrame({
        "doc_id": [0, 20, 21, 22],
        "text": [bench_text,
                 "x a b c d e f y",          # contains BOTH bench grams
                 "a b c d x e",              # no shared 5-gram
                 "a b"],                     # too short for any window
        "lang": "x", "source": "s0", "n_chars": 1,
    })
    docs.to_parquet(tmp_path / "documents.parquet")
    out = textops.text_decontaminate(str(tmp_path)).to_pandas() \
        .set_index("doc_id")["n_hits"]
    assert out[0] == 2       # benchmark doc self-hits its own 2 grams
    assert out[20] == 2
    assert out[21] == 0 and out[22] == 0


def test_lm_surprisal_hand_computed(ray_session, tmp_path):
    """Exact micro-nat arithmetic: surprisal of token t = round-half-
    away(ln(T/n_t) * 1e6) summed per doc as int64."""
    import numpy as np
    docs = pd.DataFrame({
        "doc_id": [0, 1],
        "text": ["a a b", "b b c"],  # T=6; n_a=2, n_b=3, n_c=1
        "lang": "x", "source": "s0", "n_chars": 1,
    })
    docs.to_parquet(tmp_path / "documents.parquet")
    out = textops.text_lm_surprisal(str(tmp_path)).to_pandas() \
        .set_index("doc_id")
    fp = lambda n: int(np.floor(np.log(6 / n) * 1e6 + 0.5))
    assert out.loc[0, "n_tokens"] == 3
    assert out.loc[0, "surprisal_fp"] == 2 * fp(2) + fp(3)
    assert out.loc[1, "surprisal_fp"] == 2 * fp(3) + fp(1)


def test_tfidf_join_plan_matches(ray_session, tmp_path):
    """broadcast_max=0 forces tfidf's bucketed-join plan; the rounded
    score and the per-doc cut order are shared, so the plans are
    value-identical."""
    docs = pd.DataFrame({
        "doc_id": range(20),
        "text": [f"tok{i} tok{i % 3} common common x{i % 7}"
                 for i in range(20)],
        "lang": "x", "source": "s0", "n_chars": 1,
    })
    docs.to_parquet(tmp_path / "documents.parquet")
    key = ["doc_id", "term"]
    a = textops.tfidf_topterms(str(tmp_path)).to_pandas() \
        .sort_values(key).reset_index(drop=True)
    b = textops.tfidf_topterms(str(tmp_path), broadcast_max=0) \
        .to_pandas().sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b[a.columns])


def test_lm_surprisal_join_plan_matches(ray_session, tmp_path):
    """broadcast_max=0 forces the bucketed-join plan (the
    larger-than-heap vocabulary path); exact-int arithmetic makes it
    value-identical to the broadcast plan."""
    docs = pd.DataFrame({
        "doc_id": range(20),
        "text": [f"tok{i} tok{i % 3} common common x{i % 7}"
                 for i in range(20)],
        "lang": "x", "source": "s0", "n_chars": 1,
    })
    docs.to_parquet(tmp_path / "documents.parquet")
    a = textops.text_lm_surprisal(str(tmp_path)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = textops.text_lm_surprisal(str(tmp_path), broadcast_max=0) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b[a.columns])


def test_importance_sample_plans_match_and_rank(ray_session, tmp_path):
    """DSIR importance sampling: both physical plans value-identical
    (broadcast_max=0 forces the bucketed join), docs made of
    target-domain-heavy tokens outrank off-domain docs, signed
    micro-nat rounding is half-away-from-zero on both sides."""
    docs = pd.DataFrame({
        "doc_id": range(12),
        # docs 0-5 are the 'en' target domain and share its tokens;
        # docs 6-11 use disjoint off-domain vocabulary
        "text": [f"alpha beta gamma t{i % 2}" for i in range(6)]
        + [f"zeta eta theta z{i % 2}" for i in range(6)],
        "lang": ["en"] * 6 + ["de"] * 6,
        "source": "s0", "n_chars": 1,
    })
    docs.to_parquet(tmp_path / "documents.parquet")
    a = textops.text_importance_sample(str(tmp_path), topk=5) \
        .to_pandas().reset_index(drop=True)
    b = textops.text_importance_sample(str(tmp_path), topk=5,
                                       broadcast_max=0) \
        .to_pandas().sort_values(
            ["importance_fp", "doc_id"],
            ascending=[False, True]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b[a.columns])
    # every selected doc is from the target domain (their tokens have
    # positive log-ratio; off-domain tokens are absent from the target
    # LM and score negative)
    assert set(a["doc_id"]) <= set(range(6))
    assert (a["importance_fp"].to_numpy() > 0).all()


def test_quality_percentile_matches_oracle(ray_session, tmp_path):
    """CCNet-tercile percentile ranks: engine == DuckDB window oracle
    on a tie-heavy corpus (identical docs share a mean-surprisal score,
    so percent_rank's strictly-below semantics and the tercile CASE
    cut are both exercised on ties), and the head bucket is the
    common-token-heavy docs."""
    import duckdb
    docs = pd.DataFrame({
        "doc_id": range(9),
        # docs 0-3 identical (common tokens -> low mean surprisal,
        # tied scores straddling the 1/3 cut), 4-6 mixed, 7-8 heavy
        # in rare tokens -> tail
        "text": ["the the the a a"] * 4
        + [f"the a rare{i} word{i}" for i in range(3)]
        + ["xq1 xq2 xq3 xq4 xq5", "zq1 zq2 zq3 zq4 zq5"],
        "lang": "en", "source": "s0", "n_chars": 1,
    })
    docs.to_parquet(tmp_path / "documents.parquet")
    got = textops.text_quality_percentile(str(tmp_path)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    want = con.execute(
        textops.TEXT_QUALITY_PCT_SQL + " ORDER BY doc_id").df()
    for col in ("doc_id", "mean_surprisal_fp"):
        assert got[col].astype(np.int64).tolist() \
            == want[col].astype(np.int64).tolist(), col
    assert np.allclose(got["pct_rank"], want["pct_rank"], atol=0)
    assert got["bucket"].tolist() == want["bucket"].tolist()
    # semantics: the tied common-token docs rank at pct 0 (head);
    # the rare-token docs are the tail
    byid = got.set_index("doc_id")
    assert (byid.loc[[0, 1, 2, 3], "bucket"] == "head").all()
    assert (byid.loc[[7, 8], "pct_rank"]
            > byid.loc[[0, 1, 2, 3], "pct_rank"].max()).all()
    assert set(byid.loc[[7, 8], "bucket"]) <= {"middle", "tail"}


def test_quality_percentile_empty_corpus(ray_session, tmp_path):
    """All-null-text (effectively empty) corpus: zero output rows, no
    crash in the cumulative-rank construction (the cumsum[:-1] vs [0]
    seed length mismatch class of bug)."""
    pd.DataFrame({
        "doc_id": pd.array([0, 1], dtype="int64"),
        "text": pd.array([None, None], dtype="string"),
        "lang": "en", "source": "s0", "n_chars": 0,
    }).to_parquet(tmp_path / "documents.parquet")
    out = textops.text_quality_percentile(str(tmp_path)).to_pandas()
    assert len(out) == 0


def test_round_signed_i64_matches_duckdb():
    """_round_signed_i64 == DuckDB round() on signed halves — the case
    floor(x+0.5) gets wrong for negatives."""
    import duckdb
    import numpy as np
    xs = np.array([2.5, -2.5, 1.4999, -1.4999, 0.5, -0.5, 3.0, -3.0])
    got = textops._round_signed_i64(xs)
    want = [int(r[0]) for r in duckdb.sql(
        "SELECT round(x)::BIGINT FROM (SELECT unnest(["
        + ",".join(map(str, xs.tolist())) + "]) AS x)").fetchall()]
    assert got.tolist() == want
    # Regression pin: the module-level two-arg _round_half_away(arr,
    # ndigits) must keep exactly two parameters — a later one-arg
    # redefinition under the same name shadowed it for every kernel
    # in the module (closures resolve module globals at call time).
    import inspect
    assert len(inspect.signature(
        textops._round_half_away).parameters) == 2


def test_tfidf_surprisal_null_text_matches_oracle(ray_session, tmp_path):
    """NULL text tokenizes to ZERO tokens (DuckDB's unnest emits no
    rows for NULL), so a null-text doc is ABSENT from tfidf/surprisal
    output on BOTH physical plans — round-4 ADVICE: fillna('') used to
    emit an n_tokens=1 / term='' row the oracle never produces."""
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["a a b", None, "b c"],
        "lang": "x", "source": "s0", "n_chars": 1,
    })
    docs.to_parquet(tmp_path / "documents.parquet")
    for bmax in (None, 0):
        surp = textops.text_lm_surprisal(str(tmp_path),
                                         broadcast_max=bmax).to_pandas()
        assert sorted(surp["doc_id"]) == [0, 2]
        tfidf = textops.tfidf_topterms(str(tmp_path),
                                       broadcast_max=bmax).to_pandas()
        assert sorted(tfidf["doc_id"].unique()) == [0, 2]
        assert "" not in set(tfidf["term"])


def test_lookup_token_values_dict_fallback_raises_on_miss(ray_session):
    """The dict-fallback path must raise on a missing token, not cast
    NaN to INT64_MIN garbage (round-4 ADVICE)."""
    import numpy as np
    import pytest
    table = ("dict", {"a": np.int64(1), "b": np.int64(2)}, None)
    got = textops._lookup_token_values(table, pd.Series(["b", "a"]))
    assert list(got) == [2, 1]
    with pytest.raises(KeyError):
        textops._lookup_token_values(table, pd.Series(["a", "zzz"]))


def test_minhash_join_verification_equivalent(ray_session, planted_dir):
    """The web-scale join-based verification produces exactly the
    broadcast path's pairs."""
    a = dedup_ops.minhash_near_dups(planted_dir, threshold=0.5) \
        .to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    b = dedup_ops.minhash_near_dups(planted_dir, threshold=0.5,
                                    verify="join") \
        .to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b[a.columns])
    assert (0, 1) in set(zip(b["doc_a"], b["doc_b"]))


def test_join_results_partition_count_invariant(ray_session, monkeypatch):
    """Join-bearing pipelines must produce identical results at
    different derived partition counts (round-3 item 5 done-criterion:
    KG_RAY_NUM_PARTITIONS overrides the scale-derived default)."""
    from kg_covid_19_ray.pipelines import holdouts

    sf = "/root/testdata/sf0.001"
    outs = []
    for n in ("3", "8"):
        monkeypatch.setenv("KG_RAY_JOIN_PARTITIONS", n)
        deg = holdouts.holdout_degrees(sf).to_pandas()
        deg = deg.sort_values(list(deg.columns)).reset_index(drop=True)
        nd = dedup_ops.minhash_near_dups(sf, verify="join").to_pandas()
        nd = nd.sort_values(list(nd.columns)).reset_index(drop=True)
        outs.append((deg, nd))
    pd.testing.assert_frame_equal(outs[0][0], outs[1][0])
    pd.testing.assert_frame_equal(outs[0][1], outs[1][1])


def test_embedgen_planted_structure(ray_session, tmp_path):
    """Scale-fixture generator: replica 0 is the base table verbatim,
    noisy replicas stay nearest their own anchor, ids partition by
    replica, output is deterministic."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data
    from kg_covid_19_ray.sources.embedgen import write_embeddings_parquet

    sf = "/root/testdata/sf0.001"
    n_out = write_embeddings_parquet(sf, str(tmp_path), replicas=3)
    t = pq.read_table(f"{tmp_path}/embeddings.parquet").sort_by("vec_id")
    base = pq.read_table(f"{sf}/embeddings.parquet").sort_by("vec_id")
    n = base.num_rows
    assert n_out == t.num_rows == 3 * n
    m = np.stack(t["embedding"].to_pylist())
    b = np.stack(base["embedding"].to_pylist()).astype(np.float32)
    assert np.array_equal(m[:n], b)  # replica 0 verbatim
    # a noisy copy is far closer to its anchor than to other anchors
    v = m[n + 7]
    d = np.linalg.norm(b - v, axis=1)
    assert d.argmin() == 7
    # deterministic regeneration
    write_embeddings_parquet(sf, str(tmp_path / "again"), replicas=3)
    t2 = pq.read_table(f"{tmp_path}/again/embeddings.parquet") \
        .sort_by("vec_id")
    assert np.array_equal(m, np.stack(t2["embedding"].to_pylist()))


def test_dedup_embedding_cluster_properties(ray_session):
    """Semantic near-dup clustering: every vector mapped, canon is the
    min id of its cluster, canon ids are fixpoints, and at the fixture
    threshold at least one non-trivial cluster exists."""
    from kg_covid_19_ray.pipelines import similarity as S

    sf = "/root/testdata/sf0.001"
    out = S.dedup_embedding(sf).to_pandas()
    assert len(out) == 500 and out["vec_id"].is_unique
    assert (out["canon_id"] <= out["vec_id"]).all()
    canon_map = dict(zip(out["vec_id"], out["canon_id"]))
    # canonical representatives are their own canon (fixpoint)
    assert all(canon_map[c] == c for c in set(out["canon_id"]))
    assert (out["vec_id"] != out["canon_id"]).any()  # real dup found
    # raising the threshold above the max cosine yields pure identity
    ident = S.dedup_embedding(sf, threshold=0.99).to_pandas()
    assert (ident["vec_id"] == ident["canon_id"]).all()


def test_ann_ivf_join_equals_broadcast(ray_session):
    """The cell-shuffle IVF (query set as a Dataset, no broadcast) must
    produce exactly the broadcast ann_ivf result — same candidates,
    same rounding, same reduce."""
    from kg_covid_19_ray.pipelines import similarity as S

    sf = "/root/testdata/sf0.001"
    key = ["q_id", "n_id"]
    a = S.ann_ivf(sf).to_pandas().sort_values(key).reset_index(drop=True)
    b = S.ann_ivf_join(sf).to_pandas().sort_values(key) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b[a.columns])


def test_ann_ivf_kmeans_recall(ray_session):
    """The trained-quantizer IVF must recall a healthy fraction of the
    exact brute-force top-k (sf0.001 embeddings), and the exact-probe
    variant must equal brute force."""
    from kg_covid_19_ray.pipelines import similarity as S

    sf = "/root/testdata/sf0.001"
    exact = S.ann_bruteforce(sf).to_pandas()
    km = S.ann_ivf_kmeans(sf).to_pandas()
    e = set(zip(exact["q_id"], exact["n_id"]))
    k = set(zip(km["q_id"], km["n_id"]))
    recall = len(e & k) / len(e)
    assert recall >= 0.5, f"kmeans-IVF recall {recall:.2f}"

    full = S.ann_ivf_kmeans(sf, probes=S.IVF_CELLS).to_pandas()
    f = set(zip(full["q_id"], full["n_id"]))
    assert f == e  # exhaustive probing == brute force, any quantizer


def test_exact_dedup_null_text_not_aliased(ray_session, tmp_path):
    """ADVICE r2: factorize codes nulls as -1; without fillna the null
    rows silently joined the LAST unique's duplicate group. Null text
    must group with empty string, never with an unrelated text."""
    import hashlib

    d = tmp_path / "nulls"
    d.mkdir()
    pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["alpha", None, "omega", None],
    }).to_parquet(d / "documents.parquet")
    out = dedup_ops.exact_dedup(str(d)).to_pandas()
    assert len(out) == 3  # alpha, omega, '' (both nulls)
    empty_fp = hashlib.md5(b"").hexdigest()
    grp = out[out["fp"] == empty_fp]
    assert len(grp) == 1
    assert grp.iloc[0]["n_docs"] == 2 and grp.iloc[0]["keep_doc_id"] == 1
    # the real texts keep their own groups
    omega = out[out["fp"] == hashlib.md5(b"omega").hexdigest()]
    assert omega.iloc[0]["n_docs"] == 1


def test_embedding_pair_topk_chunk_plan_matches(ray_session):
    """broadcast_max=0 forces the blocked chunk-pair exact plan (no
    matrix broadcast, two chunks per task); rounding-before-cut and the
    shared (cos desc, vec_a, vec_b) total order make it byte-identical
    to the broadcast plan — round-4 VERDICT item 2 (the last registered
    whole-matrix broadcast, now size-routed)."""
    sf = "/root/testdata/sf0.001"
    key = ["vec_a", "vec_b"]
    a = similarity.embedding_pair_topk(sf).to_pandas() \
        .sort_values(key).reset_index(drop=True)
    b = similarity.embedding_pair_topk(sf, broadcast_max=0, chunk_rows=61) \
        .to_pandas().sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b[a.columns])


def test_dedup_embedding_chunk_plan_matches(ray_session):
    """Same plan-parity pin for the SemDeDup-style clusterer: the
    chunk-pair plan yields the identical pair graph, so components and
    representatives match exactly. Odd chunk_rows exercises diagonal
    AND off-diagonal chunk-pair groups (a strict id< mask on an
    off-diagonal group would drop pairs whose left id is larger)."""
    sf = "/root/testdata/sf0.001"
    a = similarity.dedup_embedding(sf).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    b = similarity.dedup_embedding(sf, broadcast_max=0, chunk_rows=61) \
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b[a.columns])
    assert (a["vec_id"] != a["canon_id"]).any()  # a real dup is found


def test_decontaminate_bloom_plan_matches(ray_session):
    """broadcast_max=0 forces the Bloom-prefilter + exact-verify plan
    (the larger-than-heap eval-suite path); false positives are
    removed by the bucketed verification, so the plans are
    value-identical."""
    sf = "/root/testdata/sf0.001"
    a = textops.text_decontaminate(sf).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = textops.text_decontaminate(sf, broadcast_max=0).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b[a.columns])
    assert (a["n_hits"] > 0).any()   # benchmark docs self-hit


def test_bloom_filter_no_false_negatives():
    """Bloom prefilter invariant: every inserted gram is a member
    (false negatives impossible); false-positive rate is within an
    order of magnitude of the design point."""
    import numpy as np

    from kg_covid_19_ray.pipelines.textops import (_bloom_build,
                                                   _bloom_member)
    grams = pd.Series([f"g{i} x y z w" for i in range(10_000)])
    words, bits_log2 = _bloom_build(grams)
    assert _bloom_member(words, bits_log2, grams).all()
    probe = pd.Series([f"absent{i} a b c d" for i in range(100_000)])
    fp = _bloom_member(words, bits_log2, probe).mean()
    assert fp < 0.005                # design point ~0.0005 at 16 b/g
