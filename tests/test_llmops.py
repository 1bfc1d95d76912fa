"""LLM-pipeline operator tests: planted near-duplicates must be found by the
banded paths; exact baselines cross-checked with numpy."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pyspark_engine import llmops


def _docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again " * 8
    near = base.replace("lazy", "sleepy")  # one token of ~96 differs
    other = "completely different content about spark query engines and shuffles " * 8
    rows = [(1, base), (2, near), (3, other), (4, "tiny"), (5, base)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_keeps_min_id(spark):
    out = llmops.exact_dedup(_docs(spark), "doc_id", "text").collect()
    kept = sorted(r.doc_id for r in out)
    assert kept == [1, 2, 3, 4]  # doc 5 is an exact dup of 1 -> min id kept


def test_minhash_lsh_finds_planted_near_dup(spark):
    pairs = llmops.minhash_lsh_pairs(_docs(spark), "doc_id", "text", threshold=0.5)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (1, 2) in got and (1, 5) in got and (2, 5) in got
    assert all(3 not in p and 4 not in p for p in got)


def test_minhash_verify_salt_hot_bucket(spark, monkeypatch):
    """Planted hot bucket — ONE boilerplate string duplicated across k docs
    puts ~k candidate rows behind each hot doc id in the verify join.
    verify_salt must (a) leave the emitted pair set IDENTICAL to the
    unsalted join and (b) spread each hot id's verify rows over multiple
    salt groups so no single reducer carries the whole key (the
    join_table_salted lever, extended to the LSH candidate-verify join).
    r14: the salt only exists on the over-cap merge-join path (under the
    measured-bytes cap the gram tables broadcast and there is no exchange
    left to skew), so force that path for this pin."""
    monkeypatch.setattr(llmops, "_BCAST_ARRAYS_BYTES", 0)
    k, s = 120, 4
    boiler = "the quick brown fox jumps over the lazy dog boilerplate footer text here"
    rows = [(i, boiler) for i in range(k)]
    rows += [(1000 + i, f"unique document number {i} speaking about entirely different things") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    try:
        plain = sorted(
            (r.id_a, r.id_b)
            for r in llmops.minhash_lsh_pairs(df, "doc_id", "text", threshold=0.5).collect()
        )
        salted_df = llmops.minhash_lsh_pairs(df, "doc_id", "text", threshold=0.5, verify_salt=s)
        salted = sorted((r.id_a, r.id_b) for r in salted_df.collect())
    finally:
        llmops.release_cache()
    assert salted == plain and len(plain) == k * (k - 1) // 2
    # the salt column actually drives the verify join keys
    assert "__sa" in salted_df._jdf.queryExecution().analyzed().toString()
    # distribution: recompute the per-pair salt with the same expression and
    # check every hot id's pairs split across >= 3 of the 4 salt groups with
    # no group holding more than ~half the key's rows
    pairs = spark.createDataFrame(plain, "id_a long, id_b long")
    dist = (
        pairs.withColumn("__sa", F.pmod(F.xxhash64("id_a", "id_b"), F.lit(s)).cast("int"))
        .groupBy("id_a", "__sa")
        .count()
        .groupBy("id_a")
        .agg(
            F.max("count").alias("mx"),
            F.sum("count").alias("tot"),
            F.count_distinct("__sa").alias("ns"),
        )
        .filter(F.col("tot") >= 50)
        .collect()
    )
    assert dist and all(r.ns >= 3 and r.mx <= r.tot * 0.6 for r in dist)


def test_simhash_near_dup_and_identical(spark):
    pairs = llmops.simhash_pairs(_docs(spark), "doc_id", "text", max_hamming=8)
    got = {(r.id_a, r.id_b): r.hamming for r in pairs.collect()}
    assert got[(1, 5)] == 0  # identical docs -> identical fingerprint
    assert (1, 2) in got  # near dup within hamming budget
    assert not any(3 in p for p in got)


def test_cosine_topk_matches_numpy(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 4)
    got = {
        (r.q_id, r.n_id)
        for r in llmops.cosine_topk(emb, queries, k=3).collect()
    }
    pdf = emb.toPandas().sort_values("vec_id")
    mat = np.array([np.array(v, dtype=np.float64) for v in pdf["embedding"]])
    ids = pdf["vec_id"].to_numpy()
    norms = np.linalg.norm(mat, axis=1)
    want = set()
    for q in range(4):
        sims = (mat @ mat[q]) / (norms * norms[q])
        sims[ids == q] = -np.inf
        top = ids[np.argsort(-sims, kind="stable")][:3]
        want |= {(q, int(n)) for n in top}
    assert got == want


def test_ann_lsh_better_than_random(spark, sf_dir):
    """The driver embeddings are near-uniform (top-5 neighbors share a label
    ~9% ≈ chance), so absolute recall is bounded by the data.  The honest
    property: ANN-selected neighbors must score well above the mean pairwise
    similarity, and each query must return rows."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 8)
    approx = llmops.ann_lsh_topk(emb, queries, dim=64, k=5, n_planes=6).collect()
    by_q = {}
    for r in approx:
        by_q.setdefault(r.q_id, []).append(r.n_id)
    assert set(by_q) == set(range(8))
    pdf = emb.toPandas().sort_values("vec_id")
    mat = np.array([np.array(v, dtype=np.float64) for v in pdf["embedding"]])
    norms = np.linalg.norm(mat, axis=1)
    sims = (mat @ mat.T) / np.outer(norms, norms)
    picked = np.array([sims[q, n] for q, ns in by_q.items() for n in ns])
    baseline = sims[np.triu_indices_from(sims, k=1)].mean()
    assert picked.mean() > baseline + 0.05, f"ANN mean {picked.mean():.3f} vs random {baseline:.3f}"


def test_ann_ivf_better_than_random(spark, sf_dir):
    """IVF variant: same honest property as the LSH test — probed neighbors
    must beat the mean pairwise similarity, every query returns rows."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 8)
    approx = llmops.ann_ivf_topk(emb, queries, dim=64, k=5, n_lists=8, n_probe=3).collect()
    by_q = {}
    for r in approx:
        by_q.setdefault(r.q_id, []).append(r.n_id)
    assert set(by_q) == set(range(8))
    pdf = emb.toPandas().sort_values("vec_id")
    mat = np.array([np.array(v, dtype=np.float64) for v in pdf["embedding"]])
    norms = np.linalg.norm(mat, axis=1)
    sims = (mat @ mat.T) / np.outer(norms, norms)
    picked = np.array([sims[q, n] for q, ns in by_q.items() for n in ns])
    baseline = sims[np.triu_indices_from(sims, k=1)].mean()
    assert picked.mean() > baseline + 0.05


def test_embedding_neardup_finds_planted_copies(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select("vec_id", "embedding")
    planted = emb.filter(F.col("vec_id") < 10).select(
        (F.col("vec_id") + 10000).alias("vec_id"), "embedding"
    )
    pairs = llmops.embedding_neardup(emb.unionByName(planted), dim=64, threshold=0.9)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert got == {(i, i + 10000) for i in range(10)}


def test_embedding_neardup_auto_planes_recall_pin(spark):
    """r11 review finding: ``n_planes="auto"`` (semantic_dedup's default)
    sizes the bucket count to the corpus, which LOWERS recall for
    borderline-threshold pairs as the corpus grows — a tradeoff the sf0.01
    oracle cannot see (auto resolves to the old fixed 8 there).  This pin
    makes it observable: at a corpus size where auto resolves ABOVE 8,
    (a) exact-duplicate pairs are still found with recall 1.0 (the dedup
    regime auto exists for — p → 1 at any plane count), and (b) planted
    borderline pairs (cosine ≈ 0.905 vs threshold 0.9) keep at least the
    floor recall the _resolve_planes docstring's math predicts.  All inputs
    are seeded and the hyperplanes are fixed, so the measured recall is
    DETERMINISTIC — a change to the plane sizing or probing shows up as an
    exact number shift, not flake."""
    import pandas as pd

    rng = np.random.default_rng(7)
    n, dim = 16384, 64
    base = rng.standard_normal((n, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = [(i, base[i].tolist()) for i in range(n)]
    cos_t = 0.905
    n_border, n_exact = 100, 50
    for i in range(n_border):  # borderline partner: cos exactly ~0.905
        v = base[i]
        o = rng.standard_normal(dim)
        o -= o.dot(v) * v
        o /= np.linalg.norm(o)
        w = cos_t * v + np.sqrt(1 - cos_t**2) * o
        rows.append((100000 + i, w.tolist()))
    for i in range(n_exact):  # exact duplicates
        rows.append((200000 + i, base[1000 + i].tolist()))
    emb = spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding"]),
        "vec_id long, embedding array<double>",
    )
    assert llmops._resolve_planes(emb, "auto") == 11  # 16534/16 -> ceil(log2(1033.4))=11
    pairs = {
        (r.id_a, r.id_b)
        for r in llmops.embedding_neardup(
            emb, dim=dim, threshold=0.9, n_planes="auto"
        ).collect()
    }
    exact_found = sum((1000 + i, 200000 + i) in pairs for i in range(n_exact))
    border_found = sum((i, 100000 + i) in pairs for i in range(n_border))
    assert exact_found == n_exact  # recall 1.0 for true duplicates
    # predicted borderline recall at k=11, hamming-1 multiprobe:
    # p = 1 - arccos(0.905)/pi = 0.859 -> p^11 + 11 p^10 (1-p) = 0.52
    assert border_found >= 40, border_found  # floor well under prediction


def test_multimodal_features_exact(spark):
    """mapInPandas plumbing with the deterministic fake decoder: features
    must equal a direct numpy computation on the same payloads."""
    rows = [(1, b"\x00\x10\xff\xff"), (2, b"abc"), (3, b"")]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in llmops.multimodal_features(df, "doc_id", "payload", bins=4).collect()}
    for doc_id, payload in rows:
        arr = np.frombuffer(payload, dtype=np.uint8)
        r = got[doc_id]
        assert r.n_bytes == arr.size
        assert r.mean_byte == (float(arr.mean()) if arr.size else 0.0)
        assert r.hist == np.bincount(arr // 64, minlength=4)[:4].tolist()


def test_fingerprint_normalizes_whitespace(spark):
    df = spark.createDataFrame([(1, "Hello  World"), (2, " hello world ")], "doc_id long, text string")
    fps = {r.doc_id: r.fp for r in llmops.fingerprint(df, "doc_id", "text").collect()}
    assert fps[1] == fps[2]


def test_chunk_text_windows_and_tail(spark):
    """Chunk starts advance by stride; the tail is covered by a short final
    window; short docs yield exactly one chunk."""
    words = " ".join(f"w{i}" for i in range(1, 11))  # 10 tokens
    df = spark.createDataFrame([(1, words), (2, "a b")], "doc_id long, text string")
    out = llmops.chunk_text(df, "doc_id", "text", max_tokens=4, overlap=1).collect()
    got = {(r.doc_id, r.chunk_idx): (r.n_tokens_chunk, r.chunk_text) for r in out}
    # doc 1: stride 3, starts while s <= 10-1=9 -> 1,4,7 ; slice(7,4)=w7..w10
    assert got[(1, 0)] == (4, "w1 w2 w3 w4")
    assert got[(1, 1)] == (4, "w4 w5 w6 w7")
    assert got[(1, 2)] == (4, "w7 w8 w9 w10")
    assert (1, 3) not in got
    assert got[(2, 0)] == (2, "a b")


def test_sample_hash_deterministic_and_disjoint_strata(spark):
    df = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 2 == 0).cast("string").alias("s")
    )
    a = llmops.sample_hash(df, "doc_id", 0.3, salt="x")
    b = llmops.sample_hash(df, "doc_id", 0.3, salt="x")
    assert sorted(r.doc_id for r in a.collect()) == sorted(r.doc_id for r in b.collect())
    n = a.count()
    assert 450 <= n <= 750  # ~600 expected, deterministic but hash-distributed
    strat = llmops.sample_stratified_hash(df, "doc_id", "s", {"true": 1.0}, salt="x")
    rows = strat.collect()
    assert all(r.s == "true" for r in rows) and len(rows) == 1000  # frac-1.0 stratum complete, other drops


def test_quality_filter_rules(spark):
    good = "the quick brown fox and the lazy dog have fun with all of that " * 3
    short = "too short"
    symbols = "the " + "#@ " * 40 + "of and that with have be to"
    df = spark.createDataFrame(
        [(1, good), (2, short), (3, symbols)], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in llmops.quality_filter(
        df, "doc_id", "text", min_words=10, max_words=100, min_mean_word_len=2.0,
        max_mean_word_len=8.0, max_symbol_ratio=0.1, min_stop_hits=2,
    ).collect()}
    assert out[1].keep is True
    assert out[2].keep is False          # word count below minimum
    assert out[3].keep is False and out[3].symbol_ratio > 0.1


def test_decontaminate_flags_shared_ngram(spark):
    base = "one two three four five six seven eight nine ten eleven twelve"
    clean = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    docs = spark.createDataFrame([(1, base), (2, clean)], "doc_id long, text string")
    ref = spark.createDataFrame([(99, "zzz " + base)], "doc_id long, text string")
    out = {r.doc_id: r for r in llmops.decontaminate(docs, ref, "doc_id", "text", n=8).collect()}
    assert out[1].contaminated is True and out[1].n_shared_ngrams >= 1
    assert out[2].contaminated is False and out[2].n_shared_ngrams == 0


def test_repetition_stats_planted(spark):
    df = spark.createDataFrame([(1, "a b a b a b")], "doc_id long, text string")
    r = llmops.repetition_stats(df, "doc_id", "text").collect()[0]
    # bigrams: ab ba ab ba ab -> total 5, top 'a b' x3, distinct 2
    assert r.n_bigrams == 5
    assert abs(r.top_bigram_frac - 3 / 5) < 1e-12
    assert abs(r.dup_bigram_frac - (1 - 2 / 5)) < 1e-12


def test_quantize_embeddings_planted(spark):
    df = spark.createDataFrame([(1, [1.0, -2.0, 0.5]), (2, [0.0, 0.0, 0.0])],
                               "vec_id long, embedding array<float>")
    got = {r.vec_id: r for r in llmops.quantize_embeddings(df).collect()}
    assert abs(got[1].q_scale - 63.5) < 1e-12
    assert got[1].q_codes == [63, -127, 31]
    assert got[2].q_scale == 0.0 and got[2].q_codes == [0, 0, 0]


def test_pii_scrub_planted(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at jo.doe+x@corp.example.org or call 555 123 4567 now"),
            (2, "ssn 123-45-6789 from host 192.168.0.1 end"),
            (3, "nothing sensitive here"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in llmops.pii_scrub(df, "doc_id", "text").collect()}
    assert out[1].clean_text == "mail me at <EMAIL> or call <PHONE> now"
    assert out[1].n_email == 1 and out[1].n_phone == 1
    # the SSN shape also matches the looser phone pattern pre-redaction,
    # but SSN redacts first (pattern order), so the output is typed <SSN>
    assert out[2].clean_text == "ssn <SSN> from host <IP> end"
    assert out[2].n_ssn == 1 and out[2].n_ipv4 == 1 and out[2].n_phone == 1
    assert out[3].clean_text == "nothing sensitive here"
    assert out[3].n_email == out[3].n_ssn == out[3].n_phone == out[3].n_ipv4 == 0


def test_paragraph_dedup_planted(spark):
    # P1 appears in docs 1, 2, 3; doc 3 is entirely duplicates -> vanishes
    df = spark.createDataFrame(
        [(1, "P1\nP2"), (2, "P3\nP1\nP4"), (3, "P1\nP2")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in llmops.paragraph_dedup(df, "doc_id", "text").collect()}
    assert out[1].clean_text == "P1\nP2" and out[1].n_kept == 2
    assert out[2].clean_text == "P3\nP4" and out[2].n_kept == 2
    assert 3 not in out


def test_top_ngrams_planted(spark):
    df = spark.createDataFrame(
        [(1, "x y x y z"), (2, "x y q")], "doc_id long, text string"
    )
    got = [(r.ngram, r.cnt) for r in llmops.top_ngrams(df, "text", n=2, k=3).collect()]
    # 'x y' x3; ties at cnt=1 break by ngram asc
    assert got == [("x y", 3), ("y q", 1), ("y x", 1)]


def test_top_ngrams_short_doc_empty(spark):
    df = spark.createDataFrame([(1, "solo")], "doc_id long, text string")
    assert llmops.top_ngrams(df, "text", n=2, k=5).count() == 0


def test_dedup_clusters_planted(spark):
    # chain 1-2-3 (transitive), pair 5-6, long chain 10..14
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (10, 11), (11, 12), (12, 13), (13, 14)],
        "id_a long, id_b long",
    )
    got = {r.node: r.cluster_id for r in llmops.dedup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5, 10: 10, 11: 10, 12: 10, 13: 10, 14: 10}


def test_dedup_clusters_chain_topology(spark):
    # adversarial worst case for label propagation: one 1000-node path graph
    # (diameter 999).  Alternating large-star/small-star must collapse it to
    # a single min-rooted cluster within O(log²) rounds — max_iter=20 would
    # raise (non-convergence) under any O(diameter) scheme.
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(999)], "id_a long, id_b long"
    )
    got = llmops.dedup_clusters(pairs, max_iter=20)
    assert got.count() == 1000
    assert got.select("cluster_id").distinct().collect()[0][0] == 0


def test_dedup_clusters_string_ids(spark):
    # pair generators emit document ids of whatever type the corpus uses;
    # min-ordering must work on strings too
    pairs = spark.createDataFrame(
        [("docB", "docA"), ("docB", "docC"), ("z1", "z2")], "id_a string, id_b string"
    )
    got = {r.node: r.cluster_id for r in llmops.dedup_clusters(pairs).collect()}
    assert got == {"docA": "docA", "docB": "docA", "docC": "docA", "z1": "z1", "z2": "z1"}


def test_url_stats_planted(spark):
    df = spark.createDataFrame(
        [
            (1, "read https://a.example.com/x and https://b.example.org plus https://a.example.com/y"),
            (2, "no links here"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in llmops.url_stats(df, "doc_id", "text").collect()}
    assert out[1].n_urls == 3 and out[1].n_domains == 2
    assert out[1].domains == "a.example.com,b.example.org"
    assert out[2].n_urls == 0 and out[2].domains == ""
    top = [(r.domain, r.cnt) for r in llmops.top_domains(df, "text", k=5).collect()]
    assert top == [("a.example.com", 2), ("b.example.org", 1)]


def test_pack_tokens_planted(spark):
    df = spark.createDataFrame(
        [(1, 0, 300), (1, 1, 300), (2, 0, 300), (3, 0, 100)],
        "doc_id long, chunk_idx long, n long",
    )
    out = {
        (r.doc_id, r.chunk_idx): (r.pack_id, r.pack_offset)
        for r in llmops.pack_tokens(df, "doc_id", "n", budget=512,
                                    order_cols=("doc_id", "chunk_idx")).collect()
    }
    # cumulative starts: 0, 300, 600, 900 -> packs 0,0,1,1 at offsets 0,300,88,388
    assert out == {(1, 0): (0, 0), (1, 1): (0, 300), (2, 0): (1, 88), (3, 0): (1, 388)}


def test_frame_sample_planted(spark):
    payload = bytes(range(44))  # frames of 8: idx 0..4; 4 trailing bytes dropped
    df = spark.createDataFrame([(1, payload), (2, b"short")], "doc_id long, payload binary")
    out = {
        (r.doc_id, r.frame_idx): bytes(r.frame)
        for r in llmops.frame_sample(df, "doc_id", "payload", frame_bytes=8, stride=2).collect()
    }
    assert out == {
        (1, 0): bytes(range(0, 8)),
        (1, 2): bytes(range(16, 24)),
        (1, 4): bytes(range(32, 40)),
    }  # doc 2 (< one frame) yields nothing; odd frames skipped; partial tail dropped


def test_resize_payloads_planted(spark):
    import numpy as np

    big = bytes(range(200)) * 2  # 400 bytes -> 4 buckets of 100 for target 4
    small = b"\x01\x02"
    df = spark.createDataFrame([(1, big), (2, small), (3, b"")], "doc_id long, payload binary")
    out = {r.doc_id: r for r in llmops.resize_payloads(df, "doc_id", "payload", target_bytes=4).collect()}
    arr = np.frombuffer(big, dtype=np.uint8).astype("int64")
    want = bytes(int(arr[i * 100:(i + 1) * 100].sum() // 100) for i in range(4))
    assert bytes(out[1].thumb) == want and out[1].orig_bytes == 400
    assert bytes(out[2].thumb) == b"\x01\x02\x00\x00" and out[2].orig_bytes == 2
    assert bytes(out[3].thumb) == b"\x00\x00\x00\x00" and out[3].orig_bytes == 0
    assert all(len(bytes(r.thumb)) == 4 for r in out.values())  # fixed output width


def test_tfidf_topk_planted(spark):
    import math

    # 3 docs over a 3-word vocab: "rare" only in doc 1, "mid" in docs 1+2,
    # "common" everywhere (df below min_df drops nothing here: min_df=1).
    rows = [(1, "rare rare mid common"), (2, "mid common common"), (3, "common")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = llmops.tfidf_topk(df, "doc_id", "text", k=2, min_df=1).collect()
    got = {(r.doc_id, r.rnk): (r.term, r.tf, r.df_count, r.score_q) for r in out}

    def q(tf, dfc):
        return math.floor(tf * math.log(4.0 / (dfc + 1.0)) * 1000)

    assert got[(1, 1)] == ("rare", 2, 1, q(2, 1))
    assert got[(1, 2)] == ("mid", 1, 2, q(1, 2))
    # doc 2: mid (df 2) outscores common (df 3); doc 3: common scores ln(1)=0
    assert got[(2, 1)][0] == "mid" and got[(2, 2)][0] == "common"
    assert got[(3, 1)] == ("common", 1, 3, 0)
    assert len(out) == 5  # doc 3 has only one term


def test_unigram_logprob_planted(spark):
    import math

    # corpus: a×3, b×1 → p(a)=3/4, p(b)=1/4
    rows = [(1, "a a b"), (2, "a")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in llmops.unigram_logprob(df, "doc_id", "text").collect()}
    h1 = math.log(4.0) - (2 * math.log(3.0) + 1 * math.log(1.0)) / 3
    h2 = math.log(4.0) - math.log(3.0)
    assert got[1].n_tokens == 3 and got[1].xent_q == math.floor(h1 * 1000)
    assert got[2].n_tokens == 1 and got[2].xent_q == math.floor(h2 * 1000)


def test_inverted_index_planted(spark):
    rows = [(10, "x y x"), (2, "x z"), (3, "x y"), (4, "w")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.term: r for r in llmops.inverted_index(df, "doc_id", "text", min_df=2, max_df_ratio=0.6).collect()}
    # x: df=3 > 0.6*4=2.4 → pruned as stop word; w: df=1 < min_df → pruned
    assert set(out) == {"y"}
    assert out["y"].df_count == 2 and out["y"].postings == "10,3"  # lexicographic ids


def test_sample_to_mixture_rates(spark):
    import hashlib

    rows = [(i, "big" if i < 80 else "small") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, dom string")
    out = llmops.sample_to_mixture(df, "doc_id", "dom", {"big": 0.5, "small": 0.5}, budget=40, salt="s:")
    got = {(r.doc_id, r.dom) for r in out.select("doc_id", "dom").collect()}
    # small: rate = min(1, 20/20) = 1.0 → all 20 kept; big: thr = 20/80 → 250000
    assert {(i, "small") for i in range(80, 100)} <= got

    def bucket(i):
        return int(hashlib.md5(f"s:{i}".encode()).hexdigest()[:8], 16) % 1_000_000

    want_big = {(i, "big") for i in range(80) if bucket(i) < 250_000}
    assert {p for p in got if p[1] == "big"} == want_big
    # domains without a share drop entirely
    df2 = df.withColumn("dom", F.lit("other"))
    assert llmops.sample_to_mixture(df2, "doc_id", "dom", {"big": 1.0}, budget=10).count() == 0


def test_pmi_collocations_planted(spark):
    import math

    # corpus: [a b a b], [a c] → uni a:3 b:2 c:1 (T1=6); bigrams: "a b"×2,
    # "b a"×1, "a c"×1 (T2=4); min_count=2 keeps only "a b":
    # PMI = ln 2 − ln 4 − ln 3 − ln 2 + 2·ln 6 = ln 3
    df = spark.createDataFrame([(1, "a b a b"), (2, "a c")], "doc_id long, text string")
    out = llmops.pmi_collocations(df, "text", min_count=2, k=10).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.x, r.y, r.c_xy, r.c_x, r.c_y) == ("a", "b", 2, 3, 2)
    assert r.pmi_q == math.floor(
        (math.log(2.0) - math.log(4.0) - math.log(3.0) - math.log(2.0) + 2.0 * math.log(6.0)) * 1000
    )


def test_sample_per_group_quota_exact(spark):
    import hashlib

    rows = [(i, "big" if i < 50 else "small") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, g string")
    out = llmops.sample_per_group_quota(df, "doc_id", "g", quota=10, salt="s:")
    got = {(r.doc_id, r.g) for r in out.select("doc_id", "g").collect()}
    # small group (10 rows) passes through whole; big keeps exactly 10
    assert {(i, "small") for i in range(50, 60)} <= got
    assert sum(1 for p in got if p[1] == "big") == 10

    def bucket(i):
        return int(hashlib.md5(f"s:{i}".encode()).hexdigest()[:8], 16) % 1_000_000

    want_big = set(sorted(range(50), key=lambda i: (bucket(i), i))[:10])
    assert {p[0] for p in got if p[1] == "big"} == want_big


def test_repeated_spans_planted(spark):
    """Hand-checkable corpus: a 5-token span shared by docs 1 and 2, a
    within-doc repeat in doc 3, a short doc with zero windows."""
    shared = "alpha beta gamma delta epsilon"
    df = spark.createDataFrame(
        [
            (1, shared + " one two"),                   # windows: 3, first is shared
            (2, "x " + shared),                          # windows: 2, last is shared
            (3, "p q " + "r s t u v r s t u v"),        # repeated within one doc
            (4, "too short"),                            # 0 windows
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in llmops.repeated_spans(df, "doc_id", "text", span_tokens=5).collect()}
    assert (out[1].n_windows, out[1].n_dup_windows) == (3, 1)
    assert (out[2].n_windows, out[2].n_dup_windows) == (2, 1)
    assert out[3].n_dup_windows >= 2          # 'r s t u v' occurs twice
    assert (out[4].n_windows, out[4].dup_frac) == (0, 0.0)
    assert abs(out[1].dup_frac - 1 / 3) < 1e-12


def test_semantic_dedup_keeps_one_per_cluster(spark, sf_dir):
    """Planted copies (and a transitive chain of copies) collapse to the min
    id; untouched vectors all survive."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select("vec_id", "embedding")
    copies = emb.filter(F.col("vec_id") < 5)
    planted = copies.select((F.col("vec_id") + 10000).alias("vec_id"), "embedding").unionByName(
        copies.select((F.col("vec_id") + 20000).alias("vec_id"), "embedding")
    )
    corpus = emb.unionByName(planted)
    out = {r.vec_id for r in llmops.semantic_dedup(corpus, dim=64, threshold=0.9).collect()}
    # each {i, i+10000, i+20000} triple keeps only i; everything else survives
    assert out == {r.vec_id for r in emb.collect()}


def test_pack_tokens_sharded_parallel(spark):
    """shard_col packs each shard independently (parallel windows) with
    globally unique pack ids; per-shard packing equals running pack_tokens
    on that shard alone."""
    df = spark.createDataFrame(
        [(i, i % 2, 30) for i in range(10)], "chunk_id long, shard int, n long"
    )
    got = llmops.pack_tokens(df, "chunk_id", "n", budget=100, order_cols=("chunk_id",), shard_col="shard").collect()
    by_shard = {}
    for r in got:
        by_shard.setdefault(r.shard, []).append(r)
    # shard 0: ids 0,2,4,6,8 -> cum 30..150 -> local packs 0,0,0,0(90->pack0? before=90<100),1
    for s in (0, 1):
        solo = llmops.pack_tokens(
            spark.createDataFrame([(r.chunk_id, r.n) for r in by_shard[s]], "chunk_id long, n long"),
            "chunk_id", "n", budget=100, order_cols=("chunk_id",),
        ).collect()
        want = {r.chunk_id: (r.pack_id, r.pack_offset) for r in solo}
        base = min(r.pack_id for r in by_shard[s])
        for r in by_shard[s]:
            assert (r.pack_id - base, r.pack_offset) == want[r.chunk_id]
    # global uniqueness: shard pack-id ranges are disjoint
    ids0 = {r.pack_id for r in by_shard[0]}
    ids1 = {r.pack_id for r in by_shard[1]}
    assert not (ids0 & ids1)
    assert ids0 | ids1 == set(range(len(ids0 | ids1)))


def test_dsir_weights_favor_target_domain(spark):
    """Importance weights must rank in-domain docs above off-domain ones:
    target = cooking text; a cooking-like raw doc outscores a legal-like
    one; short docs get zero grams and weight."""
    cook = "stir the sauce and add butter to the pan then simmer the sauce "
    legal = "the party of the first part shall indemnify the aforementioned entity "
    target = spark.createDataFrame(
        [(100 + i, cook * 3) for i in range(5)], "doc_id long, text string"
    )
    raw = spark.createDataFrame(
        [(1, cook * 2), (2, legal * 2), (3, "x")], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in llmops.dsir_logweights(raw, target, "doc_id", "text").collect()}
    assert got[1].logw_q > got[2].logw_q
    assert got[3].n_grams == 0 and got[3].logw_q == 0
    # per-gram normalization: the cooking doc is net-positive toward target
    assert got[1].logw_q > 0 > got[2].logw_q


def test_bigram_backoff_order_sensitivity(spark):
    """Word order matters: a doc repeating the model's exact bigrams scores
    higher (per-bigram) than the same words in scrambled order, which only
    ever hits the alpha-discounted unigram backoff."""
    fluent = "the cat sat on the mat " * 6
    model = spark.createDataFrame([(100, fluent)], "doc_id long, text string")
    scrambled = "mat the on sat the cat " * 6   # same unigrams, unseen bigrams mostly
    raw = spark.createDataFrame(
        [(1, fluent), (2, scrambled), (3, "zz")], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in llmops.bigram_backoff_logprob(
        raw, "doc_id", "text", model=model).collect()}
    mean1 = got[1].logp_q / got[1].n_bigrams
    mean2 = got[2].logp_q / got[2].n_bigrams
    assert mean1 > mean2                       # order-aware: fluent wins
    assert got[3].n_bigrams == 0 and got[3].logp_q == 0


def test_char_entropy_planted(spark):
    """Hand-computable histograms: one repeated char -> ~0 nats; two
    balanced chars -> ~ln 2; four distinct chars -> ~ln 4; empty -> zeros.
    Quantization floors each n·ln n term first, so expected values are
    computed the same way here."""
    rows = [(1, "aaaa"), (2, "abab"), (3, "abcd"), (4, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in llmops.char_entropy(df, "doc_id", "text").collect()}
    assert (got[1].n_chars, got[1].n_classes, got[1].entropy_q) == (4, 1, 0)
    assert got[2].entropy_q == 693          # floor(1000·ln4 − 2·floor(1000·2·ln2)/4)
    assert got[3].entropy_q == 1386         # floor(1000·ln4)
    assert (got[4].n_chars, got[4].n_classes, got[4].entropy_q) == (0, 0, 0)
    assert got[1].entropy_q < got[2].entropy_q < got[3].entropy_q


def test_classifier_inline_equals_exported_weights(spark):
    """The zero-shuffle inline pseudo-weight path and the broadcast-join
    exported-weights path are the SAME model: materializing the pseudo
    weights as a (bucket, weight_q) table must reproduce identical scores
    and keep decisions, including the empty-text row."""
    import hashlib as _h

    rows = [(1, "the quick brown fox jumps over the lazy dog"),
            (2, "spark shuffles partition data across executors"),
            (3, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def w(b: int) -> int:
        return int(_h.md5(f"w:{b}".encode()).hexdigest()[:8], 16) % 2001 - 1000

    weights = spark.createDataFrame(
        [(b, w(b)) for b in range(4096)], "bucket int, weight_q long"
    )
    inline = {r.doc_id: r for r in llmops.classifier_score(df, "doc_id", "text").collect()}
    joined = {r.doc_id: r for r in llmops.classifier_score(
        df, "doc_id", "text", weights=weights).collect()}
    for d in (1, 2, 3):
        assert inline[d].score_q == joined[d].score_q
        assert inline[d].n_grams == joined[d].n_grams
        assert inline[d].keep == joined[d].keep
    assert inline[3].n_grams == 0


def test_perplexity_buckets_head_middle_tail(spark):
    """CCNet tiling: within one language, the doc made of the corpus's most
    common tokens lands in bucket 1 (head) and the rare-token doc in the
    last bucket; every bucket is used and sizes are balanced."""
    common = "the cat sat on the mat and the dog sat too "
    rows = [(1, "en", common * 4),
            (2, "en", common * 3 + "qwzx vbnk "),
            (3, "en", "qwzx vbnk jklp zzyy qqrr wwtt "),
            (4, "de", common)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {r.doc_id: r for r in llmops.perplexity_buckets(
        df, "doc_id", "text", "lang", n_buckets=3).collect()}
    assert got[1].bucket == 1 and got[3].bucket == 3
    assert got[1].xent_q < got[2].xent_q < got[3].xent_q
    assert got[4].bucket == 1               # sole doc in its own lang partition


def test_bm25_ranking_idf_and_saturation(spark):
    """BM25 sanity on a planted corpus: a doc matching the RARE query term
    outranks one matching only the common term (idf); more mentions of the
    same term rank higher (tf); docs with no query term don't appear; k
    caps the result."""
    filler = "alpha beta gamma delta " * 5
    rows = [(1, filler + "zebra"),                   # rare term once
            (2, filler + "common"),                  # common term once
            (3, filler + "common common common"),    # common term x3
            (4, filler),                             # no query terms
            (5, filler + "common"),
            (6, filler + "common")]                  # make 'common' common
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = llmops.bm25_topk(df, "doc_id", "text", ["zebra", "common"], k=3).collect()
    ids = [r.doc_id for r in out]
    assert len(ids) == 3 and 4 not in ids
    scores = {r.doc_id: r.score_q for r in out}
    assert scores[1] > scores[3] > scores[2]         # idf beats tf; tf beats single hit


def test_corpus_report_planted(spark):
    """Grouped dashboard: dup count matches exact_dedup's drop count per
    slice; token/byte sums and the mean are hand-checkable."""
    rows = [(1, "s1", "en", "aa bb cc"), (2, "s1", "en", "aa bb cc"),
            (3, "s1", "en", "dd ee"), (4, "s2", "de", "ff")]
    df = spark.createDataFrame(rows, "doc_id long, source string, lang string, text string")
    got = {(r.source, r.lang): r for r in llmops.corpus_report(
        df, "doc_id", "text", "source", "lang").collect()}
    s1 = got[("s1", "en")]
    assert (s1.n_docs, s1.n_dup, s1.total_tokens, s1.total_bytes) == (3, 1, 8, 21)
    assert abs(s1.mean_tokens - 8 / 3) < 1e-12
    s2 = got[("s2", "de")]
    assert (s2.n_docs, s2.n_dup, s2.total_tokens) == (1, 0, 1)


def test_sample_to_token_budget_rates(spark):
    """Token-mass thresholds: domain A has 4x the tokens of B; with equal
    token shares A must keep ~1/4 the RATE of B; domains without a share
    drop; a budget above the corpus keeps everything (rate clamps to 1)."""
    long_doc = "w " * 40
    short_doc = "w " * 10
    rows = [(i, "A", long_doc) for i in range(40)] + \
           [(100 + i, "B", short_doc) for i in range(40)] + \
           [(200, "C", short_doc)]
    df = spark.createDataFrame(rows, "doc_id long, domain string, text string")
    kept = llmops.sample_to_token_budget(
        df, "doc_id", "text", "domain", {"A": 0.5, "B": 0.5}, 800).collect()
    by_dom = {}
    for r in kept:
        by_dom.setdefault(r.domain, []).append(r.doc_id)
    assert "C" not in by_dom
    # A: 400-token share over 1600 tokens -> rate 0.25; B: 400 over 400 -> rate 1.0
    assert len(by_dom["B"]) == 40
    assert 0 < len(by_dom["A"]) < 40
    # rerun is identical (deterministic keep rule)
    again = llmops.sample_to_token_budget(
        df, "doc_id", "text", "domain", {"A": 0.5, "B": 0.5}, 800).collect()
    assert {r.doc_id for r in again} == {r.doc_id for r in kept}
    everything = llmops.sample_to_token_budget(
        df, "doc_id", "text", "domain", {"A": 0.5, "B": 0.5}, 10_000).collect()
    assert len([r for r in everything if r.domain in ("A", "B")]) == 80


def test_exact_dedup_incremental_planted(spark):
    """Both drop paths: content already in the history store goes, and an
    in-batch duplicate keeps only the min id; survivors' digests appended
    to the store make a second batch of the same content drop entirely."""
    seen_src = spark.createDataFrame([(1, "old news")], "doc_id long, text string")
    seen = seen_src.select(F.md5("text").alias("fp"))
    batch = spark.createDataFrame(
        [(10, "old news"), (11, "fresh content"), (12, "fresh content"), (13, "unique")],
        "doc_id long, text string")
    out = llmops.exact_dedup_incremental(batch, seen, "doc_id", "text")
    kept = sorted(r.doc_id for r in out.collect())
    assert kept == [11, 13]
    seen2 = seen.unionByName(out.select("fp"))
    batch2 = spark.createDataFrame([(20, "fresh content")], "doc_id long, text string")
    assert llmops.exact_dedup_incremental(batch2, seen2, "doc_id", "text").count() == 0


def test_corpus_diff_all_statuses(spark):
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id long, text string")
    new = spark.createDataFrame(
        [(2, "b"), (3, "C!"), (4, "d")], "doc_id long, text string")
    got = {r.doc_id: r.status for r in llmops.corpus_diff(
        old, new, "doc_id", "text").collect()}
    assert got == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}


def test_leakage_free_split_dups_colocated(spark):
    """Exact duplicates must land in the same split regardless of id; the
    group_col mode extends the guarantee to near-dup clusters; permille
    bounds are honored over many distinct contents."""
    rows = [(i, f"content number {i}") for i in range(300)] + \
           [(1000 + i, f"content number {i}") for i in range(300)]   # exact dups, new ids
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = llmops.leakage_free_split(df, "doc_id", "text", val_permille=100,
                                    test_permille=100).collect()
    split_of = {r.doc_id: r.split for r in out}
    for i in range(300):
        assert split_of[i] == split_of[1000 + i]
    counts = {s: sum(1 for r in out if r.split == s) for s in ("train", "val", "test")}
    assert counts["train"] > counts["val"] > 0 and counts["test"] > 0

    clustered = spark.createDataFrame(
        [(1, "x", "c1"), (2, "y", "c1"), (3, "z", "c2")],
        "doc_id long, text string, cluster string")
    got = {r.doc_id: r.split for r in llmops.leakage_free_split(
        clustered, "doc_id", "text", group_col="cluster").collect()}
    assert got[1] == got[2]          # same near-dup cluster -> same split


def test_sentence_chunks_boundaries(spark):
    """Sentences never split across chunks; chunk ids advance when the
    running token count crosses the budget; ordered reassembly; an
    over-budget single sentence still forms its own whole chunk."""
    text = "a b c. d e f. g h i. j k l m n o p q r s t u v w x y z aa bb cc"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = sorted(
        llmops.sentence_chunks(df, "doc_id", "text", max_tokens=6).collect(),
        key=lambda r: r.chunk_id,
    )
    # sentences: [a b c](3), [d e f](3), [g h i](3), [long 20-token tail](20)
    # cum-before: 0, 3, 6, 9 -> chunks 0, 0, 1, 1
    assert [r.chunk_id for r in out] == [0, 1]
    assert out[0].chunk_text == "a b c. d e f" and out[0].n_tokens == 6
    assert out[1].n_sentences == 2 and out[1].n_tokens == 23
    assert out[1].chunk_text.startswith("g h i. j k l")


def test_ngram_novelty_planted(spark):
    """Shared bigrams score 0 novelty, unique ones 1; a doc mixing both
    lands in between; short docs have zero grams."""
    shared = "alpha beta gamma delta"
    rows = [(1, shared), (2, shared),                 # all bigrams shared -> 0
            (3, "unique phrase entirely here"),       # all df=1 -> 1.0
            (4, shared + " epsilon zeta"),            # 3 shared + 2 novel of 5
            (5, "solo")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in llmops.ngram_novelty(df, "doc_id", "text").collect()}
    assert got[1].novelty_q == 0 and got[2].novelty_q == 0
    assert got[3].novelty_q == 1_000_000
    assert got[4].n_grams_distinct == 5 and got[4].n_novel == 2
    assert got[4].novelty_q == 400_000
    assert got[5].n_grams_distinct == 0 and got[5].novelty_q == 0


def test_profile_columns_planted(spark):
    df = spark.createDataFrame(
        [(1, "a", None), (2, "b", 5.0), (2, None, 7.5)],
        "k long, s string, v double")
    got = {r.column: r for r in llmops.profile_columns(df, ["k", "s", "v"]).collect()}
    assert (got["k"].n_nonnull, got["k"].n_null, got["k"].n_distinct) == (3, 0, 2)
    assert (got["k"].min_str, got["k"].max_str) == ("1", "2")
    assert (got["s"].n_nonnull, got["s"].n_null, got["s"].n_distinct) == (2, 1, 2)
    assert (got["v"].n_nonnull, got["v"].n_null, got["v"].n_distinct) == (2, 1, 2)


def test_normalize_text_rules(spark):
    """Each cleaning rule individually: control chars stripped, space/tab
    runs collapsed, line edges trimmed, 3+ newlines to two, doc trimmed,
    optional lowercase; and normalization canonicalizes cosmetic variants
    to the same digest."""
    dirty = "\x01 Hello\t\tWorld \n\n\n\n  Next\x7f paragraph  "
    df = spark.createDataFrame([(1, dirty)], "doc_id long, text string")
    row = llmops.normalize_text(df, "text", out_col="clean").collect()[0]
    assert row.clean == "Hello World\n\nNext paragraph"
    low = llmops.normalize_text(df, "text", lowercase=True, out_col="c2").collect()[0]
    assert low.c2 == "hello world\n\nnext paragraph"

    variants = spark.createDataFrame(
        [(1, "same   text"), (2, "same \t text "), (3, "\x02same text")],
        "doc_id long, text string")
    fps = {r.fp for r in llmops.normalize_text(variants, "text")
           .select(F.md5("text").alias("fp")).collect()}
    assert len(fps) == 1


def test_matryoshka_matches_numpy(spark):
    """Truncated-renormalized components match numpy within the floor
    quantum; truncation changes the normalization (prefix norm, not full
    norm); zero vectors give an empty signature."""
    rows = [(1, [3.0, 4.0, 100.0, 100.0]), (2, [0.0, 0.0, 0.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r.vec_id: r for r in llmops.matryoshka_embeddings(
        df, "vec_id", "embedding", dims=2).collect()}
    # prefix [3,4] renormalizes by 5, NOT by the full-vector norm
    assert got[1].n_dims == 2 and got[1].sig == "6000,8000"
    assert got[2].sig == ""
    vec = np.array([0.3, -1.7, 2.4, 0.9], dtype=np.float32)
    df2 = spark.createDataFrame([(7, vec.tolist())], "vec_id long, embedding array<float>")
    out = llmops.matryoshka_embeddings(df2, "vec_id", "embedding", dims=3).collect()[0]
    want = vec[:3].astype(np.float64)
    want = np.floor(10000 * want / np.sqrt((want * want).sum()))
    assert [int(x) for x in out.sig.split(",")] == [int(w) for w in want]


def test_fuzzy_editdist_planted(spark):
    """Small-edit pairs sharing a prefix are found with the right distance;
    different-prefix docs never pair (bucketing is prefix-keyed by
    design); distances above the threshold drop."""
    base = "the quick brown fox jumps over the lazy dog and keeps running ahead"
    rows = [(1, base),
            (2, base.replace("lazy", "hazy")),          # dist 1, same prefix
            (3, "completely different opening text here"),
            (4, base + " tail tail tail tail tail")]    # big tail edit
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.id_a, r.id_b): r.dist for r in llmops.fuzzy_pairs_editdist(
        df, "doc_id", "text", max_dist=5).collect()}
    assert got[(1, 2)] == 1
    assert all(3 not in p for p in got)
    assert (1, 4) not in got                            # 25-char tail > max_dist


def test_length_outliers_robustness(spark):
    """The megadoc is flagged; normal-length docs are not; the MEDIAN
    threshold is unmoved by the outlier itself (robustness — a mean/stddev
    rule would shift); per-group isolation holds."""
    normal = "w " * 20
    rows = [(i, "en", normal) for i in range(20)] + \
           [(100, "en", "w " * 2000),               # megadoc
            (200, "de", "w " * 5)]                  # sole doc in its group
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {r.doc_id: r for r in llmops.length_outliers(
        df, "doc_id", "text", "lang", k=3.0).collect()}
    assert got[100].is_outlier
    assert not any(got[i].is_outlier for i in range(20))
    assert got[0].med == 20.0                       # median ignores the megadoc
    assert not got[200].is_outlier                  # MAD 0, dev 0 in its group


def test_curation_v2_composition(spark):
    """Normalize→classify→dedup→chunk→split as one plan: a double-space
    variant canonicalizes onto its original and drops in dedup, every
    surviving chunk gets a deterministic split, and re-running reproduces
    identical output."""
    base = "the quick brown fox jumps over the lazy dog " * 8
    df = spark.createDataFrame(
        [(1, base), (2, base.replace(" ", "  ")), (3, "rare zxqv tokens only")],
        "doc_id long, text string")
    clean = llmops.normalize_text(df, "text")
    scored = llmops.classifier_score(clean, "doc_id", "text")
    kept = clean.join(scored.filter(F.col("keep")).select("doc_id"), "doc_id")
    uniq = llmops.exact_dedup(kept, "doc_id", "text")
    surv = kept.join(uniq.select("doc_id"), "doc_id")
    surv_ids = {r.doc_id for r in surv.select("doc_id").collect()}
    assert 2 not in surv_ids                      # normalized copy deduped away
    assert 1 in surv_ids
    chunks = llmops.chunk_text(surv, "doc_id", "text", max_tokens=32, overlap=8)
    out1 = sorted(
        (r.doc_id, r.chunk_idx, r.split)
        for r in llmops.leakage_free_split(
            chunks, "chunk_idx", "chunk_text", salt="cv2:").collect())
    out2 = sorted(
        (r.doc_id, r.chunk_idx, r.split)
        for r in llmops.leakage_free_split(
            chunks, "chunk_idx", "chunk_text", salt="cv2:").collect())
    assert out1 == out2 and len(out1) > 0


def test_shuffle_shards_deterministic_and_dense(spark):
    df = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    a = llmops.shuffle_shards(df, "doc_id", n_shards=8, seed=7)
    b = llmops.shuffle_shards(df, "doc_id", n_shards=8, seed=7)
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb  # bit-identical re-run
    assert len(ra) == 200
    shards = {}
    for doc_id, shard, pos in ra:
        assert 0 <= shard < 8
        shards.setdefault(shard, []).append(pos)
    # dense 1..n positions within every shard
    for poss in shards.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    # a different seed produces a different order
    c = sorted(map(tuple, llmops.shuffle_shards(df, "doc_id", n_shards=8, seed=8).collect()))
    assert c != ra


def test_strip_boilerplate_removes_high_df_paragraphs(spark):
    rows = [
        (1, "unique alpha\nCOOKIE BANNER\nbody one"),
        (2, "COOKIE BANNER\nbody two"),
        (3, "body three\nCOOKIE BANNER"),
        (4, "COOKIE BANNER"),
        (5, "no banner here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in llmops.strip_boilerplate(df, "doc_id", "text", min_docs=3).collect()}
    assert len(out) == 5  # every doc survives as a row
    assert out[1].clean_text == "unique alpha\nbody one"
    assert out[2].clean_text == "body two"
    assert out[3].clean_text == "body three"
    assert out[4].clean_text == ""  # pure-boilerplate doc stays, empty
    assert out[4].n_kept == 0 and out[4].n_removed == 1
    assert out[5].clean_text == "no banner here"
    assert out[1].n_kept == 2 and out[1].n_removed == 1


def test_event_sequences_order_and_split(spark):
    rows = [(1, i * 1000, 100 + i) for i in range(10)] + [(2, 0, 7)]
    df = spark.createDataFrame(rows, "uid long, tsm long, eid long").select(
        "uid", F.timestamp_millis(F.col("tsm")).alias("ts"), "eid"
    )
    out = {(r.uid, r.seq_idx): r for r in llmops.event_sequences(df, "uid", "ts", "eid", seq_len=4).collect()}
    assert out[(1, 0)].vals == [100, 101, 102, 103]
    assert out[(1, 1)].vals == [104, 105, 106, 107]
    assert out[(1, 2)].vals == [108, 109]  # tail sequence shorter
    assert out[(1, 2)].n_events == 2
    assert out[(1, 0)].t_start_ms == 0 and out[(1, 0)].t_end_ms == 3000
    assert out[(2, 0)].vals == [7]


def test_semantic_decontaminate_flags_planted_copies(spark):
    import numpy as np

    rng = np.random.default_rng(3)
    train = [(i, rng.normal(size=16).astype("float32").tolist()) for i in range(30)]
    # benchmark = exact copies of train rows 0..4, plus one unrelated vector
    bench = [(1000 + i, train[i][1]) for i in range(5)]
    bench.append((1999, rng.normal(size=16).astype("float32").tolist()))
    t = spark.createDataFrame(train, "vec_id long, embedding array<float>")
    b = spark.createDataFrame(bench, "vec_id long, embedding array<float>")
    out = {r.vec_id: r for r in llmops.semantic_decontaminate(t, b, dim=16, threshold=0.95).collect()}
    assert set(out) == {0, 1, 2, 3, 4}
    for i in range(5):
        assert out[i].best_bench_id == 1000 + i
        assert out[i].n_bench_hits == 1


def test_minhash_incremental_store_vs_new_batch(spark):
    base = "the quick brown fox jumps over the lazy dog again and again " * 8
    near = base.replace("lazy", "sleepy")
    hist_rows = [(1, base), (2, "completely different history content about engines " * 8)]
    new_rows = [(10, near), (11, "fresh unrelated new-batch text nothing like the rest " * 8), (12, near)]
    hist = spark.createDataFrame(hist_rows, "doc_id long, text string")
    new = spark.createDataFrame(new_rows, "doc_id long, text string")
    hs = llmops.minhash_signatures(hist, "doc_id", "text")
    ns = llmops.minhash_signatures(new, "doc_id", "text")
    out = {(r.id_a, r.id_b): r.sim_est for r in
           llmops.minhash_lsh_incremental(hs, ns, "doc_id", threshold=0.5).collect()}
    assert (1, 10) in out          # new near-dup of a history doc, via the store only
    assert (10, 12) in out         # within-batch pair
    assert out[(10, 12)] == 1.0    # identical text -> identical signature
    assert all(11 not in p and 2 not in p for p in out)
    # history-history pairs are never emitted
    assert all(not (a < 10 and b < 10) for a, b in out)


def test_strip_html_rules(spark):
    rows = [
        (1, "<html><head><style>a{}</style><script>var x = '<p>';</script></head>"
            "<body><h1>Title</h1><p>first para</p><p>second   para</p>"
            "line<br/>break &amp; entities &lt;tag&gt; &quot;q&quot; &#39;s&#39; &nbsp;end"
            "</body></html>"),
        (2, "no markup at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.text_plain for r in llmops.strip_html(df, "text").collect()}
    assert out[1] == 'Title\nfirst para\nsecond para\nline\nbreak & entities <tag> "q" \'s\' end'
    assert out[2] == "no markup at all"


def test_cluster_balanced_sample_quota_and_membership(spark):
    import numpy as np

    rng = np.random.default_rng(11)
    # two well-separated blobs of 40 + one tiny blob of 3
    rows = []
    for i in range(40):
        rows.append((i, (rng.normal(0, 0.1, 8) + 10).astype("float32").tolist()))
    for i in range(40, 80):
        rows.append((i, (rng.normal(0, 0.1, 8) - 10).astype("float32").tolist()))
    for i in range(80, 83):
        rows.append((i, (rng.normal(0, 0.1, 8) + np.array([10,-10]*4)).astype("float32").tolist()))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = llmops.cluster_balanced_sample(emb, per_cluster=5, n_lists=3, init="kmeans").collect()
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r.cluster, []).append(r.vec_id)
    # every cluster capped at 5; tiny cluster kept whole if its blob got its own cell
    assert all(len(v) <= 5 for v in by_cluster.values())
    assert len(out) <= 15
    # deterministic re-run
    out2 = llmops.cluster_balanced_sample(emb, per_cluster=5, n_lists=3, init="kmeans").collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_vocab_drift_planted_surge(spark):
    old = spark.createDataFrame([(1, "alpha beta gamma alpha")], "doc_id long, text string")
    new = spark.createDataFrame([(2, "alpha beta surge surge surge")], "doc_id long, text string")
    out = {r.token: r for r in llmops.vocab_drift(old, new, "text", k=10).collect()}
    assert out["surge"].cnt_old == 0 and out["surge"].cnt_new == 3
    assert out["gamma"].cnt_old == 1 and out["gamma"].cnt_new == 0
    assert out["surge"].dlog_q > 0 > out["gamma"].dlog_q
    # alpha shrank in relative frequency (2/4 -> 1/5)
    assert out["alpha"].dlog_q < 0


def test_exact_dedup_priority_best_copy_wins(spark):
    rows = [
        (1, "same text", 5),
        (2, "same text", 9),   # highest priority wins
        (3, "same text", 9),   # tie -> lowest id among the 9s
        (4, "unique", 1),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, priority int")
    out = {r.doc_id: r for r in llmops.exact_dedup_priority(df, "doc_id", "text", "priority").collect()}
    assert set(out) == {2, 4}
    assert out[2].priority == 9


def test_histogram_bins_and_overflow(spark):
    df = spark.createDataFrame([(float(v),) for v in [-5, 0, 4.9, 5, 14.9, 99, 200, 200]], "x double")
    out = {r.bin: r for r in llmops.histogram(df, "x", lo=0.0, hi=100.0, n_bins=20).collect()}
    assert out[-1].n == 1           # underflow
    assert out[0].n == 2            # [0,5): 0 and 4.9
    assert out[1].n == 1            # [5,10)
    assert out[2].n == 1            # [10,15)
    assert out[19].n == 1           # [95,100)
    assert out[20].n == 2           # overflow
    assert out[1].lo_edge == 5.0 and out[1].hi_edge == 10.0


def test_dedup_keep_best_cluster_winner(spark):
    rows = [
        (1, 3), (2, 9), (3, 5),   # cluster {1,2,3} -> 2 wins (priority 9)
        (4, 1), (5, 1),           # cluster {4,5} -> tie, lowest id (4) wins
        (6, 0),                   # unpaired -> survives
    ]
    df = spark.createDataFrame(rows, "doc_id long, priority int")
    pairs = spark.createDataFrame([(1, 2), (2, 3), (4, 5)], "id_a long, id_b long")
    out = sorted(r.doc_id for r in llmops.dedup_keep_best(df, pairs, "doc_id", "priority").collect())
    assert out == [2, 4, 6]


def test_write_training_shards_ordered_files(spark, tmp_path):
    from pyspark_engine.runtime import write_training_shards

    df = spark.createDataFrame([(i, f"doc {i}") for i in range(300)], "doc_id long, text string")
    dst = str(tmp_path / "shards")
    write_training_shards(df, dst, "doc_id", n_shards=8, payload_cols=["text"])
    back = spark.read.parquet(dst)
    assert back.count() == 300
    assert set(back.select("shard").distinct().toPandas()["shard"]) <= set(range(8))
    # every shard's single file is internally ordered by pos
    import glob
    import pyarrow.parquet as pq
    for d in glob.glob(f"{dst}/shard=*"):
        files = [f for f in glob.glob(f"{d}/*.parquet")]
        assert len(files) == 1
        poss = pq.read_table(files[0], columns=["pos"]).column("pos").to_pylist()
        assert poss == sorted(poss) == list(range(1, len(poss) + 1))
    # deterministic across reruns: same assignment as shuffle_shards
    ref = {(r.doc_id, r.shard, r.pos) for r in llmops.shuffle_shards(df, "doc_id", n_shards=8, payload_cols=("text",)).collect()}
    got = {(r.doc_id, r.shard, r.pos) for r in back.select("doc_id", "shard", "pos").collect()}
    assert got == ref


def test_shard_manifest_write_and_verify(spark, tmp_path):
    """Manifest integrity loop over a sharded corpus: write_shard_manifest
    records per-shard rows/bytes/content digests (distributed aggregates,
    only n_shards rows to the driver); verify_shard_manifest reports no
    discrepancies on the intact copy, then pinpoints the exact shard after
    a simulated truncated transfer (one shard dir deleted) and after silent
    row corruption (a shard's file rewritten with a changed value)."""
    import glob
    import json
    import os
    import shutil

    import pyarrow.parquet as pq

    from pyspark_engine.runtime import (
        verify_shard_manifest,
        write_shard_manifest,
        write_training_shards,
    )

    df = spark.createDataFrame([(i, f"doc {i}") for i in range(300)], "doc_id long, text string")
    dst = str(tmp_path / "shards")
    write_training_shards(df, dst, "doc_id", n_shards=6, payload_cols=["text"])
    stats = write_shard_manifest(spark, dst)
    m = json.load(open(os.path.join(dst, "_MANIFEST.json")))
    assert m["total_rows"] == 300 and m["n_shards"] == stats.count()
    assert m["total_bytes"] > 0 and all(r["n_bytes"] > 0 for r in m["shards"])
    assert verify_shard_manifest(spark, dst) == []

    # regression (round-7 ADVICE): verify compares ON-DISK BYTES against the
    # manifest's n_bytes — a stale/partial manifest byte count is flagged
    mpath = os.path.join(dst, "_MANIFEST.json")
    m2 = json.load(open(mpath))
    m2["shards"][0]["n_bytes"] += 1
    json.dump(m2, open(mpath, "w"))
    sidb = m2["shards"][0]["shard"]
    problems = verify_shard_manifest(spark, dst)
    assert any(f"shard {sidb}" in p and "bytes" in p for p in problems)
    m2["shards"][0]["n_bytes"] -= 1
    json.dump(m2, open(mpath, "w"))
    assert verify_shard_manifest(spark, dst) == []

    # truncated transfer: a whole shard vanishes -> named discrepancy
    victim = sorted(glob.glob(f"{dst}/shard=*"))[0]
    sid = int(victim.rsplit("=", 1)[1])
    shutil.rmtree(victim)
    problems = verify_shard_manifest(spark, dst)
    assert any(f"shard {sid}" in p and "missing" in p for p in problems)

    # silent corruption: rewrite one surviving shard's file with a flipped
    # value -> content digest catches it even though the row count matches
    surv = sorted(glob.glob(f"{dst}/shard=*"))[0]
    f = glob.glob(f"{surv}/*.parquet")[0]
    tbl = pq.read_table(f)
    pdf = tbl.to_pandas()
    pdf.loc[0, "text"] = "tampered"
    pdf.to_parquet(f, index=False)
    # drop the stale Hadoop .crc sidecar: TRULY silent corruption (a copy
    # tool regenerates checksums) — the manifest digest is the only defense
    for crc in glob.glob(f"{surv}/.*.crc"):
        os.remove(crc)
    sid2 = int(surv.rsplit("=", 1)[1])
    problems = verify_shard_manifest(spark, dst)
    assert any(f"shard {sid2}" in p and "digest" in p for p in problems)


def test_url_normalize_rules(spark):
    rows = [
        (1, "https://Example.COM:443/a/b/?b=2&a=1#frag"),
        (2, "https://example.com/a/b?a=1&b=2"),
        (3, "http://example.com:80"),
        (4, "https://example.com/other"),
    ]
    df = spark.createDataFrame(rows, "row_id long, url string")
    canon = {r.row_id: r.c for r in df.select("row_id", llmops.url_normalize(F.col("url")).alias("c")).collect()}
    assert canon[1] == canon[2] == "https://example.com/a/b?a=1&b=2"
    assert canon[3] == "http://example.com/"
    out = {r.canon_url: r.row_id for r in llmops.url_dedup(df, "row_id", "url").collect()}
    assert out["https://example.com/a/b?a=1&b=2"] == 1
    assert len(out) == 3


def test_temporal_split_boundaries(spark):
    rows = [(1, 999), (2, 1000), (3, 1999), (4, 2000), (5, 5000)]
    df = spark.createDataFrame(rows, "i long, tsm long").select(
        "i", F.timestamp_millis(F.col("tsm")).alias("ts")
    )
    out = {r.i: r.split for r in llmops.temporal_split(df, "ts", 1000, 2000).collect()}
    assert out == {1: "train", 2: "val", 3: "val", 4: "test", 5: "test"}


def test_url_normalize_idempotent_hypothesis(spark):
    """normalize(normalize(u)) == normalize(u): canonical forms are fixed
    points, so re-ingesting already-canonical URLs never re-splits groups."""
    from hypothesis import given, settings, strategies as st

    seg = st.text(alphabet="abcXYZ019-._~", min_size=0, max_size=8)
    urls = st.builds(
        lambda sch, host, port, path, q, frag: (
            f"{sch}://{host}{port}/{path}" + (f"?{q}" if q else "") + (f"#{frag}" if frag else "")
        ),
        st.sampled_from(["http", "HTTP", "https", "HTTPS"]),
        st.builds(lambda a, b: f"{a}.{b}.com", seg.filter(bool), seg.filter(bool)),
        st.sampled_from(["", ":80", ":443", ":8080"]),
        seg,
        st.lists(st.builds(lambda k, v: f"{k}={v}", seg.filter(bool), seg), max_size=3).map("&".join),
        seg,
    )

    @settings(max_examples=30, deadline=None)
    @given(st.lists(urls, min_size=1, max_size=20, unique=True))
    def check(batch):
        df = spark.createDataFrame([(i, u) for i, u in enumerate(batch)], "i long, url string")
        once = df.select("i", llmops.url_normalize(F.col("url")).alias("c1"))
        twice = once.select("i", "c1", llmops.url_normalize(F.col("c1")).alias("c2"))
        rows = twice.collect()
        assert all(r.c1 == r.c2 for r in rows)

    check()


def test_exact_dedup_priority_string_ids(spark):
    """The (priority DESC, id ASC) tie-break must work for non-numeric id
    types (no arithmetic negation): string doc ids, tie on priority ->
    lexicographically lowest id wins."""
    rows = [
        ("doc-a", "same text", 5),
        ("doc-c", "same text", 9),
        ("doc-b", "same text", 9),   # tie at 9 -> "doc-b" < "doc-c"
        ("doc-z", "unique", 1),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string, priority int")
    out = {r.doc_id: r for r in llmops.exact_dedup_priority(df, "doc_id", "text", "priority").collect()}
    assert set(out) == {"doc-b", "doc-z"}
    assert out["doc-b"].priority == 9


def test_event_sequences_drops_null_key_and_ts(spark):
    """Null user / null timestamp rows belong to no orderable history —
    dropped, matching sessionize/cohort_retention; null vals order LAST
    (engine-portable NULLS LAST, not Spark's default NULLS FIRST)."""
    rows = [
        (1, 0, 100),
        (1, 1000, None),   # null val sorts AFTER 101 at a later ts anyway
        (1, 500, 101),
        (None, 2000, 7),   # null key dropped
        (2, None, 8),      # null ts dropped
    ]
    df = spark.createDataFrame(rows, "uid long, tsm long, eid long").select(
        "uid", F.timestamp_millis(F.col("tsm")).alias("ts"), "eid"
    )
    out = {(r.uid, r.seq_idx): r for r in llmops.event_sequences(df, "uid", "ts", "eid", seq_len=4).collect()}
    assert set(out) == {(1, 0)}
    assert out[(1, 0)].vals == [100, 101, None]
    # same-ts null ordering: null val ties at one ts go last
    rows2 = [(1, 0, None), (1, 0, 50)]
    df2 = spark.createDataFrame(rows2, "uid long, tsm long, eid long").select(
        "uid", F.timestamp_millis(F.col("tsm")).alias("ts"), "eid"
    )
    seq2 = llmops.event_sequences(df2, "uid", "ts", "eid", seq_len=4).collect()
    assert seq2[0].vals == [50, None]


def test_url_normalize_port_strip_is_scheme_aware(spark):
    """:443 on an http URL (and :80 on https) is a REAL distinct resource —
    only the scheme's own default port strips."""
    rows = [
        (1, "http://example.com:443/x"),
        (2, "https://example.com:443/x"),
        (3, "https://example.com:80/x"),
        (4, "http://example.com:80/x"),
    ]
    df = spark.createDataFrame(rows, "row_id long, url string")
    canon = {r.row_id: r.c for r in df.select("row_id", llmops.url_normalize(F.col("url")).alias("c")).collect()}
    assert canon[1] == "http://example.com:443/x"    # kept: not http's default
    assert canon[2] == "https://example.com/x"       # stripped: https default
    assert canon[3] == "https://example.com:80/x"    # kept: not https's default
    assert canon[4] == "http://example.com/x"        # stripped: http default


def test_semantic_decontaminate_radius2_exhaustive_recall(spark):
    """With n_planes=2 and multiprobe=2 the probe set covers the ENTIRE
    2-bit code space, so every qualifying pair MUST be found — exact recall
    by construction, verified against brute-force cosine."""
    import numpy as np

    rng = np.random.default_rng(11)
    train = [(i, rng.normal(size=8).astype("float32").tolist()) for i in range(40)]
    bench = [(1000 + i, train[3 * i][1]) for i in range(8)]  # exact copies
    t = spark.createDataFrame(train, "vec_id long, embedding array<float>")
    b = spark.createDataFrame(bench, "vec_id long, embedding array<float>")
    out = llmops.semantic_decontaminate(
        t, b, dim=8, threshold=0.95, n_planes=2, multiprobe=2
    )
    got = {r.vec_id for r in out.collect()}
    # brute force on the driver (40x8 tiny)
    tv = {i: np.array(v) for i, v in train}
    want = set()
    for bid, bv in bench:
        bvn = np.array(bv)
        for i, v in tv.items():
            if float(v @ bvn / (np.linalg.norm(v) * np.linalg.norm(bvn))) >= 0.95:
                want.add(i)
    assert got == want and len(want) >= 8


def test_jaccard_pairs_exact_matches_brute_force(spark):
    """The prefix-filter join is EXACT by construction — every pair with
    shingle-Jaccard >= t must appear, none below.  Verified against a
    driver-side brute force over all pairs, including boundary cases the
    float prefix math could get wrong (J exactly at threshold, t*n hitting
    an integer)."""
    base = "the quick brown fox jumps over the lazy dog near the old river bank today"
    docs = [
        (1, base),
        (2, base.replace("lazy", "sleepy")),                 # near-dup of 1
        (3, base),                                           # exact dup of 1
        (4, "completely different text about spark engines and shuffle planning at scale"),
        (5, "the quick brown fox jumps over the lazy dog near the old river bank tonight"),
        (6, "short doc"),                                     # < shingle tokens -> dropped
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    for t in (0.4, 0.5, 0.8):
        got = {
            (r.id_a, r.id_b): (r.inter_n, r.union_n)
            for r in llmops.jaccard_pairs_exact(df, "doc_id", "text", threshold=t).collect()
        }
        # r9: the collapse probe is a performance gate only — forcing either
        # path must return the identical pair set (incl. the exact-dup 1-3)
        for mode in ("always", "never"):
            forced = {
                (r.id_a, r.id_b): (r.inter_n, r.union_n)
                for r in llmops.jaccard_pairs_exact(
                    df, "doc_id", "text", threshold=t, collapse=mode
                ).collect()
            }
            assert forced == got, f"collapse={mode} diverged at t={t}"
        # brute force with the same shingle definition
        import itertools

        def shingles(s):
            toks = s.lower().split()
            return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

        want = {}
        gs = {i: shingles(s) for i, s in docs if len(s.split()) >= 3}
        for a, b in itertools.combinations(sorted(gs), 2):
            inter = len(gs[a] & gs[b])
            union = len(gs[a] | gs[b])
            if union and inter / union >= t:
                want[(a, b)] = (inter, union)
        assert got == want, f"threshold {t}"
    # sanity: the exact-dup pair is present with inter == union
    got05 = {
        (r.id_a, r.id_b): (r.inter_n, r.union_n)
        for r in llmops.jaccard_pairs_exact(df, "doc_id", "text", threshold=0.5).collect()
    }
    assert got05[(1, 3)][0] == got05[(1, 3)][1]


def test_lsh_recall_audit_full_outer_surface(spark):
    """The audit's FULL-OUTER accounting: n_lsh_only must be 0 on a healthy
    corpus (LSH pairs verify the same exact Jaccard, so they are a subset of
    truth), n_missed = truth − hits, and recall_permille is derived from the
    hit count — a truth-side completeness bug would now surface as
    n_lsh_only > 0 instead of inflating recall."""
    base = "the quick brown fox jumps over the lazy dog near the old river bank today"
    docs = [
        (1, base),
        (2, base.replace("lazy", "sleepy")),
        (3, base),
        (4, "completely different text about spark engines and shuffle planning at scale"),
        (5, "the quick brown fox jumps over the lazy dog near the old river bank tonight"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    r = llmops.lsh_recall_audit(df, "doc_id", "text", threshold=0.4).collect()[0]
    assert r.n_lsh_only == 0
    assert r.n_missed == r.n_true_pairs - (r.n_lsh_pairs - r.n_lsh_only)
    assert r.n_true_pairs >= 3  # (1,2),(1,3),(1,5) at least
    assert 0 <= r.recall_permille <= 1000
    # empty corpus: no division blow-up, recall defined as 1000
    empty = spark.createDataFrame([], "doc_id long, text string")
    r0 = llmops.lsh_recall_audit(empty, "doc_id", "text", threshold=0.4).collect()[0]
    assert (r0.n_true_pairs, r0.n_lsh_pairs, r0.n_lsh_only, r0.recall_permille) == (0, 0, 0, 1000)


def test_recall_audit_tuning_loop_end_to_end(spark):
    """RECIPES.md §1 measured-recall loop, end to end: deterministic hash
    SAMPLE → lsh_recall_audit on the sample → increase bands until the
    measured recall clears the target → run the full-corpus near-dup pass at
    the audited band count and confirm the measurement transferred.  The
    corpus plants near-dup pairs around J≈0.5–0.7, where a low band count
    (long bands, r = 64/b rows each) measurably misses pairs and a high one
    recovers them — so the loop must actually tune, not rubber-stamp."""
    import random

    rng = random.Random(77)
    words = [f"w{i}" for i in range(400)]
    docs = []
    for i in range(40):  # planted near-dup pairs
        base = [rng.choice(words) for _ in range(20)]
        docs.append((i, " ".join(base)))
        var = list(base)
        for pos in ([5] if i % 2 else [5, 12]):  # k=1 → J≈0.71, k=2 → J≈0.5
            var[pos] = rng.choice(words)
        docs.append((i + 1000, " ".join(var)))
    for i in range(40):  # unrelated filler
        docs.append((i + 5000, " ".join(rng.choice(words) for _ in range(20))))
    corpus = spark.createDataFrame(docs, "doc_id long, text string")

    # 1. sample (deterministic md5 keep-rule — reruns audit the same subset)
    sample = llmops.sample_hash(corpus, "doc_id", 0.7, salt="audit")

    # 2+3. audit, tuning bands upward until measured recall >= 900 permille
    target, chosen, audits = 900, None, {}
    for bands in (2, 8, 32):
        r = llmops.lsh_recall_audit(
            sample, "doc_id", "text", threshold=0.4, num_hashes=64, bands=bands,
            portable=True,
        ).collect()[0]
        assert r.n_lsh_only == 0  # ground-truth completeness, not tuning
        audits[bands] = r
        if r.recall_permille >= target:
            chosen = bands
            break
    assert audits[2].n_true_pairs >= 5  # the sample kept enough planted pairs
    assert audits[2].recall_permille < target  # low bands measurably miss
    assert chosen is not None and chosen > 2  # the loop actually tuned

    # 4. full-corpus run at the audited band count: measurement transfers
    truth = llmops.jaccard_pairs_exact(corpus, "doc_id", "text", threshold=0.4)
    found = llmops.minhash_lsh_pairs(
        corpus, "doc_id", "text", num_hashes=64, bands=chosen, threshold=0.4,
        portable=True,
    )
    n_truth, n_found = truth.count(), found.count()
    assert n_truth >= 30  # most planted pairs are above threshold
    assert n_found / n_truth >= target / 1000


def test_wav_codec_spec_vector_and_features(spark):
    """The WAV pair is two independent implementations: synth packs the
    RIFF container by hand (struct), decode parses it with CPython's stdlib
    wave module.  Pin (a) the exact golden header bytes per the WAV spec for
    a known tiny ramp, and (b) hand-computed integer features through the
    full Spark mapInPandas path."""
    import struct

    params = spark.createDataFrame(
        [(7, 3, 8000, 1, 2)], "doc_id long, n long, rate long, a long, b long"
    )
    wav = llmops.synth_wav(params, "doc_id", "n", "rate", "a", "b")
    payload = bytes(wav.collect()[0].payload)
    # golden header: RIFF size 36+6, PCM fmt chunk (tag 1, mono, 8 kHz,
    # byte-rate 16000, block align 2, 16 bits), data chunk of 6 bytes
    want_hdr = (
        b"RIFF" + struct.pack("<I", 42) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data" + struct.pack("<I", 6)
    )
    assert payload[:44] == want_hdr and len(payload) == 50
    # samples: ((1*i + 2) % 65536) - 32768 for i=0,1,2 → -32766, -32765, -32764
    assert struct.unpack("<3h", payload[44:]) == (-32766, -32765, -32764)

    feats = llmops.decode_wav_features(wav, "doc_id", "payload").collect()[0]
    assert (feats.sample_rate, feats.n_channels, feats.bits) == (8000, 1, 16)
    assert (feats.n_samples, feats.wire_len) == (3, 50)
    assert feats.peak_abs == 32766
    assert feats.sumsq == 32766**2 + 32765**2 + 32764**2


def test_wav_frame_energy_fanout_and_tail(spark):
    """1→N frame fan-out with a partial tail frame: 5 samples at frame_len 2
    → frames of 2, 2, 1 with hand-computed integer energies."""
    params = spark.createDataFrame(
        [(1, 5, 8000, 0, 32770)], "doc_id long, n long, rate long, a long, b long"
    )
    # a=0, b=32770 → every sample = (32770 % 65536) - 32768 = 2
    wav = llmops.synth_wav(params, "doc_id", "n", "rate", "a", "b")
    got = {
        r.frame_idx: r
        for r in llmops.wav_frame_energy(wav, "doc_id", "payload", frame_len=2).collect()
    }
    assert set(got) == {0, 1, 2}
    assert (got[0].n_samples, got[0].peak_abs, got[0].sumsq) == (2, 2, 8)
    assert (got[1].n_samples, got[1].sumsq) == (2, 8)
    assert (got[2].n_samples, got[2].peak_abs, got[2].sumsq) == (1, 2, 4)  # tail


def test_wav_trim_silence_endpoints_only(spark):
    """Endpoint trimming semantics: leading/trailing silent frames drop
    (frame-aligned — a boundary frame mixing pad and signal is kept whole),
    interior quiet passages SURVIVE, and the re-encoded payload is a valid
    spec WAV the decoder parses back."""
    import io
    import struct
    import wave

    import numpy as np

    # 4 frames of 4 samples: [silence][signal][silence][signal] — trim drops
    # nothing interior; then a pure-lead/tail case
    sig = np.array([0, 0, 0, 0, 5, -6, 7, 8, 0, 0, 0, 0, 1, 2, 3, 4], dtype="<i2")
    payload = (
        b"RIFF" + struct.pack("<I", 36 + sig.nbytes) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data" + struct.pack("<I", sig.nbytes) + sig.tobytes()
    )
    df = spark.createDataFrame([(1, bytearray(payload))], "doc_id long, payload binary")
    out = bytes(
        llmops.wav_trim_silence(df, "doc_id", "payload", frame_len=4).collect()[0].payload
    )
    with wave.open(io.BytesIO(out)) as w:
        kept = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")
    # leading silent frame dropped; interior silent frame (idx 2) kept
    assert kept.tolist() == sig[4:].tolist()

    # all-silence input -> empty but VALID container
    silent = np.zeros(8, dtype="<i2")
    p2 = (
        b"RIFF" + struct.pack("<I", 36 + silent.nbytes) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data" + struct.pack("<I", silent.nbytes) + silent.tobytes()
    )
    df2 = spark.createDataFrame([(2, bytearray(p2))], "doc_id long, payload binary")
    out2 = bytes(
        llmops.wav_trim_silence(df2, "doc_id", "payload", frame_len=4).collect()[0].payload
    )
    assert len(out2) == 44
    with wave.open(io.BytesIO(out2)) as w:
        assert w.getnframes() == 0 and w.getframerate() == 8000


def test_ppm_codec_spec_vector_and_resize(spark):
    """P6 codec pair: golden header bytes for a known tiny image, the spec
    parser handling #-comments in the header (which our encoder never
    writes — parser generality beyond the synth path), and the 2×2
    floor-mean resize with crop-to-multiple on hand-computed pixels."""
    params = spark.createDataFrame([(3, 4, 2, 0, 0)], "doc_id long, w long, h long, a long, b long")
    payload = bytes(llmops.synth_ppm(params, "doc_id", "w", "h", "a", "b").collect()[0].payload)
    assert payload[:11] == b"P6\n4 2\n255\n" and len(payload) == 11 + 24
    # pixel i channel c = (0*i + 0 + 85*c) % 256 -> every pixel (0, 85, 170)
    assert payload[11:14] == bytes([0, 85, 170])

    # parser handles whitespace variants + comments (not producible by synth)
    hand = b"P6 # comment\n# another\n 4\t2 255\n" + bytes([7] * 24)
    w, h, maxval, img = llmops._parse_ppm(hand)
    assert (w, h, maxval) == (4, 2, 255) and img.shape == (2, 4, 3) and int(img[0, 0, 0]) == 7

    # resize: 4x2, block 2 -> 2x1; floor-mean of constant channels is exact
    df = spark.createDataFrame([(1, bytearray(payload))], "doc_id long, payload binary")
    small = llmops.resize_ppm_blockmean(df, "doc_id", "payload", block=2)
    feats = llmops.decode_ppm_features(small, "doc_id", "payload").collect()[0]
    assert (feats.width, feats.height) == (2, 1)
    assert (feats.sum_r, feats.sum_g, feats.sum_b) == (0, 170, 340)  # 2 px of (0,85,170)
    assert feats.wire_len == len(b"P6\n2 1\n255\n") + 6


def test_wav_downsample_floor_and_tail_crop(spark):
    """Decimation semantics: blocks of ``factor`` collapse to FLOOR-mean
    (pinned on a negative sum, where floor and truncate differ), the tail
    remainder is cropped, and the output rate is rate // factor."""
    import io
    import struct
    import wave

    import numpy as np

    sig = np.array([-5, -4, 10, 11, 7], dtype="<i2")  # blocks: (-5,-4), (10,11); tail 7 cropped
    payload = (
        b"RIFF" + struct.pack("<I", 36 + sig.nbytes) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 9000, 18000, 2, 16)
        + b"data" + struct.pack("<I", sig.nbytes) + sig.tobytes()
    )
    df = spark.createDataFrame([(1, bytearray(payload))], "doc_id long, payload binary")
    out = bytes(llmops.wav_downsample(df, "doc_id", "payload", factor=2).collect()[0].payload)
    with wave.open(io.BytesIO(out)) as w:
        assert w.getframerate() == 4500
        kept = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")
    # floor((-5 + -4)/2) = -5 (truncation would give -4); floor(21/2) = 10
    assert kept.tolist() == [-5, 10]


def test_decode_wav_features_stereo_and_8bit(spark):
    """decode_wav_features on containers our synth never writes: 2-channel
    16-bit (frame count is per frame, samples span both channels) and
    8-bit unsigned PCM (spec: 8-bit WAV is unsigned) — the parser handles
    the full fmt-chunk generality, not just the synth subset."""
    import struct

    def wav(nch, width, rate, data):
        return (
            b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack(
                "<IHHIIHH", 16, 1, nch, rate, rate * nch * width, nch * width, width * 8
            )
            + b"data" + struct.pack("<I", len(data)) + data
        )

    import numpy as np

    stereo = np.array([1, -2, 3, -4], dtype="<i2")  # 2 frames x 2 channels
    eight = bytes([0, 128, 255, 7])                  # 4 unsigned 8-bit samples
    df = spark.createDataFrame(
        [(1, bytearray(wav(2, 2, 16000, stereo.tobytes()))),
         (2, bytearray(wav(1, 1, 8000, eight)))],
        "doc_id long, payload binary",
    )
    out = {r.doc_id: r for r in llmops.decode_wav_features(df, "doc_id", "payload").collect()}
    assert (out[1].n_channels, out[1].bits, out[1].n_samples) == (2, 16, 2)
    assert out[1].peak_abs == 4 and out[1].sumsq == 1 + 4 + 9 + 16
    assert (out[2].n_channels, out[2].bits, out[2].n_samples) == (1, 8, 4)
    assert out[2].peak_abs == 255 and out[2].sumsq == 0 + 128**2 + 255**2 + 49


def test_wav_transforms_reject_non_mono16(spark):
    """The re-encoding transforms (trim, downsample) are defined for 16-bit
    mono only and must FAIL FAST on stereo or 8-bit input instead of
    flattening interleaved channels / misreading bytes as int16."""
    import struct

    import numpy as np
    import pytest

    stereo = np.array([1, -2, 3, -4], dtype="<i2")
    payload = (
        b"RIFF" + struct.pack("<I", 36 + stereo.nbytes) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 16000, 64000, 4, 16)
        + b"data" + struct.pack("<I", stereo.nbytes) + stereo.tobytes()
    )
    df = spark.createDataFrame([(1, bytearray(payload))], "doc_id long, payload binary")
    with pytest.raises(Exception, match="16-bit mono"):
        llmops.wav_trim_silence(df, "doc_id", "payload", frame_len=2).collect()
    with pytest.raises(Exception, match="16-bit mono"):
        llmops.wav_downsample(df, "doc_id", "payload", factor=2).collect()


def test_png_codec_spec_filtered_scanlines():
    """PNG encoder against an INDEPENDENT spec implementation: decompress
    the encoder's IDAT with stdlib zlib and compare the filtered scanlines
    byte-for-byte against filters computed here with plain per-pixel loops
    straight from the PNG spec (§9) — this catches an encoder/decoder pair
    that agrees with itself but not with the format (a matched filter bug
    would survive the roundtrip AND the parameter oracle, since filters are
    lossless either way).  Also pins the chunk layout: signature, IHDR
    fields big-endian, CRC32 over type+data."""
    import struct
    import zlib

    import numpy as np

    from pyspark_engine.llmops import PNG_SIG, _png_encode

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(6, 4, 3), dtype=np.uint8)  # 6 rows: filters 0..4,0
    raw = _png_encode(img)
    assert raw[:8] == PNG_SIG
    # IHDR: len 13, fields per spec
    assert raw[8:16] == struct.pack(">I", 13) + b"IHDR"
    assert struct.unpack(">IIBBBBB", raw[16:29]) == (4, 6, 8, 2, 0, 0, 0)
    assert struct.unpack(">I", raw[29:33])[0] == zlib.crc32(raw[12:29]) & 0xFFFFFFFF

    (idat_len,) = struct.unpack(">I", raw[33:37])
    assert raw[37:41] == b"IDAT"
    stream = zlib.decompress(raw[41 : 41 + idat_len])

    # independent spec-text reimplementation (per-pixel loops, no numpy)
    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    h, w, bpp = 6, 4, 3
    px = [[int(v) for v in img[y].reshape(-1)] for y in range(h)]
    want = bytearray()
    for y in range(h):
        f = y % 5
        want.append(f)
        for i in range(w * bpp):
            x = px[y][i]
            a = px[y][i - bpp] if i >= bpp else 0
            b = px[y - 1][i] if y > 0 else 0
            c = px[y - 1][i - bpp] if (y > 0 and i >= bpp) else 0
            pred = {0: 0, 1: a, 2: b, 3: (a + b) // 2, 4: paeth(a, b, c)}[f]
            want.append((x - pred) % 256)
    assert stream == bytes(want)


def test_png_decode_guards():
    """Decoder gates: bad signature, CRC corruption, and unsupported IHDR
    (16-bit depth) are refused rather than misread; multi-IDAT streams
    concatenate per spec."""
    import struct
    import zlib

    import numpy as np

    from pyspark_engine.llmops import PNG_SIG, _png_decode, _png_encode

    img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    raw = _png_encode(img)

    with pytest.raises(ValueError, match="signature"):
        _png_decode(b"\x89PNX" + raw[4:])
    corrupted = bytearray(raw)
    corrupted[45] ^= 0x01  # inside IDAT data
    with pytest.raises(ValueError, match="CRC"):
        _png_decode(bytes(corrupted))

    # 16-bit IHDR: rebuild the IHDR chunk with depth 16 and a valid CRC —
    # the decoder must refuse on IHDR, not misparse the pixel block
    ihdr = struct.pack(">IIBBBBB", 3, 2, 16, 2, 0, 0, 0)
    chunk = struct.pack(">I", 13) + b"IHDR" + ihdr + struct.pack(
        ">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF
    )
    with pytest.raises(ValueError, match="unsupported PNG"):
        _png_decode(PNG_SIG + chunk + raw[33:])

    # multi-IDAT: split the compressed stream into two chunks
    (idat_len,) = struct.unpack(">I", raw[33:37])
    data = raw[41 : 41 + idat_len]
    half = len(data) // 2
    parts = b""
    for piece in (data[:half], data[half:]):
        parts += struct.pack(">I", len(piece)) + b"IDAT" + piece + struct.pack(
            ">I", zlib.crc32(b"IDAT" + piece) & 0xFFFFFFFF
        )
    rebuilt = raw[:33] + parts + raw[41 + idat_len + 4 :]
    w, h, d, c, _nft, back = _png_decode(rebuilt)
    assert (w, h, d, c) == (3, 2, 8, 2)
    assert np.array_equal(back, img)


def test_png_resize_blockmean_roundtrip(spark):
    """PNG resize through the Spark operators: synth (known constant
    channels) → 2×2 floor-mean → decode; dimensions, filter count, and
    exact channel sums pinned — the q165 loop on hand-checkable pixels."""
    params = spark.createDataFrame(
        [(3, 4, 2, 0, 0)], "doc_id long, w long, h long, a long, b long"
    )
    png = llmops.synth_png(params, "doc_id", "w", "h", "a", "b")
    feats = llmops.decode_png_features(png, "doc_id", "payload").collect()[0]
    # every pixel (0, 85, 170); 8 pixels; 2 rows -> filter types {0, 1}
    assert (feats.width, feats.height, feats.bit_depth, feats.color_type) == (4, 2, 8, 2)
    assert feats.n_filter_types == 2 and feats.crc_ok
    assert (feats.sum_r, feats.sum_g, feats.sum_b) == (0, 85 * 8, 170 * 8)

    small = llmops.resize_png_blockmean(png, "doc_id", "payload", block=2)
    sf = llmops.decode_png_features(small, "doc_id", "payload").collect()[0]
    assert (sf.width, sf.height, sf.n_filter_types) == (2, 1, 1)
    assert (sf.sum_r, sf.sum_g, sf.sum_b) == (0, 170, 340)


def test_pii_scrub_v2_composition(spark):
    """pii_scrub_v2 edge semantics on hand-built text: (1) a VALID IBAN
    redacts to <IBAN> before the card pass can bite its digits, (2) an
    INVALID-checksum IBAN survives the IBAN pass but its ≥13-digit tail
    over-redacts to DE<CC>, (3) a valid spaced card redacts whole, (4)
    counts are per-signal on the ORIGINAL text (the card run also counts as
    a phone), (5) short digit runs and non-PII text pass through verbatim."""
    valid_iban = "GB82WEST12345698765432"
    bad_iban = "GB82WEST12345698765433"
    rows = [
        (1, f"send to {valid_iban} today"),
        (2, f"send to {bad_iban} today"),
        (3, "pay 4539 1488 0343 6467 or ring me"),
        (4, "order 12345 on 2023-01-15 from a@b.io"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in llmops.pii_scrub_v2(df, "doc_id", "text").collect()}

    assert out[1].clean_text == "send to <IBAN> today"
    assert (out[1].n_iban_candidates, out[1].n_iban_valid) == (1, 1)
    # invalid checksum: not PII as an IBAN, but WEST12345698765433's digit
    # run is only 18 digits AFTER the letters — the run "12345698765433" is
    # 14 digits >= 13 -> the card pass over-redacts it
    assert out[2].clean_text == "send to GB82WEST<CC> today"
    assert (out[2].n_iban_candidates, out[2].n_iban_valid) == (1, 0)
    assert out[3].clean_text == "pay <CC> or ring me"
    assert (out[3].n_card_candidates, out[3].n_card_valid) == (1, 1)
    assert out[3].n_phone == 1  # the spaced card run also matches the phone shape
    # the dashed date matches the (documented, deliberately greedy) phone
    # shape from pii_scrub v1 — same trade-off, unchanged by composition
    assert out[4].clean_text == "order 12345 on <PHONE> from <EMAIL>"
    assert (out[4].n_card_candidates, out[4].n_email, out[4].n_phone) == (0, 1, 1)


def test_jpeg_dct_and_tables_against_spec_text():
    """The JPEG transform and entropy tables against INDEPENDENT spec-text
    reimplementations (same rationale as the PNG scanline test — a matched
    encoder/decoder bug survives any roundtrip):

    * forward DCT of a block == the T.81 A.3.3 double-sum formula computed
      with plain loops;
    * the canonical Huffman code assignment (Annex C) for the Annex K DC
      luminance table == codes derived here by the textbook
      ascending-length rule;
    * EXTEND (F.2.2.1) inverts the magnitude encoding for every category.
    """
    import math

    import numpy as np

    from pyspark_engine import jpeg as J

    rng = np.random.default_rng(3)
    blk = rng.integers(-128, 128, size=(8, 8)).astype(float)
    m = J._dct_matrix()
    got = m @ blk @ m.T

    def c(u):
        return 1 / math.sqrt(2) if u == 0 else 1.0

    for u in range(8):
        for v in range(8):
            s = sum(
                blk[y][x]
                * math.cos((2 * x + 1) * v * math.pi / 16)
                * math.cos((2 * y + 1) * u * math.pi / 16)
                for x in range(8)
                for y in range(8)
            )
            want = 0.25 * c(u) * c(v) * s
            assert abs(got[u, v] - want) < 1e-9

    # canonical code construction, independently
    bits, vals = J.DC_L
    codes = J._huff_codes(bits, vals)
    lengths = [ln for ln in range(1, 17) for _ in range(bits[ln - 1])]
    code, want = 0, {}
    prev_len = lengths[0]
    for v, ln in zip(vals, lengths):
        code <<= ln - prev_len
        want[v] = (code, ln)
        code += 1
        prev_len = ln
    assert codes == want

    # EXTEND inverts magnitude coding for every signed value in range
    for v in range(-255, 256):
        cat, bits_ = J._magnitude(v)
        assert J._extend(bits_, cat) == v


def test_jpeg_roundtrip_and_guards(spark):
    """Codec pair end-to-end: smooth images reconstruct within tight
    bounds, byte stuffing survives (blocks engineered to emit 0xFF bytes),
    and the decoder refuses what it cannot honestly decode (bad SOI,
    progressive SOF2, subsampled streams, truncated entropy data)."""
    import numpy as np

    from pyspark_engine import jpeg as J

    img = llmops._jpeg_ramp(24, 18, 2, 2, 40)
    raw = J.jpeg_encode(img)
    w, h, nc, back = J.jpeg_decode(raw)
    assert (w, h, nc) == (24, 18, 3)
    e = np.abs(back.astype(int) - img.astype(int))
    assert e.max() <= 8 and e.mean() <= 2.0
    # byte stuffing actually exercised: a seeded NOISE image emits stuffed
    # 0xFF 0x00 pairs in its entropy stream (smooth ramps rarely do), and
    # the decoder must swallow them transparently — only the decode result,
    # not the stream bytes, proves the stuffing logic on both sides
    noisy = np.random.default_rng(0).integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    nraw = J.jpeg_encode(noisy)
    assert b"\xff\x00" in nraw[nraw.find(b"\xff\xda"):]
    nw, nh, _, nback = J.jpeg_decode(nraw)
    assert (nw, nh) == (16, 16)
    assert nback.shape == noisy.shape  # lossy content, exact geometry

    with pytest.raises(ValueError, match="SOI"):
        J.jpeg_decode(b"\x00\x00" + raw[2:])
    sof2 = raw.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="progressive"):
        J.jpeg_decode(sof2)
    # 1x2 (vertical-only) subsampling in the SOF component spec: outside
    # the supported set {4:4:4, 4:2:0, 4:2:2, 4:1:1}
    i = raw.find(b"\xff\xc0")
    sub = bytearray(raw)
    sub[i + 11] = 0x12  # component 1 sampling factors
    with pytest.raises(ValueError, match="subsampling"):
        J.jpeg_decode(bytes(sub))
    with pytest.raises(ValueError):
        J.jpeg_decode(raw[: len(raw) // 2])

    # Spark wrappers: synth -> decode features match the one-stage fidelity
    params = spark.createDataFrame(
        [(1, 17, 13, 1, 2, 50)], "doc_id long, w long, h long, ay long, ax long, b long"
    )
    payloads = llmops.synth_jpeg(params, "doc_id", "w", "h", "ay", "ax", "b")
    feats = llmops.decode_jpeg_features(payloads, "doc_id", "payload").collect()[0]
    assert (feats.width, feats.height, feats.n_components, feats.n_blocks) == (17, 13, 3, 6)
    fid = llmops.jpeg_fidelity(params, "doc_id", "w", "h", "ay", "ax", "b").collect()[0]
    assert (fid.width, fid.height, fid.n_blocks) == (17, 13, 6)
    assert fid.max_err <= 8 and fid.sum_abs_err <= 2 * 3 * 17 * 13


def test_jpeg_420_subsampled_roundtrip(spark):
    """The 4:2:0 interleaved-MCU layout end to end: SOF advertises
    (0x22, 0x11, 0x11), the entropy stream interleaves Y00 Y01 Y10 Y11 Cb
    Cr per 16x16 MCU, chroma is 2x2-mean downsampled and nearest-neighbor
    upsampled — smooth ramps reconstruct within the same bounds as 4:4:4
    (linear chroma loses nothing beyond quantization), and a 4:2:0 stream
    is meaningfully SMALLER than the 4:4:4 encoding of the same image
    (half the chroma blocks)."""
    import struct

    import numpy as np

    from pyspark_engine import jpeg as J

    img = llmops._jpeg_ramp(33, 20, 2, 1, 40)  # spans partial edge MCUs
    raw420 = J.jpeg_encode(img, subsample=True)
    i = raw420.find(b"\xff\xc0")
    assert raw420[i + 11] == 0x22 and raw420[i + 14] == 0x11
    # the chroma saving shows on chroma-RICH content (a smooth ramp's
    # chroma blocks are near-empty either way, and 4:2:0's 16x16 MCU
    # padding can even cost a few bytes there)
    noisy = np.random.default_rng(5).integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    assert len(J.jpeg_encode(noisy, subsample=True)) < len(J.jpeg_encode(noisy))
    w, h, nc, back = J.jpeg_decode(raw420)
    assert (w, h, nc) == (33, 20, 3)
    e = np.abs(back.astype(int) - img.astype(int))
    assert e.max() <= 8 and e.mean() <= 2.0

    # Spark one-stage fidelity with the subsample flag
    params = spark.createDataFrame(
        [(1, 17, 13, 1, 2, 50)], "doc_id long, w long, h long, ay long, ax long, b long"
    )
    fid = llmops.jpeg_fidelity(
        params, "doc_id", "w", "h", "ay", "ax", "b", subsample=True
    ).collect()[0]
    assert (fid.width, fid.height, fid.n_blocks) == (17, 13, 6)
    assert fid.max_err <= 8 and fid.sum_abs_err <= 2 * 3 * 17 * 13


def test_jpeg_422_and_411_subsampled_roundtrip(spark):
    """The horizontal-only chroma layouts through the generic MCU walk:
    4:2:2 (MCU 8x16, Y0 Y1 Cb Cr) and 4:1:1 (MCU 8x32, four Y blocks) —
    SOF advertises (0x21|0x41, 0x11, 0x11), partial edge MCUs replicate,
    and smooth ramps reconstruct within the 4:4:4 bounds (linear chroma
    pools to the tile center, losing nothing beyond quantization)."""
    import numpy as np

    from pyspark_engine import jpeg as J

    img = llmops._jpeg_ramp(33, 20, 2, 1, 40)  # spans partial edge MCUs
    for mode, samp in (("422", 0x21), ("411", 0x41)):
        raw = J.jpeg_encode(img, subsample=mode)
        i = raw.find(b"\xff\xc0")
        assert raw[i + 11] == samp and raw[i + 14] == 0x11
        w, h, nc, back = J.jpeg_decode(raw)
        assert (w, h, nc) == (33, 20, 3)
        e = np.abs(back.astype(int) - img.astype(int))
        assert e.max() <= 8 and e.mean() <= 2.0
    # chroma-rich content: fewer chroma blocks than 4:4:4
    noisy = np.random.default_rng(7).integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    full = len(J.jpeg_encode(noisy))
    assert len(J.jpeg_encode(noisy, subsample="422")) < full
    assert len(J.jpeg_encode(noisy, subsample="411")) < full
    with pytest.raises(ValueError, match="sampling mode"):
        J.jpeg_encode(img, subsample="410")

    # Spark one-stage fidelity with the string modes
    params = spark.createDataFrame(
        [(1, 17, 13, 1, 2, 50)], "doc_id long, w long, h long, ay long, ax long, b long"
    )
    for mode in ("422", "411"):
        fid = llmops.jpeg_fidelity(
            params, "doc_id", "w", "h", "ay", "ax", "b", subsample=mode
        ).collect()[0]
        assert (fid.width, fid.height, fid.n_blocks) == (17, 13, 6)
        assert fid.max_err <= 8 and fid.sum_abs_err <= 2 * 3 * 17 * 13


def test_transcode_png_to_jpeg(spark):
    """Cross-codec transcode on hand-checkable pixels: a constant-channel
    PNG transcodes to a valid 4:2:0 JPEG whose decode reproduces the
    constants within quantization error (constant blocks are DC-only)."""
    params = spark.createDataFrame(
        [(3, 16, 16, 0, 90)], "doc_id long, w long, h long, a long, b long"
    )
    png = llmops.synth_png(params, "doc_id", "w", "h", "a", "b")
    jpg = llmops.transcode_png_jpeg(png, "doc_id", "payload")
    raw = bytes(jpg.collect()[0].payload)
    assert raw[:2] == b"\xff\xd8" and raw[-2:] == b"\xff\xd9"
    feats = llmops.decode_jpeg_features(jpg, "doc_id", "payload").collect()[0]
    assert (feats.width, feats.height, feats.n_components) == (16, 16, 3)
    # channels are constant 90 / 175 / (90+170)%256=4; DC-only blocks land
    # within a couple of quantization steps per pixel
    n = 16 * 16
    for got, want in ((feats.sum_r, 90 * n), (feats.sum_g, 175 * n), (feats.sum_b, 4 * n)):
        assert abs(got - want) <= 4 * n, (got, want)


def test_parse_ppm_rejects_wide_maxval():
    """Spec-valid P6 with maxval > 255 uses TWO bytes per sample — refuse
    instead of silently misreading the pixel block."""
    import pytest

    with pytest.raises(ValueError, match="maxval"):
        llmops._parse_ppm(b"P6\n2 1\n65535\n" + bytes(12))


def test_luhn_and_credit_card_stats(spark):
    """Classic Luhn vectors (the ISO/IEC 7812 worked example 79927398713,
    a standard Visa test number) drive luhn_valid/luhn_check_digit, and
    credit_card_stats must count only checksum-valid candidates, ignore
    short/long digit runs, accept space/dash separators, and over-redact
    conservatively when asked."""
    rows = [
        (1, "card 4111111111111111 now"),             # valid (test Visa)
        (2, "pay with 4539 1488 0343 6467 today"),    # valid, spaced
        (3, "fake 4539-1488-0343-6466 number"),       # one digit off -> invalid
        (4, "order 12345 on 2023-01-15"),             # runs too short
        (5, "id 123456789012345678901234"),           # run too long (24)
        (6, "no digits at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in llmops.credit_card_stats(df, "doc_id", "text").collect()}
    # the 11-digit ISO worked example is Luhn-valid but below card length:
    # luhn_valid accepts it standalone, the stats op never extracts it
    assert spark.range(1).select(
        llmops.luhn_valid(F.lit("79927398713")).alias("v")
    ).collect()[0].v
    assert (out[1].n_candidates, out[1].n_valid) == (1, 1)
    assert (out[2].n_candidates, out[2].n_valid) == (1, 1)
    assert (out[3].n_candidates, out[3].n_valid) == (1, 0)
    assert (out[4].n_candidates, out[4].n_valid) == (0, 0)
    assert (out[5].n_candidates, out[5].n_valid) == (0, 0)
    assert (out[6].n_candidates, out[6].n_valid) == (0, 0)
    # check-digit derivation: 7992739871 -> 3 (the worked example)
    got = spark.range(1).select(
        llmops.luhn_check_digit(F.lit("7992739871")).alias("d")
    ).collect()[0].d
    assert got == 3
    # conservative redaction replaces candidates regardless of validity
    red = {r.doc_id: r.clean_text for r in llmops.credit_card_stats(
        df, "doc_id", "text", redact=True).collect()}
    assert "<CC>" in red[2] and "<CC>" in red[3] and "4539" not in red[2]
    # regression (round-7 ADVICE): decisions are PER MAXIMAL RUN — the
    # 24-digit run is redacted in full (no 19-digit prefix bite leaving the
    # tail "01234" in clean_text), short runs stay intact verbatim
    assert red[1] == "card <CC> now"
    assert red[2] == "pay with <CC> today"
    assert red[5] == "id <CC>"
    assert red[4] == "order 12345 on 2023-01-15"
    assert red[6] == "no digits at all"


def test_iban_mod97_vectors(spark):
    """Real-world IBAN vectors through the per-character mod-97 fold: the
    ISO example GB82 WEST 1234 5698 7654 32 (letters INSIDE the BBAN — the
    general letter mapping, beyond q162's digit-only German corpus), a
    valid DE IBAN, an off-by-one corruption, and shape rejects; iban_stats
    counts only checksum-valid candidates in running text."""
    vec = [
        ("GB82 WEST 1234 5698 7654 32", True),
        ("DE89 3704 0044 0532 0130 00", True),
        ("DE89 3704 0044 0532 0130 01", False),  # corrupted tail
        ("GB82WEST12345698765432", True),        # spacing-insensitive
        ("XX00", False),                          # shape too short
        ("1234567890123456", False),              # digits only, no country
    ]
    df = spark.createDataFrame([(i, s) for i, (s, _) in enumerate(vec)], "i long, s string")
    got = {r.i: r.v for r in df.select("i", llmops.iban_valid(F.col("s")).alias("v")).collect()}
    for i, (s, want) in enumerate(vec):
        assert got[i] == want, s

    txt = spark.createDataFrame(
        [(1, "pay GB82WEST12345698765432 or the fake GB82WEST12345698765433 today")],
        "doc_id long, text string",
    )
    r = llmops.iban_stats(txt, "doc_id", "text").collect()[0]
    assert (r.n_candidates, r.n_valid) == (2, 1)


def test_checksum_expressions_match_python_reference(spark):
    """Randomized differential for the two checksum expressions: 200 random
    digit strings (lengths 1–24) through luhn_valid and 200 random IBANs
    (random country letters, random alphanumeric BBANs of every legal
    length, ~half with a forced-correct check) through iban_valid, each
    compared against an independent pure-Python implementation — one Spark
    job per expression."""
    import random
    import string

    rng = random.Random(42)

    def py_luhn(num):
        s = 0
        for i, c in enumerate(reversed(num), 1):
            d = int(c)
            s += d if i % 2 == 1 else (d * 2 - 9 if d * 2 > 9 else d * 2)
        return s % 10 == 0

    luhn_rows = []
    for i in range(200):
        n = "".join(rng.choice(string.digits) for _ in range(rng.randint(1, 24)))
        luhn_rows.append((i, n, py_luhn(n)))
    df = spark.createDataFrame(luhn_rows, "i long, num string, want boolean")
    bad = df.filter(llmops.luhn_valid(F.col("num")) != F.col("want")).collect()
    assert bad == [], bad[:3]

    def py_iban(s):
        s = s.replace(" ", "").upper()
        import re

        if not re.fullmatch(r"[A-Z]{2}[0-9]{2}[A-Z0-9]{11,30}", s):
            return False
        r = s[4:] + s[:4]
        num = "".join(str(ord(c) - 55) if c.isalpha() else c for c in r)
        return int(num) % 97 == 1

    iban_rows = []
    for i in range(200):
        cc = "".join(rng.choice(string.ascii_uppercase) for _ in range(2))
        bban = "".join(
            rng.choice(string.ascii_uppercase + string.digits)
            for _ in range(rng.randint(11, 30))
        )
        if i % 2 == 0:  # force a correct check for half the cases
            digits = "".join(
                str(ord(c) - 55) if c.isalpha() else c for c in bban + cc + "00"
            )
            chk = 98 - int(digits) % 97
            iban = f"{cc}{chk:02d}{bban}"
        else:
            iban = f"{cc}{rng.randint(0, 99):02d}{bban}"
        iban_rows.append((i, iban, py_iban(iban)))
    df2 = spark.createDataFrame(iban_rows, "i long, iban string, want boolean")
    bad2 = df2.filter(llmops.iban_valid(F.col("iban")) != F.col("want")).collect()
    assert bad2 == [], bad2[:3]
    # the forced-check half must actually be valid (construction sanity)
    assert sum(1 for _, _, w in iban_rows if w) >= 100


def test_compression_ratio_orderings(spark):
    """Deflate quality signal: repetitive boilerplate compresses far below
    natural prose, (pseudo)random junk barely compresses, empty docs are
    handled; ratios are deterministic across invocations."""
    import random

    rng = random.Random(3)
    junk = "".join(chr(rng.randrange(0x21, 0x7E)) for _ in range(2000))
    prose = (
        "the quick brown fox jumps over the lazy dog while seventeen sailors "
        "watch from a distant harbor under heavy clouds of an october evening "
    ) * 12
    boiler = "click here to subscribe " * 80
    docs = [(1, boiler), (2, prose), (3, junk), (4, "")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.doc_id: r for r in llmops.compression_ratio(df, "doc_id", "text").collect()}
    assert out[1].ratio_permille < out[2].ratio_permille < out[3].ratio_permille
    assert out[1].ratio_permille < 100      # boilerplate collapses
    assert out[3].ratio_permille > 700      # junk resists
    assert (out[4].n_bytes, out[4].n_compressed > 0, out[4].ratio_permille) == (0, True, 0)
    again = {r.doc_id: r.ratio_permille for r in llmops.compression_ratio(df, "doc_id", "text").collect()}
    assert again == {k: v.ratio_permille for k, v in out.items()}


def test_domain_blocklist_decimal_decision(spark):
    """Mean-quality block decision in exact decimal: a domain exactly AT
    the threshold is NOT blocked (strict <), below is, and domains under
    min_docs never appear."""
    rows = (
        [("good.com", 1.0)] * 5
        + [("edge.com", 0.3)] * 5          # mean exactly 0.3 -> kept
        + [("bad.com", 0.1)] * 5           # mean 0.1 -> blocked
        + [("tiny.com", -9.0)] * 2         # < min_docs -> absent
    )
    df = spark.createDataFrame(rows, "domain string, score double")
    out = {r.domain: r for r in llmops.domain_blocklist(df, "domain", "score", min_docs=5, max_mean_score=0.3).collect()}
    assert set(out) == {"good.com", "edge.com", "bad.com"}
    assert not out["good.com"].blocked
    assert not out["edge.com"].blocked     # strict inequality at the boundary
    assert out["bad.com"].blocked
    assert out["bad.com"].n_docs == 5 and abs(out["bad.com"].sum_score - 0.5) < 1e-9


def test_jaccard_pairs_exact_hypothesis_vs_brute_force(spark):
    """Property: for random small corpora and thresholds, the prefix-filter
    join returns EXACTLY the brute-force pair set — the completeness
    guarantee is the operator's whole contract, so fuzz it."""
    from hypothesis import given, settings, strategies as st

    words = st.sampled_from("alpha beta gamma delta epsilon zeta eta theta".split())
    doc = st.lists(words, min_size=3, max_size=12).map(" ".join)

    @settings(max_examples=12, deadline=None)
    @given(st.lists(doc, min_size=2, max_size=8), st.sampled_from([0.3, 0.5, 0.7]))
    def check(texts, t):
        rows = [(i, s) for i, s in enumerate(texts)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            (r.id_a, r.id_b): (r.inter_n, r.union_n)
            for r in llmops.jaccard_pairs_exact(df, "doc_id", "text", threshold=t).collect()
        }
        import itertools

        def sh(s):
            tk = s.lower().split()
            return {" ".join(tk[i : i + 3]) for i in range(len(tk) - 2)}

        gs = {i: sh(s) for i, s in rows if len(s.split()) >= 3}
        want = {}
        for a, b in itertools.combinations(sorted(gs), 2):
            inter, union = len(gs[a] & gs[b]), len(gs[a] | gs[b])
            if union and inter / union >= t:
                want[(a, b)] = (inter, union)
        assert got == want

    check()


def test_jaccard_pairs_exact_adversarial_near_threshold_fuzz(spark):
    """Harder exactness fuzz: CONTINUOUS thresholds in [0.3, 0.9], shingle
    sizes 2–4, and adversarial corpora engineered so pair Jaccards sweep
    densely through the threshold (shared-prefix construction: prefix p of m
    tokens with unique suffixes gives J = (p−s+1)/(2n−(p−s+1)); p ranges over
    every value, so some pair always lands at J = t ± ε).  This pounds the
    ceil(t·n) prefix-length boundary (the float-nudge code path) exactly
    where it could silently shorten the prefix and lose a pair."""
    import itertools
    import random

    from hypothesis import given, settings, strategies as st

    @settings(max_examples=10, deadline=None)
    @given(
        st.floats(min_value=0.3, max_value=0.9, allow_nan=False),
        st.integers(min_value=2, max_value=4),
        st.integers(min_value=0, max_value=10**6),
    )
    def check(t, s, seed):
        rng = random.Random(seed)
        m = 12
        uid = [0]

        def tok():
            uid[0] += 1
            return f"t{uid[0]}"

        docs = []
        idc = 0
        for p in range(s - 1, m + 1):  # J sweeps 0 → 1 through the threshold
            common = [tok() for _ in range(p)]
            a = common + [tok() for _ in range(m - p)]
            b = common + [tok() for _ in range(m - p)]
            docs.append((idc, " ".join(a)))
            docs.append((idc + 1, " ".join(b)))
            idc += 2
        pool = [f"p{i}" for i in range(8)]  # collision-rich random docs
        for _ in range(6):
            docs.append((idc, " ".join(rng.choice(pool) for _ in range(rng.randint(s, 10)))))
            idc += 1
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            (r.id_a, r.id_b): (r.inter_n, r.union_n)
            for r in llmops.jaccard_pairs_exact(
                df, "doc_id", "text", threshold=t, shingle=s
            ).collect()
        }

        def sh(txt):
            tk = txt.lower().split()
            return {" ".join(tk[i : i + s]) for i in range(len(tk) - s + 1)}

        gs = {i: sh(x) for i, x in docs if len(x.split()) >= s}
        want = {}
        for a, b in itertools.combinations(sorted(gs), 2):
            inter, union = len(gs[a] & gs[b]), len(gs[a] | gs[b])
            if union and inter / union >= t:
                want[(a, b)] = (inter, union)
        assert got == want

    check()


def test_gif_lzw_roundtrip_and_growth():
    """GIF LZW pair across the hard boundaries: code-width growth points,
    the KwKwK case, and the 4096-entry CLEAR-reset (forced by a >4096-pixel
    high-entropy stream)."""
    import numpy as np

    from pyspark_engine.llmops import _gif_lzw_decode, _gif_lzw_encode

    rng = np.random.RandomState(3)
    for mcs, n in [(2, 7), (2, 64), (4, 500), (8, 9000)]:
        idx = rng.randint(0, 1 << mcs, n).tolist()
        assert _gif_lzw_decode(_gif_lzw_encode(idx, mcs), mcs, n) == idx
    # KwKwK: aaa... forces code == next_code immediately
    idx = [1] * 40
    assert _gif_lzw_decode(_gif_lzw_encode(idx, 2), 2, 40) == idx


def test_gif_codec_roundtrip_and_guards():
    """Whole-container roundtrip (palette mapping, sub-block framing) and
    the malformed-input guards."""
    import numpy as np
    import pytest

    from pyspark_engine.llmops import _gif_decode, _gif_encode

    rng = np.random.RandomState(11)
    pal = [tuple(int(x) for x in rng.randint(0, 256, 3)) for _ in range(13)]
    idx = rng.randint(0, 13, 24 * 18)
    raw = _gif_encode(idx.tolist(), pal, 24, 18)
    sw, sh, ps, mcs, inter, img = _gif_decode(raw)
    assert (sw, sh, mcs, inter) == (24, 18, 4, False)
    assert ps == 16  # palette padded to the 2^bits GCT size
    assert np.array_equal(img, np.asarray(pal, dtype=np.uint8)[idx.reshape(18, 24)])
    with pytest.raises(ValueError, match="bad signature"):
        _gif_decode(b"JIF89a" + raw[6:])
    with pytest.raises(ValueError, match="truncated"):
        # chop inside the LZW stream but keep the sub-block framing valid;
        # the first sub-block LENGTH byte sits at a computable offset:
        # 13-byte header + 16-entry GCT (48) + image descriptor (10) + mcs
        blk_at = 13 + 3 * 16 + 10 + 1
        assert raw[blk_at - 1] == mcs  # structural, not searched
        body = bytearray(raw)
        body[blk_at] = 2  # shrink first sub-block to 2 bytes
        _gif_decode(bytes(body[: blk_at + 3]) + b"\x00\x3b")


def test_gif_decode_wild_files():
    """Interop pin: GIFs written by real-world encoders (libxslt docs, Tk
    logos — incl. 345k-pixel images exercising thousands of width
    transitions + full-dictionary CLEAR resets, and one interlaced file)
    must decode cleanly with pixel counts matching their headers."""
    import glob
    import os

    import pytest

    files = sorted(
        glob.glob("/usr/share/doc/libxslt1-dev/html/*.gif")
        + glob.glob("/usr/share/tcltk/tk8.6/images/*.gif")
    )
    if not files:
        pytest.skip("no system GIFs on this box")
    from pyspark_engine.llmops import _gif_decode

    interlaced_seen = 0
    for f in files:
        sw, sh, ps, mcs, inter, img = _gif_decode(open(f, "rb").read())
        assert img.shape[2] == 3 and img.shape[0] * img.shape[1] > 0
        interlaced_seen += bool(inter)
    assert len(files) >= 10
    if os.path.exists("/usr/share/tcltk/tk8.6/images/tai-ku.gif"):
        assert interlaced_seen >= 1  # the deinterlace path really ran


def test_gif_spark_roundtrip(spark):
    """synth_gif → decode_gif_features through the Spark operators: the
    decoded sums must equal the palette-algebra recomputation (the q174
    oracle's arithmetic)."""
    from pyspark_engine import llmops

    params = spark.createDataFrame(
        [(1, 16, 12, 3, 7, 5), (2, 24, 18, 2, 250, 13)],
        "doc_id long, w int, h int, a int, b int, p int",
    )
    gif = llmops.synth_gif(params, "doc_id", "w", "h", "a", "b", "p")
    feats = {r["doc_id"]: r for r in llmops.decode_gif_features(gif, "doc_id", "payload").collect()}
    for doc_id, w, h, a, b, p in [(1, 16, 12, 3, 7, 5), (2, 24, 18, 2, 250, 13)]:
        exp = [0, 0, 0]
        for i in range(w * h):
            j = (a * i + b) % p
            for c in range(3):
                exp[c] += (a * j + b + 85 * c) % 256
        r = feats[doc_id]
        assert (r["width"], r["height"]) == (w, h)
        assert (r["sum_r"], r["sum_g"], r["sum_b"]) == tuple(exp)
        assert r["lzw_ok"] and not r["interlaced"]


def test_gif_animation_compositor_semantics():
    """Disposal methods + transparency against a hand-checked scenario:
    disposal 1 keeps, disposal 2 restores the frame RECT to background,
    disposal 3 restores the pre-frame canvas, transparent-index pixels
    show the canvas through (GIF89a §23)."""
    import numpy as np

    from pyspark_engine.llmops import _gif_decode_frames, _gif_encode_animated

    pal = [(0, 0, 0), (10, 20, 30), (40, 50, 60), (70, 80, 90)]
    frames = [
        dict(indices=[1] * 16, w=4, h=4, disposal=1, delay_cs=5),
        dict(indices=[2] * 4, w=2, h=2, left=1, top=1, disposal=2, delay_cs=7),
        dict(indices=[3, 0, 0, 3], w=2, h=2, left=0, top=0, disposal=3, transparent=0, delay_cs=9),
        dict(indices=[2] * 4, w=2, h=2, left=2, top=2, disposal=1),
    ]
    raw = _gif_encode_animated(4, 4, pal, frames, bg_index=0)
    sw, sh, bg, dec = _gif_decode_frames(raw)
    assert (sw, sh, bg, len(dec)) == (4, 4, (0, 0, 0), 4)
    assert (dec[0]["canvas"] == np.array(pal[1])).all()  # full-screen draw
    c1 = dec[1]["canvas"]
    assert (c1[1:3, 1:3] == np.array(pal[2])).all() and (c1[0, :] == np.array(pal[1])).all()
    c2 = dec[2]["canvas"]
    # frame2's transparent-0 pixels show frame0's pal[1] through; frame1's
    # disposal-2 rect has been restored to background
    assert (c2[0, 0] == np.array(pal[3])).all() and (c2[1, 1] == np.array(pal[3])).all()
    assert (c2[0, 1] == np.array(pal[1])).all() and (c2[1, 0] == np.array(pal[1])).all()
    assert (c2[2, 2] == np.array(bg)).all() and (c2[1, 2] == np.array(bg)).all()
    c3 = dec[3]["canvas"]
    assert (c3[0, 0] == np.array(pal[1])).all()  # disposal-3 reverted frame2
    assert (c3[2:4, 2:4] == np.array(pal[2])).all()
    assert dec[0]["delay_cs"] == 5 and dec[1]["disposal"] == 2 and dec[2]["transparent"] == 0
    # single-frame delegate still sees the first frame's own pixels
    from pyspark_engine.llmops import _gif_decode

    w, h, _ps, _mcs, _inter, img = _gif_decode(raw)
    assert (w, h) == (4, 4) and (img == np.array(pal[1])).all()


def test_gif_animation_spark_roundtrip(spark):
    """synth_gif_animation → decode_gif_animation: per-frame AND composited
    canvas sums must equal the alternating-halves algebra recomputation
    (the q179 oracle's arithmetic), including odd heights whose bottom
    strip stays background forever."""
    from pyspark_engine import llmops

    cases = [(1, 8, 6, 3, 2, 5, 7), (2, 10, 9, 4, 3, 11, 6), (3, 6, 4, 1, 1, 0, 4)]
    params = spark.createDataFrame(cases, "doc_id long, w int, h int, n int, a int, b int, p int")
    gif = llmops.synth_gif_animation(params, "doc_id", "w", "h", "n", "a", "b", "p")
    rows = llmops.decode_gif_animation(gif, "doc_id", "payload").collect()
    got = {(r["doc_id"], r["frame_idx"]): r for r in rows}
    for doc_id, w, h, n, a, b, p in cases:
        fh = h // 2
        bgc = [(b + 85 * c) % 256 for c in range(3)]  # palette[0]

        def fsum(f):
            s = [0, 0, 0]
            for i in range(w * fh):
                j = (a * i + b + f) % p
                for c in range(3):
                    s[c] += (a * j + b + 85 * c) % 256
            return s

        for f in range(n):
            r = got[(doc_id, f)]
            assert (r["n_frames"], r["width"], r["height"]) == (n, w, fh)
            assert (r["left"], r["top"]) == (0, (f % 2) * fh)
            assert (r["disposal"], r["delay_cs"], r["transparent"]) == (1, f + 1, -1)
            fs = fsum(f)
            assert (r["frame_r"], r["frame_g"], r["frame_b"]) == tuple(fs)
            strip = (h - 2 * fh) * w  # odd-height bottom strip, never drawn
            # f == 0: the other half is still background (fh*w pixels)
            other = [bgc[c] * (fh * w) for c in range(3)] if f == 0 else fsum(f - 1)
            want = [fs[c] + other[c] + bgc[c] * strip for c in range(3)]
            assert (r["canvas_r"], r["canvas_g"], r["canvas_b"]) == tuple(want)


def test_gif_frame_sample_lossless(spark):
    """gif_frame_sample re-emits every stride-th frame as a standalone
    single-frame GIF; decoding an emitted frame reproduces the source
    frame's pixel grid exactly (LZW re-encode is lossless)."""
    import numpy as np

    from pyspark_engine import llmops
    from pyspark_engine.llmops import _gif_decode, _gif_decode_frames

    params = spark.createDataFrame(
        [(7, 8, 6, 5, 3, 1, 6)], "doc_id long, w int, h int, n int, a int, b int, p int"
    )
    gif = llmops.synth_gif_animation(params, "doc_id", "w", "h", "n", "a", "b", "p")
    payload = bytes(gif.collect()[0]["payload"])
    src = _gif_decode_frames(payload, composite=False)[3]
    out = llmops.gif_frame_sample(gif, "doc_id", "payload", stride=2).collect()
    assert [r["frame_idx"] for r in out] == [0, 2, 4]
    for r in out:
        w, h, _ps, _mcs, _inter, img = _gif_decode(bytes(r["frame"]))
        assert (w, h) == (8, 3)
        assert (img == src[r["frame_idx"]]["pixels"]).all()


def _spec_built_animated_gif():
    """A multi-frame GIF89a assembled BYTE BY BYTE from the spec (GIF89a
    §§17-23) — fully independent of the repo's encoder.  The LZW payload
    uses the always-CLEAR form (CLEAR before every literal, so the code
    width never grows): valid per §22, trivially verifiable by hand.

    Scenario (4x3 screen, bg_index=3=black): frame 0 full-screen red
    (disposal 1); frame 1 a 2x2 rect at (1,1) from a LOCAL 2-color palette
    with transparency index 1 (draws white on a diagonal, disposal 2);
    frame 2 one green pixel at (0,0) after frame 1's rect was restored to
    background."""
    import struct

    def plain_lzw(indices, mcs):
        clear, eoi, width = 1 << mcs, (1 << mcs) + 1, mcs + 1
        bits = []

        def emit(code):
            for i in range(width):
                bits.append((code >> i) & 1)

        for ix in indices:
            emit(clear)
            emit(ix)
        emit(eoi)
        out = bytearray()
        for i in range(0, len(bits), 8):
            b = 0
            for j, bit in enumerate(bits[i : i + 8]):
                b |= bit << j
            out.append(b)
        return bytes(out)

    def image_data(indices, mcs):
        lzw = plain_lzw(indices, mcs)
        blocks = b""
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            blocks += bytes([len(chunk)]) + chunk
        return bytes([mcs]) + blocks + b"\x00"

    buf = b"GIF89a"
    buf += struct.pack("<HH", 4, 3)  # logical screen 4x3
    buf += bytes([0x80 | (0b001 << 4) | 0b001, 3, 0])  # GCT, 4 colors, bg=3
    buf += bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 0, 0, 0])  # red green blue black
    # frame 0: GCE disposal 1, no transparency; full-screen red
    buf += b"\x21\xf9\x04" + bytes([0b000_001_0_0]) + struct.pack("<H", 10) + b"\x00\x00"
    buf += b"\x2c" + struct.pack("<HHHH", 0, 0, 4, 3) + b"\x00" + image_data([0] * 12, 2)
    # frame 1: GCE disposal 2 + transparent index 1; 2x2 rect at (1,1),
    # LOCAL palette [white, cyan], indices [0,1,1,0] (white diagonal)
    buf += b"\x21\xf9\x04" + bytes([0b000_010_0_1]) + struct.pack("<H", 20) + b"\x01\x00"
    buf += b"\x2c" + struct.pack("<HHHH", 1, 1, 2, 2) + bytes([0x80])
    buf += bytes([255, 255, 255, 0, 255, 255])
    buf += image_data([0, 1, 1, 0], 2)
    # frame 2: no GCE options; 1x1 at (0,0), global palette index 1 (green)
    buf += b"\x21\xf9\x04\x00" + struct.pack("<H", 30) + b"\x00\x00"
    buf += b"\x2c" + struct.pack("<HHHH", 0, 0, 1, 1) + b"\x00" + image_data([1], 2)
    return buf + b"\x3b"


def test_gif_animation_spec_vector_and_wild_files():
    """Decoder interop against a spec-assembled multi-frame GIF89a (bytes
    built in _spec_built_animated_gif, independent of the repo encoder):
    disposal 2 + transparency + a local palette pinned canvas-by-canvas.
    Wild GIFs found on the box are walked too, but the embedded vector
    means the test NEVER skips (r8 verdict item 7)."""
    import glob

    import numpy as np

    from pyspark_engine.llmops import _gif_decode_frames

    sw, sh, bg, frames = _gif_decode_frames(_spec_built_animated_gif())
    RED, GREEN, WHITE, BLACK = (255, 0, 0), (0, 255, 0), (255, 255, 255), (0, 0, 0)
    assert (sw, sh, bg, len(frames)) == (4, 3, BLACK, 3)
    assert [f["delay_cs"] for f in frames] == [10, 20, 30]
    assert [f["disposal"] for f in frames] == [1, 2, 0]
    assert frames[1]["transparent"] == 1 and frames[0]["transparent"] is None
    c0 = frames[0]["canvas"]
    assert (c0 == np.array(RED)).all()
    c1 = frames[1]["canvas"]
    want1 = np.tile(np.array(RED, dtype=c1.dtype), (3, 4, 1))
    want1[1, 1] = WHITE  # local-palette draw
    want1[2, 2] = WHITE
    assert (c1 == want1).all()  # transparent-1 pixels show red through
    c2 = frames[2]["canvas"]
    want2 = np.tile(np.array(RED, dtype=c2.dtype), (3, 4, 1))
    want2[1:3, 1:3] = BLACK  # frame 1's rect restored to background
    want2[0, 0] = GREEN
    assert (c2 == want2).all()

    # wild-encoder GIFs, when the box ships any: every frame must walk
    for f in sorted(
        glob.glob("/usr/share/doc/libxslt1-dev/html/*.gif")
        + glob.glob("/usr/share/tcltk/**/*.gif", recursive=True)
        + glob.glob("/usr/share/**/images/*.gif", recursive=True)
    ):
        raw = open(f, "rb").read()
        try:
            _sw, _sh, _bg, frs = _gif_decode_frames(raw)
        except ValueError:
            continue
        assert all(fr["canvas"].shape == (_sh, _sw, 3) for fr in frs)


def test_ulaw_matches_cpython_audioop_full_domain():
    """INTEROP pin for the G.711 codec pair: byte-for-byte equal to
    CPython's C implementation (audioop lin2ulaw/ulaw2lin — the Sun/CCITT
    reference code) over ALL 65536 encoder inputs and all 256 decoder
    codes.  audioop is deprecated-for-removal, so skip gracefully when
    absent — the q175 oracle still re-derives the arithmetic in SQL."""
    import warnings

    import numpy as np
    import pytest

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        audioop = pytest.importorskip("audioop")
    from pyspark_engine.llmops import _ulaw_decode_arr, _ulaw_encode_arr

    s = np.arange(-32768, 32768, dtype=np.int64)
    ref = np.frombuffer(
        audioop.lin2ulaw(s.astype("<i2").tobytes(), 2), dtype=np.uint8
    )
    assert int((_ulaw_encode_arr(s) != ref).sum()) == 0
    codes = np.arange(256, dtype=np.uint8)
    rdec = np.frombuffer(
        audioop.ulaw2lin(codes.tobytes(), 2), dtype="<i2"
    ).astype(np.int64)
    assert int((_ulaw_decode_arr(codes) != rdec).sum()) == 0
    assert int(_ulaw_decode_arr(codes).max()) == 32124  # the spec's max output


def test_ulaw_wav_container_roundtrip_and_guards():
    """µ-law WAV container: fact-chunk layout, word-aligned chunk walk,
    format guards, and the transcode pipeline through the Spark-less
    helpers."""
    import numpy as np
    import pytest

    from pyspark_engine.llmops import (
        _pack_wav,
        _pack_wav_ulaw,
        _parse_wav_ulaw,
        _ulaw_decode_arr,
        _ulaw_encode_arr,
    )

    s = ((np.arange(123, dtype=np.int64) * 517 + 9) % 65536) - 32768
    raw = _pack_wav_ulaw(8000, _ulaw_encode_arr(s).tobytes())
    rate, n, codes = _parse_wav_ulaw(raw)
    assert (rate, n) == (8000, 123)
    assert np.array_equal(_ulaw_decode_arr(codes), _ulaw_decode_arr(_ulaw_encode_arr(s)))
    with pytest.raises(ValueError, match="not a RIFF"):
        _parse_wav_ulaw(b"RIFX" + raw[4:])
    with pytest.raises(ValueError, match="tag 7"):
        _parse_wav_ulaw(_pack_wav(8000, s.astype("<i2").tobytes()))  # PCM tag 1
    bad = bytearray(raw)
    bad[0x2E] = 99  # corrupt the fact count (offset: 12 + 8+18 + 8 -> 46)
    with pytest.raises(ValueError, match="fact sample count"):
        _parse_wav_ulaw(bytes(bad))


def test_ulaw_transcode_spark(spark):
    """synth_wav → wav_transcode_ulaw → decode_wav_ulaw_features through
    the Spark operators equals the pure-numpy recomputation."""
    import numpy as np

    from pyspark_engine import llmops
    from pyspark_engine.llmops import _ulaw_decode_arr, _ulaw_encode_arr

    params = spark.createDataFrame(
        [(1, 120, 8000, 3, 11), (2, 149, 16000, 7, 996)],
        "doc_id long, n int, rate int, a int, b int",
    )
    pcm = llmops.synth_wav(params, "doc_id", "n", "rate", "a", "b")
    ulaw = llmops.wav_transcode_ulaw(pcm, "doc_id", "payload")
    feats = {
        r["doc_id"]: r
        for r in llmops.decode_wav_ulaw_features(ulaw, "doc_id", "payload").collect()
    }
    for doc_id, n, rate, a, b in [(1, 120, 8000, 3, 11), (2, 149, 16000, 7, 996)]:
        i = np.arange(n, dtype=np.int64)
        dec = _ulaw_decode_arr(_ulaw_encode_arr((a * i + b) % 65536 - 32768))
        r = feats[doc_id]
        assert (r["n_samples"], r["fmt_tag"], r["bits"], r["sample_rate"]) == (n, 7, 8, rate)
        assert r["sum_decoded"] == int(dec.sum())
        assert r["sum_abs_decoded"] == int(np.abs(dec).sum())
        assert r["max_abs_decoded"] == int(np.abs(dec).max())


def test_adpcm_recurrence_matches_audioop():
    """INTEROP pin for the IMA ADPCM quantizer: nibble-for-nibble equal to
    CPython's C implementation (audioop.lin2adpcm, the Intel/DVI reference
    recurrence) over random full-range input, given the same initial
    (predictor, index) state.  audioop packs first-sample-high while
    IMA-WAV packs low-first; the comparison unpacks each convention."""
    import struct
    import warnings

    import numpy as np
    import pytest

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        audioop = pytest.importorskip("audioop")
    from pyspark_engine.llmops import _ima_expand, _ima_step

    rng = np.random.RandomState(5)
    s = rng.randint(-32768, 32768, 801).tolist()
    pred, index = s[0], 0
    mine = []
    for v in s[1:]:
        nib, pred, index = _ima_step(v, pred, index)
        mine.append(nib)
    code, _ = audioop.lin2adpcm(struct.pack(f"<{len(s) - 1}h", *s[1:]), 2, (s[0], 0))
    ref = []
    for byte in code:
        ref.extend((byte >> 4, byte & 0x0F))
    assert mine == ref[: len(mine)]
    # decode side: audioop.adpcm2lin from the same state reproduces my expander
    back, _ = audioop.adpcm2lin(code, 2, (s[0], 0))
    rdec = struct.unpack(f"<{len(back) // 2}h", back)
    pred, index = s[0], 0
    mdec = []
    for nib in mine:
        pred, index = _ima_expand(nib, pred, index)
        mdec.append(pred)
    assert mdec == list(rdec[: len(mdec)])


def test_adpcm_wav_container_roundtrip_and_guards():
    """IMA ADPCM container: block headers store the seed sample verbatim,
    multi-block carry-over of the step index, fact-count truncation of the
    padded final block, format guards."""
    import numpy as np
    import pytest

    from pyspark_engine.llmops import (
        ADPCM_BLOCK_ALIGN,
        _pack_wav,
        _pack_wav_adpcm,
        _parse_wav_adpcm,
    )

    i = np.arange(149, dtype=np.int64)
    ramp = (7 * i + 996) % 65536 - 32768
    raw = _pack_wav_adpcm(8000, ramp.tolist())
    rate, spb, nb, dec = _parse_wav_adpcm(raw)
    assert (rate, spb, nb) == (8000, (ADPCM_BLOCK_ALIGN - 4) * 2 + 1, 3)
    assert dec.size == 149
    assert dec[0] == ramp[0] and dec[65] == ramp[65] and dec[130] == ramp[130]
    assert int(np.abs(dec - ramp).max()) <= 4
    with pytest.raises(ValueError, match="tag 0x11"):
        _parse_wav_adpcm(_pack_wav(8000, ramp.astype("<i2").tobytes()))
    with pytest.raises(ValueError, match="short of the fact"):
        _parse_wav_adpcm(raw[:-ADPCM_BLOCK_ALIGN])


def test_adpcm_transcode_spark(spark):
    """synth_wav → wav_transcode_adpcm → parse equals the in-worker
    fidelity op's view of the same pipeline."""
    import numpy as np

    from pyspark_engine import llmops
    from pyspark_engine.llmops import _parse_wav_adpcm

    params = spark.createDataFrame(
        [(1, 120, 8000, 3, 11)], "doc_id long, n int, rate int, a int, b int"
    )
    pcm = llmops.synth_wav(params, "doc_id", "n", "rate", "a", "b")
    adp = llmops.wav_transcode_adpcm(pcm, "doc_id", "payload").collect()[0]
    rate, spb, nb, dec = _parse_wav_adpcm(bytes(adp["payload"]))
    i = np.arange(120, dtype=np.int64)
    ramp = (3 * i + 11) % 65536 - 32768
    assert (rate, nb, dec.size) == (8000, 2, 120)
    assert int(np.abs(dec - ramp).max()) <= 4
    fid = llmops.wav_adpcm_fidelity(pcm, "doc_id", "payload").collect()[0]
    assert fid["n_samples"] == 120 and fid["first_sample"] == 11 - 32768
    assert fid["max_abs_err"] <= 4 and fid["sum_abs_err"] <= 240


def test_gif_lzw_roundtrip_property():
    """Hypothesis fuzz for the LZW pair: arbitrary index streams at every
    min-code-size, including runs (KwKwK-rich), alternations, and lengths
    crossing the code-width growth points — decode∘encode must be the
    identity everywhere."""
    from hypothesis import given, settings, strategies as st

    from pyspark_engine.llmops import _gif_lzw_decode, _gif_lzw_encode

    @settings(max_examples=60, deadline=None)
    @given(
        st.integers(min_value=2, max_value=8).flatmap(
            lambda mcs: st.tuples(
                st.just(mcs),
                st.lists(
                    st.integers(min_value=0, max_value=(1 << mcs) - 1),
                    min_size=1,
                    max_size=600,
                ),
            )
        )
    )
    def check(case):
        mcs, idx = case
        assert _gif_lzw_decode(_gif_lzw_encode(idx, mcs), mcs, len(idx)) == idx

    check()


def test_sniff_image_format_expression_and_dispatch(spark):
    """sniff_image_format is a pure Catalyst routing predicate (magic
    bytes), and decode_any_image_features dispatches all three real
    containers in one worker; unknown bytes raise instead of passing
    through."""
    import pytest

    from pyspark_engine import llmops

    params = spark.createDataFrame(
        [(0, 8, 6, 2, 5, 4), (1, 8, 6, 2, 5, 4), (2, 8, 6, 2, 5, 4)],
        "doc_id long, w int, h int, a int, b int, p int",
    )
    ppm = llmops.synth_ppm(params.filter("doc_id = 0"), "doc_id", "w", "h", "a", "b")
    png = llmops.synth_png(params.filter("doc_id = 1"), "doc_id", "w", "h", "a", "b")
    gif = llmops.synth_gif(params.filter("doc_id = 2"), "doc_id", "w", "h", "a", "b", "p")
    mixed = ppm.unionByName(png).unionByName(gif)
    sniffed = {
        r["doc_id"]: r["fmt"]
        for r in mixed.select(
            "doc_id", llmops.sniff_image_format(F.col("payload")).alias("fmt")
        ).collect()
    }
    assert sniffed == {0: "ppm", 1: "png", 2: "gif"}
    got = {r["doc_id"]: r for r in llmops.decode_any_image_features(mixed, "doc_id", "payload").collect()}
    assert {k: v["format"] for k, v in got.items()} == sniffed
    # ppm and png carry the SAME pixel algebra -> identical sums; gif differs
    assert (got[0]["sum_r"], got[0]["sum_g"], got[0]["sum_b"]) == (
        got[1]["sum_r"], got[1]["sum_g"], got[1]["sum_b"])
    junk = spark.createDataFrame([(9, bytearray(b"ZZ??notanimage"))], "doc_id long, payload binary")
    assert llmops.sniff_image_format(F.col("payload")).alias  # expression builds
    assert (
        junk.select(llmops.sniff_image_format(F.col("payload")).alias("f")).collect()[0]["f"]
        == "unknown"
    )
    with pytest.raises(Exception, match="unrecognized image container"):
        llmops.decode_any_image_features(junk, "doc_id", "payload").collect()


def test_bmp_codec_roundtrip_and_guards():
    """BMP pair: padding-sensitive strides roundtrip exactly; top-down
    (negative height) decode; unsupported depths guarded."""
    import struct

    import numpy as np
    import pytest

    from pyspark_engine.llmops import _bmp_decode, _bmp_encode

    rng = np.random.RandomState(9)
    img = rng.randint(0, 256, (13, 17, 3)).astype(np.uint8)  # 17*3=51 -> stride 52
    raw = _bmp_encode(img)
    w, h, bpp, comp, back = _bmp_decode(raw)
    assert (w, h, bpp, comp) == (17, 13, 24, 0)
    assert np.array_equal(back, img)
    # top-down variant: negate the height and store rows first-to-last
    stride = 52
    flipped = bytearray(raw[:54])
    flipped[22:26] = struct.pack("<i", -13)
    for y in range(13):
        start = 54 + (12 - y) * stride
        flipped += raw[start : start + stride]
    w2, h2, _b, _c, td = _bmp_decode(bytes(flipped))
    assert (w2, h2) == (17, 13) and np.array_equal(td, img)
    with pytest.raises(ValueError, match="bad signature"):
        _bmp_decode(b"XM" + raw[2:])
    bad = bytearray(raw)
    bad[28] = 8  # 8-bpp palette form -> guarded
    with pytest.raises(ValueError, match="unsupported BMP"):
        _bmp_decode(bytes(bad))


def test_bmp_decode_wild_cpython_corpus():
    """Interop pin: CPython's own test-corpus python.bmp (a real-encoder
    artifact: BITMAPV5HEADER, 32-bpp, BI_BITFIELDS masks) decodes through
    the mask path."""
    import glob

    import pytest

    files = sorted(
        glob.glob(
            "/root/.pyenv/versions/*/lib/python*/test/**/python.bmp",
            recursive=True,
        )
    )
    if not files:
        pytest.skip("no CPython BMP corpus on this box")
    from pyspark_engine.llmops import _bmp_decode

    w, h, bpp, comp, img = _bmp_decode(open(files[0], "rb").read())
    assert (w, h, bpp, comp) == (16, 16, 32, 3)
    assert img.shape == (16, 16, 3) and int(img.sum()) > 0


def test_bmp_spark_and_sniff_dispatch(spark):
    """synth_bmp → decode_bmp_features equals the ramp algebra, and the
    sniffer + mixed dispatch pick up the fourth container."""
    from pyspark_engine import llmops

    params = spark.createDataFrame(
        [(7, 17, 13, 3, 9)], "doc_id long, w int, h int, a int, b int"
    )
    bmp = llmops.synth_bmp(params, "doc_id", "w", "h", "a", "b")
    assert (
        bmp.select(llmops.sniff_image_format(F.col("payload")).alias("f"))
        .collect()[0]["f"]
        == "bmp"
    )
    r = llmops.decode_bmp_features(bmp, "doc_id", "payload").collect()[0]
    exp = [sum((3 * i + 9 + 85 * c) % 256 for i in range(17 * 13)) for c in range(3)]
    assert (r["width"], r["height"], r["bpp"], r["compression"]) == (17, 13, 24, 0)
    assert (r["sum_r"], r["sum_g"], r["sum_b"]) == tuple(exp)
    any_r = llmops.decode_any_image_features(bmp, "doc_id", "payload").collect()[0]
    assert any_r["format"] == "bmp" and any_r["sum_r"] == exp[0]


def test_wild_cpython_corpus_cross_format_pixels():
    """Triangulated interop pin: CPython ships the SAME source image in
    multiple real-encoder containers (test/imghdrdata python.*); our
    three independent decoders (palette PNG via PLTE, BMP via V5
    BITFIELDS, PPM) must produce BYTE-IDENTICAL pixel grids from it — a
    decoder bug in any one container breaks the equality.  The GIF
    variant was palette-quantized at authoring time (128 colors), so it
    is pinned by successful decode + shape, not pixel equality."""
    import glob

    import numpy as np
    import pytest

    base = sorted(glob.glob("/root/.pyenv/versions/*/lib/python*/test/imghdrdata"))
    if not base:
        pytest.skip("no CPython image corpus on this box")
    base = base[0] + "/"
    from pyspark_engine.llmops import _bmp_decode, _gif_decode, _parse_ppm, _png_decode

    png = _png_decode(open(base + "python.png", "rb").read())[-1]
    ppm = _parse_ppm(open(base + "python.ppm", "rb").read())[-1]
    gif = _gif_decode(open(base + "python.gif", "rb").read())[-1]
    assert png.shape == ppm.shape == gif.shape == (16, 16, 3)
    assert np.array_equal(png, ppm)
    bmps = sorted(glob.glob("/root/.pyenv/versions/*/lib/python*/test/**/python.bmp", recursive=True))
    if bmps:
        bmp = _bmp_decode(open(bmps[0], "rb").read())[-1]
        assert np.array_equal(png, bmp)


def test_jaccard_positional_filter_boundary_pair_kept(spark):
    """PPJoin positional-filter boundary: A and B share m=10 tokens (df=2,
    so they sort LAST in the global rarity order) and carry k=5 unique
    tokens each (df=1, sorted first).  J = m/(2k+m) = 0.5 exactly, and the
    filter's overlap bound 1 + min(n−i, n−j) = m equals the required
    overlap ceil(t/(1+t)·(n_a+n_b)) = m EXACTLY — the keep/prune knife
    edge.  Any off-by-one in the bound (a dropped +1, a mis-nudged ceil)
    silently loses this true pair."""
    shared = [f"shared{i:02d}" for i in range(10)]
    a = " ".join([f"aonly{i}" for i in range(5)] + shared)
    b = " ".join([f"bonly{i}" for i in range(5)] + shared)
    df = spark.createDataFrame([(0, a), (1, b)], "doc_id long, text string")
    got = [
        (r.id_a, r.id_b, r.inter_n, r.union_n)
        for r in llmops.jaccard_pairs_exact(
            df, "doc_id", "text", threshold=0.5, shingle=1
        ).collect()
    ]
    assert got == [(0, 1, 10, 20)]


def test_attach_key_stats_hot_and_cold_paths_agree(spark):
    """r14 de-skew helper: the hot/cold split (forced via a tiny hot_rows)
    must return exactly the plain-join rows — hot keys via the bounded
    broadcast, cold keys via the shuffle join, partial tables with
    inner-join semantics."""
    from pyspark_engine.llmops import _attach_key_stats

    rows = [(i, "hot" if i % 3 else f"k{i}") for i in range(60)]
    big = spark.createDataFrame(rows, "id long, key string")
    tbl = big.groupBy("key").agg(F.count(F.lit(1)).alias("n"))
    want = sorted(map(tuple, big.join(tbl, "key").collect()))
    # hot_rows=5: 'hot' (40 rows) splits to the broadcast branch
    got = sorted(map(tuple, _attach_key_stats(big, tbl, "key", "n", hot_rows=5).collect()))
    assert got == want
    # partial tbl (inner semantics): only the hot key survives
    hot_only = tbl.filter(F.col("n") >= 5)
    want2 = sorted(map(tuple, big.join(hot_only, "key").collect()))
    got2 = sorted(map(tuple, _attach_key_stats(big, hot_only, "key", "n", hot_rows=5).collect()))
    assert got2 == want2


def test_jaccard_verify_broadcast_and_merge_paths_agree(spark, monkeypatch):
    """r14 broadcast gate (VERDICT r13 item 5): the verify joins broadcast
    the per-doc array tables only under a measured byte cap; forcing the
    over-cap fallback (cap = 0 -> merge-hinted SMJs, the r13 shape) must
    return the identical pair set and stats."""
    base = "the quick brown fox jumps over the lazy dog near the old river bank today"
    docs = [
        (1, base),
        (2, base.replace("lazy", "sleepy")),
        (3, base),
        (4, "completely different text about spark engines and shuffle planning at scale"),
        (5, base.replace("today", "tonight")),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    def run():
        return sorted(
            (r.id_a, r.id_b, r.inter_n, r.union_n)
            for r in llmops.jaccard_pairs_exact(df, "doc_id", "text", threshold=0.4).collect()
        )

    want = run()  # default cap: broadcast path on this tiny corpus
    monkeypatch.setattr(llmops, "_BCAST_ARRAYS_BYTES", 0)
    assert run() == want  # merge fallback: same rows
    assert want, "corpus must produce pairs for the comparison to mean anything"


def test_jaccard_df1_prefix_prune_keeps_rare_gram_pairs(spark):
    """r14 df==1 prefix pruning: candidates whose ONLY shared prefix token
    is globally rare (df exactly 2 — the minimum that can generate a pair)
    must survive the pruned explode.  Docs 1/2 share one df==2 shingle in a
    sea of df==1 shingles, sitting right at the boundary the __n1 slice
    offset must not cross."""
    d1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    d2 = "alpha beta gamma lambda mu nu xi omicron pi rho"
    docs = [(1, d1), (2, d2), (3, "sigma tau upsilon phi chi psi omega one two three")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b): (r.inter_n, r.union_n)
        for r in llmops.jaccard_pairs_exact(df, "doc_id", "text", threshold=0.05).collect()
    }
    # brute force: 3-gram shingle sets
    import itertools

    def sh(s):
        t = s.lower().split()
        return {" ".join(t[i : i + 3]) for i in range(len(t) - 2)}

    want = {}
    gs = {i: sh(s) for i, s in docs}
    for a, b in itertools.combinations(sorted(gs), 2):
        i, u = len(gs[a] & gs[b]), len(gs[a] | gs[b])
        if u and i / u >= 0.05:
            want[(a, b)] = (i, u)
    assert got == want and (1, 2) in got


def test_embedding_neardup_broadcast_and_merge_paths_agree(spark, monkeypatch):
    """r14 vector-side broadcast gate (VERDICT r13 item 8): forcing the
    over-cap merge fallback must return the identical pair set."""
    import hashlib as _h

    def vec(seed, dim=16):
        return [
            int.from_bytes(_h.sha256(f"{seed}:{d}".encode()).digest()[:4], "big") / 2**32 - 0.5
            for d in range(dim)
        ]

    rows = [(i, vec(i)) for i in range(40)] + [(100 + i, vec(i)) for i in range(0, 40, 4)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    def run():
        return sorted(
            (r.id_a, r.id_b)
            for r in llmops.embedding_neardup(emb, dim=16, threshold=0.9).collect()
        )

    want = run()
    assert want, "planted exact copies must be found"
    monkeypatch.setattr(llmops, "_BCAST_ARRAYS_BYTES", 0)
    assert run() == want


def test_embedding_neardup_signature_keeps_exact_duplicates(spark):
    """r14 Hamming signature pre-filter: exact duplicates have IDENTICAL
    63-bit signatures (distance 0), so the pre-filter can never drop them —
    the planted-copy recall contract is deterministic, not probabilistic."""
    import hashlib as _h

    def vec(seed, dim=16):
        return [
            int.from_bytes(_h.sha256(f"{seed}:{d}".encode()).digest()[:4], "big") / 2**32 - 0.5
            for d in range(dim)
        ]

    rows = [(i, vec(i)) for i in range(30)] + [(1000 + i, vec(i)) for i in range(30)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        (r.id_a, r.id_b)
        for r in llmops.embedding_neardup(emb, dim=16, threshold=0.9).collect()
    }
    assert {(i, 1000 + i) for i in range(30)} <= got


def test_minhash_verify_broadcast_and_merge_paths_agree(spark, monkeypatch):
    """r14 broadcast gate on the minhash verify joins: forcing the over-cap
    fallback (merge SMJs, incl. the verify_salt replication) must return
    the identical pair set."""
    base = "the quick brown fox jumps over the lazy dog near the old river bank today"
    docs = [(i, base) for i in range(1, 5)] + [
        (10, base.replace("lazy", "sleepy")),
        (11, "entirely different words about stream processing and state stores here"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    def run(**kw):
        return sorted(
            (r.id_a, r.id_b)
            for r in llmops.minhash_lsh_pairs(df, "doc_id", "text", threshold=0.5, **kw).collect()
        )

    want = run()
    monkeypatch.setattr(llmops, "_BCAST_ARRAYS_BYTES", 0)
    assert run() == want
    assert run(verify_salt=4) == want  # salted fallback: same pairs
    assert want, "identical docs must pair"


def test_ngram_count_arithmetic_equals_array_size(spark):
    """r14 repeated_spans rewrite: greatest(size(toks)-n+1, 0) must equal
    size(word_ngrams_multiset(toks, n)) on every edge (short doc, exactly-n
    tokens, empty string, NULL text, repeated whitespace)."""
    rows = [
        (1, "a b c d e"),
        (2, "a b"),
        (3, "a b c"),
        (4, ""),
        (5, None),
        (6, "  x   y  z   w  "),
        (7, "one"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    toks = llmops.tokens(F.col("text"))
    for n in (1, 2, 3, 5, 15):
        got = df.select(
            "id",
            F.size(llmops.word_ngrams_multiset(toks, n)).cast("long").alias("a"),
            F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0)).cast("long").alias("b"),
        ).collect()
        for r in got:
            assert r.a == r.b, (r.id, n, r.a, r.b)
