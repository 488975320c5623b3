"""Corpus-level curation operators: hash split, repetition signals,
top n-grams, TF-IDF ranking, and benchmark decontamination."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.corpus import (
    decontaminate,
    tf_idf_topk,
    top_ngrams,
)
from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.sampling import (
    hash_split,
)
from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.text import (
    repetition_signals,
    token_ngrams,
    tokens,
)


def test_hash_split_deterministic_partition_invariant(spark):
    df = spark.range(0, 5000).select(F.col("id").alias("doc_id"))
    out = hash_split(df, "doc_id").collect()
    counts: dict[str, int] = {}
    for r in out:
        counts[r["split"]] = counts.get(r["split"], 0) + 1
        assert 0 <= r["split_bucket"] < 10000
    # ~90/5/5 within md5-uniform tolerance
    assert 4300 <= counts["train"] <= 4700
    assert 150 <= counts["val"] <= 350
    assert 150 <= counts["test"] <= 350
    again = {
        r["doc_id"]: r["split"]
        for r in hash_split(df.repartition(17), "doc_id").collect()
    }
    assert all(again[r["doc_id"]] == r["split"] for r in out)


def test_hash_split_rejects_bad_weights(spark):
    import pytest

    df = spark.range(1).select(F.col("id").alias("doc_id"))
    with pytest.raises(ValueError):
        hash_split(df, "doc_id", splits=(("a", 5000), ("b", 4000)))


def test_token_ngrams_short_and_exact(spark):
    df = spark.createDataFrame(
        [(0, "a b c d"), (1, "a b"), (2, "a"), (3, "")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r["g"]
        for r in df.select("doc_id", token_ngrams(tokens("text"), 3).alias("g")).collect()
    }
    assert rows[0] == ["a b c", "b c d"]
    assert rows[1] == [] and rows[2] == [] and rows[3] == []


def test_repetition_signals(spark):
    df = spark.createDataFrame(
        [
            (0, "x y\nx y\nz w"),      # dup line 1/3; bigrams: "x y" twice
            (1, "a b c d"),            # no repetition
            (2, ""),                   # empty
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_signals(df).collect()}
    assert rows[0]["n_lines"] == 3
    assert abs(rows[0]["dup_line_frac"] - (1 - 2 / 3)) < 1e-6
    # tokens: x y x y z w -> bigrams: xy yx xy yz zw -> top "x y" count 2 of 5
    assert rows[0]["n_bigrams"] == 5
    assert abs(rows[0]["top_bigram_frac"] - 0.4) < 1e-6
    assert rows[1]["dup_line_frac"] == 0.0
    assert abs(rows[1]["top_bigram_frac"] - (1 / 3)) < 1e-6
    assert rows[2]["n_lines"] == 0 and rows[2]["top_bigram_frac"] == 0.0


def test_top_ngrams_count_and_tiebreak(spark):
    df = spark.createDataFrame(
        [(0, "b a b a"), (1, "a b")],
        "doc_id long, text string",
    )
    # bigrams: doc0 -> "b a","a b","b a"; doc1 -> "a b"
    rows = top_ngrams(df, n=2, k=2).collect()
    assert [(r["gram"], r["n_occurrences"]) for r in rows] == [
        ("a b", 2),
        ("b a", 2),
    ]


def test_tf_idf_topk_ranks_rare_terms(spark):
    df = spark.createDataFrame(
        [
            (0, "common common rare0 rare0 rare0"),
            (1, "common zeta"),
            (2, "common other"),
        ],
        "doc_id long, text string",
    )
    rows = tf_idf_topk(df, k=1).collect()
    top = {r["doc_id"]: r for r in rows}
    # "common" appears in all docs (df=3) -> never the top term
    assert top[0]["term"] == "rare0" and top[0]["tf"] == 3
    assert top[1]["term"] == "zeta" and top[1]["df"] == 1
    assert top[2]["term"] == "other"
    assert all(r["tf_idf"] > 0 for r in rows)


def test_decontaminate_flags_overlap(spark):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            (0, "a document with the quick brown fox inside"),  # 2 shared 3-grams
            (1, "totally unrelated words here"),
            (2, ""),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in decontaminate(corpus, bench, ngram=3).collect()}
    assert len(rows) == 3
    assert rows[0]["is_contaminated"] and rows[0]["n_shared_grams"] == 2
    assert not rows[1]["is_contaminated"] and rows[1]["n_shared_grams"] == 0
    assert not rows[2]["is_contaminated"]


def test_pack_sequences_greedy_invariants(spark):
    from pyspark.sql import Row

    from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.corpus import (
        pack_sequences,
    )

    # deterministic token counts: doc i has (i*7) % 23 + 1 tokens
    rows = [
        Row(doc_id=i, text=" ".join(f"t{j}" for j in range((i * 7) % 23 + 1)))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows)
    out = pack_sequences(df, budget=40, n_shards=4).collect()
    assert len(out) == 300
    by_shard: dict[int, list] = {}
    for r in out:
        assert r.shard == r.id % 4
        by_shard.setdefault(r.shard, []).append(r)
    for shard_rows in by_shard.values():
        shard_rows.sort(key=lambda r: r.id)
        fills: dict[int, int] = {}
        prev_seq = 0
        for r in shard_rows:
            # seq ids advance monotonically by at most 1 per doc
            assert r.seq_idx in (prev_seq, prev_seq + 1)
            if r.seq_idx == prev_seq + 1:
                # greedy: the doc would NOT have fit in the previous seq
                assert fills[prev_seq] + r.n_tokens > 40
            fills[r.seq_idx] = fills.get(r.seq_idx, 0) + r.n_tokens
            prev_seq = r.seq_idx
        # no sequence exceeds the budget
        assert all(v <= 40 for v in fills.values())


def test_pack_sequences_caps_long_docs(spark):
    from pyspark.sql import Row

    from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.corpus import (
        pack_sequences,
    )

    df = spark.createDataFrame(
        [
            Row(doc_id=0, text=" ".join(f"t{j}" for j in range(100))),
            Row(doc_id=4, text="a b"),
        ]
    )
    out = {r.id: r for r in pack_sequences(df, budget=10, n_shards=4).collect()}
    assert out[0].n_tokens == 10  # capped at budget
    assert out[0].seq_idx == 0
    assert out[4].seq_idx == 1  # would overflow the full sequence


class TestUnigramXent:
    def test_uniform_corpus_entropy_and_outlier(self, spark):
        from pyspark.sql import Row
        import math
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.corpus import (
            unigram_xent,
        )

        # 4 docs over a 4-token uniform vocab -> xent = ln(4) everywhere
        docs = spark.createDataFrame(
            [Row(doc_id=i, text=t) for i, t in enumerate(
                ["a b", "c d", "a c", "b d"])]
        )
        out = {r.doc_id: r for r in unigram_xent(docs).collect()}
        assert all(r.n_tokens == 2 for r in out.values())
        for r in out.values():
            assert r.xent == pytest.approx(math.log(4.0), abs=1e-5)

    def test_rare_token_doc_scores_higher(self, spark):
        from pyspark.sql import Row
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.corpus import (
            unigram_xent,
        )

        docs = spark.createDataFrame(
            [
                Row(doc_id=0, text="the the the the"),
                Row(doc_id=1, text="zyzzyva qwerty"),
                Row(doc_id=2, text=""),  # zero tokens: excluded
            ]
        )
        out = {r.doc_id: r.xent for r in unigram_xent(docs).collect()}
        assert set(out) == {0, 1}
        assert out[1] > out[0]


class TestBm25TopK:
    def test_hand_checked_ranking_and_score(self, spark):
        import math

        from pyspark.sql import Row
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.corpus import (
            bm25_topk,
        )

        docs = spark.createDataFrame(
            [
                Row(doc_id=1, text="spark shuffle join"),
                Row(doc_id=2, text="join join join padding words here now"),
                Row(doc_id=3, text="nothing relevant at all whatsoever"),
                Row(doc_id=4, text="join"),
            ]
        )
        out = bm25_topk(docs, [(7, ["join"])], k=10).collect()
        rows = {r.doc_id: r for r in out}
        # doc 3 matches no term -> absent
        assert set(rows) == {1, 2, 4}
        # python replay: N=4, df(join)=3, dl = 3,7,5,1, avgdl = 16/4
        idf = math.floor(math.log(1 + (4 - 3 + 0.5) / 3.5) * 1e6 + 0.5) / 1e6
        def score(tf, dl):
            frac = (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / 4.0))
            return math.floor(idf * frac * 1e6 + 0.5) / 1e6
        assert rows[4].score == pytest.approx(score(1, 1), abs=1e-9)
        assert rows[2].score == pytest.approx(score(3, 7), abs=1e-9)
        # shortest doc with the term outranks the long spammy one only if
        # its normalized tf wins; verify ordering matches the replay
        expect = sorted(
            [(1, score(1, 3)), (2, score(3, 7)), (4, score(1, 1))],
            key=lambda x: (-x[1], x[0]),
        )
        got = sorted(out, key=lambda r: r.rank)
        assert [r.doc_id for r in got] == [d for d, _ in expect]

    def test_k_bounds_and_duplicate_query_terms(self, spark):
        from pyspark.sql import Row
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.corpus import (
            bm25_topk,
        )

        docs = spark.createDataFrame(
            [Row(doc_id=i, text="alpha beta") for i in range(5)]
        )
        # duplicate term in the query must be scored ONCE
        one = bm25_topk(docs, [(1, ["alpha"])], k=3).collect()
        dup = bm25_topk(docs, [(1, ["alpha", "alpha"])], k=3).collect()
        assert len(one) == 3 and len(dup) == 3
        assert {r.doc_id: r.score for r in one} == {
            r.doc_id: r.score for r in dup
        }


class TestCcnetBuckets:
    def test_terciles_and_ordering(self, spark):
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.corpus import (
            ccnet_buckets,
        )
        from pyspark.sql import Row

        # 9 docs: three repeat common tokens (low xent), three mixed,
        # three all-rare (high xent)
        docs = []
        for i in range(3):
            docs.append(Row(doc_id=i, text="the the the the the the"))
        for i in range(3, 6):
            docs.append(Row(doc_id=i, text="the the alpha beta gamma delta"))
        for i in range(6, 9):
            docs.append(Row(doc_id=i, text=f"zz{i}a zz{i}b zz{i}c zz{i}d zz{i}e zz{i}f"))
        out = ccnet_buckets(spark.createDataFrame(docs)).collect()
        by_bucket = {}
        for r in out:
            by_bucket.setdefault(r.bucket, set()).add(r.doc_id)
        assert by_bucket["head"] == {0, 1, 2}
        assert by_bucket["middle"] == {3, 4, 5}
        assert by_bucket["tail"] == {6, 7, 8}

    def test_ties_share_bucket(self, spark):
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.corpus import (
            ccnet_buckets,
        )
        from pyspark.sql import Row

        # identical docs: one xent value -> everyone lands in head
        docs = [Row(doc_id=i, text="a b c") for i in range(6)]
        out = ccnet_buckets(spark.createDataFrame(docs)).collect()
        assert {r.bucket for r in out} == {"head"}


class TestSpanCorruption:
    def test_structure_and_determinism(self, spark):
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.corpus import (
            span_corruption,
        )
        from pyspark.sql import Row

        docs = spark.createDataFrame(
            [Row(doc_id=i, text=" ".join(f"w{j}" for j in range(30))) for i in range(5)]
        )
        a = {r.doc_id: r for r in span_corruption(docs).collect()}
        b = {r.doc_id: r for r in span_corruption(docs.repartition(8)).collect()}
        for i in range(5):
            ra, rb = a[i], b[i]
            # deterministic: identical across partitionings
            assert (ra.corrupted, ra.targets, ra.n_masked) == (
                rb.corrupted, rb.targets, rb.n_masked)
            assert ra.n_tokens == 30
            # reconstruction invariant: corrupted pieces + target tokens
            # cover exactly the original token multiset
            corr_toks = [t for t in ra.corrupted.split() if not t.startswith("<extra_id_")]
            tgt_toks = [t for t in ra.targets.split() if not t.startswith("<extra_id_")]
            assert sorted(corr_toks + tgt_toks) == sorted(f"w{j}" for j in range(30))
            # sentinels are sequential and paired between input/targets
            sents_in = [t for t in ra.corrupted.split() if t.startswith("<extra_id_")]
            sents_tg = [t for t in ra.targets.split() if t.startswith("<extra_id_")]
            assert sents_in == [f"<extra_id_{k}>" for k in range(ra.n_spans)]
            assert sents_tg == sents_in
            # masked fraction is in a sane band for 15% at n=30
            assert 0 <= ra.n_masked <= 15

    def test_consecutive_masks_merge(self, spark):
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.corpus import (
            span_corruption,
        )
        from pyspark.sql import Row

        # mask everything: one span covering the whole doc
        docs = spark.createDataFrame([Row(doc_id=1, text="a b c")])
        [r] = span_corruption(docs, mask_permyriad=10000).collect()
        assert r.n_masked == 3
        assert r.n_spans == 1
        assert r.corrupted == "<extra_id_0>"
        assert r.targets == "<extra_id_0> a b c"

    def test_no_masks(self, spark):
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.corpus import (
            span_corruption,
        )
        from pyspark.sql import Row

        docs = spark.createDataFrame([Row(doc_id=1, text="a b c")])
        [r] = span_corruption(docs, mask_permyriad=0).collect()
        assert r.n_masked == 0 and r.n_spans == 0
        assert r.corrupted == "a b c" and r.targets == ""


class TestBigramXent:
    def test_order_sensitivity(self, spark):
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.corpus import (
            bigram_xent,
        )
        from pyspark.sql import Row

        # corpus dominated by the bigram "a b"; the "a a" doc uses a
        # rare continuation of the same context -> higher xent2 (a
        # UNIGRAM model cannot tell these docs apart: both are pure-'a'
        # contexts with common tokens)
        docs = [Row(doc_id=i, text="a b") for i in range(10)]
        docs.append(Row(doc_id=99, text="a a"))
        out = {r.doc_id: r.xent2 for r in bigram_xent(spark.createDataFrame(docs)).collect()}
        assert out[99] > out[0]

    def test_short_docs_excluded(self, spark):
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.corpus import (
            bigram_xent,
        )
        from pyspark.sql import Row

        docs = [Row(doc_id=1, text="only"), Row(doc_id=2, text="two words")]
        out = {r.doc_id for r in bigram_xent(spark.createDataFrame(docs)).collect()}
        assert out == {2}


def test_line_frequency_filter_newline_mode(spark):
    """C4 rule: a line in more than max_docs distinct docs is dropped
    everywhere (including every doc that carried it); unique lines
    survive; repeats WITHIN one doc count once."""
    from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.corpus import (
        line_frequency_filter,
    )

    boiler = "accept cookies to continue"
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta\n{boiler}\ngamma"),
            (2, f"{boiler}\ndelta epsilon\n{boiler}"),
            (3, f"zeta\n{boiler}"),
            (4, "eta theta"),
            (5, "   \n  "),  # whitespace-only -> zero lines
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in line_frequency_filter(
            docs, max_docs=2, splitter="newline"
        ).collect()
    }
    assert out[1]["clean_text"] == "alpha beta gamma"
    assert out[1]["n_dropped"] == 1
    # doc 2 had the boilerplate twice: both positions drop
    assert out[2]["clean_text"] == "delta epsilon"
    assert out[2]["n_lines"] == 3 and out[2]["n_dropped"] == 2
    assert out[3]["clean_text"] == "zeta"
    assert out[4] ["clean_text"] == "eta theta" and out[4]["n_dropped"] == 0
    assert out[5]["n_lines"] == 0 and out[5]["clean_text"] == ""


def test_line_frequency_filter_token_mode_chunking(spark):
    """Token mode: fixed-width windows, trailing partial window kept."""
    from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.corpus import (
        line_frequency_filter,
    )

    docs = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in line_frequency_filter(
            docs, max_docs=5, line_tokens=3
        ).collect()
    }
    assert out[1]["n_lines"] == 3  # "a b c", "d e f", "g"
    assert out[1]["clean_text"] == "a b c d e f g"
    assert out[2]["n_lines"] == 0 and out[2]["clean_text"] == ""


def test_gopher_then_line_dedup_composition(spark):
    """The curation-pipeline composition: Gopher rules screen documents,
    the C4 line filter then strips cross-doc boilerplate from the
    survivors — the filter must run on gopher-PASSING docs only, and
    the boilerplate verdict must be computed on that filtered corpus."""
    from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.corpus import (
        line_frequency_filter,
    )
    from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.text import (
        gopher_rules,
    )

    body = " ".join(f"word{i}" for i in range(60))
    boiler = "subscribe to our newsletter"
    docs = spark.createDataFrame(
        [
            (1, f"{body}\n{boiler}"),
            (2, f"{boiler}\n{body} extra"),
            (3, f"{body} more\n{boiler}"),
            (4, "too short"),  # fails gopher min_words
        ],
        "doc_id long, text string",
    )
    passing = gopher_rules(docs).filter(F.col("pass_gopher")).select("doc_id")
    survivors = docs.join(passing, "doc_id")
    out = {
        r["doc_id"]: r
        for r in line_frequency_filter(
            survivors, max_docs=2, splitter="newline"
        ).collect()
    }
    assert set(out) == {1, 2, 3}  # doc 4 never reaches the line filter
    # boilerplate appears in 3 surviving docs > max_docs=2: dropped
    for d in (1, 2, 3):
        assert boiler not in out[d]["clean_text"]
        assert out[d]["n_dropped"] == 1


def test_line_frequency_filter_invariants_random(spark):
    """Randomized invariants: counts reconcile, kept text is a
    subsequence of the original lines, no over-frequent line survives
    anywhere, and the result is partition-invariant."""
    import random

    from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.corpus import (
        line_frequency_filter,
    )

    rng = random.Random(17)
    vocab = [f"w{i}" for i in range(12)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 30))))
        for i in range(60)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in line_frequency_filter(df, max_docs=3, line_tokens=2).collect()
    }
    # recompute line doc-frequencies in plain python
    def lines(t):
        toks = t.split()
        return [" ".join(toks[i : i + 2]) for i in range(0, len(toks), 2)]

    from collections import defaultdict

    docsets = defaultdict(set)
    for i, t in docs:
        for ln in lines(t):
            docsets[ln].add(i)
    hot = {ln for ln, s in docsets.items() if len(s) > 3}
    for i, t in docs:
        ls = lines(t)
        r = out[i]
        assert r["n_lines"] == len(ls)
        assert r["n_kept"] + r["n_dropped"] == r["n_lines"]
        want = " ".join(ln for ln in ls if ln not in hot)
        assert r["clean_text"] == want
    out2 = {
        r["doc_id"]: r["clean_text"]
        for r in line_frequency_filter(
            df.repartition(7), max_docs=3, line_tokens=2
        ).collect()
    }
    assert out2 == {k: v["clean_text"] for k, v in out.items()}


class TestPackingEfficiency:
    def test_fill_and_padding(self, spark):
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.corpus import (
            pack_sequences,
            packing_efficiency,
        )

        # one shard; docs of 3/3/3 tokens, budget 5 -> seqs [3+?]:
        # d0(3) fills seq0; d1(3) overflows -> seq1; d2(3) -> seq2
        docs = spark.createDataFrame(
            [(i * 8, "a b c") for i in range(3)],  # ids 0,8,16 -> shard 0
            "doc_id long, text string",
        )
        packed = pack_sequences(docs, budget=5, n_shards=8)
        out = packing_efficiency(packed, budget=5).collect()
        assert len(out) == 1
        r = out[0]
        assert r["n_docs"] == 3 and r["n_sequences"] == 3
        assert r["total_tokens"] == 9
        assert r["pad_tokens"] == 15 - 9
        assert r["fill_ratio"] == 0.6

    def test_perfect_fill(self, spark):
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.corpus import (
            pack_sequences,
            packing_efficiency,
        )

        docs = spark.createDataFrame(
            [(i * 8, "a b c d e") for i in range(4)],
            "doc_id long, text string",
        )
        packed = pack_sequences(docs, budget=5, n_shards=8)
        r = packing_efficiency(packed, budget=5).collect()[0]
        assert r["fill_ratio"] == 1.0 and r["pad_tokens"] == 0


class TestContaminationReport:
    def test_fractions_and_ranking(self, spark):
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.corpus import (
            contamination_report,
        )

        bench = spark.createDataFrame(
            [(100, "the quick brown fox jumps")],
            "doc_id long, text string",
        )
        corpus = spark.createDataFrame(
            [
                (1, "the quick brown fox jumps"),   # verbatim: frac 1.0
                (2, "x the quick brown y z"),       # 1 of 4 grams shared
                (3, "totally clean text here now"), # 0 shared -> excluded
            ],
            "doc_id long, text string",
        )
        rows = contamination_report(corpus, bench, ngram=3, top=50).collect()
        by_id = {r["doc_id"]: r for r in rows}
        assert set(by_id) == {1, 2}
        assert by_id[1]["overlap_frac"] == 1.0
        assert by_id[1]["n_grams"] == 3 and by_id[1]["n_shared_grams"] == 3
        assert by_id[2]["n_grams"] == 4 and by_id[2]["n_shared_grams"] == 1
        assert by_id[2]["overlap_frac"] == 0.25
        # ranked by fraction desc
        assert rows[0]["doc_id"] == 1


class TestVocabCoverage:
    def test_curve_is_monotone_and_mass_balanced(self, spark, sf_dir):
        import __spark_entry__ as E

        rows = E.d_vocab_coverage(spark, sf_dir).collect()
        from __spark_entry__ import _VOCAB_KS

        assert [r["k"] for r in rows] == _VOCAB_KS
        for r in rows:
            assert r["vocab_types"] <= r["k"]
            assert 0.0 < r["coverage"] <= 1.0
            assert r["oov_rate"] == 1.0 - r["coverage"]
        # coverage is monotone non-decreasing in k
        covs = [r["coverage"] for r in rows]
        assert covs == sorted(covs)
        # once k exceeds the vocabulary, coverage is exactly 1
        last = rows[-1]
        if last["vocab_types"] < last["k"]:
            assert last["coverage"] == 1.0
