"""IVF kNN recall vs brute force; rolling k-gram bottom-k fingerprints."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.similarity import (
    brute_force_knn,
    ivf_knn,
)
from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.text import (
    kgram_bottomk_fingerprint,
)
from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.sources.tables import (
    load_table,
)


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = {}
    for r in brute_force_knn(queries, emb, k=5).collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    approx = {}
    for r in ivf_knn(queries, emb, k=5, n_lists=8, n_probe=3).collect():
        approx.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    recall = hits / sum(len(v) for v in exact.values())
    assert recall >= 0.4, f"IVF recall collapsed: {recall}"
    # every returned neighbor must be a real corpus id, ranked 1..5
    for q, r in approx.items():
        assert len(r) <= 5


def test_ivf_ml_fit_path(spark, sf_dir):
    """pyspark.ml KMeans quantizer variant keeps the same output shape."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    rows = ivf_knn(queries, emb, k=3, n_lists=4, n_probe=2, fit="ml").collect()
    assert rows and {r["query_id"] for r in rows} <= {0, 1, 2}
    assert all(1 <= r["rank"] <= 3 for r in rows)


def test_seeded_centroids_partitioning_invariant(spark, sf_dir):
    """The deterministic fit must not depend on input partitioning — the
    property that makes the DuckDB oracle replay exact."""
    from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.similarity import (
        seeded_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    a = seeded_centroids(emb, n_lists=4, n_iter=1).collect()
    b = seeded_centroids(emb.repartition(7), n_lists=4, n_iter=1).collect()
    ca = {r["cell"]: r["centroid"] for r in a}
    cb = {r["cell"]: r["centroid"] for r in b}
    assert ca == cb  # bit-identical, not approximately equal


def test_hyperplane_weights_match_python_reference(spark):
    """JVM-side md5 weight generation must equal _hyperplane_component
    exactly — the LSH oracles regenerate these weights in DuckDB from the
    same formula."""
    from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.similarity import (
        _hyperplane_component,
        hyperplane_weights,
    )

    got = {
        (r["plane"], r["pos"]): r["w"]
        for r in hyperplane_weights(spark, 3, 8).collect()
    }
    assert len(got) == 24
    for (p, d), w in got.items():
        assert w == _hyperplane_component(p, d), (p, d)


def test_kgram_fingerprint_near_dup_overlap(spark):
    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "the quick brown fox jumps over the lazy cat"),
            (2, "an utterly different sentence about engines"),
            (3, "the quick brown fox jumps over the lazy dog"),
            (4, "tiny"),  # shorter than k -> single padded gram, no crash
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in kgram_bottomk_fingerprint(docs).collect()}
    assert out[0]["fingerprint"] == out[3]["fingerprint"]  # identical docs
    s0, s1, s2 = (set(out[i]["fingerprint_sketch"]) for i in (0, 1, 2))
    assert len(s0 & s1) > len(s0 & s2)  # near-dups share sketch entries
    assert out[4]["fingerprint_sketch"]  # degenerate doc still fingerprints


def test_ivf_index_persist_probe_matches_direct(spark, sf_dir, tmp_path):
    """The IVF index lifecycle: build once, persist (assignments
    partitioned by cell), probe the STORED index — bit-identical to the
    one-shot ivf_knn, and a second query batch reuses the same artifact."""
    from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.similarity import (
        ivf_index,
        ivf_knn,
        ivf_probe,
    )
    from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.sources.tables import (
        load_table,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    q1 = emb.filter(F.col("vec_id") < 5)
    q2 = emb.filter((F.col("vec_id") >= 5) & (F.col("vec_id") < 10))

    cents, assigns = ivf_index(emb, n_lists=8)
    cdir, adir = str(tmp_path / "cents"), str(tmp_path / "assigns")
    cents.write.parquet(cdir)
    assigns.write.partitionBy("cell").parquet(adir)
    cents_r = spark.read.parquet(cdir)
    # partition-column readback: cell comes back from the directory name;
    # restore the declared int type
    assigns_r = spark.read.parquet(adir).withColumn(
        "cell", F.col("cell").cast("int")
    )

    for q in (q1, q2):
        direct = ivf_knn(q, emb, k=3, n_lists=8).collect()
        stored = ivf_probe(q, cents_r, assigns_r, k=3).collect()
        assert sorted(map(tuple, stored)) == sorted(map(tuple, direct))
        assert len(direct) > 0


def test_sq8_recall_and_quantize_contract(spark, sf_dir):
    from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.similarity import (
        sq8_knn,
        sq8_quantize,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = {}
    for r in brute_force_knn(queries, emb, k=5).collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    approx = {}
    ranks = {}
    for r in sq8_knn(emb, emb, k=5, rerank=20,
                     query_filter=F.col("vec_id") < 5).collect():
        approx.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        ranks.setdefault(r["query_id"], []).append(r["rank"])
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    recall = hits / sum(len(v) for v in exact.values())
    # int8 codes keep ~7 bits of per-dim signal; with a 4x rerank margin
    # the top-5 should essentially match brute force
    assert recall >= 0.8, f"SQ8 recall collapsed: {recall}"
    for q, rs in ranks.items():
        assert sorted(rs) == list(range(1, len(rs) + 1))
        assert q not in approx[q]  # self excluded

    # quantize contract: codes in [-127, 127], zero vector -> zero codes
    qz = sq8_quantize(emb.limit(50)).collect()
    for r in qz:
        assert all(-127 <= v <= 127 for v in r["q"])
        assert r["qn"] >= 0.0


def _pq_recall(spark, sf_dir):
    from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.similarity import (
        pq_index,
        pq_probe,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = {}
    for r in brute_force_knn(queries, emb, k=5).collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    cb, codes, vectors = pq_index(emb, m=16, k=16, n_iter=2, dim=64)
    approx = {}
    ranks = {}
    probed = pq_probe(
        queries, cb, codes, vectors, k=5, shortlist_mult=16, m=16, dim=64
    )
    for r in probed.collect():
        approx.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        ranks.setdefault(r["query_id"], []).append(r["rank"])
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    recall = hits / sum(len(v) for v in exact.values())
    return recall, cb, codes, approx, ranks, emb


def test_pq_recall_and_code_contract(spark, sf_dir):
    recall, cb, codes, approx, ranks, emb = _pq_recall(spark, sf_dir)
    # 16 subspaces x 16 codes on unit-normalized vectors: integer-ADC
    # order tracks cosine order, so with a 16x shortlist + exact rescore
    # the top-5 should essentially match brute force (parity with the
    # SQ8 contract; measured 1.0 at sf0.001, deterministic md5 seeding)
    assert recall >= 0.8, f"PQ recall collapsed: {recall}"
    for q, rs in ranks.items():
        assert sorted(rs) == list(range(1, len(rs) + 1))
        assert q not in approx[q]  # self excluded

    # code contract: one code per (vector, subspace), cells in [0, 16)
    n = emb.count()
    assert codes.count() == n * 16
    stats = codes.groupBy("sub").agg(
        F.min("cell").alias("lo"), F.max("cell").alias("hi")
    ).collect()
    assert len(stats) == 16
    for r in stats:
        assert 0 <= r["lo"] and r["hi"] <= 15
    # codebooks: 16 subspaces x <= 16 cells of 4-dim centroids
    for r in cb.collect():
        assert len(r["centroid"]) == 4


def test_pq_recall_sf001(spark):
    # same contract at the correctness-gate scale (sf0.01): measured
    # 0.96, deterministic
    recall, *_ = _pq_recall(spark, "/root/testdata/sf0.01")
    assert recall >= 0.8, f"PQ recall collapsed at sf0.01: {recall}"


def test_silhouette_separated_blobs_score_high(spark):
    """Two tight, far-apart blobs: simplified silhouette ~1 for every
    point; n_lists < 2 is rejected."""
    import pytest

    from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.similarity import (
        silhouette,
    )

    rows = []
    for i in range(20):
        base = [0.0] * 8
        # blob A near the origin, blob B far along dim 0; tiny per-point
        # jitter keeps distances nonzero
        if i % 2 == 0:
            base[0] = 0.0 + (i % 5) * 0.01
        else:
            base[0] = 100.0 + (i % 5) * 0.01
        base[1] = (i % 3) * 0.01
        rows.append((i, base))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = silhouette(emb, n_lists=2, n_iter=2).collect()
    assert len(out) == 2
    assert sum(r.n for r in out) == 20
    for r in out:
        assert r.mean_sil > 0.95  # near-perfect separation
    with pytest.raises(ValueError):
        silhouette(emb, n_lists=1)


class TestEmbeddingCovariance:
    def test_matches_numpy(self, spark):
        import numpy as np
        from pyspark.sql import Row

        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.similarity import (
            embedding_covariance,
        )

        rng = np.random.default_rng(7)
        x = rng.normal(size=(40, 4)).astype(np.float32)
        df = spark.createDataFrame(
            [Row(vec_id=i, embedding=[float(v) for v in row]) for i, row in enumerate(x)]
        )
        out = {(r.i, r.j): r for r in embedding_covariance(df).collect()}
        # reference: covariance of the micro-quantized values
        q = np.floor(x.astype(np.float64) * 1e6 + 0.5)
        ref = np.cov(q, rowvar=False, ddof=1) / 1e12
        assert len(out) == 10  # upper triangle of 4x4
        for (i, j), r in out.items():
            assert r.n == 40
            assert r.cov == pytest.approx(ref[i, j], rel=1e-9)

    def test_partition_invariant(self, spark):
        import numpy as np
        from pyspark.sql import Row

        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.similarity import (
            embedding_covariance,
        )

        rng = np.random.default_rng(11)
        x = rng.normal(size=(30, 3)).astype(np.float32)
        df = spark.createDataFrame(
            [Row(vec_id=i, embedding=[float(v) for v in row]) for i, row in enumerate(x)]
        )
        a = {(r.i, r.j): r.cov for r in embedding_covariance(df.coalesce(1)).collect()}
        b = {(r.i, r.j): r.cov for r in embedding_covariance(df.repartition(8)).collect()}
        assert a == b  # exact integer partials -> bit-identical


class TestHardNegatives:
    def test_picks_nearest_cross_label(self, spark):
        from pyspark.sql import Row

        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.similarity import (
            hard_negatives,
        )

        # label 0 along +x, label 1 along +y; one label-1 vector leans
        # toward +x: it is label 0's hardest negative
        rows = [
            Row(vec_id=1, label=0, embedding=[1.0, 0.0]),
            Row(vec_id=2, label=0, embedding=[0.9, 0.1]),
            Row(vec_id=3, label=1, embedding=[0.0, 1.0]),
            Row(vec_id=4, label=1, embedding=[0.1, 0.9]),
            Row(vec_id=5, label=1, embedding=[0.7, 0.7]),  # the leaner
        ]
        out = hard_negatives(spark.createDataFrame(rows), k=1).collect()
        by_label = {r.label: r for r in out}
        assert by_label[0].neighbor_id == 5
        assert by_label[0].neighbor_label == 1
        # label 1's centroid leans +y but vec 2 (0.9, 0.1) vs vec 1
        # (1.0, 0.0): vec 2 has the y component -> more similar
        assert by_label[1].neighbor_id == 2

    def test_never_returns_own_label(self, spark):
        from pyspark.sql import Row

        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.similarity import (
            hard_negatives,
        )

        rows = [
            Row(vec_id=i, label=i % 2, embedding=[float(i), 1.0])
            for i in range(10)
        ]
        for r in hard_negatives(spark.createDataFrame(rows), k=3).collect():
            assert r.neighbor_label != r.label


class TestPcaProject:
    def test_matches_numpy_pca(self, spark):
        import numpy as np
        from pyspark.sql import Row

        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.similarity import (
            pca_project,
        )

        rng = np.random.default_rng(3)
        # anisotropic cloud: one dominant direction
        base = rng.normal(size=(60, 4)) * np.array([5.0, 1.0, 0.5, 0.1])
        x = base.astype(np.float32)
        df = spark.createDataFrame(
            [Row(vec_id=i, embedding=[float(v) for v in row]) for i, row in enumerate(x)]
        )
        out = {r.vec_id: r for r in pca_project(df, k=2).collect()}
        # numpy reference on the micro-quantized values (the operator's
        # covariance quantizes identically)
        q = np.floor(x.astype(np.float64) * 1e6 + 0.5) / 1e6
        mu = q.mean(axis=0)
        cov = np.cov(q, rowvar=False, ddof=1)
        w, v = np.linalg.eigh(cov)
        order = np.argsort(w)[::-1][:2]
        comps = v[:, order].T
        for row in comps:
            if row[np.argmax(np.abs(row))] < 0:
                row *= -1.0
        # mean used by the operator is the quantized-integer mean
        # (sum(floor(x*1e6+0.5))/n/1e6) — within 5e-7/dim of the raw
        # mean, inside this test's atol either way
        mu_op = x.astype(np.float64).mean(axis=0)
        ref = (x.astype(np.float64) - mu_op) @ comps.T
        for i in range(60):
            got = np.array(out[i].projection)
            assert np.allclose(got, ref[i], atol=1e-4)
        # explained variance dominated by the stretched axis
        assert out[0].explained > 0.9

    def test_projection_shape_and_determinism(self, spark):
        import numpy as np
        from pyspark.sql import Row

        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.similarity import (
            pca_project,
        )

        rng = np.random.default_rng(5)
        x = rng.normal(size=(30, 6)).astype(np.float32)
        df = spark.createDataFrame(
            [Row(vec_id=i, embedding=[float(v) for v in row]) for i, row in enumerate(x)]
        )
        a = {r.vec_id: tuple(r.projection) for r in pca_project(df.coalesce(1), k=3).collect()}
        b = {r.vec_id: tuple(r.projection) for r in pca_project(df.repartition(8), k=3).collect()}
        assert set(a) == set(b)
        for i in a:
            assert np.allclose(a[i], b[i], atol=1e-12)
        assert all(len(v) == 3 for v in a.values())


class TestPcaFitLocal:
    """The emb_pca oracle rests on pca_fit_local reproducing the
    distributed fit BIT-FOR-BIT (same exact-integer ledger, same eigh
    input, same numpy) — pin that on the real testdata."""

    def test_local_fit_bit_matches_distributed(self, spark):
        import numpy as np

        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.similarity import (
            _pca_fit,
            pca_fit_local,
        )
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.sources.tables import (
            load_table,
        )

        sf_dir = "/root/testdata/sf0.001"
        df = load_table(spark, sf_dir, "embeddings")
        mu_d, comps_d, ev_d, ex_d = _pca_fit(df, 8, "embedding")
        mu_l, comps_l, ev_l, ex_l = pca_fit_local(
            f"{sf_dir}/embeddings.parquet", k=8
        )
        assert np.array_equal(mu_d, mu_l)  # bit-identical, not allclose
        assert np.array_equal(comps_d, comps_l)
        assert np.array_equal(ev_d, ev_l)
        assert ex_d == ex_l

    def test_scalar_layout_is_flat(self, spark):
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.similarity import (
            pca_project_scalar,
        )
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.sources.tables import (
            load_table,
        )

        df = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        out = pca_project_scalar(df, k=3)
        assert out.columns == ["vec_id", "p0", "p1", "p2", "explained"]
        row = out.limit(1).collect()[0]
        # every cell scalar (hashable by the driver's canonicalizer)
        assert all(not isinstance(v, (list, dict)) for v in row)


class TestEmbeddingDrift:
    def test_shifted_dimension_flagged(self, spark):
        import numpy as np
        from pyspark.sql import Row

        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.similarity import (
            embedding_drift,
        )

        rng = np.random.default_rng(9)
        a = rng.normal(size=(80, 3))
        b = rng.normal(size=(80, 3))
        b[:, 1] += 5.0  # big shift on dim 1 only
        mk = lambda x, base: spark.createDataFrame(
            [Row(vec_id=base + i, embedding=[float(v) for v in r]) for i, r in enumerate(x)]
        )
        out = {r.dim: r for r in embedding_drift(mk(a, 0), mk(b, 1000)).collect()}
        assert abs(out[1].smd) > 3.0
        assert abs(out[0].smd) < 1.0 and abs(out[2].smd) < 1.0
        assert out[1].n_a == 80 and out[1].n_b == 80

    def test_identical_slices_zero(self, spark):
        import numpy as np
        from pyspark.sql import Row

        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.similarity import (
            embedding_drift,
        )

        rng = np.random.default_rng(2)
        x = rng.normal(size=(50, 2))
        df = spark.createDataFrame(
            [Row(vec_id=i, embedding=[float(v) for v in r]) for i, r in enumerate(x)]
        )
        for r in embedding_drift(df, df).collect():
            assert r.smd == 0.0
            assert r.mean_a == r.mean_b


def test_ivf_recall_report_math(spark, sf_dir):
    """The emb_ivf_recall registry report: per-query hit counts are
    bounded by k, recall is hits/5, and the report covers exactly the
    brute-force query set (left join keeps zero-hit queries)."""
    import __spark_entry__ as E

    rows = E.emb_ivf_recall(spark, sf_dir).collect()
    assert len(rows) == 10  # the vec_id < 10 query set
    for r in rows:
        assert 0 <= r["n_hits"] <= 5
        assert r["recall_at_5"] == r["n_hits"] / 5.0
