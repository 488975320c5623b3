"""Property-based tests (hypothesis) for semantics that must hold on any
input: dedup idempotence/direction, resample conservation, rollup bounds,
exact-agg partition invariance."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

MAX_EXAMPLES = 12  # each example spins Spark jobs; keep the suite fast

candle_lists = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),        # symbol idx
        st.integers(min_value=0, max_value=50),       # ts slot
        st.floats(min_value=0.01, max_value=1e4,
                  allow_nan=False, allow_infinity=False),
        st.integers(min_value=0, max_value=5),        # arrival seq
    ),
    min_size=1,
    max_size=60,
)


@settings(max_examples=MAX_EXAMPLES, deadline=None)
@given(candle_lists)
def test_dedup_properties(rows):
    spark = _spark()
    from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.dedup import (
        dedup_by_key,
    )

    df = spark.createDataFrame(
        [(f"S{s}", t, round(v, 2), q) for s, t, v, q in rows],
        "symbol string, t long, v double, seq long",
    )
    out = dedup_by_key(df, ["symbol", "t"], ["seq", "v"], keep="last")
    got = out.collect()
    # exactly one row per key, and idempotent
    keys = [(r["symbol"], r["t"]) for r in got]
    assert len(keys) == len(set(keys))
    assert len(keys) == df.select("symbol", "t").distinct().count()
    assert dedup_by_key(out, ["symbol", "t"], ["seq", "v"], keep="last").count() == len(keys)
    # last-wins picks the max (seq, v) per key
    expect = {}
    for s, t, v, q in rows:
        k = (f"S{s}", t)
        cand = (q, round(v, 2))
        if k not in expect or cand > expect[k]:
            expect[k] = cand
    assert {(r["symbol"], r["t"]): (r["seq"], r["v"]) for r in got} == expect


@settings(max_examples=MAX_EXAMPLES, deadline=None)
@given(candle_lists)
def test_resample_conserves_count_and_extremes(rows):
    spark = _spark()
    from pyspark.sql import functions as F

    from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.resample import (
        resample_series,
    )

    df = spark.createDataFrame(
        [(f"S{s}", t * 60, round(v, 2), i) for i, (s, t, v, _) in enumerate(rows)],
        "symbol string, epoch long, v double, seq long",
    ).withColumn("ts", F.timestamp_seconds("epoch"))
    out = resample_series(df, 10, ["symbol"], "ts", "v", tiebreak="seq").collect()
    assert sum(r["num_records"] for r in out) == len(rows)
    assert max(r["high"] for r in out) == max(round(v, 2) for _, _, v, _ in rows)
    assert min(r["low"] for r in out) == min(round(v, 2) for _, _, v, _ in rows)
    for r in out:  # OHLC invariants per bucket
        assert r["low"] <= r["open"] <= r["high"]
        assert r["low"] <= r["close"] <= r["high"]


doc_texts = st.lists(
    st.text(
        alphabet=st.sampled_from("ab c\t\n"), min_size=0, max_size=400
    ),
    min_size=1,
    max_size=12,
)


@settings(max_examples=MAX_EXAMPLES, deadline=None)
@given(doc_texts, st.integers(min_value=2, max_value=8),
       st.integers(min_value=0, max_value=6))
def test_chunking_covers_every_token_in_order(texts, chunk_tokens, overlap):
    """Every document's token stream must be exactly reconstructible from
    its chunks (drop each chunk's leading `overlap` tokens after the
    first); empty docs chunk to nothing."""
    if overlap >= chunk_tokens:
        overlap = chunk_tokens - 1
    spark = _spark()
    from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.text import (
        chunk_documents,
    )

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    rows = chunk_documents(
        docs, chunk_tokens=chunk_tokens, overlap=overlap
    ).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    step = chunk_tokens - overlap
    for doc_id, text in enumerate(texts):
        toks = text.lower().strip().split()
        if not toks:
            assert doc_id not in by_doc
            continue
        chunks = sorted(by_doc[doc_id], key=lambda r: r["chunk_idx"])
        for i, c in enumerate(chunks):
            ctoks = c["chunk_text"].split()
            assert len(ctoks) == c["n_chunk_tokens"] <= chunk_tokens
            assert ctoks == toks[i * step : i * step + chunk_tokens]
        # the last chunk must reach the end of the token stream
        # (together with the per-chunk slice check => full coverage)
        last = chunks[-1]
        assert (len(chunks) - 1) * step + last["n_chunk_tokens"] == len(toks)


@settings(max_examples=MAX_EXAMPLES, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=10_000), min_size=1,
                max_size=80, unique=True))
def test_stratified_sample_subset_and_idempotent(ids):
    """Sampling returns a subset, is idempotent (sampling the sample at
    the same rate changes nothing), and monotone in the rate."""
    spark = _spark()
    from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.sampling import (
        stratified_sample,
    )

    df = spark.createDataFrame([(i, "x") for i in ids], "rid long, cls string")
    lo = stratified_sample(df, "cls", {"x": 3000}, "rid")
    hi = stratified_sample(df, "cls", {"x": 8000}, "rid")
    lo_ids = {r["rid"] for r in lo.collect()}
    hi_ids = {r["rid"] for r in hi.collect()}
    assert lo_ids <= hi_ids <= set(ids)
    again = {r["rid"] for r in stratified_sample(lo, "cls", {"x": 3000}, "rid").collect()}
    assert again == lo_ids


def _spark():
    from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark import get_spark

    return get_spark("tests", shuffle_partitions=8)


@settings(max_examples=MAX_EXAMPLES, deadline=None)
@given(candle_lists)
def test_max_drawdown_properties(rows):
    spark = _spark()
    from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.finance import (
        max_drawdown,
        max_drawdown_chunked,
    )

    df = spark.createDataFrame(
        [(f"S{s}", t, round(v, 2), i) for i, (s, t, v, _q) in enumerate(rows)],
        "symbol string, t long, v double, rid long",
    )
    got = max_drawdown(df, ["symbol"], "t", "rid", "v", skew_safe=False).collect()
    # drawdown is never positive and the trough never beats the running max
    for r in got:
        assert r.max_drawdown <= 0.0
        assert r.n_obs >= 1
    # chunked decomposition is bit-identical on any input
    chunked = max_drawdown_chunked(
        df, ["symbol"], "t", "rid", "v", chunk_width=7
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, chunked))


@settings(max_examples=MAX_EXAMPLES, deadline=None)
@given(candle_lists)
def test_scd2_reconstructs_changelog_states(rows):
    spark = _spark()
    from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.scd import (
        scd2_history,
    )

    # attr: a small set of states derived from the value
    df = spark.createDataFrame(
        [
            (f"S{s}", t, i, f"state{int(v) % 3}")
            for i, (s, t, v, _q) in enumerate(rows)
        ],
        "symbol string, t long, rid long, attr string",
    )
    hist = scd2_history(df, ["symbol"], "t", "rid", ["attr"]).collect()
    src = df.collect()
    # every changelog event's attr equals the version covering its ts
    # (events ordered (t, rid); the covering version is the newest with
    # valid_from <= t, tie-broken by version number)
    by_key: dict[str, list] = {}
    for h in hist:
        by_key.setdefault(h.symbol, []).append(h)
    for row in src:
        versions = sorted(by_key[row.symbol], key=lambda h: h.version)
        covering = [
            h for h in versions
            if h.valid_from <= row.t
            and (h.valid_to is None or row.t < h.valid_to or (
                # boundary events: same-ts changes (ordered by rid) close
                # the old version AT the event's ts, so an event at a
                # change instant may belong to the version it closes
                row.t == h.valid_to))
        ]
        assert any(h.attr == row.attr for h in covering)
    # exactly one current version per key, intervals tile
    for versions in by_key.values():
        versions.sort(key=lambda h: h.version)
        assert sum(1 for h in versions if h.is_current) == 1
        for a, b in zip(versions, versions[1:]):
            assert a.valid_to == b.valid_from


@settings(max_examples=MAX_EXAMPLES, deadline=None)
@given(candle_lists)
def test_indicator_properties(rows):
    """Stochastic %K bounds + OBV telescoping + VWAP bounds on arbitrary
    bar series."""
    spark = _spark()
    from pyspark.sql import functions as F
    from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.finance import (
        anchored_vwap,
        on_balance_volume,
        stochastic_oscillator,
    )

    bars = spark.createDataFrame(
        [
            (f"S{s}", t, round(v, 2), round(v * 1.1, 2), round(v * 0.9, 2), q + 1)
            for s, t, v, q in rows
        ],
        "symbol string, t long, close double, high double, low double, volume long",
    ).dropDuplicates(["symbol", "t"])

    st_out = stochastic_oscillator(bars, ["symbol"], "t", n=5, d=3).collect()
    for r in st_out:
        if r["pct_k"] is not None:
            assert -1e-9 <= r["pct_k"] <= 100 + 1e-9
        if r["pct_d"] is not None:
            assert -1e-9 <= r["pct_d"] <= 100 + 1e-9

    obv_out = on_balance_volume(bars, ["symbol"], "t").collect()
    # |OBV| can never exceed the total traded volume per key
    tot = {}
    for r in obv_out:
        tot.setdefault(r["symbol"], 0)
        tot[r["symbol"]] += r["volume"]
    last = {}
    for r in sorted(obv_out, key=lambda r: (r["symbol"], r["t"])):
        assert abs(r["obv"]) <= tot[r["symbol"]]
        last[r["symbol"]] = r["obv"]

    vw = anchored_vwap(
        bars.withColumn("anchor", F.lit(1)), ["symbol"], "anchor", "t", "t",
        price_col="close", volume_col="volume",
    ).collect()
    # VWAP always lies within [min close, max close] seen so far per key
    seen: dict = {}
    for r in sorted(vw, key=lambda r: (r["symbol"], r["t"])):
        lo, hi = seen.get(r["symbol"], (r["close"], r["close"]))
        lo, hi = min(lo, r["close"]), max(hi, r["close"])
        seen[r["symbol"]] = (lo, hi)
        assert lo - 1e-6 <= r["vwap"] <= hi + 1e-6


@settings(max_examples=MAX_EXAMPLES, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=12),
        min_size=1,
        max_size=8,
    ),
    st.sampled_from([("a", "b"), ("a", "a"), ("b", "c"), ("c", "c")]),
)
def test_apply_bpe_merge_matches_python_greedy_fold(words, rule):
    """The island-parity window algebra must equal the per-word greedy
    left-to-right scan for ANY symbol sequence and any rule, including
    the a==b overlap chains."""
    spark = _spark()
    from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.corpus import (
        _apply_bpe_merge,
    )

    a, b = rule

    def greedy(syms):
        # reference semantics: left-to-right, non-overlapping, merge-once
        res = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                res.append(a + b)
                i += 2
            else:
                res.append(syms[i])
                i += 1
        return res

    rows = [(f"w{i}", 1, list(w)) for i, w in enumerate(words)]
    df = spark.createDataFrame(rows, "w string, cnt long, syms array<string>")
    got = {
        r["w"]: list(r["syms"]) for r in _apply_bpe_merge(df, a, b).collect()
    }
    want = {f"w{i}": greedy(list(w)) for i, w in enumerate(words)}
    assert got == want
