"""Training-data pipeline walkthrough: curate a document corpus with the
engine's beyond-reference operators, then persist it as a versioned
table.

Run: python examples/corpus_pipeline.py [testdata_dir]

Stages (each also available as an oracle-checked query in
__spark_entry__.py — names in brackets):

1. curation verdicts   [d_curation_pipeline]  near-dup keeper selection,
   benchmark decontamination, quality floor, train/val/test hash split
2. sequence packing    [d_pack_sequences]     greedy token-budget packing
3. sketch artifacts    [d_hll_users, d_cms_tokens]  mergeable HLL + CMS
4. versioned commit    [tests/test_versioned.py]    snapshot + time travel
5. incremental dedup   [d_incremental_dedup]  persist the MinHash index,
   probe the NEXT ingest batch against it without re-hashing the corpus
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark import get_spark  # noqa: E402
from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.corpus import (  # noqa: E402
    pack_sequences,
)
from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.sketch import (  # noqa: E402
    cms_sketch,
    hll_estimate,
    hll_registers,
)
from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.text import (  # noqa: E402
    tokens,
)
from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.plans.versioned import (  # noqa: E402
    commit_version,
    history,
    read_version,
)
from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.sources.tables import (  # noqa: E402
    load_table,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("corpus-pipeline-example")
    import __spark_entry__ as E

    docs = load_table(spark, sf_dir, "documents")
    print(f"corpus: {docs.count()} documents")

    # 1. one-query curation: drop_reason | split per doc
    verdicts = E.queries()["d_curation_pipeline"](spark, sf_dir)
    verdicts.groupBy("drop_reason", "split").count().orderBy(
        "drop_reason", "split"
    ).show()

    # 2. pack the kept docs into 512-token training sequences
    kept_ids = verdicts.filter(F.col("drop_reason").isNull()).select("doc_id")
    kept = docs.join(kept_ids, "doc_id")
    packed = pack_sequences(kept, budget=512, n_shards=8)
    n_seqs = packed.select("shard", "seq_idx").distinct().count()
    print(f"packed {packed.count()} kept docs into {n_seqs} sequences")

    # 3. sketch artifacts: tiny, mergeable, engine-portable
    regs = hll_registers(docs, "source", p=8)
    print(f"~distinct sources (HLL): {hll_estimate(regs, p=8):.1f}")
    cells = cms_sketch(docs.select(F.explode(tokens("text")).alias("t")), "t")
    print(f"CMS cells touched: {cells.count()} (<= 4096 at any corpus size)")

    # 4. commit the curated set as a versioned table; re-curate -> new
    #    version; old snapshot stays readable (time travel)
    with tempfile.TemporaryDirectory() as td:
        table = f"{td}/curated_docs"
        v1 = commit_version(kept.select("doc_id", "text"), table, note="initial")
        v2 = commit_version(
            kept.filter(F.col("doc_id") % 2 == 0).select("doc_id", "text"),
            table,
            note="re-curated",
        )
        print(
            f"v{v1}: {read_version(spark, table, v1).count()} docs; "
            f"v{v2}: {read_version(spark, table, v2).count()} docs"
        )
        for h in history(table):
            print(f"  version {h['version']} ({h['mode']}): {h['note']}")

    # 5. incremental dedup: index today's curated corpus once, probe the
    #    next batch against the stored artifact (no corpus re-hash)
    from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.dedup_similarity import (  # noqa: E402,E501
        dedup_against_index,
        minhash_index,
    )

    with tempfile.TemporaryDirectory() as td:
        idx_path = f"{td}/minhash_index"
        minhash_index(kept, threshold=0.9).write.parquet(idx_path)
        index = spark.read.parquet(idx_path)
        # tomorrow's batch: some genuinely new docs + re-crawls of
        # indexed ones (simulated by re-submitting a slice with new ids)
        recrawl = kept.limit(20).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
        )
        pairs = dedup_against_index(recrawl, index, threshold=0.9)
        n_dup = pairs.select("new_id").distinct().count()
        print(f"incremental probe: {n_dup}/20 re-crawled docs matched the index")
        # the batch's own index rows APPEND — tomorrow's index is ready
        minhash_index(recrawl, threshold=0.9).write.mode("append").parquet(idx_path)
        print(f"index now {spark.read.parquet(idx_path).count()} rows")


if __name__ == "__main__":
    main()
