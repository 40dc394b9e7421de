"""End-to-end training-data build: the LLM-pipeline extension surface
composed into the pipeline a pre-training data team actually runs, over
the driver's own testdata.

  1. scan      documents (+ embeddings for near-dup clustering),
               then the declarative ingest gate (completeness /
               uniqueness / consistency expectations) — fail fast,
               don't curate a broken feed
  2. cut       quality score + Gopher-style repetition filters +
               substring-level duplicate-span coverage
  3. scrub     PII redaction (text is replaced by its redacted form)
  4. decontam  drop docs overlapping the held-out benchmark subset
  5. dedup     exact keep-one, then embedding near-dup clusters keeping
               each cluster's BEST-QUALITY member (retention policy),
               then SemDeDup semantic dedup within k-means clusters,
               then a leakage-free train carve (near-dup clusters never
               straddle the held-out splits)
  6. mix       water-fill a token budget across sources → realize the
               plan with fractional stratified sampling →
               replacement-free epochs (temperature plan reported
               side-by-side)
  7. pack      concat-then-chunk sequence offsets per (epoch, source)
  8. ship      hive-partitioned parquet (epoch/source) trainers prune;
               plus the overlapping chunk-window view of epoch 0

Every stage is the same operator the registered query surface verifies
against DuckDB; this file just composes them. Run:

    python examples/training_data_pipeline.py [sf_dir]   (~30 s at sf0.01)
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from db_integration_via_kafka_ksql_spark.io import load_table
from db_integration_via_kafka_ksql_spark.operators import dedup as D
from db_integration_via_kafka_ksql_spark.operators import graph as G
from db_integration_via_kafka_ksql_spark.operators import kmeans as KM
from db_integration_via_kafka_ksql_spark.operators import text_analysis as TA
from db_integration_via_kafka_ksql_spark.session import get_spark
from db_integration_via_kafka_ksql_spark.sinks.dataset import (
    read_dataset,
    write_dataset,
)

MIN_QUALITY = 0.70
MAX_DUP_BIGRAM_FRAC = 0.60
MAX_DUP_SPAN_FRAC = 0.80  # drop docs mostly made of corpus-shared spans
BENCH_MOD = 11
MIX_BUDGET_TOKENS = 8_000  # target corpus size the water-fill planner hits
N_EPOCHS = 4
PACK_CAPACITY = 256


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="training_data_pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    stages: list[tuple[str, int]] = []

    docs = load_table(spark, sf_dir, "documents")
    stages.append(("scanned", docs.count()))

    # 1b. ingest gate: the declarative constraint suite runs BEFORE any
    # curation math trusts the feed — a failed expectation here is a
    # pipeline stop, not a silently skewed corpus
    from db_integration_via_kafka_ksql_spark.operators import validation as VAL

    gate = VAL.check_constraints(
        docs,
        [
            VAL.completeness("text_present", "text"),
            VAL.completeness("source_present", "source"),
            VAL.uniqueness("doc_id_unique", "doc_id"),
            VAL.predicate("n_chars_consistent", "n_chars = length(text)"),
        ],
    ).collect()
    failed = [r["constraint"] for r in gate if r["status"] != "pass"]
    if failed:
        raise SystemExit(f"ingest gate failed: {failed}")
    stages.append(("ingest constraints passed", len(gate)))

    # 2. quality + repetition cuts (both scan-side / uniform-shuffle ops)
    ok_quality = TA.quality_scores(docs, keep_cols=("source", "text")).filter(
        F.col("quality") >= MIN_QUALITY
    )
    # dup_bigram_frac is NULL for sub-bigram docs (no gram population to
    # measure); policy: too short to be repetitive, so keep them here and
    # let the quality cut decide their fate
    ok_rep = TA.repetition_stats(docs).filter(
        F.col("dup_bigram_frac").isNull()
        | (F.col("dup_bigram_frac") <= MAX_DUP_BIGRAM_FRAC)
    )
    # substring-level signal the doc-level fingerprints miss: docs whose
    # token mass is mostly windows shared with OTHER docs (boilerplate)
    ok_spans = TA.duplicate_spans(docs).filter(
        F.col("dup_frac") <= MAX_DUP_SPAN_FRAC
    )
    kept = (
        ok_quality.join(ok_rep.select("doc_id"), "doc_id", "left_semi")
        .join(ok_spans.select("doc_id"), "doc_id", "left_semi")
    )
    stages.append(("after quality+repetition+span cut", kept.count()))

    # 2b. substring-level CUTTING (Lee et al. 2022, the applied step):
    # surviving docs get their exact duplicate spans REMOVED, not just
    # scored — dropping only mostly-duplicate docs leaves boilerplate
    # embedded in otherwise-good ones. Docs cut down to nothing leave.
    cuts = TA.remove_duplicate_spans(docs).select(
        "doc_id", "clean_text", "n_removed"
    )
    kept = (
        kept.join(cuts, "doc_id")
        .filter(F.col("clean_text") != "")
        .withColumn("text", F.col("clean_text"))
        .drop("clean_text", "n_removed")
    )
    stages.append(("after duplicate-span removal", kept.count()))

    # 3. PII scrub: text continues downstream in redacted form
    kept = (
        TA.scrub_pii(kept, id_cols=("doc_id", "source"))
        .withColumnRenamed("redacted", "text")
        .drop("n_email", "n_phone", "n_ipv4")
    )

    # 4. benchmark decontamination (doc_id % BENCH_MOD == 0 is the eval set)
    clean = TA.decontaminate(docs, bench_mod=BENCH_MOD).filter(
        F.col("contaminated") == 0
    )
    kept = kept.join(clean.select("doc_id"), "doc_id", "left_semi")
    stages.append(("after decontamination", kept.count()))

    # 5a. exact dedup keep-one
    winners = D.exact_duplicates(kept).select(F.col("keep_doc").alias("doc_id"))
    kept = kept.join(winners, "doc_id", "left_semi")
    stages.append(("after exact dedup", kept.count()))

    # 5b. embedding near-dup clusters (vec_id aligns with doc_id) with the
    # quality-aware retention policy: every cluster keeps its best-quality
    # member, not the one with the smallest id
    emb = load_table(spark, sf_dir, "embeddings")
    clusters = G.dedup_clusters(
        emb,
        # n_planes="auto" is the production default: LSH bucket count
        # scales with the corpus so the candidate space stays linear
        # (a fixed plane count is quadratic at some corpus size — the
        # r14 sf1 probe measured it; see dedup.auto_lsh_planes)
        D.embedding_dup_pairs(emb, multiprobe=True, n_planes="auto"),
        "vec_id",
        "vec_a",
        "vec_b",
    )
    quality = TA.quality_scores(docs).select("doc_id", "quality")
    # restrict membership to docs that SURVIVED the upstream cuts before
    # the argmax: otherwise a cluster whose best member was already
    # filtered out would nominate a ghost keep_id and drop its surviving
    # members too
    members = (
        clusters.select(F.col("vec_id").alias("doc_id"), "cluster_rep")
        .join(kept.select("doc_id"), "doc_id", "left_semi")
        .join(quality, "doc_id")
    )
    reps = D.keep_best_per_cluster(
        members, "cluster_rep", "doc_id", "quality"
    ).select(F.col("keep_id").alias("doc_id"))
    kept = kept.join(reps, "doc_id", "left_semi")
    stages.append(("after near-dup keep-best-quality", kept.count()))

    # 5c. semantic dedup (SemDeDup): k-means blocks the embedding space,
    # near-dup pairs only form within a cluster. Drop a doc only when its
    # dominating (lower-id) neighbor actually SURVIVED the upstream cuts —
    # a ghost dominator must not take its survivors down with it
    sem_pairs = KM.semdedup_pairs(emb, threshold_pct=40)
    sem_dropped = (
        sem_pairs.join(
            kept.select(F.col("doc_id").alias("vec_a")), "vec_a", "left_semi"
        )
        .select(F.col("vec_b").alias("doc_id"))
        .distinct()
    )
    kept = kept.join(sem_dropped, "doc_id", "left_anti")
    stages.append(("after semantic dedup", kept.count()))

    # 5d. leakage-free eval carve-out: test/val membership is hashed from
    # the near-dup CLUSTER (MinHash pairs on the surviving corpus), so no
    # near-duplicate of a training doc can sit in the held-out splits;
    # only the train split continues into the mix. The pair threshold is
    # TIGHT (0.9): a loose threshold on this highly-self-similar synthetic
    # corpus chains everything into one component, and a single cluster
    # moves as one unit — the documented trade (dedup first, split tight)
    mh_pairs = D.minhash_lsh_pairs(kept, k=8, bands=4, threshold=0.9)
    splits = G.leakage_free_splits(
        kept, mh_pairs, "doc_id", "doc_a", "doc_b",
        weights=[("train", 90), ("val", 5), ("test", 5)],
    )
    train_ids = splits.filter(F.col("split") == "train").select(
        F.col("doc_id").cast("long").alias("doc_id")
    )
    kept = kept.join(train_ids, "doc_id", "left_semi")
    stages.append(("after leakage-free train carve", kept.count()))

    # 6. training mix: water-fill the token budget across sources, realize
    # the plan's fractional rates deterministically, then split epochs
    plan = TA.token_budget_mixture(kept, budget_tokens=MIX_BUDGET_TOKENS)
    mixed = TA.stratified_sample_by_plan(kept, plan)
    mixed = TA.epoch_split(mixed, n_epochs=N_EPOCHS)
    stages.append(("after budgeted mix sampling", mixed.count()))
    # the temperature planner is the alternative mixing policy (share ~
    # sqrt(supply) upsamples low-resource sources); report what it WOULD
    # do to the same corpus so the two plans are comparable side by side
    temp = TA.temperature_mixture(
        kept, budget_tokens=MIX_BUDGET_TOKENS, alpha=0.5
    ).agg(
        F.min("repeat_factor").alias("lo"), F.max("repeat_factor").alias("hi")
    ).collect()[0]
    temp_note = f"temperature(0.5) repeat factors {temp.lo:.2f}..{temp.hi:.2f}"

    # 6b. curriculum order: quality-decile buckets consumed easy-first,
    # deterministically shuffled within each bucket; global positions
    # from broadcast prefix-sum offsets (never a global sort) — the
    # column a curriculum-aware loader sorts its shards by
    curric = TA.curriculum_order(mixed.select("doc_id", "text"))
    mixed = mixed.join(
        curric.select("doc_id", F.col("global_pos").alias("curriculum_pos")),
        "doc_id",
    )

    # 6c. dataset-card diff: what this build did to the raw corpus
    # (removed = cut/dedup/mix-dropped docs; the incremental-reprocessing
    # work list when the next crawl lands)
    from db_integration_via_kafka_ksql_spark.operators import versioning as V

    diff = {
        r["change_type"]: r["n"]
        for r in V.snapshot_diff_summary(
            docs.select("doc_id", "text"),
            mixed.select("doc_id", "text").distinct(),
        ).collect()
    }
    diff_note = (
        f"version diff vs raw corpus: {diff.get('unchanged', 0):,} kept, "
        f"{diff.get('removed', 0):,} removed, {diff.get('changed', 0):,} changed"
    )

    # 7. sequence packing per (epoch, source) shard
    packed = TA.pack_sequences(
        mixed, capacity=PACK_CAPACITY, shard_cols=("epoch", "source")
    )
    corpus = mixed.join(
        packed.select("doc_id", "start_offset", "first_seq", "last_seq"),
        "doc_id",
    )

    # 8. ship as hive-partitioned parquet; prove the pruned read path
    out = os.path.join(tempfile.mkdtemp(prefix="training_set_"), "corpus")
    # z-order the files within each hive partition on (doc_id,
    # curriculum_pos) so BOTH id-lookups and curriculum-range reads prune
    write_dataset(
        corpus, out, partition_cols=("epoch", "source"),
        zorder_cols=("doc_id", "curriculum_pos"),
    )
    epoch0 = read_dataset(spark, out).filter("epoch = 0")
    n_epoch0 = epoch0.count()
    # the RAG/long-context view of the same shipped epoch: overlapping
    # 64-token windows that never cross a doc boundary
    n_chunks = TA.chunk_documents(epoch0, window=64, stride=48).count()
    n_seqs = (
        epoch0.groupBy("source").agg(F.max("last_seq").alias("m")).agg(
            F.sum(F.col("m") + 1)
        ).collect()[0][0]
    )

    width = max(len(s) for s, _ in stages)
    for stage, n in stages:
        print(f"  {stage:<{width}}  {n:>7,}")
    print(f"  dataset: {out}")
    print(f"  {temp_note}")
    print(f"  {diff_note}")
    print(
        f"  epoch 0 reads {n_epoch0:,} docs in {n_seqs:,} packed"
        f" {PACK_CAPACITY}-token sequences (partition-pruned scan),"
        f" {n_chunks:,} overlapping 64-token chunk windows"
    )
    spark.stop()


if __name__ == "__main__":
    main()
