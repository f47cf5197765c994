"""Training-corpus preparation job — the ``spark-submit --py-files``
entry point for the post-extraction pipeline.

Composes the training-data operators end to end over a documents-shaped
table (``doc_id``, ``text`` [, ``source``, ``lang``]):

  exact dedup (keep-first) → language-ID allowlist → quality floor →
  deterministic train/val/test split → token-budget sequence packing

and writes one parquet table partitioned by ``split`` — the shard layout
a data loader consumes. Every stage is the oracle-verified operator from
``operators/``; the whole job is one aggregation + semi-join (dedup), one
projection (lang/quality), and one window per source shard (packing) —
no Python in the hot path, so it scales with the scan.

Usage:

    spark-submit --py-files dist/nhao_engine.zip jobs/prepare_corpus.py \\
        --input <documents parquet> --output <corpus path> \\
        [--langs en,no] [--min-quality 0.5] [--budget 2048] \\
        [--sample-rate 1.0] [--train 0.98 --val 0.01 --test 0.01]
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main(argv=None):
    p = argparse.ArgumentParser(description="training-corpus preparation")
    p.add_argument("--input", required=True,
                   help="documents table path (doc_id, text[, source, lang])")
    p.add_argument("--output", required=True, help="corpus output path")
    p.add_argument("--langs", default="en",
                   help="comma-separated predicted-language allowlist")
    p.add_argument("--min-quality", type=float, default=0.5)
    p.add_argument("--budget", type=int, default=2048,
                   help="context-window token budget for packing")
    p.add_argument("--sample-rate", type=float, default=1.0,
                   help="deterministic downsampling rate (1.0 = keep all)")
    p.add_argument("--train", type=float, default=0.98)
    p.add_argument("--val", type=float, default=0.01)
    p.add_argument("--test", type=float, default=0.01)
    p.add_argument("--group-col", default="source",
                   help="packing shard column (docs without it pack as "
                        "one shard)")
    p.add_argument("--induce-lexicon", type=int, default=0, metavar="N",
                   help="induce an orthography confusion table from the "
                        "top-N corpus tokens (operators/lexicon.py) and "
                        "normalize text with it before packing (0 = off)")
    p.add_argument("--scrub", action="store_true",
                   help="mask emails/URLs in text with typed placeholders "
                        "(operators/quality.scrub_patterns)")
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from norsk_historisk_avis_ocr_spark.operators.corpus import (
        deterministic_split, pack_sequences, stratified_sample,
    )
    from norsk_historisk_avis_ocr_spark.operators.quality import corpus_prep
    from norsk_historisk_avis_ocr_spark.plans import build_session

    owns_session = SparkSession.getActiveSession() is None
    spark = build_session("nhao-prepare-corpus", master=args.master)
    persisted = None
    try:
        docs = spark.read.parquet(args.input)
        if args.group_col not in docs.columns:
            docs = docs.withColumn(args.group_col, F.lit("all"))
        if args.sample_rate < 1.0:
            docs = stratified_sample(docs, rate=args.sample_rate)

        langs = tuple(x for x in args.langs.split(",") if x)
        kept = corpus_prep(docs.select("doc_id", "text"),
                           min_quality=args.min_quality, langs=langs)

        # hygiene verdicts join back to the full rows (broadcast-size at
        # probe scale; semi-join keyed on doc_id at corpus scale)
        surviving = docs.join(kept.select("doc_id", "pred_lang", "quality"),
                              "doc_id")
        if args.scrub:
            # scrub before any lexicon induction: placeholder tokens must
            # not enter the frequency table, and n_tokens must count the
            # shipped (masked) text
            from norsk_historisk_avis_ocr_spark.operators.quality import (
                scrub_patterns,
            )
            surviving = scrub_patterns(surviving)
        if args.induce_lexicon:
            # corpus-induced orthography pass: lexicon from the surviving
            # text (bounded-k collect), trie broadcast back — normalize
            # BEFORE split/packing so n_tokens reflects the shipped text.
            # Persist first: the induction collect and the final write
            # would otherwise each recompute the dedup→langid→quality
            # lineage (the job's expensive UDF stages) from scratch.
            surviving = persisted = surviving.persist()
            from norsk_historisk_avis_ocr_spark.functions.udfs import (
                make_normalize_udf,
            )
            from norsk_historisk_avis_ocr_spark.operators.lexicon import (
                normalizer_from_corpus,
            )
            nz = normalizer_from_corpus(surviving,
                                        top_n=args.induce_lexicon)
            surviving = surviving.withColumn(
                "text", make_normalize_udf(spark, nz)(F.col("text")))
        split = deterministic_split(
            surviving,
            weights=(("train", args.train), ("val", args.val),
                     ("test", args.test)))
        # pack WITHIN (split, shard): a context block must never span
        # splits — a loader reading one split shard needs dense blocks and
        # zero leakage of other-split token ranges
        packs = pack_sequences(split, budget=args.budget,
                               group_col=["split", args.group_col]) \
            .select("doc_id", "n_tokens", "pack_id")
        final = split.join(packs, "doc_id")

        final.write.mode("overwrite").partitionBy("split") \
            .parquet(args.output)
        stats = spark.read.parquet(args.output).groupBy("split").agg(
            F.count("*").alias("n"), F.sum("n_tokens").alias("toks")) \
            .collect()
        counts = {r["split"]: r["n"] for r in stats}
        total_tokens = sum(r["toks"] for r in stats)
        print(f"corpus committed to {args.output}: "
              f"{sum(counts.values())} docs, {total_tokens} tokens, "
              f"splits {counts}")
    finally:
        # release the induction cache even when main() is called from a
        # long-lived session (owns_session False → no stop() to free it)
        if persisted is not None:
            persisted.unpersist()
        if owns_session:
            spark.stop()


if __name__ == "__main__":
    main()
