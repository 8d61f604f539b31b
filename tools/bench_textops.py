"""Crawl-scale benchmark for the LLM-pipeline text operators.

Graph primitives have 10^7–10^8-edge numbers in BENCH/BASELINE.md; this
tool gives the dedup / quality / ANN operators the same treatment at
~10^6 documents (the largest corpus that keeps the whole suite under a
few minutes at local[32]).  Results are written to ``BENCH/textops.json``;
``bench.py`` embeds that file into BENCH/BASELINE.md on its next run so
the numbers live in the artifact of record without re-paying the cost
per driver round.

Corpus design (deterministic, generated JVM-side — no driver loop):

- ``N`` docs of ~``TOKENS`` tokens each from a vocab of ``VOCAB`` words,
  token stream seeded by doc id (Knuth multiplicative hash, so adjacent
  ids do NOT share token prefixes);
- every doc with ``id % 20 == 7`` is an EXACT duplicate of ``id − 1``
  (5% exact-dup rate, like boilerplate re-crawls);
- every doc with ``id % 20 == 13`` is a NEAR duplicate of ``id − 1``
  (first token replaced — Jaccard ≈ (T−n)/T on shingles);
- embeddings: 64-dim deterministic arithmetic vectors with the same
  dup structure.

Usage: ``python tools/bench_textops.py [--docs N] [--ab]``
``--ab`` additionally times the round-1 per-token-Python simhash body
(mapInArrow + hashlib loop) against the shipped JVM version on the same
input — the A/B behind BENCH/NOTES.md's simhash entry.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WORK_DIR = os.environ.get("LINKGRAPH_BENCH_DIR", "/tmp/linkgraph_bench")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
TOKENS = 100
VOCAB = 50_000


def build_corpus(spark, n_docs: int, path: str) -> None:
    """Deterministic docs + embeddings parquet, generated JVM-side."""
    from pyspark.sql import functions as F

    base = F.when(
        (F.col("id") % 20).isin(7, 13), F.col("id") - 1
    ).otherwise(F.col("id"))
    # token k of doc b: 'w' + ((b*2654435761 + k²*40503 + k*7919) % VOCAB).
    # The k² term is LOAD-BEARING: with an affine k term, every shingle
    # is determined by a single residue mod VOCAB (consecutive tokens
    # differ by a constant), collapsing the shingle universe to VOCAB and
    # making unrelated docs collide in MinHash buckets; quadratic spacing
    # keeps the universe ~|docs|·|tokens| like real text.
    toks = F.expr(
        f"transform(sequence(0, {TOKENS - 1}), "
        f"k -> concat('w', pmod(base * 2654435761 + k * k * 40503 + k * 7919, {VOCAB})))"
    )
    near = F.expr(
        "concat('variant', doc_id % 97, ' ', "
        "array_join(slice(_toks, 2, size(_toks) - 1), ' '))"
    )
    df = (
        spark.range(n_docs)
        .select(F.col("id").alias("doc_id"), base.alias("base"))
        .select("doc_id", toks.alias("_toks"))
        .select(
            "doc_id",
            F.when((F.col("doc_id") % 20) == 13, near)
            .otherwise(F.array_join("_toks", " "))
            .alias("text"),
        )
    )
    df.repartition(CPUS * 2).write.mode("overwrite").parquet(path)

    emb = F.expr(
        "transform(sequence(0, 63), j -> "
        "cast(pmod(base * 1000003 + j * 2654435761, 1000) as double) / 1000.0 - 0.5)"
    )
    (
        spark.range(n_docs)
        .select(F.col("id").alias("doc_id"), base.alias("base"))
        .select("doc_id", emb.alias("embedding"))
        .repartition(CPUS * 2)
        .write.mode("overwrite")
        .parquet(path + ".emb")
    )


def simhash64_round1(df, text_col="text", id_col="doc_id"):
    """Round-1 body (per-token Python hashlib loop inside mapInArrow) —
    kept ONLY as the A/B baseline for the JVM rewrite; do not use."""
    import pyarrow as pa
    from pyspark.sql import functions as F

    def run(batches):
        import hashlib

        import numpy as np

        for batch in batches:
            ids = batch.column(0).to_pylist()
            texts = batch.column(1).to_pylist()
            out = []
            for t in texts:
                toks = (t or "").lower().split()
                if not toks:
                    out.append(0)
                    continue
                hs = np.frombuffer(
                    b"".join(
                        hashlib.md5(tok.encode("utf-8")).digest()[:8]
                        for tok in toks
                    ),
                    dtype=">u8",
                ).astype(np.uint64)
                bits = (
                    (hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                    & np.uint64(1)
                ).astype(np.int64)
                votes = (2 * bits - 1).sum(axis=0)
                fp = np.uint64(0)
                for i in np.nonzero(votes > 0)[0]:
                    fp |= np.uint64(1) << np.uint64(i)
                out.append(int(np.int64(fp)))
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, type=pa.int64()), pa.array(out, type=pa.int64())],
                names=["doc_id", "simhash"],
            )

    return df.select(F.col(id_col).cast("long"), F.col(text_col)).mapInArrow(
        run, schema="doc_id long, simhash long"
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--ab", action="store_true", help="time round-1 simhash too")
    ap.add_argument(
        "--repeats",
        type=int,
        default=1,
        help="runs per op; >1 records best-of-N as <op>_s plus the "
        "sorted <op>_runs_s list (this shared VM has minutes-long "
        "CPU-steal bursts — a single run is a point estimate)",
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from linkgraph.session import get_spark
    from linkgraph.textops.ann import lsh_cosine_topk
    from linkgraph.textops.dedup import (
        exact_duplicates,
        minhash_lsh_candidates,
        minhash_signatures,
        simhash64,
    )
    from linkgraph.textops.quality import (
        doc_fingerprint,
        language_id,
        quality_scores,
        token_counts,
    )

    os.makedirs(WORK_DIR, exist_ok=True)
    path = os.path.join(WORK_DIR, f"docs_{args.docs}.parquet")
    spark = get_spark(
        master=f"local[{CPUS}]",
        app_name="linkgraph-bench-textops",
        shuffle_partitions=CPUS * 2,
        extra_conf={"spark.driver.memory": "48g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(path):
        build_corpus(spark, args.docs, path)
    docs = spark.read.parquet(path)
    emb = spark.read.parquet(path + ".emb")
    docs.count(), emb.count()  # warm the page cache / scan path

    res: dict = {"docs": args.docs, "tokens_per_doc": TOKENS, "cores": CPUS}

    def materialize(df) -> int:
        """Force FULL evaluation: sum an xxhash64 over every output
        column alongside the count.  A bare ``.count()`` lets Catalyst
        column-prune the computed expressions away entirely — a per-row
        op like quality_scores "times" as a scan-only count (0.2 s for
        10^6 docs), and a final left join on a unique aggregate key is
        eliminated outright — so count-based walls under-measure every
        projection-shaped operator."""
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            # bit_xor, not sum: summing 64-bit hashes overflows BIGINT
            # under ANSI mode; xor folds without overflow
            F.expr(
                "bit_xor(xxhash64("
                + ", ".join(f"`{c}`" for c in df.columns)
                + "))"
            ).alias("h"),
        ).collect()[0]
        return int(row["n"])

    def timed(name, fn):
        runs = []
        for _ in range(max(1, args.repeats)):
            t0 = time.perf_counter()
            out = fn()
            runs.append(round(time.perf_counter() - t0, 2))
        runs.sort()
        res[name + "_s"] = runs[0]
        res[name + "_rows"] = out
        if len(runs) > 1:
            res[name + "_runs_s"] = runs
        print(f"{name}: {runs} s ({out} rows)", flush=True)

    timed("simhash_jvm", lambda: materialize(simhash64(docs)))
    if args.ab:
        timed(
            "simhash_round1_python",
            lambda: materialize(simhash64_round1(docs)),
        )
    timed("exact_dedup", lambda: materialize(exact_duplicates(docs)))
    timed(
        "minhash_signatures",
        lambda: materialize(minhash_signatures(docs, num_hashes=8)),
    )

    # Σ bucket² — the LSH join's true cost driver, reported alongside wall
    sig = minhash_signatures(docs, num_hashes=8)
    band = (F.col("seed") / 2).cast("int").alias("band")
    bands = (
        sig.select("doc_id", band, "seed", "minhash")
        .groupBy("doc_id", "band")
        .agg(
            F.concat_ws(
                "|",
                F.array_sort(
                    F.collect_list(
                        F.concat_ws("=", F.col("seed").cast("string"), "minhash")
                    )
                ),
            ).alias("band_key")
        )
    )
    sizes = bands.groupBy("band", "band_key").agg(F.count(F.lit(1)).alias("b"))
    stats = sizes.agg(
        F.sum(F.col("b") * F.col("b")).alias("sum_b2"),
        F.max("b").alias("max_bucket"),
    ).collect()[0]
    res["lsh_sum_bucket_sq"] = int(stats["sum_b2"])
    res["lsh_max_bucket"] = int(stats["max_bucket"])
    timed(
        "minhash_lsh_candidates",
        lambda: materialize(minhash_lsh_candidates(docs)),
    )
    # production hash family A/B (same shingles, long-valued signatures)
    timed(
        "minhash_signatures_xxhash64",
        lambda: materialize(
            minhash_signatures(docs, num_hashes=8, hash_fn="xxhash64")
        ),
    )
    timed(
        "minhash_lsh_candidates_xxhash64",
        lambda: materialize(minhash_lsh_candidates(docs, hash_fn="xxhash64")),
    )

    timed("quality_scores", lambda: materialize(quality_scores(docs)))
    timed("language_id", lambda: materialize(language_id(docs)))
    timed("token_counts", lambda: materialize(token_counts(docs)))
    timed("doc_fingerprint", lambda: materialize(doc_fingerprint(docs)))

    # corpus-curation passes (textops/corpus.py)
    from linkgraph.textops.corpus import (
        boilerplate_ngrams,
        contamination,
        repetition_stats,
        tfidf_terms,
    )

    from linkgraph.textops.corpus import paragraph_dedup

    timed("repetition_stats", lambda: materialize(repetition_stats(docs)))
    timed(
        "paragraph_dedup",
        lambda: materialize(paragraph_dedup(docs, para_tokens=12)),
    )
    timed(
        "boilerplate_ngrams",
        lambda: materialize(boilerplate_ngrams(docs, n=3, min_df=3)),
    )
    bench_docs = docs.where(F.col("doc_id") % 997 == 0)  # ~0.1% eval set
    timed(
        "contamination",
        lambda: materialize(contamination(docs, bench_docs, n=3)),
    )
    timed("tfidf_top1", lambda: materialize(tfidf_terms(docs, k=1)))

    queries = emb.where(F.col("doc_id") % (args.docs // 100) == 0)
    timed(
        "lsh_ann_100q",
        lambda: materialize(
            lsh_cosine_topk(
                emb,
                queries,
                dim=64,
                k=10,
                seed=0,
                planes="arith",
                id_col="doc_id",
                query_id_col="doc_id",
            )
        ),
    )

    # mirror-site detection over the same corpus: 1000 synthetic hosts;
    # the exact-dup pairs (id%20==7 copies id−1) land on DIFFERENT hosts
    # (adjacent ids), so every dup is a cross-host mirror signal
    from linkgraph.textops.dedup import mirror_host_pairs

    hosted = docs.withColumn(
        "host", F.concat(F.lit("h"), (F.col("doc_id") % 1000).cast("string"))
    )
    timed(
        "mirror_hosts",
        lambda: materialize(mirror_host_pairs(hosted, min_shared=1)),
    )

    # sessionization at 10× the doc count (events are narrower rows):
    # deterministic synthetic event log, ~N/1000 users, arithmetic gaps
    # spanning the 6h threshold so sessions actually split
    from linkgraph.events import session_stats

    n_ev = args.docs * 10
    events = spark.range(n_ev).select(
        F.col("id").alias("event_id"),
        F.timestamp_micros(
            (F.col("id") % 1000) * 86_400_000_000
            + (F.col("id") / 1000).cast("long") * 3_600_000_000
            + (F.col("id") % 11) * 7_200_000_000
        ).alias("ts"),
        (F.col("id") % (args.docs // 100)).alias("user_id"),
        ((F.col("id") % 997) / 997.0).alias("value"),
    )
    timed(
        "sessionize_10x",
        lambda: materialize(session_stats(events, gap_seconds=21600)),
    )

    out_path = os.path.join(REPO, "BENCH", "textops.json")
    res["generated_by"] = "tools/bench_textops.py"
    with open(out_path, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
