"""10× scale-up smoke: build a synthetic ~sf1 corpus by unioning sf0.1
ten times with shifted ids (which also makes every document 10×
duplicated — the adversarial duplicate-flood case for near-dup), then run
the heavy operators end-to-end and print wall times.

    python tools/scale_smoke.py [sf_dir] [n_copies]

This is the "would it survive a 10× scale-up" check the correctness gate
can't give: it caught a driver-broadcast OOM of the near-dup candidate
set and the O(copy-pairs) verification cost (both fixed — see
operators/dedup.py near_dup_pairs collapse_exact).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark import get_session
from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.sources.readers import (
    read_parquet,
)

import __spark_entry__ as em


def _replicate(df, id_cols: list[str], n: int):
    out = None
    for i in range(n):
        d = df
        for c in id_cols:
            d = d.withColumn(c, F.col(c) + F.lit(i * 10_000_000))
        out = d if out is None else out.unionByName(d)
    return out.repartition(32).persist()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_session(app_name="scale-smoke", master="local[16]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    def timed(name, fn):
        t0 = time.time()
        rows = fn()
        print(f"{name:28s} {time.time() - t0:7.1f}s  {rows} rows")

    docs = _replicate(read_parquet(spark, f"{sf_dir}/documents.parquet"), ["doc_id"], n)
    print(f"documents ×{n}: {docs.count()}")
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.dedup import (
        near_dup_pairs,
    )
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.sampling import (
        hash_split,
        pack_sequential,
    )

    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.dedup import (
        simhash_near_pairs,
        winnow_fingerprint_sets,
    )

    timed("near_dup_pairs", lambda: near_dup_pairs(docs, "doc_id", "text").count())
    timed(
        "near_dup_pairs (direct)",
        lambda: near_dup_pairs(docs, "doc_id", "text", collapse_exact=False).count(),
    )
    timed(
        # sum(size(...)) not count(): count() lets Spark drop the map-only
        # projection entirely and measures nothing
        "winnow_fingerprints",
        lambda: winnow_fingerprint_sets(docs, "doc_id", "text")
        .agg(F.sum(F.size("fingerprints")))
        .collect(),
    )
    timed(
        "simhash_near_pairs",
        lambda: simhash_near_pairs(docs, "doc_id", "text", radius=2).count(),
    )
    timed(
        "pack_sequential",
        lambda: pack_sequential(docs, "doc_id", "n_chars", budget=5000, n_shards=32).count(),
    )
    timed(
        "hash_split",
        lambda: hash_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}).count(),
    )

    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.corpus import (
        contaminated_docs,
        frequent_ngrams,
        remove_duplicate_spans,
        repetition_profile,
    )

    timed(
        "decontaminate",
        lambda: contaminated_docs(
            docs.filter(F.col("doc_id") % 10 != 0),
            docs.filter(F.col("doc_id") % 10 == 0),
            "doc_id",
            "text",
            n=8,
        ).count(),
    )
    timed(
        "boilerplate_ngrams",
        lambda: frequent_ngrams(docs, "doc_id", "text", n=5, min_doc_freq=2).count(),
    )
    timed(
        # agg over text length (count() alone would let Spark skip the rebuild)
        "span_dedup",
        lambda: remove_duplicate_spans(docs, "doc_id", "text", span_tokens=3)
        .agg(F.sum(F.length("text")))
        .collect(),
    )
    timed(
        "repetition_profile",
        lambda: repetition_profile(docs, "doc_id", "text", n=2)
        .agg(F.sum("total_grams"))
        .collect(),
    )

    ev = _replicate(
        read_parquet(spark, f"{sf_dir}/events.parquet"), ["user_id", "event_id"], n
    )
    print(f"events ×{n}: {ev.count()}")
    ev.createOrReplaceTempView("events")
    timed("sessionization", lambda: spark.sql(em.SESSIONIZATION).count())
    timed("event_type_pivot", lambda: spark.sql(em.EVENT_TYPE_PIVOT).count())

    # round-5 corpus operators over the flooded docs
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.bpe import bpe_train
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.text import (
        unigram_cross_entropy,
    )
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.dedup import (
        bloom_incremental_new,
    )
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.sampling import (
        domain_mix_sample,
    )

    timed(
        "lm_cross_entropy",
        lambda: unigram_cross_entropy(docs, "doc_id", "text")
        .agg(F.sum("n_tokens"))
        .collect(),
    )
    timed(
        "domain_mix_sample",
        lambda: domain_mix_sample(
            docs, "source", {"src0": 3, "src1": 2, "src2": 1}, "doc_id"
        ).count(),
    )
    fp_docs = docs.withColumn("fp", F.substring("text", 1, 40))
    timed(
        # the flood makes every new-side fp present in history: worst-case
        # bloom (every row bloom-positive → all pay the verify join)
        "bloom_incremental_new",
        lambda: bloom_incremental_new(
            fp_docs.filter(F.col("doc_id") % 3 == 0),
            fp_docs.filter(F.col("doc_id") % 3 != 0),
            "fp",
        ).count(),
    )
    timed("bpe_train (8 merges)", lambda: len(bpe_train(docs, "text", n_merges=8)))

    # round-6 operators over the flooded docs
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.indexing import (
        inverted_index,
        tfidf_top_terms,
    )
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.sampling import (
        weighted_priority_sample,
    )

    timed("tfidf_top_terms", lambda: tfidf_top_terms(docs, "doc_id", "text").count())
    timed(
        "inverted_index",
        lambda: inverted_index(docs, "doc_id", "text", min_df=2, max_df=100_000).count(),
    )
    timed(
        # the flood is adversarial here: every doc gains n exact copies, so
        # the true pair set grows as copies^2 per doc — candidate bucketing
        # must absorb it without an all-pairs blowup
        "ngram_jaccard_pairs",
        lambda: ngram_jaccard_pairs(docs, "doc_id", "text").count(),
    )
    timed(
        "weighted_sample",
        lambda: weighted_priority_sample(
            docs, "doc_id", F.when(F.col("lang") == "en", 4).otherwise(1), 1000
        ).count(),
    )

    emb = _replicate(read_parquet(spark, f"{sf_dir}/embeddings.parquet"), ["vec_id"], n)
    print(f"embeddings ×{n}: {emb.count()}")
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.similarity import (
        ann_topk_lsh,
        ivf_topk,
    )

    q = emb.filter(F.col("vec_id") % 50 == 0)
    # production knobs: multi-probe LSH (entry config) and ADAPTIVE IVF
    # sizing (n_centroids=None -> ~sqrt(n)) — this smoke is the evidence
    # that recall and runtime hold when the corpus grows 10x under the
    # defaults a user gets without tuning
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.similarity import (
        topk_neighbors,
    )

    def _pairs(df, max_rank=5):
        return {
            (r["query_id"], r["neighbor_id"])
            for r in df.collect()
            if r["rank"] <= max_rank
        }

    exact = _pairs(topk_neighbors(q, emb, "vec_id", "embedding", k=5))
    lsh_df = ann_topk_lsh(q, emb, "vec_id", "embedding", dim=64, k=5,
                          num_planes=4, num_tables=3, num_probes=4)
    timed("ann_topk_lsh (multi-probe)", lambda: lsh_df.count())
    print(f"  ann_lsh recall@5 at x{n}: {len(_pairs(lsh_df) & exact) / max(len(exact), 1):.3f}")
    ivf_df = ivf_topk(q, emb, "vec_id", "embedding", k=5, n_centroids=None, n_probe=8)
    timed("ivf_topk (adaptive ~sqrt n)", lambda: ivf_df.count())
    print(f"  ivf recall@5 at x{n}: {len(_pairs(ivf_df) & exact) / max(len(exact), 1):.3f}")
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.dedup import (
        semantic_dedup_keep,
    )

    timed(
        # flood = every vector 10x duplicated at cosine 1.0 — the
        # within-cluster pair count is the adversarial part; n_clusters
        # is the knob that bounds it and now defaults to ~sqrt(n)
        "semantic_dedup (adaptive)",
        lambda: semantic_dedup_keep(
            emb, "vec_id", "embedding", n_clusters=None, threshold=0.95
        ).count(),
    )
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.clustering import (
        kmeans_fit_predict,
    )

    timed(
        # per-iteration cost: one Arrow matmul map stage + a k-row driver
        # update; the agg width is dim (64 avgs), independent of k
        "kmeans (k=64, 2 iters)",
        lambda: kmeans_fit_predict(emb, "vec_id", "embedding", k=64, iters=2).count(),
    )

    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.graph import (
        knn_pagerank,
    )
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.similarity import (
        pq_topk,
    )

    pq_df = pq_topk(q, emb, "vec_id", "embedding", k=5, m=16, k_codes=32,
                    iters=1, shortlist=100)
    timed("pq_topk (ADC + rerank)", lambda: pq_df.count())
    print(f"  pq recall@5 at x{n}: {len(_pairs(pq_df) & exact) / max(len(exact), 1):.3f}")
    timed(
        # the exact all-pairs edge build is the quadratic piece (294s
        # cold at 20k — measured); method="ivf" is the production graph
        # builder, and the PageRank iterations themselves are the linear
        # equi-join + grouped-sum loop
        "knn_pagerank (ivf edges)",
        lambda: knn_pagerank(
            emb, "vec_id", "embedding", k=3, iters=3, method="ivf"
        ).count(),
    )

    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.sketches import (
        cms_frequency,
    )
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.scale import (
        zorder_layout,
    )
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.timeseries import (
        resample_ffill,
    )

    timed(
        # state stays depth x width counters no matter the stream size —
        # the smoke checks the constant-state claim at 100k events
        "cms_frequency (4x256)",
        lambda: cms_frequency(ev, "user_id", depth=4, width=256).count(),
    )
    timed(
        "zorder_layout (events)",
        lambda: zorder_layout(ev, ["user_id", "event_id"], bits=12,
                              num_partitions=32).count(),
    )
    timed(
        "resample_ffill (hourly)",
        lambda: resample_ffill(
            ev.filter(F.col("user_id") % 7 == 0), "user_id", "ts", "value",
            tie_cols=["event_id"],
        ).count(),
    )

    li = _replicate(read_parquet(spark, f"{sf_dir}/lineitem.parquet"), ["l_partkey"], n)
    print(f"lineitem ×{n}: {li.count()}")
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.scd2 import (
        scd2_initial,
        scd2_merge,
    )

    base = li.filter("l_shipdate < '1998-06-01'").groupBy("l_partkey").agg(
        F.min("l_extendedprice").alias("low"), F.max("l_extendedprice").alias("high")
    )
    delta = li.filter("l_partkey % 10 = 0").groupBy("l_partkey").agg(
        F.min("l_extendedprice").alias("low"), F.max("l_extendedprice").alias("high")
    )
    timed(
        "scd2_merge (incremental)",
        lambda: scd2_merge(
            scd2_initial(base, "1998-06-01 00:00:00"),
            delta,
            keys=["l_partkey"],
            effective_ts="2000-01-01 00:00:00",
        ).count(),
    )



    # round-7 operators over the flooded corpus
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.corpus import (
        chunk_documents,
    )

    timed(
        # chunking is row-local (no shuffle): the smoke checks the
        # explode factor stays bounded by the chunk geometry at 10x
        "chunk_documents (32/8)",
        lambda: chunk_documents(
            docs, "doc_id", "text", chunk_tokens=32, overlap=8
        ).count(),
    )

    def _jpeg_smoke():
        # decode a real Huffman stream per doc across all cores — the
        # per-row Python codec cost is the thing being smoked here
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.jpeg import (
            encode_jpeg_gray,
        )
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.multimodal import (
            decode_image,
        )

        import pandas as pd

        def gen(batches):
            for pdf in batches:
                payloads = [
                    encode_jpeg_gray(
                        [(int(d) % 96 + (p % 16) * 5 + p // 16 * 5) for p in range(256)],
                        16, 16,
                    )
                    for d in pdf["doc_id"]
                ]
                yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

        payload_df = docs.select("doc_id").repartition(32).mapInPandas(
            gen, "doc_id long, payload binary"
        )
        return decode_image(payload_df).filter(F.col("decode_error").isNull()).count()

    timed("jpeg encode+decode per doc", _jpeg_smoke)

    def _media_smoke(maker, decoder):
        import pandas as pd

        def gen(batches):
            for pdf in batches:
                yield pd.DataFrame(
                    {"doc_id": pdf["doc_id"], "payload": [maker(int(d)) for d in pdf["doc_id"]]}
                )

        payload_df = docs.select("doc_id").repartition(32).mapInPandas(
            gen, "doc_id long, payload binary"
        )
        return decoder(payload_df)

    def _gif_smoke():
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.gif import (
            encode_gif_gray,
        )
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.multimodal import (
            decode_image,
        )

        return _media_smoke(
            lambda d: encode_gif_gray(
                [(d * 37 + p * 11) % 256 for p in range(256)], 16, 16, interlace=True
            ),
            lambda df: decode_image(df).filter(F.col("decode_error").isNull()).count(),
        )

    timed("gif interlaced-LZW encode+decode per doc", _gif_smoke)

    def _avi_smoke():
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.avi import (
            mux_mjpeg_avi,
            sample_video_frames,
        )
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.jpeg import (
            encode_jpeg_gray,
        )

        def make(d):
            return mux_mjpeg_avi(
                [
                    encode_jpeg_gray(
                        [((d + f * 7) % 96) + (p % 16) * 5 + p // 16 * 5 for p in range(256)],
                        16, 16,
                    )
                    for f in range(4)
                ],
                16, 16, rate=24,
            )

        return _media_smoke(
            make,
            lambda df: sample_video_frames(df, every=2)
            .filter(F.col("frame_ok"))
            .count(),
        )

    timed("mjpeg-avi mux+demux+frame-decode per doc", _avi_smoke)

    def _g711_smoke():
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.audio import (
            audio_features,
            encode_wav_g711,
        )

        return _media_smoke(
            lambda d: encode_wav_g711(
                [((d * 17 + i * 13) % 2048) - 1024 for i in range(480)], 8000
            ),
            lambda df: audio_features(df).filter(F.col("decode_error").isNull()).count(),
        )

    timed("g711 quantize+expand per doc", _g711_smoke)

    def _flac_smoke():
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.audio import (
            audio_features,
        )
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.flac import (
            encode_flac,
        )

        return _media_smoke(
            lambda d: encode_flac(
                [[((d * 13 + i * 7) % 4001) - 2000 for i in range(480)]],
                16000,
                block_size=256,
            ),
            lambda df: audio_features(df).filter(F.col("decode_error").isNull()).count(),
        )

    timed("flac rice encode+decode per doc", _flac_smoke)

    def _phash_smoke():
        # per-doc 32x32 PGM -> integer-DCT hash, then the Hamming band
        # self-join: the pair-bucket shuffle is the scale axis here
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.phash import (
            phash_fingerprints,
            phash_near_pairs,
        )

        def make(d):
            import hashlib

            base = d - (d % 2)
            rows = [
                hashlib.md5(
                    (f"{d}#x" if r == 31 and d % 2 else f"{base}#{r}").encode()
                ).hexdigest()
                for r in range(32)
            ]
            return b"P5 32 32 255\n" + "".join(rows).encode()

        return _media_smoke(
            make,
            lambda df: phash_near_pairs(phash_fingerprints(df), radius=10).count(),
        )

    timed("phash hash+band-pair per doc", _phash_smoke)

    def _delta_smoke():
        # the delta lane's scale axes: commit/replay cost vs file count
        # and MERGE file pruning — 64-file table, tiny matched set
        import shutil
        import tempfile

        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.scd2 import (
            scd2_merge,
        )
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.sources.delta_lite import (
            load_snapshot,
            merge_scd2_delta_lite,
            read_delta_lite,
            write_delta_lite,
        )

        base = tempfile.mkdtemp(prefix="delta_smoke_")
        tp = f"{base}/t"
        init = scd2_merge(
            None,
            docs.select(F.col("doc_id").alias("k"), F.col("source").alias("v")),
            ["k"],
            effective_ts="2024-01-01 00:00:00",
        )
        write_delta_lite(init.repartition(64, "k"), tp)
        inc = (
            docs.select(F.col("doc_id").alias("k"))
            .filter(F.col("k") % 1000 == 0)
            .withColumn("v", F.lit("CHANGED"))
        )
        merge_scd2_delta_lite(spark, tp, inc, ["k"], effective_ts="2024-02-01 00:00:00")
        snap = load_snapshot(tp)
        n = read_delta_lite(spark, tp).count()
        shutil.rmtree(base, ignore_errors=True)
        print(f"  delta files after merge: {len(snap.files)} (64 + rewrites)")
        return n

    timed("delta scd2 write+pruned-merge", _delta_smoke)

    # round-8 fourth session: web curation, event analytics, linkage,
    # log-bucket sketch — all over the ×n replicas
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.analytics import (
        funnel,
        retention,
    )
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.linkage import (
        FieldComparator,
        link_records,
    )
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.sketches import (
        logbucket_quantiles,
        logbucket_sketch,
    )
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.web import (
        domain_cap,
        url_dedup,
    )

    urls = docs.select(
        "doc_id",
        F.concat(
            F.lit("HTTP://WWW.host"), (F.col("doc_id") % 997).cast("string"),
            F.lit(".Example.co.uk:80/p/"), (F.col("doc_id") % 5000).cast("string"),
            F.lit("?utm_source=x&k=1#f"),
        ).alias("url"),
        F.concat(
            F.lit("host"), (F.col("doc_id") % 997).cast("string"),
            F.lit(".example.co.uk"),
        ).alias("host"),
    )
    timed("url_dedup", lambda: url_dedup(urls, "url", "doc_id").count())
    timed(
        "domain_cap",
        lambda: domain_cap(urls, "host", 100, "doc_id").count(),
    )

    events = _replicate(read_parquet(spark, f"{sf_dir}/events.parquet"), ["event_id"], n)
    print(f"events ×{n}: {events.count()}")
    timed(
        "funnel (4 stages)",
        lambda: funnel(
            events, "user_id", "ts", "event_type",
            ["signup", "view", "click", "purchase"],
        ).count(),
    )
    timed(
        "retention (8 offsets)",
        lambda: retention(events, "user_id", "ts", max_offset=7).count(),
    )

    li = _replicate(read_parquet(spark, f"{sf_dir}/lineitem.parquet"),
                    ["l_orderkey", "l_linenumber"], n)
    cents = li.select(
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("bigint").alias("c")
    )
    timed(
        "logbucket sketch+quantiles",
        lambda: logbucket_quantiles(logbucket_sketch(cents, "c")).count(),
    )

    cust = _replicate(read_parquet(spark, f"{sf_dir}/customer.parquet"), ["c_custkey"], n)
    dirty = cust.select(
        F.col("c_custkey").alias("d_id"),
        F.when(F.col("c_custkey") % 3 == 0,
               F.regexp_replace("c_name", "Customer#", "Custmer#"))
        .otherwise(F.col("c_name")).alias("d_name"),
        F.col("c_nationkey").alias("d_nationkey"),
        F.col("c_acctbal").alias("d_acctbal"),
        F.col("c_mktsegment").alias("d_mktsegment"),
    )
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.graph import (
        triangle_count,
    )
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.text import (
        portable_hash,
    )
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.geo import (
        proximity_pairs,
    )

    # offset partkeys per replica too: the graph must grow in NODES
    # (disjoint copies), not densify — un-offset parts would multiply
    # per-node degree by n and the wedge count by n², which measures the
    # replication artifact, not the operator
    li_g = _replicate(
        read_parquet(spark, f"{sf_dir}/lineitem.parquet"),
        ["l_orderkey", "l_linenumber", "l_partkey"], n,
    )
    li_g.createOrReplaceTempView("smoke_lineitem")
    edges = spark.sql(
        """
        SELECT DISTINCT l1.l_partkey AS src, l2.l_partkey AS dst
        FROM smoke_lineitem l1 JOIN smoke_lineitem l2
          ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
          AND l1.l_partkey % 2 = 0 AND l2.l_partkey % 2 = 0
        """
    )
    timed(
        "triangle_count (co-purchase graph, nodes x n)",
        lambda: triangle_count(edges, "src", "dst").count(),
    )

    geo_pts = events.select(F.col("event_id").alias("id")).distinct().select(
        "id",
        (F.lit(40_000_000) + portable_hash(F.col("id"), seed=1) % F.lit(5_000_000))
        .cast("bigint").alias("lat"),
        (F.lit(-74_000_000) + portable_hash(F.col("id"), seed=2) % F.lit(5_000_000))
        .cast("bigint").alias("lon"),
    )
    timed(
        "geo proximity (1M pts, 3x3 probe)",
        lambda: proximity_pairs(geo_pts, "id", "lat", "lon", 20_000).count(),
    )

    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.scale import (
        skew_report,
    )
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.timeseries import (
        bar_returns,
        ohlc_bars,
    )

    timed(
        "ohlc_bars + bar_returns",
        lambda: bar_returns(
            ohlc_bars(events, "event_type", "ts", "value", "event_id")
        ).count(),
    )
    timed(
        "skew_report (lineitem suppkey)",
        lambda: skew_report(li, "l_suppkey", top_n=5).count(),
    )

    timed(
        "record_linkage (blocked FS)",
        lambda: link_records(
            cust, dirty,
            [(F.col("l.c_nationkey"), F.col("r.d_nationkey")),
             (F.expr("right(l.c_name, 4)"), F.expr("right(r.d_name, 4)"))],
            [FieldComparator("c_name", "d_name", "exact", 4000, -1500),
             FieldComparator("c_acctbal", "d_acctbal", "abs_tol_x100", 2000, -2500, param=50),
             FieldComparator("c_mktsegment", "d_mktsegment", "exact", 500, -500)],
            800, "c_custkey", "d_id",
        ).count(),
    )

    # ---- round-8 fifth-session lanes ------------------------------------
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.graph import (
        bfs_levels,
    )
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.sketches import (
        kmv_intersect,
        kmv_sketch,
    )
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.analytics import (
        transition_matrix,
    )
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.sampling import (
        dsir_select,
    )

    timed(
        "transition_matrix (1M events)",
        lambda: transition_matrix(events, "user_id", "ts", "event_type",
                                  tie_col="event_id").count(),
    )
    timed(
        "kmv_intersect (two 1M-row key sets, k=256)",
        lambda: kmv_intersect(
            kmv_sketch(li.filter(F.col("l_orderkey") % 2 == 0), "l_partkey", k=256),
            kmv_sketch(li.filter(F.col("l_orderkey") % 2 == 1), "l_partkey", k=256),
            256,
        ).count(),
    )
    # BFS over the replicated adjacent-line co-purchase graph (nodes
    # scale with copies; degree stays constant, so the frontier joins
    # are the scaled axis)
    bfs_edges = spark.sql(
        """
        SELECT DISTINCT l1.l_partkey AS src, l2.l_partkey AS dst
        FROM smoke_lineitem l1 JOIN smoke_lineitem l2
          ON l1.l_orderkey = l2.l_orderkey
         AND l2.l_linenumber = l1.l_linenumber + 1
        WHERE l1.l_partkey <> l2.l_partkey
        """
    )
    bfs_srcs = li.filter(F.col("l_partkey") % 100 == 0).select(
        F.col("l_partkey").alias("node")
    ).distinct()
    timed(
        "bfs_levels (3 hops, x-n node graph)",
        lambda: bfs_levels(bfs_edges, bfs_srcs, max_hops=3).count(),
    )
    timed(
        "dsir_select (x-n corpus, 512 buckets)",
        lambda: dsir_select(
            docs, docs.filter(F.col("source") == "src18"),
            "doc_id", "text", 100,
        ).count(),
    )

    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.audio import (
        audio_features,
        encode_wav_adpcm_ima,
    )
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.avi import (
        encode_mrle_frame,
        mux_mrle_avi,
        sample_video_frames,
    )

    adpcm_clip = encode_wav_adpcm_ima(
        [((i * 37) % 4001) - 2000 for i in range(505 * 2)], 8000
    )
    adpcm_df = docs.select("doc_id").withColumn(
        "payload", F.lit(bytearray(adpcm_clip))
    )
    timed(
        "adpcm decode (x-n clips of 1010 samples)",
        lambda: audio_features(adpcm_df).filter(
            F.col("decode_error").isNull()
        ).count(),
    )

    _rows0 = [[30] * 16 for _ in range(16)]
    _rows1 = [list(r) for r in _rows0]
    for _y in range(4):
        _rows1[_y][4:8] = [200] * 4
    mrle_clip = mux_mrle_avi(
        [encode_mrle_frame(_rows0), encode_mrle_frame(_rows1, _rows0)], 16, 16
    )
    mrle_df = docs.select("doc_id").withColumn(
        "payload", F.lit(bytearray(mrle_clip))
    )
    timed(
        "mrle video decode (x-n 2-frame clips)",
        lambda: sample_video_frames(mrle_df, every=1).filter("frame_ok").count(),
    )

    # ---- round-9 lanes ---------------------------------------------------
    # the mega-domain adversary domain_cap exists for: 95% of the corpus
    # in ONE registrable domain. The skew-safe plan must rank only the
    # ~4*cap hash-prefix survivors, never window-sort the mega-domain.
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.web import (
        domain_cap,
        load_psl,
        registrable_domain_psl,
    )

    mega = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 20 < 19, F.lit("www.megasite.co.uk"))
        .otherwise(
            F.concat(
                F.lit("host"),
                (F.col("doc_id") % 5000).cast("string"),
                F.lit(".example.org"),
            )
        )
        .alias("host"),
    )
    timed(
        "domain_cap (95% mega-domain)",
        lambda: domain_cap(mega, "host", 1000, "doc_id").count(),
    )
    psl_rules = load_psl(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "building_and_operating_data_pipelines_at_scale_using_ci_cd_spark",
            "resources",
            "public_suffix_excerpt.dat",
        )
    )
    timed(
        "registrable_domain_psl (x-n)",
        lambda: registrable_domain_psl(mega, "host", psl_rules)
        .filter(F.col("domain").isNotNull())
        .count(),
    )

    # ---- round-10 lanes --------------------------------------------------
    # crawl-scale robots ingestion: ~1e5 domains' robots BODIES parsed
    # distributively (no driver dict), verdicts joined under
    # rules_hint='auto' so the planner sizes the (multi-rule-per-domain)
    # table itself. The corpus fans its URLs across all domains.
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.web import (
        robots_filter,
        robots_rules_from_df,
    )

    n_dom = 100_000
    bodies = (
        spark.range(n_dom)
        .select(
            F.concat(F.lit("site"), F.col("id"), F.lit(".example")).alias(
                "domain"
            ),
            F.concat(
                F.lit("User-agent: *\nDisallow: /priv"),
                (F.col("id") % 7).cast("string"),
                F.lit("/\nAllow: /priv"),
                (F.col("id") % 7).cast("string"),
                F.lit("/ok/\nDisallow: /logs/*.tmp$\n"),
            ).alias("body"),
        )
    )
    crawl_urls = docs.select(
        "doc_id",
        F.concat(
            F.lit("https://site"),
            (F.col("doc_id") % n_dom).cast("string"),
            F.lit(".example/priv"),
            (F.col("doc_id") % 7).cast("string"),
            F.when(F.col("doc_id") % 3 == 0, F.lit("/ok/a")).otherwise(
                F.lit("/x")
            ),
        ).alias("url"),
    )
    rules_dist = robots_rules_from_df(bodies, "domain", "body")
    timed(
        "robots_rules_from_df + filter (1e5 domains, auto join)",
        lambda: robots_filter(crawl_urls, "url", rules_dist)
        .filter("NOT robots_allowed")
        .count(),
    )

    # k-anonymity enforcement under skew: one quasi tuple holds 90% of
    # the corpus; group stats must stay on the (small) distinct-tuple
    # table and the release join must stay AQE-splittable.
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.validation import (
        generalize_to_k,
    )

    skewed = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 10 < 9, F.lit(0))
        .otherwise((F.col("doc_id") % 1000).cast("int"))
        .alias("zip"),
        (F.col("doc_id") % 4).cast("int").alias("seg"),
    )
    ladder = [
        {"zip": "CAST(zip AS BIGINT)", "seg": "CAST(seg AS BIGINT)"},
        {"zip": "CAST(FLOOR(zip / 100) AS BIGINT)", "seg": "CAST(seg AS BIGINT)"},
        {"zip": "CAST(-1 AS BIGINT)", "seg": "CAST(-1 AS BIGINT)"},
    ]
    timed(
        "generalize_to_k (90% one quasi tuple)",
        lambda: generalize_to_k(
            skewed, 50, ladder, max_suppression_bp=100
        ).count(),
    )

    # streaming source over a LONG log: 1 wide commit + 40 small appends
    # (a day of 15-min batches). The drain must plan from commit JSONs
    # only (driver work = log size) and fan file reads to executors —
    # wall time should track row volume, not commit count.
    import tempfile as _tf
    import uuid as _uuid

    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.sources.delta_lite import (
        write_delta_lite,
    )
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.sources.delta_stream import (
        read_delta_lite_stream,
    )

    stream_tp = os.path.join(_tf.mkdtemp(prefix="scale_stream_"), "t")
    t0 = time.time()
    write_delta_lite(
        spark.range(2_000_000).selectExpr("id AS k", "id % 7 AS g").repartition(16),
        stream_tp,
    )
    for i in range(40):
        write_delta_lite(
            spark.range(i * 10_000, (i + 1) * 10_000)
            .selectExpr("id AS k", "id % 7 AS g")
            .coalesce(2),  # a sane micro-batch writer lands a couple files
            stream_tp,
            mode="append",
            checkpoint_interval=None,
        )
    print(f"  [fixture: 41-commit delta table in {time.time() - t0:.1f}s]")

    def _drain_stream():
        name = f"scale_ds_{_uuid.uuid4().hex[:8]}"
        q = (
            read_delta_lite_stream(spark, stream_tp)
            .groupBy("g")
            .count()
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", _tf.mkdtemp(prefix="scale_ds_cp_"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.table(name).count()

    timed("delta stream drain (41 commits, 2.4M rows)", _drain_stream)

    # ---- round-11 lanes --------------------------------------------------
    # constraint enforcement: the per-commit cost is ONE bounded re-read
    # of the just-staged files (never a recompute of the writer's plan),
    # so a 410k-row guarded append costs staged-parquet scan time; and
    # SHALLOW CLONE of the 41-commit/82-file table is one log write —
    # zero data movement at any table size.
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.sources.delta_lite import (
        add_check_constraint,
        clone_delta_lite,
        load_snapshot,
        read_delta_lite,
    )

    add_check_constraint(spark, stream_tp, "k_nonneg", "k >= 0")

    try:  # a violating bulk append refuses, staged files unlinked
        write_delta_lite(
            spark.range(-100_000, 0).selectExpr("id AS k", "id % 7 AS g"),
            stream_tp,
            mode="append",
            checkpoint_interval=None,
        )
        raise AssertionError("constraint should have refused k < 0")
    except ValueError:
        pass  # refused exactly as intended; now the passing shape:

    def _guarded_append_ok():
        write_delta_lite(
            spark.range(1_000_000, 1_400_000).selectExpr("id AS k", "id % 7 AS g"),
            stream_tp,
            mode="append",
            checkpoint_interval=None,
        )
        return read_delta_lite(spark, stream_tp).count()

    timed("constraint-guarded append (400k rows, 1 re-read)", _guarded_append_ok)

    def _clone_lane():
        dst = _tf.mkdtemp(prefix="scale_clone_") + "/fork"
        clone_delta_lite(stream_tp, dst)
        snap = load_snapshot(dst)
        print(f"  clone references {len(snap.files)} files in place")
        return read_delta_lite(spark, dst).count()

    timed("shallow clone (log write only)", _clone_lane)

    # round 12: deletion-vector read at volume — a 1.8M-row table whose
    # files carry DVs marking ~25% of rows deleted (roaring decode is
    # executor-side; the anti-join's positions side is broadcast by
    # declared cardinality). The lane asserts the exact survivor count.
    def _dv_lane():
        import json as _json
        import os as _os
        import shutil as _shutil
        import uuid as _uuid

        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.sources import (
            delta_lite as _dl,
            dv as _dv,
        )

        tp = _tf.mkdtemp(prefix="scale_dv_") + "/t"
        _os.makedirs(_os.path.join(tp, _dl.LOG_DIR))
        n_files, rows_per = 6, 300_000
        adds = []
        for i in range(n_files):
            stage = _tf.mkdtemp(prefix="scale_dv_stage_") + "/p"
            (
                spark.range(i * rows_per, (i + 1) * rows_per)
                .selectExpr("id AS k", "id % 97 AS g")
                .coalesce(1)
                .write.parquet(stage)
            )
            part = next(
                f for f in _os.listdir(stage) if f.endswith(".parquet")
            )
            fname = f"f{i}.parquet"
            _shutil.move(_os.path.join(stage, part), _os.path.join(tp, fname))
            adds.append(
                {
                    "add": {
                        "path": fname,
                        "partitionValues": {},
                        "size": _os.path.getsize(_os.path.join(tp, fname)),
                        "modificationTime": 1700000000000,
                        "dataChange": True,
                    }
                }
            )
        proto = {
            "minReaderVersion": 3,
            "minWriterVersion": 7,
            "readerFeatures": ["deletionVectors"],
            "writerFeatures": ["deletionVectors"],
        }
        meta = {
            "id": "scale-dv",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": _json.dumps(
                {
                    "type": "struct",
                    "fields": [
                        {"name": "k", "type": "long", "nullable": True,
                         "metadata": {}},
                        {"name": "g", "type": "long", "nullable": True,
                         "metadata": {}},
                    ],
                }
            ),
            "partitionColumns": [],
            "configuration": {},
            "createdTime": 1700000000000,
        }
        with open(_os.path.join(tp, _dl.LOG_DIR, f"{0:020d}.json"), "w") as fh:
            fh.write(
                "\n".join(
                    _json.dumps(a)
                    for a in [{"protocol": proto}, {"metaData": meta}] + adds
                )
                + "\n"
            )
        # DV per file: every 4th position deleted (range-free roaring mix)
        dv_actions = []
        for i, a in enumerate(adds):
            positions = list(range(0, rows_per, 4))
            u = _uuid.uuid4()
            payload = _dv.encode_bitmap_array(positions, runs=(i % 2 == 0))
            [(off, size)] = _dv.write_dv_file(
                _os.path.join(tp, _dv.dv_file_name(u)), [payload]
            )
            desc = {
                "storageType": "u",
                "pathOrInlineDv": _dv.encode_dv_uuid_path(u),
                "offset": off,
                "sizeInBytes": size,
                "cardinality": len(positions),
            }
            dv_actions.append(
                {"remove": {"path": a["add"]["path"], "dataChange": True}}
            )
            dv_actions.append(
                {"add": {**a["add"], "deletionVector": desc,
                         "dataChange": True}}
            )
        with open(_os.path.join(tp, _dl.LOG_DIR, f"{1:020d}.json"), "w") as fh:
            fh.write("\n".join(_json.dumps(a) for a in dv_actions) + "\n")
        got = _dl.read_delta_lite(spark, tp).count()
        want = n_files * (rows_per - len(range(0, rows_per, 4)))
        assert got == want, (got, want)
        return got

    timed("DV read (1.8M rows, 450k deleted)", _dv_lane)


if __name__ == "__main__":
    main()
