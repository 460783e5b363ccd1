"""Streaming extraction tests: exactly-once equality with the batch path,
incremental processing of newly-arrived files, checkpointed resume."""

from __future__ import annotations

from wikicrawler_spark import corpus
from wikicrawler_spark.kernel import extract_spans
from wikicrawler_spark.streaming import stream_extract


def _write_chunk(spark, docs, path):
    spark.createDataFrame(
        [(d["doc_id"], [tuple(s.values()) for s in d["spans"]]) for d in docs],
        schema=corpus.DOC_SCHEMA,
    ).coalesce(1).write.mode("append").parquet(path)


def _spans_set(df):
    return {
        (r["doc_id"], tuple(tuple(s) for s in r["spans"]))
        for r in df.collect()
    }


def test_stream_equals_batch_and_is_incremental(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ck = str(tmp_path / "ck")

    chunk1 = [corpus.generate_doc("basic_article", i) for i in range(8)]
    chunk2 = [corpus.generate_doc("sections", i) for i in range(6)]
    _write_chunk(spark, chunk1, in_dir)

    q = stream_extract(spark, in_dir, out_dir, ck)
    q.awaitTermination()
    got1 = _spans_set(spark.read.parquet(out_dir))
    batch1 = _spans_set(
        extract_spans(spark.read.schema(corpus.DOC_SCHEMA).parquet(in_dir)))
    assert got1 == batch1

    # new files arrive; a resumed query processes ONLY them (checkpoint)
    _write_chunk(spark, chunk2, in_dir)
    q2 = stream_extract(spark, in_dir, out_dir, ck)
    q2.awaitTermination()
    got2 = _spans_set(spark.read.parquet(out_dir))
    assert len(got2) == len(chunk1) + len(chunk2)
    batch2 = _spans_set(
        extract_spans(spark.read.schema(corpus.DOC_SCHEMA).parquet(in_dir)))
    assert got2 == batch2

    # re-running with nothing new appends nothing (exactly-once)
    q3 = stream_extract(spark, in_dir, out_dir, ck)
    q3.awaitTermination()
    assert len(_spans_set(spark.read.parquet(out_dir))) == len(got2)


def test_stream_stateful_dedup(spark, tmp_path):
    """dropDuplicates state store: the same doc_id re-delivered in a later
    micro-batch is extracted exactly once."""
    in_dir = str(tmp_path / "in2")
    out_dir = str(tmp_path / "out2")
    ck = str(tmp_path / "ck2")
    docs = [corpus.generate_doc("basic_article", i) for i in range(5)]
    _write_chunk(spark, docs, in_dir)
    _write_chunk(spark, docs[:3], in_dir)  # re-delivery of 3 docs
    q = stream_extract(spark, in_dir, out_dir, ck, dedup_doc_ids=True,
                       max_files_per_trigger=1)
    q.awaitTermination()
    got = [r["doc_id"] for r in spark.read.parquet(out_dir).collect()]
    assert sorted(got) == sorted(d["doc_id"] for d in docs)


def test_stream_sessionize_equals_batch(spark, tmp_path):
    """applyInPandasWithState sessionization == an independent pure-python
    replay of the gap rule, with sessions CROSSING micro-batches (events
    split into time-ordered files, maxFilesPerTrigger=1 so state must
    carry the open session between batches)."""
    import numpy as np
    import pandas as pd

    from wikicrawler_spark.streaming import stream_sessionize

    ev = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .select("user_id", "event_id", "ts", "value")
        .orderBy("ts", "event_id")
        .toPandas()
    )
    # three time-ordered slices -> three micro-batches
    in_dir = str(tmp_path / "ev")
    cuts = [0, len(ev) // 3, 2 * len(ev) // 3, len(ev)]
    for i in range(3):
        spark.createDataFrame(ev.iloc[cuts[i]:cuts[i + 1]]).coalesce(1) \
            .write.mode("append").parquet(in_dir)

    src = (
        spark.readStream.schema(spark.read.parquet(in_dir).schema)
        .option("maxFilesPerTrigger", 1).parquet(in_dir)
    )
    q = (
        stream_sessionize(src).writeStream.format("memory")
        .queryName("sess_test").outputMode("update")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    emitted = spark.sql("SELECT * FROM sess_test").toPandas()
    # latest emission per session = the one with max n_events
    final = emitted.sort_values("n_events").groupby(
        ["user_id", "session_id"]).tail(1)

    # independent replica of the gap rule
    want = {}
    for user, g in ev.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        last, sess, n, val = None, 0, 0, 0.0
        for t, v in zip(g["ts"].astype("int64") // 1000, g["value"]):
            if last is None or t - last > 1_800_000_000:
                sess += 1
                n, val = 0, 0.0
            n += 1
            val += float(v)
            last = t
            want[(user, sess)] = (n, val)

    got = {(r.user_id, r.session_id): (r.n_events, r.session_value)
           for r in final.itertuples()}
    assert set(got) == set(want)
    assert all(got[k][0] == want[k][0] for k in want)
    assert all(np.isclose(got[k][1], want[k][1], atol=1e-9) for k in want)
