"""Delta deletion-vector READ support (sources/dv.py + delta_lite).

Reference parity: deltalake is a first-class format in the reference
(reference spark.json:19); deletion vectors are how every modern delta
writer encodes row-level DELETE/UPDATE/MERGE without rewriting parquet
(enabled by default in current delta-spark), so a foreign table is very
likely to carry them. Implemented from the public specs — delta
PROTOCOL.md "Deletion Vectors" (descriptor, Base85/RFC 1924, DV file
layout, RoaringBitmapArray portable format, action reconciliation on
(path, dv id)) and RoaringBitmap/RoaringFormatSpec (array / bitset /
run containers, cookies 12346/12347). Writes stay refused by the
writer-protocol gate.
"""

import json
import os
import uuid

import pytest
from pyspark.sql import functions as F

from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.sources import (
    delta_lite as dl,
)
from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.sources import dv


PROTOCOL = {
    "minReaderVersion": 3,
    "minWriterVersion": 7,
    "readerFeatures": ["deletionVectors"],
    "writerFeatures": ["deletionVectors"],
}


def _meta(pcols=()):
    fields = [{"name": "v", "type": "long", "nullable": True, "metadata": {}}]
    for p in pcols:
        fields.append({"name": p, "type": "string", "nullable": True, "metadata": {}})
    return {
        "id": "fixture-dv",
        "format": {"provider": "parquet", "options": {}},
        "schemaString": json.dumps({"type": "struct", "fields": fields}),
        "partitionColumns": list(pcols),
        "configuration": {},
        "createdTime": 1700000000000,
    }


def _stage_file(spark, tmp_path, tp, fname, n):
    """One single-partition parquet file with v = 0..n-1 IN ORDER, so a
    row's value equals its row index (positions are knowable)."""
    import shutil

    stage = str(tmp_path / f"stage_{fname.replace('/', '_')}")
    spark.createDataFrame([(i,) for i in range(n)], "v long").coalesce(1).write.parquet(
        stage
    )
    part = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
    dest = os.path.join(tp, fname)
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    shutil.move(os.path.join(stage, part), dest)
    return {
        "path": fname,
        "partitionValues": {},
        "size": os.path.getsize(dest),
        "modificationTime": 1700000000000,
        "dataChange": True,
        "stats": json.dumps(
            {"numRecords": n, "minValues": {"v": 0}, "maxValues": {"v": n - 1},
             "nullCount": {"v": 0}}
        ),
    }


def _commit(tp, version, actions):
    os.makedirs(os.path.join(tp, dl.LOG_DIR), exist_ok=True)
    with open(os.path.join(tp, dl.LOG_DIR, f"{version:020d}.json"), "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in actions) + "\n")


def _u_descriptor(tp, positions, prefix="", runs=False):
    """Write an on-disk 'u'-storage DV for ``positions``; returns the
    descriptor."""
    u = uuid.uuid4()
    payload = dv.encode_bitmap_array(positions, runs=runs)
    dv_dir = os.path.join(tp, prefix) if prefix else tp
    os.makedirs(dv_dir, exist_ok=True)
    [(off, size)] = dv.write_dv_file(
        os.path.join(dv_dir, dv.dv_file_name(u)), [payload]
    )
    return {
        "storageType": "u",
        "pathOrInlineDv": dv.encode_dv_uuid_path(u, prefix),
        "offset": off,
        "sizeInBytes": size,
        "cardinality": len(positions),
    }


def _mk_dv_table(spark, tmp_path, deleted, runs=False, prefix=""):
    """v0: two 100-row files; v1: a DV on f1.parquet deleting ``deleted``
    row positions (remove+add per the protocol)."""
    tp = str(tmp_path / "t")
    os.makedirs(tp)
    add1 = _stage_file(spark, tmp_path, tp, "f1.parquet", 100)
    add2 = _stage_file(spark, tmp_path, tp, "f2.parquet", 100)
    _commit(tp, 0, [{"protocol": PROTOCOL}, {"metaData": _meta()},
                    {"add": add1}, {"add": add2}])
    desc = _u_descriptor(tp, deleted, prefix=prefix, runs=runs)
    _commit(tp, 1, [
        # add listed BEFORE its matching remove: reconciliation must key
        # on (path, dv id), not on action order
        {"add": {**add1, "deletionVector": desc, "dataChange": True}},
        {"remove": {"path": "f1.parquet", "deletionTimestamp": 1700000000001,
                    "dataChange": True}},
    ])
    return tp, desc


def test_u_storage_read_and_time_travel(spark, tmp_path):
    deleted = [3, 4, 5, 97]
    tp, _ = _mk_dv_table(spark, tmp_path, deleted)
    df = dl.read_delta_lite(spark, tp)
    assert df.count() == 200 - len(deleted)
    got = sorted(r["v"] for r in df.filter(F.col("v") < 10).collect())
    # v<10 from both files: f1 lost 3,4,5; f2 intact
    assert got == sorted([0, 1, 2, 6, 7, 8, 9] + list(range(10)))
    assert dl.read_delta_lite(spark, tp, version=0).count() == 200
    # no helper columns leak
    assert df.columns == ["v"]


def test_prefix_run_bitmap_and_multikey(spark, tmp_path):
    # run containers + a >4096-cardinality bitmap container + a prefixed
    # DV path, all in one descriptor
    tp = str(tmp_path / "t")
    os.makedirs(tp)
    add1 = _stage_file(spark, tmp_path, tp, "big.parquet", 9000)
    _commit(tp, 0, [{"protocol": PROTOCOL}, {"metaData": _meta()}, {"add": add1}])
    deleted = list(range(1000, 6000))  # 5000 rows: bitmap-sized, runs-friendly
    desc = _u_descriptor(tp, deleted, prefix="ab", runs=True)
    assert os.path.exists(
        os.path.join(tp, "ab", os.listdir(os.path.join(tp, "ab"))[0])
    )
    _commit(tp, 1, [
        {"remove": {"path": "big.parquet", "dataChange": True}},
        {"add": {**add1, "deletionVector": desc, "dataChange": True}},
    ])
    df = dl.read_delta_lite(spark, tp)
    assert df.count() == 4000
    assert df.filter("v >= 1000 AND v < 6000").count() == 0


def test_inline_and_absolute_storage(spark, tmp_path):
    import base64

    tp = str(tmp_path / "t")
    os.makedirs(tp)
    add1 = _stage_file(spark, tmp_path, tp, "f1.parquet", 50)
    payload = dv.encode_bitmap_array([0, 1, 2])
    inline = {
        "storageType": "i",
        "pathOrInlineDv": base64.b85encode(payload).decode("ascii"),
        "sizeInBytes": len(payload),
        "cardinality": 3,
    }
    _commit(tp, 0, [{"protocol": PROTOCOL}, {"metaData": _meta()},
                    {"add": {**add1, "deletionVector": inline}}])
    assert dl.read_delta_lite(spark, tp).count() == 47
    # 'p' absolute storage: point a second version at an on-disk file
    u = uuid.uuid4()
    abs_path = str(tmp_path / "elsewhere.bin")
    [(off, size)] = dv.write_dv_file(abs_path, [dv.encode_bitmap_array([10, 11])])
    pdesc = {"storageType": "p", "pathOrInlineDv": abs_path, "offset": off,
             "sizeInBytes": size, "cardinality": 2}
    _commit(tp, 1, [
        {"remove": {"path": "f1.parquet", "deletionVector": inline,
                    "dataChange": True}},
        {"add": {**add1, "deletionVector": pdesc, "dataChange": True}},
    ])
    df = dl.read_delta_lite(spark, tp)
    assert df.count() == 48
    assert df.filter("v IN (10, 11)").count() == 0
    # and v0 still applies the OLD (inline) vector
    assert dl.read_delta_lite(spark, tp, version=0).count() == 47


def test_dv_update_reconciliation_both_orders(spark, tmp_path):
    """remove(path, dv_old) + add(path, dv_new) — in EITHER order within
    the commit — must leave the new DV live (protocol: actions key on
    (path, dv unique id))."""
    for add_first in (True, False):
        base = tmp_path / ("o1" if add_first else "o2")
        base.mkdir()
        tp, old_desc = _mk_dv_table(spark, base, [0, 1])
        new_desc = _u_descriptor(tp, [0, 1, 2, 3])
        add1 = dl.load_snapshot(tp).files["f1.parquet"]
        actions = [
            {"add": {**add1, "deletionVector": new_desc, "dataChange": True}},
            {"remove": {"path": "f1.parquet", "deletionVector": old_desc,
                        "dataChange": True}},
        ]
        if not add_first:
            actions.reverse()
        _commit(tp, 2, actions)
        assert dl.read_delta_lite(spark, tp).count() == 196, f"add_first={add_first}"


def test_stats_pruning_composes_with_dvs(spark, tmp_path):
    tp, _ = _mk_dv_table(spark, tmp_path, [3, 4, 5])
    snap = dl.load_snapshot(tp)
    # both files span v ∈ [0, 99] — a v<=99 predicate keeps both, and the
    # DV still filters; a stats-impossible predicate prunes everything
    assert dl.read_delta_lite(spark, tp, predicate="v <= 99").count() == 197
    assert dl._candidate_files(snap, dl._parse_conjuncts("v > 1000")) == []


def test_writes_and_vacuum_refused_clone_readable(spark, tmp_path):
    tp, _ = _mk_dv_table(spark, tmp_path, [7])
    one = spark.createDataFrame([(999,)], "v long")
    with pytest.raises(ValueError, match="writer"):
        dl.write_delta_lite(one, tp, mode="append")
    with pytest.raises(ValueError, match="writer"):
        dl.delete_delta_lite(spark, tp, "v = 1")
    with pytest.raises(ValueError, match="writer"):
        dl.vacuum_delta_lite(tp)
    # shallow clone: readable, DV rewritten u -> p (absolute)
    dst = str(tmp_path / "clone")
    dl.clone_delta_lite(tp, dst)
    cdesc = dl.load_snapshot(dst).files[
        next(iter(k for k in dl.load_snapshot(dst).files if "f1" in k))
    ]["deletionVector"]
    assert cdesc["storageType"] == "p"
    assert os.path.isabs(cdesc["pathOrInlineDv"])
    assert dl.read_delta_lite(spark, dst).count() == 199


def test_checkpoint_carries_dvs(spark, tmp_path):
    deleted = [1, 2, 3, 4, 5, 6, 7, 8, 9, 10]
    tp, _ = _mk_dv_table(spark, tmp_path, deleted)
    v = dl.checkpoint_delta_lite(tp)
    assert v == 1
    # checkpoint-bounded replay: drop the json commits it summarizes
    for j in (0, 1):
        os.unlink(os.path.join(tp, dl.LOG_DIR, f"{j:020d}.json"))
    df = dl.read_delta_lite(spark, tp)
    assert df.count() == 190
    assert df.filter("v <= 10 AND v >= 1").count() == 10  # from intact f2


def test_corrupt_dvs_raise_named_errors(spark, tmp_path):
    tp, desc = _mk_dv_table(spark, tmp_path, [0])
    # cardinality mismatch
    bad = {**desc, "cardinality": 5}
    add1 = dl.load_snapshot(tp, version=0).files["f1.parquet"]
    _commit(tp, 2, [{"add": {**add1, "deletionVector": bad, "dataChange": True}}])
    with pytest.raises(Exception, match="cardinality"):
        dl.read_delta_lite(spark, tp).count()
    # CRC corruption
    tp2 = str(tmp_path / "crc")
    os.makedirs(tp2)
    a = _stage_file(spark, tmp_path, tp2, "f.parquet", 10)
    d = _u_descriptor(tp2, [0])
    bin_path = next(
        os.path.join(tp2, f) for f in os.listdir(tp2) if f.endswith(".bin")
    )
    raw = bytearray(open(bin_path, "rb").read())
    raw[6] ^= 0xFF  # flip a bitmap byte, leave size intact
    open(bin_path, "wb").write(bytes(raw))
    _commit(tp2, 0, [{"protocol": PROTOCOL}, {"metaData": _meta()},
                     {"add": {**a, "deletionVector": d}}])
    with pytest.raises(Exception, match="CRC"):
        dl.read_delta_lite(spark, tp2).count()
    # unknown storage type
    with pytest.raises(ValueError, match="storageType"):
        dv.resolve_dv_path(tp2, {"storageType": "x", "pathOrInlineDv": ""})


def test_mapped_table_with_dvs(spark, tmp_path):
    """Column mapping + deletion vectors COMPOSE: physical names, add-
    action partition values, and DV row positions all on one table."""
    tp = str(tmp_path / "t")
    os.makedirs(tp)
    import shutil

    stage = str(tmp_path / "stage")
    spark.createDataFrame([(i,) for i in range(40)], "v long").coalesce(1).select(
        F.col("v").alias("col-x9")
    ).write.parquet(stage)
    part = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
    shutil.move(os.path.join(stage, part), os.path.join(tp, "m.parquet"))
    meta = {
        "id": "fixture-cm-dv",
        "format": {"provider": "parquet", "options": {}},
        "schemaString": json.dumps({"type": "struct", "fields": [
            {"name": "v", "type": "long", "nullable": True,
             "metadata": {"delta.columnMapping.id": 1,
                          "delta.columnMapping.physicalName": "col-x9"}},
            {"name": "pt", "type": "string", "nullable": True,
             "metadata": {"delta.columnMapping.id": 2,
                          "delta.columnMapping.physicalName": "col-p1"}},
        ]}),
        "partitionColumns": ["pt"],
        "configuration": {"delta.columnMapping.mode": "name",
                          "delta.columnMapping.maxColumnId": "2"},
        "createdTime": 1700000000000,
    }
    desc = _u_descriptor(tp, [0, 39])
    proto = {
        "minReaderVersion": 3,
        "minWriterVersion": 7,
        "readerFeatures": ["columnMapping", "deletionVectors"],
        "writerFeatures": ["columnMapping", "deletionVectors"],
    }
    _commit(tp, 0, [{"protocol": proto}, {"metaData": meta}, {"add": {
        "path": "m.parquet", "partitionValues": {"col-p1": "a"},
        "size": os.path.getsize(os.path.join(tp, "m.parquet")),
        "modificationTime": 1700000000000, "dataChange": True,
        "stats": json.dumps({"numRecords": 40, "minValues": {"col-x9": 0},
                             "maxValues": {"col-x9": 39},
                             "nullCount": {"col-x9": 0}}),
        "deletionVector": desc}}])
    df = dl.read_delta_lite(spark, tp)
    assert df.columns == ["v", "pt"]
    assert df.count() == 38
    assert df.filter("v IN (0, 39)").count() == 0
    assert df.filter("pt = 'a'").count() == 38


def test_cdc_sees_dv_deletes(spark, tmp_path):
    """delta_changes must NOT cancel a path whose deletion vector
    changed — the DV update IS the change (deletes of the newly-marked
    rows), and only that file is scanned (f2 cancels by path+dv)."""
    deleted = [11, 12, 13]
    tp, _ = _mk_dv_table(spark, tmp_path, deleted)
    ch = dl.delta_changes(spark, tp, 0, 1)
    rows = {(r["v"], r["_change_type"]) for r in ch.collect()}
    assert rows == {(11, "delete"), (12, "delete"), (13, "delete")}
    # and within the DV-update commit range where nothing else changed,
    # a no-op range yields no changes
    assert dl.delta_changes(spark, tp, 1, 1).count() == 0


def test_streaming_append_gate_and_dv_cdf(spark, tmp_path):
    """An append stream still refuses the DV commit (it is
    data-changing), but the CHANGE FEED now diffs it: the stream
    delivers exactly the DV's newly-deleted rows, equal to the batch
    delta_changes feed."""
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.sources.delta_stream import (
        read_delta_lite_stream,
    )

    deleted = [7, 8, 42]
    tp, _ = _mk_dv_table(spark, tmp_path, deleted)
    # append stream over the DV commit: data-changing -> named refusal
    s = read_delta_lite_stream(spark, tp, startingVersion=0)
    q = (
        s.writeStream.format("memory")
        .queryName(f"dvgate_{uuid.uuid4().hex[:8]}")
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="data-changing|skipChangeCommits"):
        q.awaitTermination()
    # change feed over the DV commit: the masked multiset diff IS the
    # deleted row set
    c = read_delta_lite_stream(
        spark, tp, readChangeFeed=True, startingVersion=1
    )
    name = f"dvcdf_{uuid.uuid4().hex[:8]}"
    q2 = (
        c.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()
    rows = {
        (r["v"], r["_change_type"], r["_commit_version"])
        for r in spark.table(name).collect()
    }
    assert rows == {(v, "delete", 1) for v in deleted}


def test_streaming_initial_snapshot_masks_dv_files(spark, tmp_path):
    """A fresh stream's first batch delivers the RECONCILED snapshot —
    DV'd files contribute only their live rows (positions masked
    executor-side), never the deleted ones."""
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.sources.delta_stream import (
        read_delta_lite_stream,
    )

    deleted = [5, 6, 99]
    tp, _ = _mk_dv_table(spark, tmp_path, deleted)
    s = read_delta_lite_stream(spark, tp)  # default: snapshot-first
    name = f"dvsnap_{uuid.uuid4().hex[:8]}"
    q = (
        s.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = [r["v"] for r in spark.table(name).collect()]
    assert len(got) == 200 - len(deleted)
    # deleted positions gone from f1; f2's copies of the values remain
    from collections import Counter

    c = Counter(got)
    assert all(c[v] == 1 for v in deleted)
    assert c[0] == 2  # undeleted value present from both files


def test_codec_property_roundtrip():
    import random

    rng = random.Random(20260816)
    for _ in range(25):
        n = rng.randrange(1, 4000)
        vals = sorted(
            rng.sample(range(rng.choice([1 << 12, 1 << 17, 1 << 33])),
                       min(n, 3000))
        )
        for runs in (False, True):
            assert dv.decode_bitmap_array(dv.encode_bitmap_array(vals, runs=runs)) == vals
