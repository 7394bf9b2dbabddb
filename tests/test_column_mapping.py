"""Delta column mapping ('name' mode) READ support.

Reference parity: deltalake is a first-class format in the reference
(reference spark.json:19); name-mode column mapping is the most common
real-world delta feature a foreign table brings (any ALTER TABLE RENAME
COLUMN enables it). The log format is public (delta-io/delta
PROTOCOL.md "Column Mapping"): protocol (2,5) or (3,7)+columnMapping,
``delta.columnMapping.physicalName`` per schema field, stats and
``partitionValues`` keyed by PHYSICAL name. Reads are implemented;
writes are honestly refused by the writer-protocol gate.
"""

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.sources import (
    delta_lite as dl,
)

#: logical -> physical names for the fixture table
PHYS = {"id": "col-a7f3", "v": "col-b2c9", "pt": "col-p001"}


def _schema_string(id_name="id"):
    def fld(name, typ, phys, fid):
        return {
            "name": name,
            "type": typ,
            "nullable": True,
            "metadata": {
                "delta.columnMapping.id": fid,
                "delta.columnMapping.physicalName": phys,
            },
        }

    return json.dumps(
        {
            "type": "struct",
            "fields": [
                fld(id_name, "long", PHYS["id"], 1),
                fld("v", "long", PHYS["v"], 2),
                fld("pt", "string", PHYS["pt"], 3),
            ],
        }
    )


def _mk_mapped_table(spark, tmp_path, mode="name", protocol=None):
    """Hand-commit a column-mapped table: two data files with PHYSICAL
    parquet column names, no hive layout (the protocol says mapped
    readers must take partition values from the add actions), physical
    stats keys, partitions pt=x (ids 1-3) and pt=y (ids 10-12)."""
    tp = str(tmp_path / "mapped")
    os.makedirs(os.path.join(tp, dl.LOG_DIR))
    adds = []
    for fname, ids, pt in (("f1.parquet", [1, 2, 3], "x"), ("f2.parquet", [10, 11, 12], "y")):
        stage = str(tmp_path / f"stage_{fname}")
        (
            spark.createDataFrame([(i, i * 100) for i in ids], "a long, b long")
            .coalesce(1)
            .select(F.col("a").alias(PHYS["id"]), F.col("b").alias(PHYS["v"]))
            .write.parquet(stage)
        )
        part = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
        shutil.move(os.path.join(stage, part), os.path.join(tp, fname))
        adds.append(
            {
                "add": {
                    "path": fname,
                    "partitionValues": {PHYS["pt"]: pt},
                    "size": os.path.getsize(os.path.join(tp, fname)),
                    "modificationTime": 1700000000000,
                    "dataChange": True,
                    "stats": json.dumps(
                        {
                            "numRecords": 3,
                            "minValues": {PHYS["id"]: min(ids)},
                            "maxValues": {PHYS["id"]: max(ids)},
                            "nullCount": {PHYS["id"]: 0},
                        }
                    ),
                }
            }
        )
    actions = [
        {"protocol": protocol or {"minReaderVersion": 2, "minWriterVersion": 5}},
        {
            "metaData": {
                "id": "fixture-mapped",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": _schema_string(),
                "partitionColumns": ["pt"],
                "configuration": {
                    "delta.columnMapping.mode": mode,
                    "delta.columnMapping.maxColumnId": "3",
                },
                "createdTime": 1700000000000,
            }
        },
    ] + adds
    with open(os.path.join(tp, dl.LOG_DIR, f"{0:020d}.json"), "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in actions) + "\n")
    return tp


def test_name_mode_read_logical_names_and_partition_values(spark, tmp_path):
    tp = _mk_mapped_table(spark, tmp_path)
    df = dl.read_delta_lite(spark, tp)
    assert df.columns == ["id", "v", "pt"]
    rows = {(r["id"], r["v"], r["pt"]) for r in df.collect()}
    assert rows == {(1, 100, "x"), (2, 200, "x"), (3, 300, "x"),
                    (10, 1000, "y"), (11, 1100, "y"), (12, 1200, "y")}
    # dtypes pinned by the logical schema, not inference
    assert dict(df.dtypes) == {"id": "bigint", "v": "bigint", "pt": "string"}


def test_name_mode_rename_survives_without_rewrite(spark, tmp_path):
    """The point of column mapping: a RENAME changes only the LOGICAL
    name in the metadata; physical files are untouched and reads follow
    the new name."""
    tp = _mk_mapped_table(spark, tmp_path)
    meta = dict(dl.load_snapshot(tp).metadata)
    meta["schemaString"] = _schema_string(id_name="order_id")
    with open(os.path.join(tp, dl.LOG_DIR, f"{1:020d}.json"), "w") as fh:
        fh.write(json.dumps({"metaData": meta}) + "\n")
    df = dl.read_delta_lite(spark, tp)
    assert df.columns == ["order_id", "v", "pt"]
    assert df.filter("order_id = 11").collect()[0]["v"] == 1100
    # time travel to v0 still sees the OLD logical name
    assert dl.read_delta_lite(spark, tp, version=0).columns == ["id", "v", "pt"]


def test_name_mode_pruning_translates_to_physical_stats(spark, tmp_path):
    """Stats and partitionValues are keyed by physical names; a logical
    predicate must still skip files (translated, not disabled)."""
    tp = _mk_mapped_table(spark, tmp_path)
    snap = dl.load_snapshot(tp)
    cand = dl._candidate_files(snap, dl._parse_conjuncts("id <= 3"))
    assert cand == ["f1.parquet"]  # stats skip f2 (min id 10)
    cand_pt = dl._candidate_files(snap, dl._parse_conjuncts("pt = 'y'"))
    assert cand_pt == ["f2.parquet"]  # partitionValues skip f1
    # and the predicate read is still exact
    got = dl.read_delta_lite(spark, tp, predicate="id <= 3 AND pt = 'x'")
    assert sorted(r["id"] for r in got.collect()) == [1, 2, 3]


def test_mapped_writes_are_refused_reads_of_id_mode_too(spark, tmp_path):
    tp = _mk_mapped_table(spark, tmp_path)
    two = spark.createDataFrame([(7, 700, "x")], "id long, v long, pt string")
    with pytest.raises(ValueError, match="writer"):
        dl.write_delta_lite(two, tp, mode="append")
    with pytest.raises(ValueError, match="writer"):
        dl.delete_delta_lite(spark, tp, "id = 1")
    # 'id' mode: refused at the metadata gate, by name
    tp2 = _mk_mapped_table(spark, tmp_path / "sub", mode="id")
    with pytest.raises(ValueError, match="columnMapping mode 'id'"):
        dl.read_delta_lite(spark, tp2)


def test_reader_feature_gate(spark, tmp_path):
    # (3,7) with only columnMapping: readable
    tp = _mk_mapped_table(
        spark,
        tmp_path,
        protocol={
            "minReaderVersion": 3,
            "minWriterVersion": 7,
            "readerFeatures": ["columnMapping"],
            "writerFeatures": ["columnMapping"],
        },
    )
    assert dl.read_delta_lite(spark, tp).count() == 6
    # an unimplemented reader feature: refused, named
    tp2 = _mk_mapped_table(
        spark,
        tmp_path / "tw",
        protocol={
            "minReaderVersion": 3,
            "minWriterVersion": 7,
            "readerFeatures": ["columnMapping", "typeWidening"],
            "writerFeatures": ["columnMapping", "typeWidening"],
        },
    )
    with pytest.raises(ValueError, match="typeWidening"):
        dl.read_delta_lite(spark, tp2)
