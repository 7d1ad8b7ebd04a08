"""Per-source CDC format adapters, parity with the reference's four unit
tests (/root/reference/spark/src/test/scala/com/example/MultiSourceCDCTest.scala)
using the same envelope rows, plus an end-to-end: parsed binlog -> keyed
merge -> final table state."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T
import pytest

from dataingestion_spark.lake import LakeTable
from dataingestion_spark.sources.cdc_formats import (
    parse_aerospike_cdc,
    parse_cdc,
    parse_clickstream,
    parse_mongo_change_stream,
    parse_mysql_binlog,
)


def _mysql_envelope(spark):
    # rows = MultiSourceCDCTest.scala:36-40
    rows = [
        ("INSERT", "users", 1, '{"id": 1, "name": "John Doe", "email": "john@example.com", "created_at": "2025-06-28T10:00:00Z"}', "mysql-bin.000001", 12345, 1719565200000),
        ("UPDATE", "users", 1, '{"id": 1, "name": "John Smith", "email": "john.smith@example.com", "updated_at": "2025-06-28T11:00:00Z"}', "mysql-bin.000001", 12346, 1719568800000),
        ("DELETE", "users", 1, '{"id": 1}', "mysql-bin.000001", 12347, 1719572400000),
    ]
    return spark.createDataFrame(
        rows,
        "operation string, table_name string, primary_key long, data string, "
        "binlog_file string, binlog_position long, timestamp long",
    )


def test_mysql_binlog_parse(spark):
    out = parse_mysql_binlog(
        _mysql_envelope(spark),
        payload_fields=[("id", "long"), ("name", "string"), ("email", "string")],
    ).orderBy("lsn")
    rows = out.collect()
    assert [r["op"] for r in rows] == ["INSERT", "UPDATE", "DELETE"]
    # MultiSourceCDCTest.scala:74-75 expectations
    assert rows[0]["name"] == "John Doe"
    assert rows[1]["name"] == "John Smith"
    assert rows[1]["email"] == "john.smith@example.com"
    assert rows[2]["name"] is None  # delete payload carries only the key
    assert [r["lsn"] for r in rows] == [12345, 12346, 12347]
    assert rows[0]["source_file"] == "mysql-bin.000001"
    assert rows[0]["ts_ms"] == 1719565200000


def test_mongo_change_stream_parse(spark):
    # rows = MultiSourceCDCTest.scala:82-86
    rows = [
        ("insert", "orders", '{"_id": {"$oid": "507f1f77bcf86cd799439011"}, "customer_id": 123, "amount": 99.99, "status": "pending"}', '{"_id": {"$oid": "507f1f77bcf86cd799439011"}}', "2025-06-28T10:00:00Z", "orders.123"),
        ("update", "orders", '{"$set": {"status": "completed", "completed_at": "2025-06-28T11:00:00Z"}}', '{"_id": {"$oid": "507f1f77bcf86cd799439011"}}', "2025-06-28T11:00:00Z", "orders.124"),
        ("delete", "orders", None, '{"_id": {"$oid": "507f1f77bcf86cd799439011"}}', "2025-06-28T12:00:00Z", "orders.125"),
    ]
    df = spark.createDataFrame(
        rows,
        "operationType string, ns_coll string, fullDocument string, "
        "documentKey string, clusterTime string, resumeToken string",
    )
    out = parse_mongo_change_stream(
        df,
        payload_fields=[
            ("customer_id", "long"),
            ("amount", "double"),
            ("status", "string"),
        ],
    ).orderBy("lsn")
    got = out.collect()
    assert [r["op"] for r in got] == ["INSERT", "UPDATE", "DELETE"]
    # MultiSourceCDCTest.scala:117-119 expectations
    assert got[0]["customer_id"] == 123
    assert got[0]["amount"] == 99.99
    # $set unwrap: the partial update surfaces its fields
    assert got[1]["status"] == "completed"
    assert got[1]["customer_id"] is None
    assert all(r["document_id"] == "507f1f77bcf86cd799439011" for r in got)
    assert [r["lsn"] for r in got] == [123, 124, 125]


def test_aerospike_parse(spark):
    # rows = MultiSourceCDCTest.scala:126-130
    rows = [
        ("WRITE", "test", "users", "user:1", '{"name": "Alice", "age": 30, "city": "NYC"}', 1719565200000, 1),
        ("WRITE", "test", "users", "user:1", '{"name": "Alice", "age": 31, "city": "NYC", "updated": true}', 1719568800000, 2),
        ("DELETE", "test", "users", "user:1", None, 1719572400000, 3),
    ]
    df = spark.createDataFrame(
        rows,
        "operation string, namespace string, set_name string, user_key string, "
        "bins string, timestamp long, generation long",
    )
    out = parse_aerospike_cdc(
        df, payload_fields=[("name", "string"), ("age", "int"), ("city", "string")]
    ).orderBy("lsn")
    got = out.collect()
    assert [r["op"] for r in got] == ["UPSERT", "UPSERT", "DELETE"]
    # MultiSourceCDCTest.scala:162-165 expectations
    assert got[0]["name"] == "Alice"
    assert got[1]["age"] == 31
    assert got[0]["source_file"] == "test.users"
    assert [r["lsn"] for r in got] == [1, 2, 3]


def test_clickstream_parse(spark):
    # rows = MultiSourceCDCTest.scala:172-176
    rows = [
        ("page_view", "user123", "/home", "2025-06-28T10:00:00Z", '{"referrer": "google.com", "user_agent": "Chrome/91.0", "session_id": "sess_abc123"}', "192.168.1.100"),
        ("click", "user123", "/product/123", "2025-06-28T10:01:00Z", '{"element": "buy_button", "product_id": "123", "session_id": "sess_abc123"}', "192.168.1.100"),
        ("purchase", "user123", "/checkout", "2025-06-28T10:05:00Z", '{"order_id": "ord_456", "amount": 99.99, "payment_method": "credit_card", "session_id": "sess_abc123"}', "192.168.1.100"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_type string, user_id string, page_url string, timestamp string, "
        "properties string, ip_address string",
    )
    out = parse_clickstream(
        df,
        payload_fields=[
            ("session_id", "string"),
            ("referrer", "string"),
            ("order_id", "string"),
            ("amount", "double"),
        ],
    )
    got = {r["event_type"]: r for r in out.collect()}
    assert set(got) == {"page_view", "click", "purchase"}
    # MultiSourceCDCTest.scala:208-210 expectations
    assert got["purchase"]["order_id"] == "ord_456"
    assert got["purchase"]["amount"] == 99.99
    assert got["page_view"]["referrer"] == "google.com"
    assert all(r["op"] == "INSERT" for r in got.values())
    assert all(r["session_id"] == "sess_abc123" for r in got.values())


def test_parse_cdc_dispatch(spark):
    out = parse_cdc(
        _mysql_envelope(spark), "mysql-binlog", payload_fields=[("name", "string")]
    )
    assert out.count() == 3
    with pytest.raises(ValueError, match="unknown CDC source format"):
        parse_cdc(_mysql_envelope(spark), "oracle-goldengate")


def test_binlog_parse_to_merge_end_to_end(spark, tmp_path):
    """Parsed binlog stream applied through the keyed merge: insert then
    update then delete of the same key leaves an empty table; replaying
    without the delete leaves the updated row (the e2e upsert invariant,
    /root/reference/e2e-tests/src/test/scala/com/example/e2e/MultiSourceE2ETest.scala:129-131)."""
    schema = T.StructType(
        [
            T.StructField("primary_key", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("email", T.StringType()),
            T.StructField("ts_ms", T.LongType()),
        ]
    )
    parsed = parse_mysql_binlog(
        _mysql_envelope(spark),
        payload_fields=[("name", "string"), ("email", "string")],
    )

    tbl = LakeTable.create(
        spark, tmp_path / "full", schema,
        pk_fields=["primary_key"], order_fields=["lsn", "ts_ms"], num_buckets=2,
    )
    tbl.merge(parsed, pipeline_id="p", epoch_id=0)
    assert tbl.read().count() == 0  # delete is the last writer

    tbl2 = LakeTable.create(
        spark, tmp_path / "nodelete", schema,
        pk_fields=["primary_key"], order_fields=["lsn", "ts_ms"], num_buckets=2,
    )
    tbl2.merge(parsed.filter(F.col("op") != "DELETE"), pipeline_id="p", epoch_id=0)
    got = tbl2.read().collect()
    assert len(got) == 1
    assert got[0]["name"] == "John Smith"
    assert got[0]["email"] == "john.smith@example.com"


def test_multi_source_union_merge(spark, tmp_path):
    """MultiSourceE2ETest analog (round 4): two upstream shards - MySQL
    binlog and Aerospike CDC - parse to the canonical relation, union
    into ONE batch, LWW-merge into one table. The aerospike write (higher
    lsn) must beat the mysql update; the mysql delete (highest lsn) must
    tombstone across sources."""
    my = parse_mysql_binlog(
        spark.createDataFrame(
            [
                ("INSERT", "users", 1, '{"v": "m1"}', "mysql-bin.000001", 10, 1000),
                ("UPDATE", "users", 1, '{"v": "m2"}', "mysql-bin.000001", 12, 1200),
                ("INSERT", "users", 2, '{"v": "m3"}', "mysql-bin.000001", 14, 1400),
                ("DELETE", "users", 2, '{"v": null}', "mysql-bin.000001", 20, 2000),
            ],
            "operation string, table_name string, primary_key long, data string,"
            " binlog_file string, binlog_position long, timestamp long",
        ),
        payload_fields=[("v", "string")],
    ).select(
        "op", F.col("primary_key").alias("user_id"), "v",
        F.lit("mysql").alias("src"), "ts_ms", "lsn", "source_file",
    )
    ae = parse_aerospike_cdc(
        spark.createDataFrame(
            [
                ("WRITE", "prod", "users", "user:1", '{"v": "a1"}', 1300, 13),
                ("WRITE", "prod", "users", "user:2", '{"v": "a2"}', 1500, 15),
            ],
            "operation string, namespace string, set_name string,"
            " user_key string, bins string, timestamp long, generation long",
        ),
        payload_fields=[("v", "string")],
    ).select(
        "op",
        F.regexp_extract("user_key", r"(\d+)$", 1).cast("long").alias("user_id"),
        "v", F.lit("aerospike").alias("src"), "ts_ms", "lsn", "source_file",
    )
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("v", T.StringType()),
            T.StructField("src", T.StringType()),
            T.StructField("ts_ms", T.LongType()),
        ]
    )
    tbl = LakeTable.create(
        spark, tmp_path / "multi", schema,
        pk_fields=["user_id"], order_fields=["lsn"], num_buckets=2,
    )
    tbl.merge(my.unionByName(ae), pipeline_id="p", epoch_id=0)
    got = {r["user_id"]: r for r in tbl.read().collect()}
    # user 1: aerospike lsn 13 beats mysql lsn 12
    assert set(got) == {1}
    assert got[1]["v"] == "a1" and got[1]["src"] == "aerospike"
    # user 2: mysql DELETE at lsn 20 tombstones the aerospike write at 15


def _debezium_envelope(spark):
    # Public Debezium envelope shape: before/after/source/op/ts_ms as one
    # JSON value per event (Kafka record value).
    rows = [
        ('{"before": null, "after": {"id": 1, "name": "John"}, "source": '
         '{"connector": "postgresql", "db": "app", "table": "users", '
         '"lsn": 100}, "op": "c", "ts_ms": 1719565200000}',),
        ('{"before": {"id": 1, "name": "John"}, "after": {"id": 1, "name": '
         '"Johnny"}, "source": {"connector": "postgresql", "db": "app", '
         '"table": "users", "lsn": 101}, "op": "u", "ts_ms": 1719568800000}',),
        ('{"before": null, "after": {"id": 2, "name": "Snap"}, "source": '
         '{"connector": "mysql", "db": "app", "table": "users", '
         '"pos": 102}, "op": "r", "ts_ms": 1719570000000}',),
        ('{"before": {"id": 1, "name": "Johnny"}, "after": null, "source": '
         '{"connector": "postgresql", "db": "app", "table": "users", '
         '"lsn": 103}, "op": "d", "ts_ms": 1719572400000}',),
    ]
    return spark.createDataFrame(rows, "value string")


def test_debezium_parse(spark):
    from dataingestion_spark.sources.cdc_formats import parse_debezium

    out = parse_debezium(
        _debezium_envelope(spark),
        payload_fields=[("id", "long"), ("name", "string")],
        key_field="id",
        key_type="long",
    ).orderBy("lsn")
    rows = out.collect()
    assert [r["op"] for r in rows] == ["INSERT", "UPDATE", "UPSERT", "DELETE"]
    # key survives a delete via the before image
    assert [r["id"] for r in rows] == [1, 1, 2, 1]
    # payload comes from after only: null-filled on delete
    assert [r["name"] for r in rows] == ["John", "Johnny", "Snap", None]
    # lsn: postgres lsn and mysql pos both land in the canonical ordinal
    assert [r["lsn"] for r in rows] == [100, 101, 102, 103]
    assert rows[0]["source_file"] == "app.users"
    assert rows[0]["ts_ms"] == 1719565200000


def test_debezium_dispatch_and_bad_payload(spark):
    df = spark.createDataFrame(
        [('{"before": null, "after": {"id": "oops"}, "source": {"db": "a", '
          '"table": "t", "lsn": 1}, "op": "c", "ts_ms": 5}',)],
        "value string",
    )
    out = parse_cdc(
        df, "debezium", payload_fields=[("id", "long")],
        key_field="id", key_type="long",
    ).collect()[0]
    # try_cast degrades a malformed value to NULL instead of killing the
    # batch under ANSI mode; the quarantine gate rejects it row-wise.
    assert out["id"] is None and out["op"] == "INSERT"


def _wal2json_envelope(spark):
    # wal2json format-version=2 stream: one JSON object per change, plus
    # the B/C transaction control records the adapter must drop. Column
    # order differs between the insert and the update on purpose (wal2json
    # emits relation order, which ALTER TABLE can change) - extraction is
    # by name.
    rows = [
        '{"action": "B", "lsn": "0/16B2C00"}',
        '{"action": "I", "schema": "public", "table": "users",'
        ' "columns": [{"name": "id", "type": "bigint", "value": 1},'
        ' {"name": "name", "type": "text", "value": "John"}],'
        ' "lsn": "0/16B2C38", "timestamp": "2025-06-28 10:00:00.000123+00"}',
        '{"action": "U", "schema": "public", "table": "users",'
        ' "columns": [{"name": "name", "type": "text", "value": "Johnny"},'
        ' {"name": "id", "type": "bigint", "value": 1}],'
        ' "identity": [{"name": "id", "type": "bigint", "value": 1}],'
        ' "lsn": "0/16B2D00", "timestamp": "2025-06-28 11:00:00+00"}',
        '{"action": "D", "schema": "public", "table": "users",'
        ' "identity": [{"name": "id", "type": "bigint", "value": 1}],'
        ' "lsn": "1/00000010", "timestamp": "2025-06-28 12:00:00+00"}',
        '{"action": "C", "lsn": "1/00000020"}',
    ]
    return spark.createDataFrame([(r,) for r in rows], "value string")


def test_wal2json_parse(spark):
    from dataingestion_spark.sources.cdc_formats import parse_wal2json

    out = parse_wal2json(
        _wal2json_envelope(spark),
        payload_fields=[("name", "string")],
        key_fields=[("id", "long")],
    ).orderBy("lsn")
    rows = out.collect()
    # B/C control records dropped; I/U/D map to canonical ops
    assert [r["op"] for r in rows] == ["INSERT", "UPDATE", "DELETE"]
    # key resolves from columns, falling back to the replica identity on
    # delete; by-name lookup survives the swapped column order in the U row
    assert [r["id"] for r in rows] == [1, 1, 1]
    assert [r["name"] for r in rows] == ["John", "Johnny", None]
    # pg_lsn 'hi/lo' hex halves -> 64-bit ordinal (the D row exercises the
    # high half: '1/00000010' = 2^32 + 16)
    assert rows[0]["lsn"] == 0x16B2C38
    assert rows[2]["lsn"] == (1 << 32) + 0x10
    assert rows[0]["source_file"] == "public.users"
    # microsecond timestamp truncates to epoch ms
    assert rows[0]["ts_ms"] == 1751104800000
    assert rows[1]["ts_ms"] == 1751108400000


def test_wal2json_dispatch_and_bad_payload(spark):
    df = spark.createDataFrame(
        [('{"action": "I", "schema": "s", "table": "t",'
          ' "columns": [{"name": "id", "type": "bigint", "value": "oops"}],'
          ' "lsn": "0/1", "timestamp": "2025-06-28 10:00:00+00"}',)],
        "value string",
    )
    out = parse_cdc(
        df, "wal2json", payload_fields=[], key_fields=[("id", "long")]
    ).collect()[0]
    # try_cast degrades a malformed value to NULL instead of killing the
    # batch under ANSI mode; the quarantine gate rejects it row-wise.
    assert out["id"] is None and out["op"] == "INSERT" and out["lsn"] == 1


def test_maxwell_parse(spark):
    """Maxwell's-daemon JSON (public Zendesk format): full post-image in
    `data`, binlog position folded into one monotone lsn over file
    rollovers, bootstrap-insert replays as a plain INSERT."""
    from dataingestion_spark.sources.cdc_formats import parse_maxwell

    rows = [
        ("shop", "users", "bootstrap-insert", 1719565200, 10,
         "mysql-bin.000001:100", '{"id": 1, "name": "John"}', None),
        ("shop", "users", "insert", 1719565201, 11,
         "mysql-bin.000001:200", '{"id": 2, "name": "Ada"}', None),
        ("shop", "users", "update", 1719565202, 12,
         "mysql-bin.000002:50", '{"id": 1, "name": "John S"}',
         '{"name": "John"}'),
        ("shop", "users", "delete", 1719565203, 13,
         "mysql-bin.000002:90", '{"id": 2, "name": "Ada"}', None),
        ("shop", "users", "table-create", 1719565204, 14,
         "mysql-bin.000002:99", "{}", None),  # DDL: unknown -> null op
    ]
    df = spark.createDataFrame(
        rows,
        "database string, table string, type string, ts long, xid long, "
        "position string, data string, old string",
    )
    out = parse_maxwell(
        df, payload_fields=[("name", "string")], key_field="id",
        key_type="long",
    ).orderBy("lsn")
    got = out.collect()
    assert [r["op"] for r in got] == [
        "INSERT", "INSERT", "UPDATE", "DELETE", None
    ]
    assert [r["id"] for r in got] == [1, 2, 1, 2, None]
    assert got[2]["name"] == "John S"
    # file rollover keeps lsn monotone: file 2 offsets sort after file 1
    lsns = [r["lsn"] for r in got]
    assert lsns == sorted(lsns)
    assert got[0]["lsn"] == (1 << 40) + 100 and got[2]["lsn"] == (2 << 40) + 50
    assert got[0]["source_file"] == "mysql-bin.000001"
    assert got[0]["ts_ms"] == 1719565200000


def test_dynamodb_stream_parse(spark):
    """DynamoDB Streams (public AWS shape): typed attribute encoding,
    key from Keys on every record (REMOVE has no NewImage), lsn =
    SequenceNumber."""
    from dataingestion_spark.sources.cdc_formats import parse_dynamodb_stream

    rows = [
        ("INSERT",
         '{"Keys": {"uid": {"N": "1"}}, '
         '"NewImage": {"uid": {"N": "1"}, "name": {"S": "John"}, '
         '"score": {"N": "42"}}, '
         '"SequenceNumber": "100", "ApproximateCreationDateTime": 1719565200}'),
        ("MODIFY",
         '{"Keys": {"uid": {"N": "1"}}, '
         '"NewImage": {"uid": {"N": "1"}, "name": {"S": "John S"}, '
         '"score": {"N": "43"}}, '
         '"SequenceNumber": "101", "ApproximateCreationDateTime": 1719565201}'),
        ("REMOVE",
         '{"Keys": {"uid": {"N": "1"}}, '
         '"SequenceNumber": "102", "ApproximateCreationDateTime": 1719565202}'),
    ]
    df = spark.createDataFrame(rows, "eventName string, dynamodb string")
    out = parse_dynamodb_stream(
        df, payload_fields=[("name", "string"), ("score", "int")],
        key_field="uid", key_type="long",
    ).orderBy("lsn")
    got = out.collect()
    assert [r["op"] for r in got] == ["INSERT", "UPDATE", "DELETE"]
    assert [r["uid"] for r in got] == [1, 1, 1]  # key present on REMOVE too
    assert got[1]["name"] == "John S" and got[1]["score"] == 43
    assert got[2]["name"] is None and got[2]["score"] is None
    assert [r["lsn"] for r in got] == [100, 101, 102]
    assert got[0]["ts_ms"] == 1719565200000
    assert got[0]["source_file"] == "dynamodb"


def test_new_adapters_dispatch_and_merge(spark, tmp_path):
    """parse_cdc knows the new names; a parsed Maxwell stream merges
    into a lake table with the standard LWW semantics (delete wins by
    position order, not arrival order)."""
    from dataingestion_spark.sources.cdc_formats import parse_cdc

    rows = [
        ("t", "insert", 1, "mysql-bin.000001:100", '{"id": 1, "v": "a"}'),
        ("t", "delete", 3, "mysql-bin.000001:300", '{"id": 1, "v": "b"}'),
        ("t", "update", 2, "mysql-bin.000001:200", '{"id": 1, "v": "b"}'),
        ("t", "insert", 4, "mysql-bin.000001:400", '{"id": 2, "v": "z"}'),
    ]
    df = spark.createDataFrame(
        rows, "table string, type string, ts long, position string, data string"
    ).withColumn("database", F.lit("d")).withColumn("xid", F.col("ts"))
    parsed = parse_cdc(
        df, "maxwell", payload_fields=[("v", "string")], key_field="id",
        key_type="long",
    )
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("v", T.StringType()),
            T.StructField("ts_ms", T.LongType()),
        ]
    )
    tbl = LakeTable.create(
        spark, str(tmp_path / "mx"), schema, pk_fields=["id"],
        order_fields=["lsn", "ts_ms"], num_buckets=2,
    )
    tbl.merge(parsed.withColumn("source_file", F.lit("f")))
    got = {r.id: r.v for r in tbl.read().collect()}
    assert got == {2: "z"}  # id 1 deleted at the highest position


def test_dynamodb_real_width_sequence_numbers(spark, tmp_path):
    """Real AWS SequenceNumbers are 21-40-digit decimal strings
    (AWS-documented width); with the subscription-time seq_base the
    adapter maps them to exact, order-preserving 64-bit lsns and the
    stream merges correctly (VERDICT r4 #1 / ADVICE medium)."""
    from dataingestion_spark.sources.cdc_formats import parse_dynamodb_stream

    base21 = 10 ** 20 + 7  # 21-digit shard base
    base40 = 10 ** 39 + 12345  # 40-digit shard base
    seqs = [
        (base21 + 0, "INSERT", 1, "a"),
        (base21 + 5, "MODIFY", 1, "b"),
        (base21 + 10 ** 18 * 3 + 9, "MODIFY", 1, "c"),  # crosses limbs
        (base40 + 2, "INSERT", 2, "x"),
        (base40 + 10 ** 17, "REMOVE", 2, None),
    ]
    rows = []
    for seq, ev, uid, v in seqs:
        img = (
            f'"NewImage": {{"uid": {{"N": "{uid}"}}, '
            f'"v": {{"S": "{v}"}}}}, '
            if v is not None
            else ""
        )
        rows.append(
            (
                ev,
                f'{{"Keys": {{"uid": {{"N": "{uid}"}}}}, {img}'
                f'"SequenceNumber": "{seq}", '
                f'"ApproximateCreationDateTime": 1719565200}}',
            )
        )
    df21 = spark.createDataFrame(rows[:3], "eventName string, dynamodb string")
    df40 = spark.createDataFrame(rows[3:], "eventName string, dynamodb string")

    out21 = parse_dynamodb_stream(
        df21, payload_fields=[("v", "string")], key_field="uid",
        key_type="long", seq_base=str(base21),
    ).orderBy("lsn").collect()
    assert [r["lsn"] for r in out21] == [0, 5, 3 * 10 ** 18 + 9]
    assert [r["v"] for r in out21] == ["a", "b", "c"]

    # 40-digit values against a 40-digit base: exact two-limb subtract
    out40 = (
        parse_dynamodb_stream(
            df40, payload_fields=[("v", "string")], key_field="uid",
            key_type="long", seq_base=str(base40),
        )
        .orderBy("lsn")
        .collect()
    )
    assert [r["lsn"] for r in out40] == [2, 10 ** 17]
    assert [r["op"] for r in out40] == ["INSERT", "DELETE"]

    # end-to-end: real-width stream merges with standard LWW semantics
    schema = T.StructType(
        [
            T.StructField("uid", T.LongType()),
            T.StructField("v", T.StringType()),
            T.StructField("ts_ms", T.LongType()),
        ]
    )
    tbl = LakeTable.create(
        spark, str(tmp_path / "ddb"), schema, pk_fields=["uid"],
        order_fields=["lsn", "ts_ms"], num_buckets=2,
    )
    parsed = parse_dynamodb_stream(
        df21, payload_fields=[("v", "string")], key_field="uid",
        key_type="long", seq_base=str(base21),
    )
    tbl.merge(parsed)
    got = {r.uid: r.v for r in tbl.read().collect()}
    assert got == {1: "c"}  # highest sequence number wins


def test_dynamodb_overflow_fails_fast(spark):
    """A real-width SequenceNumber whose offset from seq_base does not
    fit in int64 must ABORT the job (raise_error), never silently
    quarantine the stream; garbage/NULL sequence numbers still take the
    standard NULL-lsn quarantine path."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    from dataingestion_spark.sources.cdc_formats import parse_dynamodb_stream

    mk = lambda seq: (
        "INSERT",
        '{"Keys": {"uid": {"N": "1"}}, '
        '"NewImage": {"uid": {"N": "1"}, "v": {"S": "a"}}, '
        f'"SequenceNumber": {seq}, '
        '"ApproximateCreationDateTime": 1719565200}',
    )
    # 21-digit value against the default base "0": offset can't fit
    big = spark.createDataFrame(
        [mk('"' + str(10 ** 20) + '"')], "eventName string, dynamodb string"
    )
    with pytest.raises((SparkRuntimeException, Py4JJavaError)) as ei:
        parse_dynamodb_stream(
            big, payload_fields=[("v", "string")], key_field="uid",
            key_type="long",
        ).collect()
    assert "seq_base" in str(ei.value)

    # sequence BEFORE the base (negative offset) also fails fast
    before = spark.createDataFrame(
        [mk('"5"')], "eventName string, dynamodb string"
    )
    with pytest.raises((SparkRuntimeException, Py4JJavaError)):
        parse_dynamodb_stream(
            before, payload_fields=[("v", "string")], key_field="uid",
            key_type="long", seq_base="10",
        ).collect()

    # non-numeric / missing sequence -> NULL lsn (quarantine path)
    junk = spark.createDataFrame(
        [mk('"not-a-number"'), mk("null")],
        "eventName string, dynamodb string",
    )
    got = parse_dynamodb_stream(
        junk, payload_fields=[("v", "string")], key_field="uid",
        key_type="long",
    ).collect()
    assert [r["lsn"] for r in got] == [None, None]

    # malformed seq_base rejected at plan time
    with pytest.raises(ValueError):
        parse_dynamodb_stream(
            junk, payload_fields=[("v", "string")], key_field="uid",
            key_type="long", seq_base="12x",
        )


def test_dynamodb_bool_attribute_arm(spark):
    """DynamoDB booleans arrive as {"BOOL": true}; a boolean-typed
    payload field reads the .BOOL arm (VERDICT r4 #6)."""
    from dataingestion_spark.sources.cdc_formats import parse_dynamodb_stream

    rows = [
        ("INSERT",
         '{"Keys": {"uid": {"N": "1"}}, '
         '"NewImage": {"uid": {"N": "1"}, "active": {"BOOL": true}, '
         '"v": {"S": "a"}}, '
         '"SequenceNumber": "100", "ApproximateCreationDateTime": 1719565200}'),
        ("MODIFY",
         '{"Keys": {"uid": {"N": "1"}}, '
         '"NewImage": {"uid": {"N": "1"}, "active": {"BOOL": false}, '
         '"v": {"S": "b"}}, '
         '"SequenceNumber": "101", "ApproximateCreationDateTime": 1719565201}'),
    ]
    df = spark.createDataFrame(rows, "eventName string, dynamodb string")
    got = parse_dynamodb_stream(
        df,
        payload_fields=[("active", "boolean"), ("v", "string")],
        key_field="uid", key_type="long",
    ).orderBy("lsn").collect()
    assert [r["active"] for r in got] == [True, False]
    assert [r["v"] for r in got] == ["a", "b"]


def test_goldengate_parse(spark):
    """GoldenGate Big Data JSON formatter: before/after row images,
    op_type I/U/D (+T truncate filtered), pos as the zero-padded trail
    ordinal, op_ts with microseconds."""
    from dataingestion_spark.sources.cdc_formats import parse_goldengate

    rows = [
        ('{"table": "HR.EMP", "op_type": "I", '
         '"op_ts": "2024-06-28 09:00:00.000000", '
         '"pos": "00000000020000001000", '
         '"after": {"id": 1, "name": "John", "score": 42}}',),
        ('{"table": "HR.EMP", "op_type": "U", '
         '"op_ts": "2024-06-28 09:00:01.500000", '
         '"pos": "00000000020000002000", '
         '"before": {"id": 1, "name": "John", "score": 42}, '
         '"after": {"id": 1, "name": "John S", "score": 43}}',),
        # a delete's only row image is `before`
        ('{"table": "HR.EMP", "op_type": "D", '
         '"op_ts": "2024-06-28 09:00:02.000000", '
         '"pos": "00000000020000003000", '
         '"before": {"id": 1, "name": "John S", "score": 43}}',),
        # truncate: control record, no row - dropped
        ('{"table": "HR.EMP", "op_type": "T", '
         '"op_ts": "2024-06-28 09:00:03.000000", '
         '"pos": "00000000020000004000"}',),
    ]
    df = spark.createDataFrame(rows, "value string")
    out = parse_goldengate(
        df,
        payload_fields=[("name", "string"), ("score", "int")],
        key_fields=[("id", "long")],
    ).orderBy("lsn")
    got = out.collect()
    assert [r["op"] for r in got] == ["INSERT", "UPDATE", "DELETE"]
    assert [r["id"] for r in got] == [1, 1, 1]  # key resolves on DELETE
    assert got[1]["name"] == "John S" and got[1]["score"] == 43
    assert got[2]["name"] is None and got[2]["score"] is None  # after-only
    assert [r["lsn"] for r in got] == [
        20000001000, 20000002000, 20000003000,
    ]
    assert got[0]["ts_ms"] == 1719565200000
    assert got[1]["ts_ms"] == 1719565201500  # microsecond op_ts kept to ms
    assert got[0]["source_file"] == "HR.EMP"


def test_goldengate_pos_overflow_fails_fast(spark):
    """A trail position past 2^63-1 must abort the job loudly, not
    quarantine the stream (the DynamoDB-adapter discipline); a
    non-numeric pos degrades to NULL row-wise."""
    from pyspark.errors import SparkRuntimeException

    from dataingestion_spark.sources.cdc_formats import parse_goldengate

    over = spark.createDataFrame(
        [('{"table": "T", "op_type": "I", '
          '"op_ts": "2024-06-28 09:00:00.000000", '
          '"pos": "99999999999999999999", "after": {"id": 1}}',)],
        "value string",
    )
    with pytest.raises(SparkRuntimeException, match="64-bit lsn"):
        parse_goldengate(
            over, payload_fields=[], key_fields=[("id", "long")]
        ).collect()

    junk = spark.createDataFrame(
        [('{"table": "T", "op_type": "I", '
          '"op_ts": "2024-06-28 09:00:00.000000", '
          '"pos": "not-a-number", "after": {"id": 1}}',)],
        "value string",
    )
    got = parse_goldengate(
        junk, payload_fields=[], key_fields=[("id", "long")]
    ).collect()
    assert got[0]["lsn"] is None  # quarantine-gate path


def test_canal_parse_multi_row(spark):
    """Canal FlatMessage: one envelope carries MANY rows (data is an
    array); lsn folds (batch id, row index); DELETE's data is the full
    deleted-row image; DDL records are filtered."""
    from dataingestion_spark.sources.cdc_formats import parse_canal

    rows = [
        ('{"id": 3, "database": "shop", "table": "emp", "isDdl": false, '
         '"type": "INSERT", "es": 1719565200000, "ts": 1719565200477, '
         '"data": [{"id": "1", "name": "John", "score": "42"}, '
         '{"id": "2", "name": "Jane", "score": "50"}]}',),
        ('{"id": 4, "database": "shop", "table": "emp", "isDdl": false, '
         '"type": "UPDATE", "es": 1719565201000, "ts": 1719565201477, '
         '"data": [{"id": "1", "name": "John S", "score": "43"}], '
         '"old": [{"name": "John", "score": "42"}]}',),
        ('{"id": 5, "database": "shop", "table": "emp", "isDdl": false, '
         '"type": "DELETE", "es": 1719565202000, "ts": 1719565202477, '
         '"data": [{"id": "2", "name": "Jane", "score": "50"}]}',),
        # DDL record: no rows, filtered
        ('{"id": 6, "database": "shop", "table": "emp", "isDdl": true, '
         '"type": "ALTER", "es": 1719565203000, "ts": 1719565203477, '
         '"sql": "alter table emp add col x int", "data": null}',),
    ]
    df = spark.createDataFrame(rows, "value string")
    out = parse_canal(
        df,
        payload_fields=[("name", "string"), ("score", "int")],
        key_fields=[("id", "long")],
    ).orderBy("lsn")
    got = out.collect()
    assert [r["op"] for r in got] == ["INSERT", "INSERT", "UPDATE", "DELETE"]
    assert [r["id"] for r in got] == [1, 2, 1, 2]
    assert [r["name"] for r in got] == ["John", "Jane", "John S", "Jane"]
    # (batch, row) fold: monotone across batches, ordered within one
    assert [r["lsn"] for r in got] == [
        (3 << 20) + 0, (3 << 20) + 1, (4 << 20) + 0, (5 << 20) + 0,
    ]
    assert got[0]["ts_ms"] == 1719565200000  # es (source time), not ts
    assert got[0]["source_file"] == "shop.emp"


def test_goldengate_canal_dispatch_and_merge(spark, tmp_path):
    """parse_cdc knows the new names; a parsed GoldenGate stream merges
    with standard LWW semantics (trail-position order, not arrival
    order) and a Canal multi-row stream round-trips the same table."""
    from dataingestion_spark.sources.cdc_formats import parse_cdc

    gg_rows = [
        ('{"table": "D.T", "op_type": "I", '
         '"op_ts": "2024-06-28 09:00:00.000000", "pos": "100", '
         '"after": {"id": 1, "v": "a"}}',),
        ('{"table": "D.T", "op_type": "D", '
         '"op_ts": "2024-06-28 09:00:02.000000", "pos": "300", '
         '"before": {"id": 1, "v": "b"}}',),
        ('{"table": "D.T", "op_type": "U", '
         '"op_ts": "2024-06-28 09:00:01.000000", "pos": "200", '
         '"before": {"id": 1, "v": "a"}, "after": {"id": 1, "v": "b"}}',),
        ('{"table": "D.T", "op_type": "I", '
         '"op_ts": "2024-06-28 09:00:03.000000", "pos": "400", '
         '"after": {"id": 2, "v": "z"}}',),
    ]
    parsed = parse_cdc(
        spark.createDataFrame(gg_rows, "value string"),
        "goldengate",
        payload_fields=[("v", "string")],
        key_fields=[("id", "long")],
    )
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("v", T.StringType()),
            T.StructField("ts_ms", T.LongType()),
        ]
    )
    tbl = LakeTable.create(
        spark, str(tmp_path / "gg"), schema, pk_fields=["id"],
        order_fields=["lsn", "ts_ms"], num_buckets=2,
    )
    tbl.merge(parsed)
    got = {r.id: r.v for r in tbl.read().collect()}
    assert got == {2: "z"}  # id=1's winner by pos order is the DELETE

    canal_rows = [
        ('{"id": 9, "database": "d", "table": "t", "isDdl": false, '
         '"type": "INSERT", "es": 1719565204000, "ts": 1719565204100, '
         '"data": [{"id": "1", "v": "back"}, {"id": "3", "v": "c"}]}',),
    ]
    parsed2 = parse_cdc(
        spark.createDataFrame(canal_rows, "value string"),
        "canal",
        payload_fields=[("v", "string")],
        key_fields=[("id", "long")],
    )
    tbl.merge(parsed2, epoch_id=1)
    got = {r.id: r.v for r in tbl.read().collect()}
    assert got == {1: "back", 2: "z", 3: "c"}


def test_detect_cdc_format_column_shapes(spark):
    """Structured envelopes are detected by column shape alone - zero
    data read (works before any record arrives)."""
    from dataingestion_spark.sources.cdc_formats import detect_cdc_format

    shapes = {
        "mysql-binlog": "operation string, table_name string, "
        "primary_key long, data string, binlog_file string, "
        "binlog_position long, timestamp long",
        "mongo-change-stream": "operationType string, ns_coll string, "
        "fullDocument string, documentKey string, clusterTime string, "
        "resumeToken string",
        "aerospike-cdc": "operation string, namespace string, "
        "set_name string, user_key string, bins string, timestamp long, "
        "generation long",
        "clickstream": "event_type string, user_id string, "
        "page_url string, timestamp string, properties string, "
        "ip_address string",
        "maxwell": "database string, table string, type string, ts long, "
        "xid long, position string, data string, old string",
        "dynamodb-stream": "eventName string, dynamodb string",
    }
    for fmt, ddl in shapes.items():
        df = spark.createDataFrame([], ddl)
        assert detect_cdc_format(df) == fmt, fmt


def test_detect_cdc_format_json_sampling(spark):
    """The Kafka-value family is detected from sampled top-level JSON
    keys; every sampled record must agree and ambiguity raises."""
    from dataingestion_spark.sources.cdc_formats import detect_cdc_format

    samples = {
        "debezium": '{"before": null, "after": {"id": 1}, '
        '"source": {"db": "d", "table": "t", "lsn": 1}, "op": "c", '
        '"ts_ms": 1}',
        "goldengate": '{"table": "D.T", "op_type": "I", '
        '"op_ts": "2024-06-28 09:00:00.000000", "pos": "100", '
        '"after": {"id": 1}}',
        "wal2json": '{"action": "I", "schema": "public", "table": "t", '
        '"columns": [{"name": "id", "value": "1"}], '
        '"lsn": "0/16B2C38", "timestamp": "2024-06-28 09:00:00+00"}',
        "canal": '{"id": 1, "database": "d", "table": "t", '
        '"isDdl": false, "type": "INSERT", "es": 1, "ts": 2, '
        '"data": [{"id": "1"}]}',
    }
    for fmt, rec in samples.items():
        df = spark.createDataFrame([(rec,), (rec,)], "value string")
        assert detect_cdc_format(df) == fmt, fmt

    # mixed stream: sampled records disagree -> refuse, don't guess
    mixed = spark.createDataFrame(
        [(samples["debezium"],), (samples["canal"],)], "value string"
    )
    with pytest.raises(ValueError, match="disagree"):
        detect_cdc_format(mixed)

    # unknown envelope -> no match, loud
    junk = spark.createDataFrame([('{"foo": 1}',)], "value string")
    with pytest.raises(ValueError, match="no known format"):
        detect_cdc_format(junk)

    # empty sample -> can't decide
    empty = spark.createDataFrame([], "value string")
    with pytest.raises(ValueError, match="empty sample"):
        detect_cdc_format(empty)

    # no value column and no structural match -> loud
    nocol = spark.createDataFrame([(1,)], "x long")
    with pytest.raises(ValueError, match="no 'value' column"):
        detect_cdc_format(nocol)


def test_detect_then_parse_roundtrip(spark):
    """detect + parse_cdc composes: an unlabeled GoldenGate batch routes
    to the right adapter and parses identically to an explicit call."""
    from dataingestion_spark.sources.cdc_formats import (
        detect_cdc_format,
        parse_cdc,
        parse_goldengate,
    )

    rows = [
        ('{"table": "D.T", "op_type": "I", '
         '"op_ts": "2024-06-28 09:00:00.000000", "pos": "100", '
         '"after": {"id": 1, "v": "a"}}',),
    ]
    df = spark.createDataFrame(rows, "value string")
    fmt = detect_cdc_format(df)
    assert fmt == "goldengate"
    auto = parse_cdc(
        df, fmt, payload_fields=[("v", "string")], key_fields=[("id", "long")]
    ).collect()
    explicit = parse_goldengate(
        df, payload_fields=[("v", "string")], key_fields=[("id", "long")]
    ).collect()
    assert auto == explicit


def _mssql_hex(v: int) -> str:
    return f"0x{v:020X}"


def test_sqlserver_cdc_parse(spark):
    """SQL Server CDC change-table shape (fn_cdc_get_all_changes):
    operation 1/2/4 map to DELETE/INSERT/UPDATE, operation 3 (update
    before-image) is filtered, natively-typed captured columns pass
    through, and the lsn folds (rebased __$start_lsn, __$seqval -
    __$start_lsn) exactly."""
    from dataingestion_spark.sources.cdc_formats import parse_sqlserver_cdc

    base = 0x0000002A000001D80000
    t1, t2 = base + 0x100, base + 0x10000  # two transactions (commit LSNs)
    rows = [
        # txn 1: insert then same-transaction update - seqval is the
        # OPERATION's log LSN, which precedes the commit record, so real
        # streams have seqval BELOW start_lsn (the centered-window case)
        (_mssql_hex(t1), _mssql_hex(t1 - 2), 2, "0x03", 1, "a", 10,
         "2024-06-28 09:00:00"),
        (_mssql_hex(t1), _mssql_hex(t1 - 1), 3, "0x02", 1, "a", 10,
         "2024-06-28 09:00:00"),  # before image: dropped
        (_mssql_hex(t1), _mssql_hex(t1 - 1), 4, "0x02", 1, "b", 11,
         "2024-06-28 09:00:00"),
        # txn 2: delete carries the full deleted row image
        (_mssql_hex(t2), _mssql_hex(t2), 1, "0x03", 1, "b", 11,
         "2024-06-28 09:00:05"),
    ]
    schema = T.StructType(
        [
            T.StructField("__$start_lsn", T.StringType()),
            T.StructField("__$seqval", T.StringType()),
            T.StructField("__$operation", T.IntegerType()),
            T.StructField("__$update_mask", T.StringType()),
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("score", T.IntegerType()),
            T.StructField("tran_end_time", T.StringType()),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    out = parse_sqlserver_cdc(
        df,
        payload_fields=[("name", "string"), ("score", "int")],
        key_fields=[("id", "long")],
        lsn_base=_mssql_hex(base),
        capture_instance="dbo_emp",
    ).orderBy("lsn")
    got = out.collect()
    from dataingestion_spark.sources.cdc_formats import _MSSQL_SLACK

    assert [r["op"] for r in got] == ["INSERT", "UPDATE", "DELETE"]
    slack = _MSSQL_SLACK
    # lsn = seqval - base + slack: the operation's own log LSN rebased
    assert [r["lsn"] for r in got] == [
        0x100 - 2 + slack,   # txn 1 first op
        0x100 - 1 + slack,   # txn 1 second op (one log record later)
        0x10000 + slack,     # txn 2 (seqval == its commit LSN here)
    ]
    assert got[1]["name"] == "b" and got[1]["score"] == 11
    assert got[2]["name"] == "b"  # delete keeps the full row image
    assert got[0]["ts_ms"] == 1719565200000
    assert got[2]["ts_ms"] == 1719565205000
    assert got[0]["source_file"] == "dbo_emp"


def test_sqlserver_lsn_guards(spark):
    """A seqval outside the signed-64 rebased budget (or more than the
    slack below the base: a wrong lsn_base) fails FAST; a multi-block /
    multi-VLF LSN geometry parses fine (the raw numeric jumps are the
    point of the seqval-only design); malformed hex degrades to NULL
    lsn row-wise; a bad lsn_base raises at call time."""
    from pyspark.errors import SparkRuntimeException

    from dataingestion_spark.sources.cdc_formats import parse_sqlserver_cdc

    schema = (
        "`__$start_lsn` string, `__$seqval` string, "
        "`__$operation` int, id long"
    )
    # ordinary real-world geometry: the operation's log record sits in
    # an earlier log BLOCK (and even an earlier VLF) than its commit
    # record - raw numeric distance 2^16 / 2^48 - must NOT abort
    base = 0x2A << 48
    multi = spark.createDataFrame(
        [
            (_mssql_hex(base + (1 << 20)), _mssql_hex(base + (1 << 16)), 2, 1),
            (_mssql_hex(base + (1 << 48)), _mssql_hex(base + (1 << 48) - (1 << 16)), 4, 1),
        ],
        schema,
    )
    from dataingestion_spark.sources.cdc_formats import _MSSQL_SLACK

    got = parse_sqlserver_cdc(
        multi, payload_fields=[], key_fields=[("id", "long")],
        lsn_base=_mssql_hex(base),
    ).orderBy("lsn").collect()
    slack = _MSSQL_SLACK
    assert [r["lsn"] for r in got] == [
        (1 << 16) + slack,
        (1 << 48) - (1 << 16) + slack,
    ]

    far = spark.createDataFrame(
        [(_mssql_hex(1 << 63), _mssql_hex(1 << 63), 2, 1)], schema
    )
    with pytest.raises(SparkRuntimeException, match="lsn_base"):
        parse_sqlserver_cdc(
            far, payload_fields=[], key_fields=[("id", "long")],
            lsn_base="0",
        ).collect()

    # seqval far BELOW the base (beyond the slack): wrong base, loud
    below = spark.createDataFrame(
        [(_mssql_hex(base), _mssql_hex(base - _MSSQL_SLACK - 1), 2, 1)],
        schema,
    )
    with pytest.raises(SparkRuntimeException, match="lsn_base"):
        parse_sqlserver_cdc(
            below, payload_fields=[], key_fields=[("id", "long")],
            lsn_base=_mssql_hex(base),
        ).collect()

    junk = spark.createDataFrame([("zz", "zz", 2, 1)], schema)
    got = parse_sqlserver_cdc(
        junk, payload_fields=[], key_fields=[("id", "long")]
    ).collect()
    assert got[0]["lsn"] is None  # quarantine-gate path

    with pytest.raises(ValueError, match="hex"):
        parse_sqlserver_cdc(
            junk, payload_fields=[], key_fields=[("id", "long")],
            lsn_base="not-hex!",
        )


def test_cockroach_changefeed_parse(spark):
    """CockroachDB wrapped changefeed envelope: after-null deletes,
    positional key array, HLC "<wall-nanos>.<logical>" rebased into the
    lsn fold with the logical counter breaking same-nanosecond ties."""
    from dataingestion_spark.sources.cdc_formats import (
        parse_cockroach_changefeed,
    )

    b = 1_700_000_000_000_000_000
    rows = [
        ('{"after": {"id": 1, "name": "a", "score": 10}, "key": [1], '
         f'"updated": "{b + 1000}.0000000000"}}',),
        # same wall nanosecond, higher logical counter -> later
        ('{"after": {"id": 1, "name": "b", "score": 11}, "key": [1], '
         f'"updated": "{b + 1000}.0000000003"}}',),
        ('{"after": null, "before": {"id": 1}, "key": [1], '
         f'"updated": "{b + 2000}.0000000000"}}',),
    ]
    df = spark.createDataFrame(rows, "value string")
    out = parse_cockroach_changefeed(
        df,
        payload_fields=[("name", "string"), ("score", "int")],
        key_fields=[("id", "long")],
        hlc_base=str(b),
        topic="defaultdb.public.emp",
    ).orderBy("lsn")
    got = out.collect()
    assert [r["op"] for r in got] == ["UPSERT", "UPSERT", "DELETE"]
    assert [r["id"] for r in got] == [1, 1, 1]  # key array covers deletes
    assert [r["lsn"] for r in got] == [
        1000 * 1024, 1000 * 1024 + 3, 2000 * 1024,
    ]
    assert got[1]["name"] == "b" and got[2]["name"] is None
    assert got[0]["ts_ms"] == (b + 1000) // 1_000_000
    assert got[0]["source_file"] == "defaultdb.public.emp"


def test_cockroach_hlc_guards(spark):
    """A wall timestamp before hlc_base (or past the 53-bit window)
    fails FAST with a re-subscribe instruction; an unparsable updated
    field degrades to NULL lsn row-wise."""
    from pyspark.errors import SparkRuntimeException

    from dataingestion_spark.sources.cdc_formats import (
        parse_cockroach_changefeed,
    )

    before_base = spark.createDataFrame(
        [('{"after": {"id": 1}, "key": [1], '
          '"updated": "100.0000000000"}',)],
        "value string",
    )
    with pytest.raises(SparkRuntimeException, match="hlc_base"):
        parse_cockroach_changefeed(
            before_base, payload_fields=[], key_fields=[("id", "long")],
            hlc_base="1700000000000000000",
        ).collect()

    junk = spark.createDataFrame(
        [('{"after": {"id": 1}, "key": [1], "updated": "garbage"}',)],
        "value string",
    )
    got = parse_cockroach_changefeed(
        junk, payload_fields=[], key_fields=[("id", "long")]
    ).collect()
    assert got[0]["lsn"] is None

    with pytest.raises(ValueError, match="nanoseconds"):
        parse_cockroach_changefeed(
            junk, payload_fields=[], key_fields=[("id", "long")],
            hlc_base="0x10",
        )


def test_detect_sqlserver_and_cockroach(spark):
    """Round-11/12 formats join detection: SQL Server CDC by column
    shape (the __$ envelope columns), CockroachDB by sampled JSON keys -
    and Debezium (which also carries `after`) still resolves uniquely."""
    from dataingestion_spark.sources.cdc_formats import detect_cdc_format

    mssql = spark.createDataFrame(
        [],
        "`__$start_lsn` string, `__$seqval` string, `__$operation` int, "
        "`__$update_mask` string, id long",
    )
    assert detect_cdc_format(mssql) == "sqlserver-cdc"

    crdb = spark.createDataFrame(
        [('{"after": {"id": 1}, "key": [1], '
          '"updated": "1700000000000000000.0000000000"}',)] * 2,
        "value string",
    )
    assert detect_cdc_format(crdb) == "cockroach-changefeed"

    dbz = spark.createDataFrame(
        [('{"before": null, "after": {"id": 1}, '
          '"source": {"lsn": 1}, "op": "c", "ts_ms": 1}',)],
        "value string",
    )
    assert detect_cdc_format(dbz) == "debezium"


def test_sqlserver_cockroach_dispatch_and_merge(spark, tmp_path):
    """Both new adapters compose with the standard pipeline: parse_cdc
    dispatch -> canonical relation -> keyed LWW merge -> final state."""
    from dataingestion_spark.sources.cdc_formats import parse_cdc

    base = 0x01
    rows = [
        (_mssql_hex(base + 1), _mssql_hex(base + 1), 2, 1, "a"),
        (_mssql_hex(base + 2), _mssql_hex(base + 2), 4, 1, "b"),
        (_mssql_hex(base + 3), _mssql_hex(base + 3), 2, 2, "c"),
        (_mssql_hex(base + 4), _mssql_hex(base + 4), 1, 2, "c"),
    ]
    mssql = spark.createDataFrame(
        rows,
        "`__$start_lsn` string, `__$seqval` string, `__$operation` int, "
        "id long, name string",
    )
    canon = parse_cdc(
        mssql, "sqlserver-cdc",
        payload_fields=[("name", "string")], key_fields=[("id", "long")],
        lsn_base=_mssql_hex(base),
    )
    tbl = LakeTable.create(
        spark,
        str(tmp_path / "mssql_tbl"),
        T.StructType(
            [
                T.StructField("id", T.LongType(), False),
                T.StructField("name", T.StringType()),
            ]
        ),
        pk_fields=["id"],
        order_fields=["lsn"],
        num_buckets=4,
    )
    tbl.merge(
        canon.withColumn("ts_ms", F.lit(0).cast("long"))
        .withColumn("source_file", F.lit("t")),
        pipeline_id="p", epoch_id=0,
    )
    final = {r["id"]: r["name"] for r in tbl.read().collect()}
    assert final == {1: "b"}  # id 2 inserted then deleted

    b = 1_700_000_000_000_000_000
    crdb_rows = [
        ('{"after": {"id": 1, "name": "x"}, "key": [1], '
         f'"updated": "{b + 1}.0000000000"}}',),
        ('{"after": {"id": 1, "name": "y"}, "key": [1], '
         f'"updated": "{b + 2}.0000000000"}}',),
        ('{"after": null, "key": [2], '
         f'"updated": "{b + 3}.0000000000"}}',),
    ]
    crdb = spark.createDataFrame(crdb_rows, "value string")
    canon2 = parse_cdc(
        crdb, "cockroach-changefeed",
        payload_fields=[("name", "string")], key_fields=[("id", "long")],
        hlc_base=str(b),
    )
    tbl2 = LakeTable.create(
        spark,
        str(tmp_path / "crdb_tbl"),
        T.StructType(
            [
                T.StructField("id", T.LongType(), False),
                T.StructField("name", T.StringType()),
            ]
        ),
        pk_fields=["id"],
        order_fields=["lsn"],
        num_buckets=4,
    )
    tbl2.merge(
        canon2.withColumn("ts_ms", F.lit(0).cast("long"))
        .withColumn("source_file", F.lit("t")),
        pipeline_id="p", epoch_id=0,
    )
    final2 = {r["id"]: r["name"] for r in tbl2.read().collect()}
    assert final2 == {1: "y"}


# --- encode/decode round-trip properties for the limb-arithmetic adapters ---

_rt_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),          # key
        st.integers(min_value=0, max_value=2),          # 0=ins 1=upd 2=del
        st.text(alphabet="abcxyz 0123", min_size=0, max_size=8),
    ),
    min_size=1,
    max_size=12,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_rt_events)
def test_sqlserver_roundtrip_property(spark, events):
    """For ANY change stream, encoding it into the SQL Server CDC
    change-table shape and parsing back yields exactly the canonical
    relation - the rebased-seqval lsn is an order-preserving injection."""
    from dataingestion_spark.sources.cdc_formats import parse_sqlserver_cdc

    base = 0x0000002A000001D80000
    ops = ["INSERT", "UPDATE", "DELETE"]
    codes = [2, 4, 1]
    rows = [
        (
            f"0x{base + 2 * i:020X}",
            # odd rows mimic reality: the operation's log record (and so
            # its seqval) precedes the transaction's commit LSN
            f"0x{base + 2 * i - (i % 2):020X}",
            codes[op_idx],
            k,
            text,
        )
        for i, (k, op_idx, text) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows,
        "`__$start_lsn` string, `__$seqval` string, `__$operation` int, "
        "id long, name string",
    )
    got = sorted(
        parse_sqlserver_cdc(
            df,
            payload_fields=[("name", "string")],
            key_fields=[("id", "long")],
            lsn_base=f"0x{base:020X}",
        ).collect(),
        key=lambda r: r["lsn"],
    )
    from dataingestion_spark.sources.cdc_formats import _MSSQL_SLACK

    want = sorted(
        (
            (ops[op_idx], k, text, 2 * i - (i % 2) + _MSSQL_SLACK)
            for i, (k, op_idx, text) in enumerate(events)
        ),
        key=lambda t: t[3],
    )
    assert [(r["op"], r["id"], r["name"], r["lsn"]) for r in got] == want


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_rt_events)
def test_cockroach_roundtrip_property(spark, events):
    """For ANY change stream, encoding it as CockroachDB changefeed
    envelopes (realistic 19-digit HLC walls, nonzero logical counters)
    and parsing back yields exactly the canonical relation."""
    from dataingestion_spark.sources.cdc_formats import (
        parse_cockroach_changefeed,
    )

    b = 1_700_000_000_000_000_000
    rows = []
    for i, (k, op_idx, text) in enumerate(events):
        updated = f"{b + i * 7}.{(i * 13) % 1024:010d}"
        if op_idx == 2:
            rows.append(
                (f'{{"after": null, "key": [{k}], "updated": "{updated}"}}',)
            )
        else:
            rows.append(
                (
                    f'{{"after": {{"id": {k}, "name": "{text}"}}, '
                    f'"key": [{k}], "updated": "{updated}"}}',
                )
            )
    df = spark.createDataFrame(rows, "value string")
    got = sorted(
        parse_cockroach_changefeed(
            df,
            payload_fields=[("name", "string")],
            key_fields=[("id", "long")],
            hlc_base=str(b),
        ).collect(),
        key=lambda r: r["lsn"],
    )
    want = sorted(
        (
            (
                "DELETE" if op_idx == 2 else "UPSERT",
                k,
                None if op_idx == 2 else text,
                (i * 7) * 1024 + (i * 13) % 1024,
                (b + i * 7) // 1_000_000,
            )
            for i, (k, op_idx, text) in enumerate(events)
        ),
        key=lambda t: t[3],
    )
    assert [
        (r["op"], r["id"], r["name"], r["lsn"], r["ts_ms"]) for r in got
    ] == want


def test_detect_wal2json_with_control_records(spark):
    """Real wal2json dumps interleave B/C (begin/commit) transaction
    control records that carry no schema key; detection must count them
    as wal2json votes instead of refusing the whole stream."""
    from dataingestion_spark.sources.cdc_formats import detect_cdc_format

    rows = [
        ('{"action": "B", "xid": 741}',),
        ('{"action": "I", "schema": "public", "table": "t", '
         '"columns": [{"name": "id", "value": "1"}], '
         '"lsn": "0/16B2C38", "timestamp": "2024-06-28 09:00:00+00"}',),
        ('{"action": "C", "xid": 741}',),
    ]
    df = spark.createDataFrame(rows, "value string")
    assert detect_cdc_format(df) == "wal2json"


def test_detect_skips_debezium_tombstones(spark):
    """Kafka NULL values (Debezium post-delete tombstones) are a normal
    part of any topic with deletes - they are skipped during sampling,
    and an all-tombstone sample refuses with a widen-the-range hint."""
    from dataingestion_spark.sources.cdc_formats import detect_cdc_format

    dbz = ('{"before": null, "after": {"id": 1}, '
           '"source": {"lsn": 1}, "op": "c", "ts_ms": 1}')
    mixed = spark.createDataFrame(
        [(None,), (dbz,), (None,)], "value string"
    )
    assert detect_cdc_format(mixed) == "debezium"

    only_tombstones = spark.createDataFrame(
        [(None,), (None,)], "value string"
    )
    with pytest.raises(ValueError, match="tombstones"):
        detect_cdc_format(only_tombstones)


def test_detect_sqlserver_signature_wins_over_captured_columns(spark):
    """A capture instance whose SOURCE columns coincide with another
    format's signature (here: Maxwell's database/table/type/position/
    data) must still detect as sqlserver-cdc - the reserved __$
    namespace is checked first."""
    from dataingestion_spark.sources.cdc_formats import detect_cdc_format

    df = spark.createDataFrame(
        [],
        "`__$start_lsn` string, `__$seqval` string, `__$operation` int, "
        "database string, table string, type string, position string, "
        "data string",
    )
    assert detect_cdc_format(df) == "sqlserver-cdc"


def test_sqlserver_overlong_hex_quarantines(spark):
    """Hex wider than 20 digits must degrade to NULL lsn (quarantine),
    not silently left-truncate to a wrong but plausible ordinal."""
    from dataingestion_spark.sources.cdc_formats import parse_sqlserver_cdc

    df = spark.createDataFrame(
        [("0x" + "A" * 22, "0x" + "A" * 22, 2, 1)],
        "`__$start_lsn` string, `__$seqval` string, `__$operation` int, "
        "id long",
    )
    got = parse_sqlserver_cdc(
        df, payload_fields=[], key_fields=[("id", "long")]
    ).collect()
    assert got[0]["lsn"] is None


def test_cockroach_hlc_base_value_bound(spark):
    """A 19-digit hlc_base past int64 max must raise the adapter's own
    ValueError, not an obscure literal-overflow at plan construction."""
    from dataingestion_spark.sources.cdc_formats import (
        parse_cockroach_changefeed,
    )

    df = spark.createDataFrame([("x",)], "value string")
    with pytest.raises(ValueError, match="64-bit"):
        parse_cockroach_changefeed(
            df, payload_fields=[], key_fields=[("id", "long")],
            hlc_base="9999999999999999999",
        )


def test_canal_missing_isddl_not_dropped(spark):
    """A FlatMessage without the isDdl key (older canal versions omit
    it) is a data record - three-valued NULL != 'true' logic must not
    silently discard it."""
    from dataingestion_spark.sources.cdc_formats import parse_canal

    rows = [
        ('{"id": 7, "database": "d", "table": "t", "type": "INSERT", '
         '"es": 1000, "ts": 1001, "data": [{"id": "1", "v": "x"}]}',),
    ]
    df = spark.createDataFrame(rows, "value string")
    got = parse_canal(
        df, payload_fields=[("v", "string")], key_fields=[("id", "long")]
    ).collect()
    assert len(got) == 1 and got[0]["op"] == "INSERT" and got[0]["v"] == "x"


def test_detect_action_keyed_stranger_still_refuses(spark):
    """The wal2json control-record fallback is shape-bound: a non-
    wal2json producer that merely reuses an "action" field with foreign
    keys must still refuse loudly, not misroute to an all-filtered
    parse."""
    from dataingestion_spark.sources.cdc_formats import detect_cdc_format

    df = spark.createDataFrame(
        [('{"action": "C", "foo": 1}',)], "value string"
    )
    with pytest.raises(ValueError, match="no known format"):
        detect_cdc_format(df)
