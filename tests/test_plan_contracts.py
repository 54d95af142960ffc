"""Frozen-golden contracts for the two runtime paths this sandbox cannot
execute (no Iceberg runtime jar, no Kafka connector jar, no network).

The refusal behavior is pinned elsewhere (tests/test_tables.py,
tests/test_streaming.py, tests/test_cli.py); THESE tests pin the exact
artifacts the paths would hand the missing runtimes — the DataFrameWriterV2
call-chain spec, the Iceberg DDL text, the Kafka source option map, and the
value-deserialization plan that runs downstream of any source — so an
environment WITH the jars needs zero code change and any drift in the
contracts fails loudly here first.  Both specs are load-bearing: the
production code paths build their call chains FROM them.
"""

from __future__ import annotations

import re


class TestIcebergContract:
    def test_write_spec_golden(self):
        from geowave_spark.sources.tables import iceberg_write_spec

        assert iceberg_write_spec("cat.db.points") == {
            "api": "DataFrameWriterV2",
            "table": "cat.db.points",
            "using": "iceberg",
            "partitioned_by": ["tier"],
            "within_file_order": ["tier", "cell"],
            "finish": "createOrReplace",
            "ddl_twin": "iceberg_ddl",
        }

    def test_spec_methods_exist_on_writer_v2(self, spark):
        """Every call the spec names resolves on the real DataFrameWriterV2 —
        so the chain can't drift from the pyspark API it targets."""
        from geowave_spark.sources.tables import iceberg_write_spec

        spec = iceberg_write_spec("cat.db.t")
        writer = spark.range(1).writeTo(spec["table"])
        assert callable(getattr(writer, "using"))
        assert callable(getattr(writer, "partitionedBy"))
        assert callable(getattr(writer, spec["finish"]))

    def test_ddl_golden(self):
        from geowave_spark.sources.tables import iceberg_ddl

        got = iceberg_ddl(
            "cat.db.docs_indexed",
            {"doc_id": "string", "cell": "bigint", "tier": "int"},
        )
        assert got == (
            "CREATE TABLE cat.db.docs_indexed (\n"
            "  doc_id string,\n"
            "  cell bigint,\n"
            "  tier int\n"
            ")\n"
            "USING iceberg\n"
            "PARTITIONED BY (tier)\n"
            "TBLPROPERTIES ('write.distribution-mode'='hash')\n"
            ";\n"
            "ALTER TABLE cat.db.docs_indexed WRITE ORDERED BY (tier, cell);"
        )


class TestKafkaContract:
    def test_source_options_golden(self):
        from geowave_spark.streaming.ingest import kafka_source_options

        assert kafka_source_options("broker1:9092,broker2:9092", "docs") == {
            "kafka.bootstrap.servers": "broker1:9092,broker2:9092",
            "subscribe": "docs",
            "startingOffsets": "earliest",
        }
        assert kafka_source_options(
            "b:9092", "docs", starting_offsets="latest", max_offsets_per_trigger=50_000
        ) == {
            "kafka.bootstrap.servers": "b:9092",
            "subscribe": "docs",
            "startingOffsets": "latest",
            "maxOffsetsPerTrigger": "50000",
        }

    def test_value_pipeline_plan_golden(self, spark, tmp_path):
        """The value-deserialization plan (the part that runs downstream of
        ANY source — Kafka hands the same binary `value` column a file
        source does) is frozen: two projections, from_json with the docs
        schema, no extra shuffle-introducing nodes."""
        from geowave_spark.streaming.ingest import parse_docs_payload

        (tmp_path / "seed.txt").write_text('{"doc_id":"a","spans":[]}')
        raw = spark.readStream.format("text").schema("value string").load(str(tmp_path))
        df = parse_docs_payload(raw)
        plan = df._jdf.queryExecution().analyzed().toString()
        lines = [
            re.sub(r"#\d+", "#N", ln).strip()
            for ln in plan.splitlines()
            if "StreamingRelation" not in ln  # source line carries tmp paths
        ]
        assert lines == [
            "~Project [d#N.doc_id AS doc_id#N, d#N.spans AS spans#N]",
            "+- ~Project [from_json(StructField(doc_id,StringType,true), "
            "StructField(spans,ArrayType(StructType(StructField(kind,StringType,true),"
            "StructField(text,StringType,true),StructField(media_ref,StringType,true),"
            "StructField(offset,IntegerType,true)),true),true), "
            "cast(value#N as string), Some(UTC), false) AS d#N]",
        ]
