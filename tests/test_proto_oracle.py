"""proto_files oracle discrimination: the driver's sf tables carry a single
flat shape ({"k": int}), which exercises none of the merge lattice. This
test feeds the SAME registry QuerySpec (Spark fn + DuckDB SQL, both
untouched) a synthetic events corpus that forces every lattice rule —
key union, integer∨number widening, string dominance, null identity,
boolean-vs-integer last-write-wins (fold ORDER matters), top-10
truncation, and invalid/NULL props filtering — and requires cell-exact
agreement between the two independent walkers."""

from __future__ import annotations

import duckdb
import pytest

from schema_inference_spark.queries import registry


def _write_events(spark, tmp_path, props_with_counts):
    rows = []
    i = 0
    for props, n in props_with_counts:
        for _ in range(n):
            rows.append((i, props))
            i += 1
    df = spark.createDataFrame(rows, "event_id long, props string")
    path = str(tmp_path / "events.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(path)
    return path


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("proto_oracle")
    props = [
        # counts are all distinct so the rank (count DESC, schema ASC) is
        # total — the fold order below is therefore pinned exactly
        ('{"a":12,"b":"xy"}', 40),           # rank 1: a=integer, b=string
        ('{"a":1.2345,"c":7}', 30),          # rank 2: a widens integer∨number
        ('{"a":true,"d":null}', 20),         # rank 3: number,boolean -> boolean
        #   (last-write-wins: boolean is NOT widenable with number)
        ('{"a":99,"d":"zz"}', 15),           # rank 4: boolean,integer -> integer
        ('{"e":true}', 10),                  # rank 5: key only here
        ('{"b":123}', 9),                    # b: string∨integer -> string
        ('{"c":null}', 8),                   # c: number after null identity? no:
        #   c seen integer(r2) then null(r7) -> stays integer
        ('{"f":1.5}', 7),                    # ranks 7..10 pad the top-10
        ('{"g":"s"}', 6),
        ('{"h":0.125}', 5),
        ('{"only_rank_11":1}', 4),           # MUST be truncated by top-10
        ("not json at all", 3),              # filtered: invalid JSON
        (None, 2),                           # filtered: NULL props
    ]
    return _write_events(spark, tmp, props)


def _expected_merged():
    # hand-folded through functions/type_inference.py merge_type, in rank
    # order (written independently of both engines):
    return {
        "a": "integer",  # integer -> number -> boolean(last-write) -> integer(last-write)
        "b": "string",   # string -> string (string∨integer)
        "c": "integer",  # integer -> integer (null identity)
        "d": "string",   # null -> string
        "e": "boolean",
        "f": "number",
        "g": "string",
        "h": "number",
        # only_rank_11 truncated
    }


def test_proto_files_oracle_discriminates(spark, corpus):
    spec = registry()["proto_files"]
    sf_dir = str(corpus).rsplit("/events.parquet", 1)[0]
    srows = [
        (r["file_name"], r["content"])
        for r in spec.fn(spark, sf_dir).collect()
    ]

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{corpus}/*.parquet'")
    orows = con.execute(spec.sql).fetchall()

    assert srows == orows, (
        "spark/oracle divergence:\n"
        + "\n".join(f"S {r}" for r in srows)
        + "\n"
        + "\n".join(f"O {r}" for r in orows)
    )

    # and BOTH must equal the hand-derived truth — two engines agreeing on
    # the same wrong answer would otherwise pass
    exp = _expected_merged()
    exp_json = (
        '{"properties":{'
        + ",".join(f'"{k}":{{"type":"{t}"}}' for k, t in sorted(exp.items()))
        + '},"type":"object"}'
    )
    by_name = dict(srows)
    assert by_name["_merged_schema.json"] == exp_json
    proto_type = {"integer": "int32", "number": "float", "boolean": "bool"}
    exp_event = (
        'syntax = "proto3";\nmessage Event {\n'
        + "\n".join(
            f"  {proto_type.get(t, 'string')} {k} = {i};"
            for i, (k, t) in enumerate(sorted(exp.items()), start=1)
        )
        + "\n}"
    )
    assert by_name["Event.proto"] == exp_event
    assert "int32 ts = 4;" in by_name["Metadata.proto"]
