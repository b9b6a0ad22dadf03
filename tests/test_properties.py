"""Property-based checks (hypothesis): the Spark dedup + merge operators
agree with a direct Python model of the reference semantics
(IcebergTableOperator.java:58-125, BaseDeltaTaskWriter.java:52-72) on
arbitrary batches."""

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from debezium_server_iceberg_spark.operators.dedup import OP_PRIORITY, dedup_batch
from debezium_server_iceberg_spark.operators.merge import merge_dataframes

KEYS = st.integers(min_value=0, max_value=5)
OPS = st.sampled_from(["c", "i", "r", "u", "d"])
TS = st.integers(min_value=0, max_value=3)

events = st.lists(
    st.tuples(KEYS, OPS, TS, st.integers(min_value=-100, max_value=100)),
    min_size=1,
    max_size=25,
)

SCHEMA = "k long, __op string, __source_ts_ms long, payload long, seq long"


def _model_dedup(rows):
    """Reference comparator: max by (ts, op-priority, batch order)."""
    best = {}
    for seq, (k, op, ts, payload) in enumerate(rows):
        cand = (ts, OP_PRIORITY[op], seq, op, payload)
        if k not in best or cand > best[k]:
            best[k] = cand
    return {k: (op, ts, payload) for k, (ts, _, _, op, payload) in best.items()}


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(events)
def test_dedup_batch_matches_reference_model(spark, rows):
    df = spark.createDataFrame(
        [(k, op, ts, p, i) for i, (k, op, ts, p) in enumerate(rows)], SCHEMA
    )
    got = {
        r["k"]: (r["__op"], r["__source_ts_ms"], r["payload"])
        for r in dedup_batch(
            df, ["k"], dedup_column="__source_ts_ms", tiebreak_col="seq"
        ).collect()
    }
    assert got == _model_dedup(rows)


def _model_merge(target, changes, keep_deletes):
    """target: {k: payload}; changes: {k: (op, payload)} (already deduped)."""
    out = dict(target)
    for k, (op, payload) in changes.items():
        if op == "d" and not keep_deletes:
            out.pop(k, None)
        else:
            out[k] = payload  # update, insert, or soft-delete row
    return out


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.dictionaries(KEYS, st.integers(-100, 100), max_size=6),
    st.dictionaries(KEYS, st.tuples(OPS, st.integers(-100, 100)), max_size=6),
    st.booleans(),
)
def test_merge_dataframes_matches_reference_model(spark, target, changes, keep):
    tgt_schema = "k long, __op string, payload long"
    tgt = spark.createDataFrame(
        [(k, "r", p) for k, p in target.items()] or [], tgt_schema
    )
    src = spark.createDataFrame(
        [(k, op, p) for k, (op, p) in changes.items()] or [], tgt_schema
    )
    got_rows = merge_dataframes(tgt, src, ["k"], keep_deletes=keep).collect()
    got = {r["k"]: r["payload"] for r in got_rows}
    assert got == _model_merge(target, changes, keep)
    assert len(got_rows) == len(got)  # exactly one row per key survives


def test_dedup_null_key_guard(spark):
    from debezium_server_iceberg_spark.operators.dedup import assert_no_null_keys

    df = spark.createDataFrame([(1, "u"), (None, "u")], "k long, __op string")
    with pytest.raises(Exception, match="null identifier field"):
        assert_no_null_keys(df, ["k"]).collect()


# ---- schema evolution properties (no Spark jobs — pure StructType algebra)

from pyspark.sql import types as T  # noqa: E402

from debezium_server_iceberg_spark.schema.evolution import (  # noqa: E402
    merge_schemas,
    schemas_equal,
)

_TYPES = [T.IntegerType(), T.LongType(), T.FloatType(), T.DoubleType(), T.StringType()]
_names = st.sampled_from(["a", "b", "c", "d", "e"])
_structs = st.dictionaries(_names, st.sampled_from(_TYPES), min_size=0, max_size=5).map(
    lambda d: T.StructType([T.StructField(k, v, True) for k, v in sorted(d.items())])
)


def _compatible(a, b):
    widenable = {("integer", "long"), ("float", "double")}
    for f in a.fields:
        for g in b.fields:
            if f.name == g.name and f.dataType != g.dataType:
                p = (f.dataType.typeName(), g.dataType.typeName())
                if p not in widenable and (p[1], p[0]) not in widenable:
                    return False
    return True


@settings(max_examples=60, deadline=None, suppress_health_check=list(HealthCheck))
@given(_structs, _structs)
def test_merge_schemas_union_and_idempotent(a, b):
    from debezium_server_iceberg_spark.schema.evolution import SchemaEvolutionError

    if not _compatible(a, b):
        with pytest.raises(SchemaEvolutionError):
            merge_schemas(a, b)
        return
    m = merge_schemas(a, b)
    # contains every field name from both sides
    assert {f.name for f in m.fields} == {f.name for f in a.fields} | {
        f.name for f in b.fields
    }
    # table-side field order preserved as prefix
    assert [f.name for f in m.fields[: len(a.fields)]] == [f.name for f in a.fields]
    # idempotent: merging the incoming again changes nothing
    assert schemas_equal(merge_schemas(m, b), m)
    assert schemas_equal(merge_schemas(m, a), m)


def test_near_dup_clusters_connected_components(spark):
    from debezium_server_iceberg_spark.functions.dedup import near_dup_clusters

    # two chains and a singleton pair: {1-2-3-4}, {10-11}, {20-21-22}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (21, 20), (21, 22)],
        "doc_a long, doc_b long",
    )
    expected = {
        1: (1, True), 2: (1, False), 3: (1, False), 4: (1, False),
        10: (10, True), 11: (10, False),
        20: (20, True), 21: (20, False), 22: (20, False),
    }
    # both execution paths must agree: driver union-find (small graph)
    # and distributed pointer doubling (threshold forced to 0)
    for thr in (2_000_000, 0):
        got = {
            r["doc"]: (r["cluster_id"], r["is_canonical"])
            for r in near_dup_clusters(pairs, small_edge_threshold=thr).collect()
        }
        assert got == expected, f"threshold={thr}"


def test_near_dup_clusters_pointer_doubling_long_chain(spark):
    """A 10k-node path graph (worst-case diameter) must converge in
    O(log d) rounds — the pointer-doubling guarantee; plain min-label
    propagation would need ~10k rounds."""
    from pyspark.sql import functions as F

    from debezium_server_iceberg_spark.functions.dedup import near_dup_clusters

    n = 10_000
    pairs = spark.range(n - 1).select(
        F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
    )
    got = near_dup_clusters(pairs, max_rounds=14, small_edge_threshold=0)
    agg = got.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("cluster_id").alias("clusters"),
        F.sum(F.col("is_canonical").cast("int")).alias("canon"),
        F.min("cluster_id").alias("root"),
    ).collect()[0]
    assert (agg["n"], agg["clusters"], agg["canon"], agg["root"]) == (n, 1, 1, 0)


# --------------------------------------------------------------- avro codec


_AVRO_PRIMS = st.sampled_from(["boolean", "int", "long", "string", "bytes", "double"])


def _value_for(schema, draw):
    if isinstance(schema, list):  # optional
        inner = next(s for s in schema if s != "null")
        return None if draw(st.booleans()) else _value_for(inner, draw)
    t = schema["type"] if isinstance(schema, dict) else schema
    if t == "boolean":
        return draw(st.booleans())
    if t == "int":
        return draw(st.integers(min_value=-(2**31), max_value=2**31 - 1))
    if t == "long":
        return draw(st.integers(min_value=-(2**63), max_value=2**63 - 1))
    if t == "double":
        return draw(st.floats(allow_nan=False, allow_infinity=False))
    if t == "string":
        return draw(st.text(max_size=20))
    if t == "bytes":
        return draw(st.binary(max_size=20))
    if t == "array":
        return [_value_for(schema["items"], draw) for _ in range(draw(st.integers(0, 4)))]
    if t == "map":
        return {
            draw(st.text(min_size=1, max_size=8)): _value_for(schema["values"], draw)
            for _ in range(draw(st.integers(0, 3)))
        }
    if t == "record":
        return {f["name"]: _value_for(f["type"], draw) for f in schema["fields"]}
    raise AssertionError(t)


@st.composite
def _avro_case(draw):
    n_fields = draw(st.integers(1, 5))
    fields = []
    for i in range(n_fields):
        base = draw(
            st.one_of(
                _AVRO_PRIMS,
                st.builds(
                    lambda it: {"type": "array", "items": it}, _AVRO_PRIMS
                ),
                st.builds(
                    lambda vt: {"type": "map", "values": vt}, _AVRO_PRIMS
                ),
            )
        )
        if draw(st.booleans()):
            base = ["null", base]
        fields.append({"name": f"f{i}", "type": base, "default": None} if isinstance(base, list) else {"name": f"f{i}", "type": base})
    schema = {"type": "record", "name": "rec", "fields": fields}
    records = [
        {f["name"]: _value_for(f["type"], draw) for f in fields}
        for _ in range(draw(st.integers(0, 5)))
    ]
    return schema, records


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(case=_avro_case())
def test_avro_codec_roundtrips_arbitrary_schemas(case, tmp_path_factory):
    """Property: for arbitrary record schemas (primitives, optionals,
    arrays, maps), write_container -> read_container is the identity."""
    import os
    import uuid

    from debezium_server_iceberg_spark.lakehouse.avro_io import (
        read_container,
        write_container,
    )

    schema, records = case
    path = os.path.join(
        str(tmp_path_factory.mktemp("avro")), f"{uuid.uuid4().hex}.avro"
    )
    write_container(path, schema, records)
    got_schema, got, _meta = read_container(path)
    assert got_schema == schema
    assert got == records


_colloc_docs = st.lists(
    st.lists(
        st.sampled_from(["aa", "bb", "cc", "dd", "ee"]),
        min_size=0, max_size=8,
    ),
    min_size=1, max_size=12,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(_colloc_docs)
def test_collocation_lift_matches_python_reference(spark, docs):
    """collocation_top_pairs against a brute-force Python model: same
    surviving pairs, counts, and exact integer lifts (min_count=2 so
    tiny corpora still produce candidates)."""
    from collections import Counter

    from debezium_server_iceberg_spark.functions.corpus import (
        collocation_top_pairs,
    )

    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {
        (r["w1"], r["w2"]): (r["pair_count"], r["lift_scaled"], r["rank"])
        for r in collocation_top_pairs(df, top_n=100, min_count=2).collect()
    }
    pair_c, uni_c = Counter(), Counter()
    for toks in docs:
        uni_c.update(toks)
        pair_c.update(zip(toks, toks[1:]))
    total = sum(uni_c.values())
    want = {
        p: (c, (1_000_000 * c * total) // (uni_c[p[0]] * uni_c[p[1]]))
        for p, c in pair_c.items() if c >= 2
    }
    assert {p: v[:2] for p, v in got.items()} == want
    # ranking is (lift desc, w1, w2) dense over the survivors
    ordered = sorted(want.items(), key=lambda kv: (-kv[1][1], kv[0]))
    for rank0, (p, _) in enumerate(ordered):
        assert got[p][2] == rank0 + 1


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.lists(st.floats(-4, 4, allow_nan=False, width=32),
                 min_size=4, max_size=4),
        min_size=9, max_size=24, unique_by=lambda v: tuple(v),
    ),
    st.integers(1, 5),
)
def test_cluster_balanced_sample_model(spark, vecs, budget):
    """Assignment matches the nearest-seed model (lowest-id seeds,
    sequential fold, ties to lower id); per-cluster picks are exactly
    the budget-lowest md5(id)s of that cluster's members."""
    import hashlib

    from debezium_server_iceberg_spark.functions.curation import (
        cluster_balanced_sample,
    )

    k = 4
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {}
    for r in cluster_balanced_sample(df, k=k, per_cluster=budget).collect():
        got.setdefault(r["cluster_id"], []).append((r["pick_rank"], r["vec_id"]))
    seeds = rows[:k]
    def d2(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + (x - y) * (x - y)
        return acc
    members = {}
    for i, v in rows:
        best = min(seeds, key=lambda s: (d2(v, s[1]), s[0]))
        members.setdefault(best[0], []).append(i)
    want = {
        cid: [
            (j + 1, vid)
            for j, vid in enumerate(
                sorted(ms, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))[:budget]
            )
        ]
        for cid, ms in members.items()
    }
    assert {c: sorted(v) for c, v in got.items()} == {
        c: sorted(v) for c, v in want.items() if v
    }
