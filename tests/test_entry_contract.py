"""Local mirror of the driver's correctness gate: run every queries() entry
on sf0.001 and compare against its oracle_sql() twin through DuckDB
(row-count + column names + order-insensitive values)."""

import math
import os

import pytest

pyspark = pytest.importorskip("pyspark")
duckdb = pytest.importorskip("duckdb")

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    session = (
        SparkSession.builder.master("local[4]")
        .appName("entry-contract")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield session
    session.stop()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    yield con
    con.close()


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6f}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def _canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(tuple(_norm(row[i]) for i in order) for row in rows)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.limit(10).collect()
    assert df.count() >= 0
    assert {"doc_id", "title", "content_extracted"} <= set(df.columns)
    assert rows


ORACLES = entrymod.oracle_sql()
ALL_QUERIES = entrymod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES.keys()))
def test_query_matches_oracle(spark, duck, name):
    assert name in ALL_QUERIES, f"oracle without query: {name}"
    sdf = ALL_QUERIES[name](spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), f"{name}: column mismatch"
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} != {len(duck_rows)}"
    )
    canon_spark = _canon(spark_rows, spark_cols)
    canon_duck = _canon(duck_rows, duck_cols)
    if canon_spark != canon_duck:
        diffs = [
            (a, b) for a, b in zip(canon_spark, canon_duck) if a != b
        ][:3]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


@pytest.mark.parametrize(
    "name", sorted(set(ALL_QUERIES.keys()) - set(ORACLES.keys()))
)
def test_rows_only_queries_run(spark, name):
    df = ALL_QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0


def test_minhash_finds_planted_near_dups(spark):
    """The planted near-duplicates (text + ' extra') must be recovered."""
    df = ALL_QUERIES["dedup_minhash_lsh"](spark, SF_DIR)
    pairs = {(r["doc_id_a"], r["doc_id_b"]) for r in df.collect()}
    planted = {(i, i + 1000000) for i in range(50)}
    found = planted & pairs
    assert len(found) >= 45, f"minhash LSH recall too low: {len(found)}/50"


def test_ann_lsh_recall_against_bruteforce(spark):
    bf = ALL_QUERIES["ann_bruteforce_topk"](spark, SF_DIR).collect()
    lsh = ALL_QUERIES["ann_lsh_topk"](spark, SF_DIR).collect()
    bf_pairs = {(r["query_id"], r["corpus_id"]) for r in bf}
    lsh_pairs = {(r["query_id"], r["corpus_id"]) for r in lsh}
    # LSH with 8 bits on 500 vectors: expect some overlap, full recall not required
    assert lsh_pairs, "LSH returned nothing"
    recall = len(bf_pairs & lsh_pairs) / len(bf_pairs)
    assert recall > 0.05, f"suspiciously low LSH recall: {recall}"


def test_ann_ivf_recall_against_bruteforce(spark):
    bf = ALL_QUERIES["ann_bruteforce_topk"](spark, SF_DIR).collect()
    ivf = ALL_QUERIES["ann_ivf_topk"](spark, SF_DIR).collect()
    bf_pairs = {(r["query_id"], r["corpus_id"]) for r in bf}
    ivf_pairs = {(r["query_id"], r["corpus_id"]) for r in ivf}
    assert ivf_pairs, "IVF returned nothing"
    recall = len(bf_pairs & ivf_pairs) / len(bf_pairs)
    # 4/16 lists probed: decent recall expected on clustered synthetic data
    assert recall > 0.3, f"suspiciously low IVF recall: {recall}"


def test_ann_ivf_deterministic(spark):
    a = sorted(map(tuple, ALL_QUERIES["ann_ivf_topk"](spark, SF_DIR).collect()))
    b = sorted(map(tuple, ALL_QUERIES["ann_ivf_topk"](spark, SF_DIR).collect()))
    assert a == b
