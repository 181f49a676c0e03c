"""Deterministic-routing tests (consistenthash_test.go analog) + the Spark
bucket/salt expressions."""

from pyspark.sql import functions as F

from lumbermill_spark.route import HashRing, bucket_expr, fnv1a_32, salt_expr, salted_repartition


def test_ring_deterministic_with_injected_hash():
    # consistenthash_test.go:26-72 pattern: identity-ish hash → predictable ring
    ring = HashRing(replicas=3, hash_fn=lambda b: int(b.decode()) if b.decode().isdigit() else sum(b))
    # replicas for "2": 02,12,22 → keys 2,12,22; for "4": 4,14,24; for "6": 6,16,26
    ring.add("6", "4", "2")
    cases = {"2": "2", "11": "2", "23": "4", "27": "2"}
    for k, want in cases.items():
        assert ring.get(k) == want
    ring.add("8")  # keys 8,18,28
    cases.update({"27": "8"})
    for k, want in cases.items():
        assert ring.get(k) == want


def test_ring_insertion_order_independent():
    # consistenthash_test.go:74-99
    a, b = HashRing(replicas=46), HashRing(replicas=46)
    a.add("hostA", "hostB", "hostC")
    for h in ("hostC", "hostA", "hostB"):
        b.add(h)
    for tok in ("t.aaa", "t.bbb", "t.ccc", "anything"):
        assert a.get(tok) == b.get(tok)


def test_fnv1a_reference_vectors():
    # public FNV-1a 32-bit test vectors
    assert fnv1a_32(b"") == 2166136261
    assert fnv1a_32(b"a") == 0xE40C292C
    assert fnv1a_32(b"foobar") == 0xBF9CF968


def test_bucket_expr_stable_and_in_range(spark):
    df = spark.createDataFrame([("t.aaa",), ("t.bbb",), ("t.aaa",)], ["token"])
    out = df.select("token", bucket_expr(F.col("token"), 16).alias("b")).collect()
    by_tok = {}
    for r in out:
        assert 0 <= r["b"] < 16
        by_tok.setdefault(r["token"], set()).add(r["b"])
    assert all(len(v) == 1 for v in by_tok.values())  # same token ⇒ same bucket


def test_salted_repartition_lossless_and_bounded(spark):
    rows = [("t.hot", i) for i in range(400)] + [("t.c%d" % i, 0) for i in range(40)]
    df = spark.createDataFrame(rows, ["token", "turn_idx"])
    out = salted_repartition(df, 8, n_salts=4)
    assert out.count() == 440
    pid = out.withColumn("pid", F.spark_partition_id())
    hot = pid.filter(F.col("token") == "t.hot").select("pid").distinct().count()
    assert 1 < hot <= 4  # hot key spread over >1 but ≤ n_salts partitions


def test_salt_expr_range(spark):
    df = spark.range(100).select(salt_expr(F.col("id").cast("int"), 8).alias("s"))
    vals = {r["s"] for r in df.collect()}
    assert vals <= set(range(8)) and len(vals) > 1
