

def test_merge_readd_of_base_row_does_not_duplicate(spark):
    """A branch 'add' of a triple already present in base (no opposing
    del, so no conflict) must keep set semantics — exactly one row in
    the merged result, matching the reference's layer model."""
    from pyspark.sql import functions as F

    from terminus_server_spark.versioning.layers import merge_branches

    key = ["graph", "subject", "predicate", "obj"]
    base = spark.createDataFrame(
        [("g", "s1", "p", "v1"), ("g", "s2", "p", "v2")],
        "graph string, subject string, predicate string, obj string",
    )
    left = spark.createDataFrame(
        [("add", "g", "s1", "p", "v1")],  # re-add of an existing base row
        "op string, graph string, subject string, predicate string, obj string",
    )
    right = spark.createDataFrame(
        [("add", "g", "s3", "p", "v3")],
        "op string, graph string, subject string, predicate string, obj string",
    )
    merged, conflicts = merge_branches(base, left, right, key)
    assert conflicts.count() == 0
    rows = sorted(map(tuple, merged.collect()))
    assert rows == [
        ("g", "s1", "p", "v1"),
        ("g", "s2", "p", "v2"),
        ("g", "s3", "p", "v3"),
    ]
    assert merged.groupBy(*key).count().where(F.col("count") > 1).count() == 0


def test_commit_dag_log_walk_min_depth(spark):
    from terminus_server_spark.versioning.dag import log_from, log_walk

    # diamond on top of a chain: f <- e <- d(merge of b,c) ; b,c <- a
    commits = spark.createDataFrame(
        [
            ("a", [], "u", "root", None),
            ("b", ["a"], "u", "left", None),
            ("c", ["a"], "u", "right", None),
            ("d", ["b", "c"], "u", "merge", None),
            ("e", ["d"], "u", "next", None),
            ("f", ["e"], "u", "head", None),
        ],
        "commit_id string, parent_ids array<string>, author string, "
        "message string, committed_at timestamp_ntz",
    )
    depths = {r["commit_id"]: r["depth"] for r in log_walk(commits, "f").collect()}
    assert depths == {"f": 0, "e": 1, "d": 2, "b": 3, "c": 3, "a": 4}
    # walk from an interior ref sees only its ancestors
    assert {r["commit_id"] for r in log_walk(commits, "b").collect()} == {"b", "a"}
    # metadata join: merge commit reports both parents
    log = {r["commit_id"]: r["n_parents"] for r in log_from(commits, "f").collect()}
    assert log["d"] == 2 and log["a"] == 0
