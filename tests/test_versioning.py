

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
