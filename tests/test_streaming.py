

def test_stream_cc_cdc_split_invariance(spark):
    """run_stream_cc_cdc: re-batching a CDC op sequence (respecting
    the within-batch convention: deletes apply against the pre-batch
    state, inserts after) leaves the labels identical, and they equal
    batch CC of the net edge set (adds, splits, heals, vanishing
    nodes all present)."""
    from terminus_server_spark.operators.graph import connected_components
    from terminus_server_spark.streaming.events import run_stream_cc_cdc

    schema = "op string, src long, dst long"
    b1 = [("add", i, i + 1) for i in range(12)] + [("add", 20, 21)]
    b2 = [("del", 4, 5), ("del", 9, 8), ("del", 20, 21)]
    b3 = [("add", 4, 5)]
    three = [spark.createDataFrame(b, schema) for b in (b1, b2, b3)]
    # batches 2+3 merged: its dels hit the post-batch-1 state, its
    # add applies after — the same net under the convention
    two = [
        spark.createDataFrame(b1, schema),
        spark.createDataFrame(b2 + b3, schema),
    ]
    got3 = {(r.node, r.component)
            for r in run_stream_cc_cdc(spark, three).collect()}
    got2 = {(r.node, r.component)
            for r in run_stream_cc_cdc(spark, two).collect()}
    net = [(i, i + 1) for i in range(12) if (i, i + 1) != (8, 9)]
    want = {(r.node, r.component)
            for r in connected_components(
                spark.createDataFrame(net, "src long, dst long")).collect()}
    want |= {(20, 20), (21, 21)}  # vanished pair stays as singletons
    assert got3 == want
    assert got2 == want
