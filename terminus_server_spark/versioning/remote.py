"""Remote sync: clone / fetch / push / pull as layer-pack exchange.

Reference parity: terminus-server ships the git-for-data remote verbs
as pack exchange over immutable store layers (public repo:
src/core/api/db_clone.pl, db_push.pl, db_pull.pl, db_fetch.pl;
layer pack assembly in terminusdb-store).  A push computes the set of
layers the remote's head lacks and ships them; a pull fetches the
remote's missing layers and fast-forwards, or merges when the local
branch diverged; a clone is the full pack.

Spark translation: a store is a ``layers`` DataFrame (see
``layers.py``); the *wire format is itself a DataFrame* — a
parquet-shippable pack of the layers the other side does not have —
so a sync between two clusters is one parquet write + one union, and
the pack size scales with the un-synced delta, never with store
history.  Heads/refs are driver-side integers (refs are metadata the
reference also keeps in a tiny graph — they never touch the data
plane).

Divergence handling reuses ``merge_branches`` (three-way, local-wins
— git's "ours" resolution, with the conflict report surfaced), so a
pull never loses local commits silently.  Fast-forward is the
degenerate merge with an empty local delta: no driver-side branching
is needed and the whole pull stays one lazy plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from terminus_server_spark.versioning.layers import materialize, merge_branches


def pack_layers(layers: DataFrame, above_seq: int) -> DataFrame:
    """The wire pack: every layer a peer whose head is ``above_seq``
    lacks.  A pure commit_seq filter — with layers stored
    commit-partitioned this is a partition-pruned scan, so assembling
    a pack reads only the shipped commits."""
    return layers.where(F.col("commit_seq") > above_seq)


def clone_store(remote: DataFrame) -> DataFrame:
    """Clone = the full pack (head 0 knows nothing).  Layers are
    immutable, so a clone is a reference to the same frames — writing
    it to the clone's location is the only copy that ever happens."""
    return pack_layers(remote, 0)


def push(
    local: DataFrame, remote: DataFrame, remote_head_seq: int
) -> tuple[DataFrame, DataFrame]:
    """Fast-forward push: ship the layers above the remote's known
    head and append them.  Returns ``(new_remote, pack)`` — the pack
    is what crosses the wire (|pack| == |new local commits|, zero
    when the remote is up to date).  Non-fast-forward pushes are the
    caller's error, exactly like the reference (push rejects when the
    remote advanced; pull first)."""
    pack = pack_layers(local, remote_head_seq)
    return remote.unionByName(pack), pack


def bundle(layers: DataFrame) -> DataFrame:
    """``terminusdb bundle``: the whole store — every commit's layer
    rows with commit metadata inline — serialized as ONE
    self-describing JSON-lines artifact (reference: the bundle CLI
    packs a database into a single transportable file; public locus
    src/core/api/db_pack.pl).  One map-only projection; the artifact
    parallelizes to the sink's shard count and any system can
    re-ingest it without this engine."""
    payload = F.to_json(F.struct(*[F.col(c) for c in layers.columns]))
    return layers.select(payload.alias("line"))


def unbundle(lines: DataFrame, schema: str) -> DataFrame:
    """Inverse of :func:`bundle`: parse the JSON-lines artifact back
    into a layers frame with an EXPLICIT schema (no inference scan —
    a bundle can be TBs) — ``unbundle ∘ bundle`` materializes
    bit-identically at every ref."""
    return lines.select(F.from_json(F.col("line"), schema).alias("r")).select("r.*")


def net_delta(layers: DataFrame, above_seq: int, key_cols: list[str]) -> DataFrame:
    """Net op per entity key across the commits above ``above_seq``
    (the newest op wins — intermediate add/del churn collapses), in
    the delta shape ``merge_branches`` consumes: (op, key...).  One
    window over the pack, which scales with the delta."""
    w = Window.partitionBy(*key_cols).orderBy(F.col("commit_seq").desc())
    return (
        pack_layers(layers, above_seq)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "commit_seq", "commit_id")
    )


def pull(
    local: DataFrame,
    remote: DataFrame,
    base_seq: int,
    key_cols: list[str],
) -> tuple[DataFrame, DataFrame]:
    """Fetch + integrate: three-way merge of the local and remote
    net deltas above the common ancestor ``base_seq``, local-wins
    (git's "ours") with the conflict report returned alongside.
    When the local side has no commits above base this *is* a
    fast-forward — the local delta is empty and the remote pack
    applies verbatim — with no driver-side case split.

    Returns ``(merged_state, conflicts)``: the post-pull visible
    state and the keys both sides changed incompatibly."""
    base_state = materialize(local, base_seq, key_cols).drop(
        "commit_seq", "commit_id"
    )
    local_net = net_delta(local, base_seq, key_cols)
    remote_net = net_delta(remote, base_seq, key_cols)
    return merge_branches(base_state, local_net, remote_net, key_cols)
