"""1x/10x scaling probe for the round-5 operators with any
super-linear or serial risk: the typed RDF import parse (after the
staged-projection rewrite), DSIR weighting, and shard assignment.
Run on an idle box: ``python scripts/scaling_r5.py``."""

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from terminus_server_spark.checkpoint import plan_checkpoint  # noqa: E402
from terminus_server_spark.model.triples import (  # noqa: E402
    from_ntriples,
    to_ntriples,
)
from terminus_server_spark.operators.pipeline import (  # noqa: E402
    dsir_weights,
    shard_assign,
)
from terminus_server_spark.session import get_spark  # noqa: E402


def synth_docs(spark, n):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.concat(F.lit(f"w{j}_"), (F.col("id") % (j + 7)).cast("string"))
                for j in range(40)
            ],
        ).alias("text"),
        F.when(F.col("id") % 3 == 0, "en").otherwise("de").alias("lang"),
        F.concat(F.lit("src"), (F.col("id") % 20).cast("string")).alias("source"),
        F.lit(200).alias("n_chars"),
    )


def synth_duration_triples(spark, n):
    k = F.col("id")
    dur = F.when(
        k % 7 == 0, F.concat(F.lit("P"), (k % 3 + 1).cast("string"), F.lit("M"))
    ).otherwise(
        F.concat(
            F.lit("P"), (k % 5).cast("string"), F.lit("DT"),
            (k % 23).cast("string"), F.lit("H"),
            (k % 60).cast("string"), F.lit("M"),
        )
    )
    return spark.range(n).select(
        F.concat(F.lit("Order/"), k.cast("string")).alias("subject"),
        F.lit("lead_time").alias("predicate"),
        dur.alias("obj"),
        F.lit("xsd:duration").alias("obj_type"),
        F.lit(None).cast("string").alias("obj_lang"),
    )


def timed(label, fn):
    t0 = time.time()
    n = fn()
    print(f"{label}: {time.time() - t0:.2f}s ({n} rows)", flush=True)


def main():
    spark = get_spark("tss-scaling-r5")
    spark.sparkContext.setLogLevel("ERROR")
    w = spark.sparkContext.defaultParallelism
    for n in (150_000, 1_500_000):
        lines = plan_checkpoint(
            to_ntriples(synth_duration_triples(spark, n))
            .select("line")
            .repartition(w)
        )
        lines.count()
        timed(
            f"rdf_parse_typed {n}",
            lambda: from_ntriples(lines)
            .where(F.col("obj_num").isNotNull())
            .count(),
        )
    for n in (20_000, 200_000):
        docs = synth_docs(spark, n).localCheckpoint(eager=True)
        timed(f"dsir_weights {n}", lambda: dsir_weights(docs).count())
        timed(f"shard_assign {n}", lambda: shard_assign(docs).count())


if __name__ == "__main__":
    main()
