"""Deterministic sf1 testdata: inflate the sf0.1 fixtures 10× with key
remapping, builder-side, no driver dependency (VERDICT r9 #6).

The SCALING sweep previously topped out at sf0.1 (~600 k lineitem), so
the "at-worst-linear" claim rested on one measured decade.  This builds
a second decade under /tmp (digest-keyed on the sf0.1 source files via
``fixture_roots.ensure_built``, so regenerated testdata mints a new
root) by replicating the four fact tables REPS× with disjoint key
spaces:

- ``events``: event_id / user_id shifted per replica (10× users, same
  date span — the axis the per-user A/B and decay operators shard on);
- ``documents``: doc_id shifted; replica r > 0 suffixes every token
  with ``_r{r}``, so each replica is an ISOMORPHIC copy of the corpus
  over a disjoint vocabulary — the original near-dup/cluster structure
  repeats exactly 10× (duplicate pairs scale linearly), while no
  cross-replica shingle can collide into a pathological 10-clone
  near-dup clique that would make candidate generation look
  super-linear for data-shape (not engine) reasons;
- ``embeddings``: vec_id shifted; replica r rotates every vector by r
  positions — one orthogonal transform per replica, so within-replica
  cosines (and thus the ANN structure) are EXACTLY preserved and
  cross-replica vectors are decorrelated but deterministic;
- ``lineitem``: l_orderkey / l_partkey / l_suppkey shifted — 10× the
  (l_suppkey, l_returnflag) training groups, the 1,115 → 1M-groups
  axis of the grouped trainer.

Dimension tables and ``orders`` are copied verbatim (the sf1 sweep
queries read only the inflated facts; the copies keep the directory a
complete, loadable sf dir).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

REPS = 10
_VERSION = "v1"
COPY_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
)


def _reps(spark: SparkSession):
    return F.broadcast(
        spark.range(REPS).select(F.col("id").cast("int").alias("__rep"))
    )


def _shift(col: str, space: int):
    return (F.col(col) + F.col("__rep").cast("long") * F.lit(space)).alias(col)


def _id_spaces(df, *cols: str) -> list[int]:
    """Smallest power of 10 above each column's max id — replica key
    ranges are disjoint and human-readable (replica = leading digit).
    ONE aggregate pass per table regardless of how many id columns are
    remapped (code-review r10: the per-column version scanned lineitem
    three times just for maxes)."""
    row = df.agg(*[F.max(c).alias(c) for c in cols]).first()
    spaces = []
    for c in cols:
        space = 1
        while space <= row[c]:
            space *= 10
        spaces.append(space)
    return spaces


def ensure_sf1(spark: SparkSession, base: str = "/root/testdata/sf0.1") -> str:
    import sys

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from sales_forecast_mlops_at_scale_spark.plans.fixture_roots import (
        digest_root,
        ensure_built,
    )

    root = digest_root("sfspark_sf1_testdata", [base], [_VERSION, REPS])

    def build(staging: str) -> None:
        os.makedirs(staging, exist_ok=True)
        for t in COPY_TABLES:
            shutil.copy(
                os.path.join(base, f"{t}.parquet"),
                os.path.join(staging, f"{t}.parquet"),
            )
        reps = _reps(spark)

        # events — ts stays raw nanos-as-long bigint; the catalog's
        # load_table converts on read exactly as for the driver fixtures
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        ev = spark.read.parquet(os.path.join(base, "events.parquet"))
        eid_s, uid_s = _id_spaces(ev, "event_id", "user_id")
        ev_out = ev.crossJoin(reps).select(
            _shift("event_id", eid_s),
            "ts",
            _shift("user_id", uid_s),
            "event_type",
            "value",
            "props",
        )
        ev_out.repartition(16).write.parquet(
            os.path.join(staging, "events.parquet")
        )

        # documents — disjoint vocabulary per replica (see module doc)
        _inflate_documents(spark, base, staging, reps)

        # embeddings — per-replica rotation (orthogonal ⇒ within-replica
        # cosines exactly preserved); replica 0 is the original corpus,
        # so the fixed q-vector set (vec_id < 8) is unchanged
        emb = spark.read.parquet(os.path.join(base, "embeddings.parquet"))
        dim = len(emb.select("embedding").first()[0])
        # the rotation slices assume at least REPS positions to rotate
        # through; a shorter fixture would yield invalid slice lengths
        # and a confusing downstream error instead of this precondition
        # (ADVICE r10)
        if dim < REPS:
            raise ValueError(
                f"embedding dim {dim} < REPS {REPS}: the per-replica "
                "rotation needs dim >= REPS to stay orthogonal"
            )
        rotated = F.expr(
            f"concat(slice(embedding, __rep + 1, {dim} - __rep), "
            "slice(embedding, 1, __rep))"
        )
        (vid_s,) = _id_spaces(emb, "vec_id")
        emb_out = emb.crossJoin(reps).select(
            _shift("vec_id", vid_s),
            rotated.alias("embedding"),
            "label",
        )
        emb_out.repartition(16).write.parquet(
            os.path.join(staging, "embeddings.parquet")
        )

        # lineitem — 10× (l_suppkey, l_returnflag) training groups
        _inflate_lineitem(spark, base, staging, reps)

    return ensure_built(root, "_SF1_COMPLETE", build)


def _inflate_documents(spark, src_dir: str, dst_dir: str, reps) -> None:
    """Replicate documents with a per-replica token suffix (disjoint
    vocabulary families — see module doc).  Applying it to an ALREADY
    inflated corpus composes cleanly: outer replica r re-suffixes every
    token, so the 10 inner vocabularies split into 100 disjoint ones and
    the near-dup structure stays exactly isomorphic per copy."""
    docs = spark.read.parquet(os.path.join(src_dir, "documents.parquet"))
    suffixed = F.array_join(
        F.transform(
            F.split(F.col("text"), r"\s+"),
            lambda t: F.concat(t, F.lit("_r"), F.col("__rep").cast("string")),
        ),
        " ",
    )
    text2 = F.when(F.col("__rep") == 0, F.col("text")).otherwise(suffixed)
    (did_s,) = _id_spaces(docs, "doc_id")
    docs_out = docs.crossJoin(reps).select(
        _shift("doc_id", did_s),
        text2.alias("text"),
        "lang",
        "source",
        F.length(text2).cast("long").alias("n_chars"),
    )
    docs_out.repartition(16).write.parquet(
        os.path.join(dst_dir, "documents.parquet")
    )


def _inflate_lineitem(spark, src_dir: str, dst_dir: str, reps) -> None:
    li = spark.read.parquet(os.path.join(src_dir, "lineitem.parquet"))
    ok_s, pk_s, sk_s = _id_spaces(li, "l_orderkey", "l_partkey", "l_suppkey")
    others = [
        c
        for c in li.columns
        if c not in ("l_orderkey", "l_partkey", "l_suppkey")
    ]
    li_out = li.crossJoin(reps).select(
        _shift("l_orderkey", ok_s),
        _shift("l_partkey", pk_s),
        _shift("l_suppkey", sk_s),
        *others,
    )
    li_out.repartition(32).write.parquet(
        os.path.join(dst_dir, "lineitem.parquet")
    )


def ensure_sf10(spark: SparkSession, base: str = "/root/testdata/sf0.1") -> str:
    """THIRD self-generated decade (VERDICT r10 #2), targeted: inflate
    the sf1 decade another 10× for ONLY the fact tables the three
    rising-ratio queries read — lineitem (q_train_metrics /
    q_forecast_7d, the grouped-map trainer axis: ~111 k training
    groups) and documents (q_split_leakage's pair search, 100 disjoint
    isomorphic corpora).  Everything else is copied verbatim from sf1
    so the directory stays a complete, loadable sf dir.  ~1.2 GB under
    /tmp, digest-keyed like sf1."""
    import sys

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from sales_forecast_mlops_at_scale_spark.plans.fixture_roots import (
        digest_root,
        ensure_built,
    )

    sf1 = ensure_sf1(spark, base)
    root = digest_root("sfspark_sf10_testdata", [sf1], [_VERSION, REPS])

    def build(staging: str) -> None:
        os.makedirs(staging, exist_ok=True)
        for t in COPY_TABLES + ("events", "embeddings"):
            src = os.path.join(sf1, f"{t}.parquet")
            dst = os.path.join(staging, f"{t}.parquet")
            if os.path.isdir(src):
                shutil.copytree(src, dst)
            else:
                shutil.copy(src, dst)
        reps = _reps(spark)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        _inflate_documents(spark, sf1, staging, reps)
        _inflate_lineitem(spark, sf1, staging, reps)

    return ensure_built(root, "_SF10_COMPLETE", build)


if __name__ == "__main__":
    import sys

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from sales_forecast_mlops_at_scale_spark.session import get_spark

    spark = get_spark("make-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    print(ensure_sf1(spark))
    spark.stop()
