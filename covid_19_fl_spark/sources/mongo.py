"""MongoDB connector wiring (SURVEY §2.1 S6-S8, §2.2 K1-K2) — the
reference's storage boundary, kept behind a thin option-builder layer.

This container ships neither the Mongo Spark connector jar nor pymongo,
so everything here is *wiring*, exercised in tests only up to the
option-dict contract; on a cluster with
``org.mongodb.spark:mongo-spark-connector`` on the classpath these
return live DataFrames. The connector pushes filters and projections
server-side (V2ScanRelationPushDown), which subsumes the reference's
hand-written Mongo queries:

- ``find({"travel": "Under Investigation"}, {"case_number": 1})``
  (cv.py:113) → ``read(...).filter(...).select(...)`` — both pushed
- ``find({"date_added": {"$lt": today}})`` (cv-stats.py:38-51) →
  ``.filter(col < ...)`` — pushed
- ``aggregate([$group $max])`` (cv.py:93-100) → ``df.agg(max(...))`` —
  Catalyst partial+final agg replaces the shipped pipeline
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..config import EngineConfig


def mongo_options(cfg: EngineConfig, collection: str) -> dict[str, str]:
    """Connector option dict from resolved config (sampleconfig.json /
    env-var pattern, cv-api.py:16-42)."""
    if not cfg.mongodb_uri:
        raise ValueError("mongodb_uri not configured (config.json or MONGODB_URI)")
    return {
        "connection.uri": cfg.mongodb_uri,
        "database": cfg.mongodb_database,
        "collection": collection,
    }


def read_collection(spark: SparkSession, cfg: EngineConfig, collection: str) -> DataFrame:
    """S6/S7 — collection scan; compose ``.filter``/``.select`` on the
    result and the connector pushes both to the server."""
    return spark.read.format("mongodb").options(**mongo_options(cfg, collection)).load()


def write_append(df: DataFrame, cfg: EngineConfig, collection: str) -> None:
    """K1 — append insert (insert_many, cv.py:125)."""
    df.write.format("mongodb").mode("append").options(
        **mongo_options(cfg, collection)
    ).save()


def write_overwrite(df: DataFrame, cfg: EngineConfig, collection: str) -> None:
    """K2 — full refresh (delete_many({}) + insert_many,
    cv-api.py:184-207). The connector's overwrite drops then reloads."""
    df.write.format("mongodb").mode("overwrite").options(
        **mongo_options(cfg, collection)
    ).save()
