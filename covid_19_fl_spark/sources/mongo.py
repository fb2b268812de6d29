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


# ---------------------------------------------------------------------------
# Pushdown contract (recorded-options level): what the connector sends
# server-side for the reference's hand-written Mongo calls. Verified
# against the reference shapes in tests without a Mongo server.
# ---------------------------------------------------------------------------

_OPS = {
    "=": None,  # bare equality — Mongo's implicit form
    "<": "$lt",
    "<=": "$lte",
    ">": "$gt",
    ">=": "$gte",
    "!=": "$ne",
    "in": "$in",
}


def filters_to_mongo(filters: list[tuple[str, str, object]]) -> dict:
    """Translate pushed-down (column, op, value) predicates into the
    Mongo filter document the connector would send. Conjunction is
    Mongo's implicit top-level AND; ``=`` uses the bare
    ``{field: value}`` form the reference writes by hand
    (cv.py:113 ``find({"travel": "Under Investigation"}, ...)``,
    cv-stats.py:38-51 ``find({"date_added": {"$lt": today}})``).

    Mixed predicates on one column compose: ``=`` upgrades to an
    explicit ``{"$eq": v}`` whenever the column also carries (or later
    gains) an operator document, since indexing an operator into a
    bare scalar is malformed — e.g. ``[('age','>=',18),('age','=',30)]``
    → ``{'age': {'$gte': 18, '$eq': 30}}``. Duplicate operators on the
    same column (contradictory or range-refining conjuncts) fall back
    to an explicit top-level ``$and``, as does a DICT-valued equality
    that later gains another predicate — a dict equality is a literal
    subdocument match, so it moves to the overflow as an explicit
    ``$eq`` rather than being misread as an operator document (and the
    caller's dict is never mutated)."""
    doc: dict = {}
    bare: set = set()  # columns whose doc[col] is a bare equality VALUE
    extra: list[dict] = []  # $and overflow for duplicate ops
    for col, op, value in filters:
        if op not in _OPS:
            raise ValueError(f"unsupported pushdown op: {op!r}")
        mongo_op = "$eq" if op == "=" else _OPS[op]
        if col not in doc:
            if op == "=":
                doc[col] = value  # reference's bare implicit-equality form
                bare.add(col)
            else:
                doc[col] = {mongo_op: value}
            continue
        if col in bare:
            prev = doc[col]
            bare.discard(col)
            if isinstance(prev, dict):
                # A dict-valued equality is a LITERAL subdocument match,
                # not an operator document — never merge operators into
                # it (that would both corrupt semantics and mutate the
                # caller's dict). Route it through the $and overflow as
                # an explicit $eq and start a fresh operator doc.
                extra.append({col: {"$eq": prev}})
                doc[col] = {mongo_op: value}
                continue
            doc[col] = {"$eq": prev}  # new dict: upgrade without mutating
        cur = doc[col]
        if mongo_op in cur:
            extra.append({col: {mongo_op: value}})
        else:
            cur[mongo_op] = value
    if extra:
        return {"$and": [doc, *extra]}
    return doc


def find_to_pipeline(
    filters: list[tuple[str, str, object]] | None = None,
    projection: list[str] | None = None,
) -> list[dict]:
    """Aggregation-pipeline equivalent of a pushed filter+projection
    scan — the server-side work V2ScanRelationPushDown hands the
    connector for ``read_collection(...).filter(...).select(...)``."""
    stages: list[dict] = []
    if filters:
        stages.append({"$match": filters_to_mongo(filters)})
    if projection:
        stages.append({"$project": {f: 1 for f in projection}})
    return stages


def group_max_pipeline(field: str) -> list[dict]:
    """The reference's max-watermark aggregate (cv.py:93-100
    ``aggregate([{"$group": {"_id": None, "max_case": {"$max":
    "$case_number"}}}])``) — what ``df.agg(F.max(field))`` subsumes."""
    return [{"$group": {"_id": None, f"max_{field}": {"$max": f"${field}"}}}]
