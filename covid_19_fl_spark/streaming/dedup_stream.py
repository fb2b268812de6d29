"""Streaming near-duplicate filtering against a persisted LSH index —
the continuous form of llmops.dedup.minhash_lsh_pairs.

A pre-training ingestion pipeline never sees the corpus at once:
documents arrive continuously and each batch must be deduplicated
against EVERYTHING accepted so far. Re-running batch LSH over the full
corpus per arrival is O(corpus) per batch; instead the accepted set is
maintained as two incrementally-appended tables:

- ``bands``    (doc_id, band_idx, band_hash) — the LSH index probed by
               each new batch with a plain equi-join (at scale: parquet
               partitioned/bucketed by band_hash, so a probe touches
               the matching buckets, not the index).
- ``shingles`` (doc_id, shingles) — hashed shingle sets for the exact
               Jaccard verify of band-collision candidates.

Per micro-batch (foreachBatch, sequential by contract so the
read-probe-append cycle is race-free):

1. greedy in-batch dedup: keep the min-id member of each verified
   near-dup pair inside the batch;
2. probe the band index, verify candidates vs the shingle store, drop
   batch docs near-dup of anything accepted earlier;
3. append survivors to the output table and their bands/shingles to
   the index (``append_new`` keyed on doc_id keeps a replayed batch —
   restart after checkpoint loss — idempotent).

Everything hashes with the portable family, so the accepted set is
byte-stable across restarts and reruns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamWriter

from ..llmops.dedup import hashed_word_shingles, jaccard, minhash_bands
from ..sinks.batch import ParquetTable


def _verified_dups(
    cand: DataFrame, new_sh: DataFrame, old_sh: DataFrame, threshold: float
) -> DataFrame:
    """(new_id, old_id) candidates → new_ids whose Jaccard vs the old
    doc clears the threshold (the ids to DROP)."""
    return (
        cand.join(new_sh.withColumnsRenamed({"doc_id": "new_id", "shingles": "sh_n"}), "new_id")
        .join(old_sh.withColumnsRenamed({"doc_id": "old_id", "shingles": "sh_o"}), "old_id")
        .filter(jaccard(F.col("sh_n"), F.col("sh_o")) >= threshold)
        .select(F.col("new_id").alias("doc_id"))
        .distinct()
    )


def write_near_dedup(
    stream: DataFrame,
    out: ParquetTable,
    bands_index: ParquetTable,
    shingle_store: ParquetTable,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    n: int = 3,
    threshold: float = 0.5,
) -> DataStreamWriter:
    """Continuous near-dup curation sink; caller picks the trigger."""

    def _batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        batch = batch.dropDuplicates([id_col])
        base = batch.select(
            F.col(id_col).alias("doc_id"),
            hashed_word_shingles(F.col(text_col), n).alias("shingles"),
        ).cache()
        banded = minhash_bands(base, num_hashes=num_hashes, bands=bands)

        # 1. in-batch greedy dedup: a doc loses to any smaller-id
        #    near-dup in the same batch (pairs via the band self-join).
        in_cand = (
            banded.select(F.col("doc_id").alias("old_id"), "band_idx", "band_hash")
            .join(
                banded.select(F.col("doc_id").alias("new_id"), "band_idx", "band_hash"),
                ["band_idx", "band_hash"],
            )
            .filter(F.col("new_id") > F.col("old_id"))
            .select("new_id", "old_id")
            .dropDuplicates(["new_id", "old_id"])
        )
        drop_in = _verified_dups(in_cand, base, base, threshold)

        # 2. probe the persisted index.
        if bands_index.exists():
            idx_cand = (
                banded.join(drop_in, "doc_id", "left_anti")
                .select(F.col("doc_id").alias("new_id"), "band_idx", "band_hash")
                .join(
                    bands_index.read().select(
                        F.col("doc_id").alias("old_id"), "band_idx", "band_hash"
                    ),
                    ["band_idx", "band_hash"],
                )
                .select("new_id", "old_id")
                .dropDuplicates(["new_id", "old_id"])
            )
            drop_idx = _verified_dups(idx_cand, base, shingle_store.read(), threshold)
            dropped = drop_in.unionByName(drop_idx).distinct()
        else:
            dropped = drop_in

        # Materialize the survivor set ONCE: the three sinks below each
        # execute their input plan twice (count/isEmpty + write), so an
        # uncached `survivors` would re-run the band self-join, index
        # probe, and Jaccard verify ~6× per batch.
        survivors = batch.join(
            dropped.withColumnRenamed("doc_id", id_col), id_col, "left_anti"
        ).cache()
        out.append_new(survivors, id_col, exact=True)
        surv_ids = survivors.select(F.col(id_col).alias("doc_id"))
        shingle_store.append_new(base.join(surv_ids, "doc_id"), "doc_id", exact=True)
        # bands are multi-row per doc: append only docs not yet indexed
        fresh_bands = banded.join(surv_ids, "doc_id")
        if bands_index.exists():
            fresh_bands = fresh_bands.join(
                bands_index.read().select("doc_id").distinct(), "doc_id", "left_anti"
            )
        if not fresh_bands.isEmpty():
            bands_index.append(fresh_bands)
        survivors.unpersist()
        base.unpersist()

    return stream.writeStream.foreachBatch(_batch).option(
        "checkpointLocation", checkpoint_dir
    )
