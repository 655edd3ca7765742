"""Manifest-based file skipping (operators/data_skipping.py): pruning
must be correct (superset of matches, exact after residual filter) and
actually skip files when the layout correlates with the indexed column."""

from __future__ import annotations

from pyspark.sql import functions as F

from pinterest_data_pipeline_spark.operators.data_skipping import (
    build_manifest,
    prune_files,
    read_pruned,
)
from pinterest_data_pipeline_spark.sources.parquet import load_table


def _laid_out_orders(spark, sf_dir, tmp_path) -> str:
    """Write orders range-partitioned + sorted on o_totalprice — the
    layout that makes per-file min/max ranges narrow and disjoint."""
    out = str(tmp_path / "orders_by_price")
    (
        load_table(spark, sf_dir, "orders")
        .repartitionByRange(8, "o_totalprice")
        .sortWithinPartitions("o_totalprice")
        .write.mode("overwrite")
        .parquet(out)
    )
    return out


def test_pruned_read_equals_full_scan(spark, sf_dir, tmp_path):
    path = _laid_out_orders(spark, sf_dir, tmp_path)
    manifest = build_manifest(spark, path, ["o_totalprice"]).cache()
    lo, hi = 100000.0, 150000.0
    got = read_pruned(spark, manifest, "o_totalprice", lo, hi)
    full = (
        spark.read.parquet(path)
        .filter((F.col("o_totalprice") >= lo) & (F.col("o_totalprice") <= hi))
    )
    assert sorted(r["o_orderkey"] for r in got.collect()) == sorted(
        r["o_orderkey"] for r in full.collect()
    )


def test_manifest_actually_skips_files(spark, sf_dir, tmp_path):
    path = _laid_out_orders(spark, sf_dir, tmp_path)
    manifest = build_manifest(spark, path, ["o_totalprice"]).cache()
    n_files = manifest.count()
    assert n_files >= 8
    # a narrow band in a range-partitioned layout touches few files
    survivors = prune_files(manifest, "o_totalprice", 100000.0, 150000.0)
    assert 0 < len(survivors) < n_files / 2, (len(survivors), n_files)


def test_fully_pruned_range_returns_empty_with_schema(spark, sf_dir, tmp_path):
    path = _laid_out_orders(spark, sf_dir, tmp_path)
    manifest = build_manifest(spark, path, ["o_totalprice"]).cache()
    got = read_pruned(spark, manifest, "o_totalprice", 10_000_000.0, 20_000_000.0)
    assert got.count() == 0
    assert "o_orderkey" in got.columns
