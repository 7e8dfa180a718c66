"""Table source/sink contract for the engine's pipelines.

Every pipeline reads and writes through these two functions so the
storage format is a deployment choice, not something baked into each
query (SURVEY.md §1.4/§2.1 names Lance as the canonical production
format for the interleaved document tables; parquet is what this
sandbox ships).

* parquet — pyarrow-backed, always available.
* lance   — used when the `lance` package is importable; otherwise a
            clear error tells the operator what is missing.  The Ray
            integration mirrors the parquet one (Datasource-based
            streaming reads, partitioned writes).
"""

from __future__ import annotations

from typing import Optional, Sequence


def _lance_available() -> bool:
    try:
        import lance  # noqa: F401

        return True
    except ImportError:
        return False


def read_table(path: str, *, columns: Optional[Sequence[str]] = None,
               table_format: str = "parquet", **kwargs):
    """ray.data.Dataset from a table directory/file.

    `table_format`: "parquet" | "lance".  Column pruning is pushed into
    the read for both formats (never load columns a 2-column transform
    doesn't need)."""
    import ray.data as rd

    if table_format == "parquet":
        return rd.read_parquet(path, columns=list(columns) if columns
                               else None, **kwargs)
    if table_format == "lance":
        if not _lance_available():
            raise NotImplementedError(
                "lance format requested but the 'lance' package is not "
                "installed in this environment; use table_format='parquet' "
                "or install pylance")
        return rd.read_lance(path, columns=list(columns) if columns
                             else None, **kwargs)
    raise ValueError(f"unknown table format {table_format!r}")


def write_table(ds, path: str, *, table_format: str = "parquet",
                partition_cols: Optional[Sequence[str]] = None, **kwargs):
    """Write a Dataset as a (optionally partitioned) table.

    Partitioned parquet (one directory per key) is the resumable-output
    layout: a failed run re-reads the manifest and skips finished
    partitions (state/checkpoint.py)."""
    if table_format == "parquet":
        return ds.write_parquet(path, partition_cols=list(partition_cols)
                                if partition_cols else None, **kwargs)
    if table_format == "lance":
        if not _lance_available():
            raise NotImplementedError(
                "lance format requested but the 'lance' package is not "
                "installed in this environment; use table_format='parquet' "
                "or install pylance")
        return ds.write_lance(path, **kwargs)
    raise ValueError(f"unknown table format {table_format!r}")
