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

Pluggable storage (the engine-side analogue of PROJ's user file API,
reference `src/proj.h:446-560` `PROJ_FILE_API` / `proj_context_set_
fileapi`): deployments mount new formats with
`register_table_format(name, reader, writer)` and new path schemes
with `register_filesystem(scheme, factory)` — the factory returns a
pyarrow-compatible filesystem that is handed to the format reader, so
`s3like://bucket/table` style paths resolve without touching query
code.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

# format name -> (reader(path, columns, fs, **kw) -> Dataset,
#                 writer(ds, path, partition_cols, fs, **kw))
_FORMATS: dict = {}
# scheme -> zero-arg factory returning a pyarrow.fs.FileSystem
_FILESYSTEMS: dict = {}


def register_table_format(name: str, reader: Callable,
                          writer: Callable) -> None:
    """Mount a storage format.  `reader(path, columns=None,
    filesystem=None, **kw)` must return a ray.data.Dataset;
    `writer(ds, path, partition_cols=None, filesystem=None, **kw)`
    must persist it."""
    _FORMATS[name] = (reader, writer)


def register_filesystem(scheme: str, factory: Callable) -> None:
    """Mount a path scheme (`scheme://...`).  `factory()` returns a
    pyarrow-compatible filesystem; the scheme prefix is stripped from
    the path before it reaches the format reader/writer."""
    _FILESYSTEMS[scheme] = factory


def resolve_path(path: str):
    """(filesystem | None, path-without-scheme) for a possibly
    scheme-prefixed path.  Unregistered schemes (and plain paths) pass
    through untouched so pyarrow's own s3://, gcs://, hdfs:// handling
    still applies."""
    sep = path.find("://")
    if sep > 0:
        scheme = path[:sep]
        factory = _FILESYSTEMS.get(scheme)
        if factory is not None:
            return factory(), path[sep + 3:]
    return None, path


def _lance_available() -> bool:
    try:
        import lance  # noqa: F401

        return True
    except ImportError:
        return False


def _read_parquet(path, columns=None, filesystem=None, **kwargs):
    import ray.data as rd

    return rd.read_parquet(path, columns=columns,
                           filesystem=filesystem, **kwargs)


def _write_parquet(ds, path, partition_cols=None, filesystem=None,
                   **kwargs):
    return ds.write_parquet(path, partition_cols=partition_cols,
                            filesystem=filesystem, **kwargs)


def _read_lance(path, columns=None, filesystem=None, **kwargs):
    if not _lance_available():
        raise NotImplementedError(
            "lance format requested but the 'lance' package is not "
            "installed in this environment; use table_format='parquet' "
            "or install pylance")
    import ray.data as rd

    return rd.read_lance(path, columns=columns, **kwargs)


def _write_lance(ds, path, partition_cols=None, filesystem=None,
                 **kwargs):
    if not _lance_available():
        raise NotImplementedError(
            "lance format requested but the 'lance' package is not "
            "installed in this environment; use table_format='parquet' "
            "or install pylance")
    return ds.write_lance(path, **kwargs)


register_table_format("parquet", _read_parquet, _write_parquet)
register_table_format("lance", _read_lance, _write_lance)


def read_table(path: str, *, columns: Optional[Sequence[str]] = None,
               table_format: str = "parquet", **kwargs):
    """ray.data.Dataset from a table directory/file.

    `table_format` is any registered format ("parquet" | "lance" by
    default).  Column pruning is pushed into the read (never load
    columns a 2-column transform doesn't need); scheme-prefixed paths
    resolve through the filesystem registry."""
    if table_format not in _FORMATS:
        raise ValueError(f"unknown table format {table_format!r}; "
                         f"registered: {sorted(_FORMATS)}")
    fs, path = resolve_path(path)
    reader, _ = _FORMATS[table_format]
    return reader(path, columns=list(columns) if columns else None,
                  filesystem=fs, **kwargs)


def write_table(ds, path: str, *, table_format: str = "parquet",
                partition_cols: Optional[Sequence[str]] = None, **kwargs):
    """Write a Dataset as a (optionally partitioned) table.

    Partitioned parquet (one directory per key) is the resumable-output
    layout: a failed run re-reads the manifest and skips finished
    partitions (state/checkpoint.py)."""
    if table_format not in _FORMATS:
        raise ValueError(f"unknown table format {table_format!r}; "
                         f"registered: {sorted(_FORMATS)}")
    fs, path = resolve_path(path)
    _, writer = _FORMATS[table_format]
    return writer(ds, path, partition_cols=list(partition_cols)
                  if partition_cols else None, filesystem=fs, **kwargs)
