"""proj_ray — a Ray-Data-native spatial / coordinate-transformation engine.

A from-scratch reimplementation of the computational semantics of the
reference coordinate-transformation library (OSGeo PROJ, snapshot at
/root/reference) re-expressed as vectorized NumPy kernels applied to
Arrow batches via ``ray.data.Dataset.map_batches``, plus a distributed
spatial core (cell indexing, point-in-polygon joins, kNN, tile
assignment) the reference does not have.

Layout:
    core/       Arrow/NumPy coordinate model, ellipsoids, math helpers
    ops/        operation kernels (projections, conversions, datum shifts)
    functions/  shared scalar/vector functions (geodesics, DMS, ...)
    pipeline    proj-string parser + pipeline composition + Dataset API
    spatial/    cell index, PIP join, kNN, tiles, skew handling
    stages/     Ray Data stage wrappers (map_batches callables, actor pools)
    docs/       interleaved text+media document table synth + span handling
    sources/    I/O (parquet today; lance layout kept compatible)
    state/      checkpoint / manifest handling for resumable runs
"""

__version__ = "0.1.0"

from proj_ray.core.coords import Coords  # noqa: F401
from proj_ray.core.ellipsoid import Ellipsoid, get_ellipsoid  # noqa: F401
from proj_ray.pipeline import create_operation, transform  # noqa: F401
