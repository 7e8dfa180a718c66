"""Operation kernels: projections, conversions, transformations.

Importing this package populates the operation registry (the analogue of
the reference dispatch table, src/pj_list.h + src/list.cpp:23-29).
"""

from proj_ray.ops.base import REGISTRY, Operation, register  # noqa: F401

# importing each module registers its operations
from proj_ray.ops import (  # noqa: F401,E402
    latlong,
    merc,
    eqc,
    cart,
    axisswap,
    unitconvert,
    helmert,
    tmerc,
    lcc,
    stere,
    laea,
    aea,
    aeqd,
    molodensky,
    affine,
    offsets,
    misc_cyl,
    pseudocyl,
    azimuthal,
    conic_misc,
    gridshift,
    sterea,
    cass,
    horner,
    topocentric,
    geodesic_ops,
    pushpop,
    interrupted,
    misc_sph,
    cube,
    omerc,
    krovak,
    satellite,
    pcyl_poly,
    regional,
    mod_ster,
    bipc_imw,
    sat_orbit,
    healpix,
    misc_oblique,
    special_regional,
    isea,
    adams,
    tinshift,
    deformation,
    gridshift_generic,
    sch,
    defmodel,
)
