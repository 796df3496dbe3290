"""Great-circle and rhumb-line navigation functions — cross-track /
along-track distance to a route, loxodrome (rhumb) distance + bearing,
and the direct geodesic (destination point). All pure column trig on
degree coordinates: whole-stage codegen, no UDF, no shuffle — at 100 TB
each is a per-row projection exactly like the reference's haversine fold
(osmflat/examples/road-length.rs:32-42), and the formula term order is
pinned so doubles reproduce bit-for-bit across engines (the haversine_m
discipline, geo.py:34-47).

Spherical model, standard navigation formulary (Williams' Aviation
Formulary / Movable Type; Bowditch for the rhumb line), radius =
geo.EARTH_RADIUS_M (the reference's constant).
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

from osmflat_rs_spark.functions.geo import EARTH_RADIUS_M

_R = float(EARTH_RADIUS_M)


def central_angle_rad(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Haversine central angle in RADIANS between two degree coordinates
    — ``haversine_m`` without the radius scale, same pinned term order."""
    lat1r = F.radians(lat1)
    lat2r = F.radians(lat2)
    dlat_half = (F.radians(lat2) - F.radians(lat1)) / F.lit(2.0)
    dlon_half = (F.radians(lon2) - F.radians(lon1)) / F.lit(2.0)
    a = (
        F.sin(dlat_half) * F.sin(dlat_half)
        + F.cos(lat1r) * F.cos(lat2r) * F.sin(dlon_half) * F.sin(dlon_half)
    )
    return F.lit(2.0) * F.asin(F.sqrt(a))


def bearing_deg_rad(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Initial great-circle bearing in radians, (-pi, pi], over DEGREE
    coordinates (the fixed-point twin lives in operators/circular.py)."""
    p1 = F.radians(lat1)
    p2 = F.radians(lat2)
    dl = F.radians(lon2) - F.radians(lon1)
    return F.atan2(
        F.sin(dl) * F.cos(p2),
        F.cos(p1) * F.sin(p2) - F.sin(p1) * F.cos(p2) * F.cos(dl),
    )


def _clamp1(x: Column) -> Column:
    """Clamp to [-1, 1] before asin/acos — float noise can push the
    mathematical value an ulp outside. BOTH engines must apply the
    identical clamp (the SQL oracles mirror it) or hash parity breaks
    on the boundary rows."""
    return F.least(F.lit(1.0), F.greatest(F.lit(-1.0), x))


def cross_track_m(
    lat: Column, lon: Column,
    lat1: Column, lon1: Column,
    lat2: Column, lon2: Column,
) -> Column:
    """SIGNED cross-track distance in meters from point (lat, lon) to
    the great circle through route start (lat1, lon1) → end (lat2,
    lon2): asin(sin(d13) * sin(t13 - t12)) * R. Negative = left of the
    route (facing the end), positive = right — the standard route-
    adherence measure."""
    d13 = central_angle_rad(lat1, lon1, lat, lon)
    t13 = bearing_deg_rad(lat1, lon1, lat, lon)
    t12 = bearing_deg_rad(lat1, lon1, lat2, lon2)
    return F.asin(_clamp1(F.sin(d13) * F.sin(t13 - t12))) * F.lit(_R)


def along_track_m(
    lat: Column, lon: Column,
    lat1: Column, lon1: Column,
    lat2: Column, lon2: Column,
) -> Column:
    """Along-track distance in meters: how far along the route's great
    circle (from the start point) the point's perpendicular foot lies.
    acos(cos(d13) / cos(xt_angle)) * R, sign from the along-route
    bearing component (cos(t13 - t12) < 0 → the foot is BEHIND the
    start)."""
    d13 = central_angle_rad(lat1, lon1, lat, lon)
    t13 = bearing_deg_rad(lat1, lon1, lat, lon)
    t12 = bearing_deg_rad(lat1, lon1, lat2, lon2)
    xt = F.asin(_clamp1(F.sin(d13) * F.sin(t13 - t12)))
    at = F.acos(_clamp1(F.cos(d13) / F.cos(xt)))
    sign = F.when(F.cos(t13 - t12) < F.lit(0.0), F.lit(-1.0)).otherwise(F.lit(1.0))
    return sign * at * F.lit(_R)


def _dlon_wrapped(lon1: Column, lon2: Column) -> Column:
    """lon2 - lon1 in radians wrapped to (-pi, pi] — the rhumb line
    takes the short way around the date line."""
    dl = F.radians(lon2) - F.radians(lon1)
    pi = F.lit(math.pi)
    two_pi = F.lit(2.0 * math.pi)
    return F.when(dl > pi, dl - two_pi).when(dl <= -pi, dl + two_pi).otherwise(dl)


def _rhumb_parts(lat1: Column, lon1: Column, lat2: Column, lon2: Column):
    """(dlat_rad, dpsi, q, dlon_rad) — the shared rhumb-line pieces.
    dpsi is the isometric-latitude difference; q = dlat/dpsi degenerates
    to cos(lat1) on an east-west course (|dpsi| < 1e-12, the standard
    Bowditch guard — mirrored verbatim in the SQL oracles)."""
    phi1 = F.radians(lat1)
    phi2 = F.radians(lat2)
    dlat = phi2 - phi1
    quarter_pi = F.lit(math.pi / 4.0)
    dpsi = F.log(
        F.tan(quarter_pi + phi2 / F.lit(2.0)) / F.tan(quarter_pi + phi1 / F.lit(2.0))
    )
    q = F.when(F.abs(dpsi) > F.lit(1e-12), dlat / dpsi).otherwise(F.cos(phi1))
    return dlat, dpsi, q, _dlon_wrapped(lon1, lon2)


def rhumb_distance_m(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Loxodrome (constant-bearing) distance in meters — always >= the
    great-circle distance, equal on meridians and the equator."""
    dlat, _, q, dlon = _rhumb_parts(lat1, lon1, lat2, lon2)
    return F.sqrt(dlat * dlat + q * q * dlon * dlon) * F.lit(_R)


def rhumb_bearing_rad(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Constant rhumb-line bearing in radians, (-pi, pi] — the single
    compass course that connects the two points."""
    _, dpsi, _, dlon = _rhumb_parts(lat1, lon1, lat2, lon2)
    return F.atan2(dlon, dpsi)


def destination_lat_deg(lat: Column, bearing_rad: Column, dist_m: Column) -> Column:
    """Direct geodesic, latitude leg: end latitude (degrees) after
    travelling ``dist_m`` meters on initial ``bearing_rad`` from
    ``lat`` (degrees)."""
    phi1 = F.radians(lat)
    delta = dist_m / F.lit(_R)
    return F.degrees(
        F.asin(
            _clamp1(
                F.sin(phi1) * F.cos(delta)
                + F.cos(phi1) * F.sin(delta) * F.cos(bearing_rad)
            )
        )
    )


def destination_lon_deg(
    lat: Column, lon: Column, bearing_rad: Column, dist_m: Column
) -> Column:
    """Direct geodesic, longitude leg (degrees, NOT renormalized to
    [-180, 180) — the synthetic test domain never leaves it; renormalize
    downstream for date-line routes)."""
    phi1 = F.radians(lat)
    delta = dist_m / F.lit(_R)
    sin_phi2 = _clamp1(
        F.sin(phi1) * F.cos(delta) + F.cos(phi1) * F.sin(delta) * F.cos(bearing_rad)
    )
    return lon + F.degrees(
        F.atan2(
            F.sin(bearing_rad) * F.sin(delta) * F.cos(phi1),
            F.cos(delta) - F.sin(phi1) * sin_phi2,
        )
    )
