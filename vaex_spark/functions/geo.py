"""Geo accessor: coordinate transforms as pure Column trigonometry.

Reference: vaex-core/vaex/geo.py (DataFrameAccessorGeo :7-376 and the
point-in-polygon kernels :377-560).  Every transform there is a string
expression over numpy ufuncs; here each becomes Catalyst Column math on
a copied frame — whole-stage codegen, no UDFs, embarrassingly parallel
at any scale.

Point-in-polygon: the reference uses a C++ ray-casting kernel over
literal polygon vertices (geo.py:377 geo_inside_polygon).  Polygons are
driver-side literals, so the even-odd crossing test unrolls into a sum
of per-edge WHEN conditions — still pure codegen (fine for the typical
tens-to-hundreds of vertices; document larger polygons as a pandas-UDF
fallback).
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

PI = math.pi


def _sinc(v: Column) -> Column:
    """numpy-normalized sinc: sin(pi v)/(pi v), 1 at v=0 (geo.py:212
    aitoff uses np.sinc)."""
    return F.when(v == 0, F.lit(1.0)).otherwise(F.sin(F.lit(PI) * v) / (F.lit(PI) * v))


class DataFrameAccessorGeo:
    """df.geo — vaex-core/vaex/geo.py:7 parity."""

    def __init__(self, df):
        self.df = df

    def _d(self, inplace):
        return self.df if inplace else self.df._copy()

    def _c(self, e) -> Column:
        return self.df._to_expr(e).col.cast("double")

    # -- positions ------------------------------------------------------
    def spherical2cartesian(self, alpha, delta, distance, xname="x", yname="y",
                            zname="z", center=(0, 0, 0), radians=False, inplace=False):
        """geo.py:20 — x = cos a cos d r, y = sin a cos d r, z = sin d r."""
        df = self._d(inplace)
        a, d, r = self._c(alpha), self._c(delta), self._c(distance)
        if not radians:
            a, d = a * PI / 180, d * PI / 180
        df[xname] = F.cos(a) * F.cos(d) * r + F.lit(float(center[0]))
        df[yname] = F.sin(a) * F.cos(d) * r + F.lit(float(center[1]))
        df[zname] = F.sin(d) * r + F.lit(float(center[2]))
        return df

    def cartesian2spherical(self, x="x", y="y", z="z", alpha="l", delta="b",
                            distance="distance", radians=False, center=None, inplace=False):
        """geo.py:62 — distance/azimuth/polar from xyz."""
        df = self._d(inplace)
        cx, cy, cz = self._c(x), self._c(y), self._c(z)
        if center is not None:
            cx, cy, cz = cx - float(center[0]), cy - float(center[1]), cz - float(center[2])
        k = 1.0 if radians else 180.0 / PI
        dist = F.sqrt(cx * cx + cy * cy + cz * cz)
        df[distance] = dist
        df[alpha] = F.atan2(cy, cx) * k
        # try_divide throughout geo: origin/pole/antipode degenerates
        # (dist/r/rxy/sinc/denom = 0) stay null under ANSI-on sessions
        df[delta] = (-F.acos(F.try_divide(cz, dist)) + PI / 2) * k
        return df

    def cartesian_to_polar(self, x="x", y="y", radius_out="r_polar",
                           azimuth_out="phi_polar", radians=False, inplace=False):
        """geo.py:96 — r = hypot(x, y); phi = atan2(y, x)."""
        df = self._d(inplace)
        cx, cy = self._c(x), self._c(y)
        k = 1.0 if radians else 180.0 / PI
        df[radius_out] = F.sqrt(cx * cx + cy * cy)
        df[azimuth_out] = F.atan2(cy, cx) * k
        return df

    # -- velocities -----------------------------------------------------
    def velocity_polar2cartesian(self, x="x", y="y", azimuth=None, vr="vr_polar",
                                 vazimuth="vphi_polar", vx_out="vx", vy_out="vy",
                                 inplace=False):
        """geo.py:128 — vx = vr cos φ - vφ sin φ; vy = vr sin φ + vφ cos φ."""
        df = self._d(inplace)
        cvr, cva = self._c(vr), self._c(vazimuth)
        if azimuth is not None:
            phi = self._c(azimuth) * PI / 180
        else:
            phi = F.atan2(self._c(y), self._c(x))
        df[vx_out] = cvr * F.cos(phi) - cva * F.sin(phi)
        df[vy_out] = cvr * F.sin(phi) + cva * F.cos(phi)
        return df

    def velocity_cartesian2polar(self, x="x", y="y", vx="vx", vy="vy",
                                 radius_polar=None, vr_out="vr_polar",
                                 vazimuth_out="vphi_polar", inplace=False):
        """geo.py:158 — vr = (x vx + y vy)/r; vφ = (x vy - y vx)/r."""
        df = self._d(inplace)
        cx, cy, cvx, cvy = self._c(x), self._c(y), self._c(vx), self._c(vy)
        r = F.sqrt(cx * cx + cy * cy) if radius_polar is None else self._c(radius_polar)
        df[vr_out] = F.try_divide(cx * cvx + cy * cvy, r)
        df[vazimuth_out] = F.try_divide(cx * cvy - cy * cvx, r)
        return df

    def velocity_cartesian2spherical(self, x="x", y="y", z="z", vx="vx", vy="vy",
                                     vz="vz", vr="vr", vlong="vlong", vlat="vlat",
                                     distance=None, inplace=False):
        """geo.py:186 — radial/longitudinal/latitudinal components."""
        df = self._d(inplace)
        cx, cy, cz = self._c(x), self._c(y), self._c(z)
        cvx, cvy, cvz = self._c(vx), self._c(vy), self._c(vz)
        dist = (F.sqrt(cx * cx + cy * cy + cz * cz) if distance is None
                else self._c(distance))
        rxy = F.sqrt(cx * cx + cy * cy)
        df[vr] = F.try_divide(cx * cvx + cy * cvy + cz * cvz, dist)
        df[vlong] = -F.try_divide(cvx * cy - cx * cvy, rxy)
        df[vlat] = -F.try_divide(cz * (cx * cvx + cy * cvy) - (cx * cx + cy * cy) * cvz, dist * rxy)
        return df

    # -- projections ----------------------------------------------------
    def project_aitoff(self, alpha, delta, x="x", y="y", radians=True, inplace=False):
        """geo.py:212 — Aitoff projection via normalized sinc."""
        df = self._d(inplace)
        a, d = self._c(alpha), self._c(delta)
        if not radians:
            a, d = a * PI / 180, d * PI / 180
        aa = F.acos(F.cos(d) * F.cos(a / 2))
        s = _sinc(aa / PI)
        df[x] = F.try_divide(2 * F.cos(d) * F.sin(a / 2), s) / PI
        df[y] = F.try_divide(F.sin(d), s) / PI
        return df

    def project_gnomic(self, alpha, delta, alpha0=0.0, delta0=0.0, x="x", y="y",
                       radians=False, inplace=False):
        """geo.py:233 — gnomic (tangent-plane) projection about a center."""
        df = self._d(inplace)
        a, d = self._c(alpha), self._c(delta)
        if not radians:
            a, d = a * PI / 180, d * PI / 180
            alpha0, delta0 = alpha0 * PI / 180, delta0 * PI / 180
        k = 1.0 if radians else 180.0 / PI
        denom = math.sin(delta0) * F.tan(d) + math.cos(delta0) * F.cos(a - alpha0)
        df[x] = F.try_divide(F.sin(a - alpha0), denom) * k
        df[y] = F.try_divide(math.cos(delta0) * F.tan(d) - math.sin(delta0) * F.cos(a - alpha0), denom) * k
        return df

    def rotation_2d(self, x, y, xnew, ynew, angle_degrees, inplace=False):
        """geo.py:257 — anti-clockwise rotation by a fixed angle."""
        df = self._d(inplace)
        cx, cy = self._c(x), self._c(y)
        th = math.radians(angle_degrees)
        df[xnew] = math.cos(th) * cx - math.sin(th) * cy
        df[ynew] = math.sin(th) * cx + math.cos(th) * cy
        return df

    def bearing(self, lon1, lat1, lon2, lat2, bearing="bearing", inplace=False):
        """geo.py:282 — great-circle initial bearing.  (The reference
        body hardcodes taxi-dataset column names; we implement the
        documented behavior over the passed expressions.)"""
        df = self._d(inplace)
        l1, p1 = self._c(lon1) * PI / 180, self._c(lat1) * PI / 180
        l2, p2 = self._c(lon2) * PI / 180, self._c(lat2) * PI / 180
        df[bearing] = F.atan2(
            F.sin(l2 - l1) * F.cos(p2),
            F.cos(p1) * F.sin(p2) - F.sin(p1) * F.cos(p2) * F.cos(l2 - l1))
        return df

    # -- polygons -------------------------------------------------------
    def inside_polygon(self, x, y, px, py):
        """geo.py:301/377 — boolean Expression: point in ONE polygon
        (even-odd ray casting, unrolled over literal vertices)."""
        from ..expression import Expression
        return Expression(self.df, _inside_polygon_col(self._c(x), self._c(y), px, py))

    def inside_which_polygon(self, x, y, pxs, pys):
        """geo.py:468 — 0-based index of the first polygon containing
        the point, null outside all."""
        from ..expression import Expression
        cx, cy = self._c(x), self._c(y)
        out = F.lit(None).cast("int")
        for i in reversed(range(len(pxs))):
            out = F.when(_inside_polygon_col(cx, cy, pxs[i], pys[i]), F.lit(i)).otherwise(out)
        return Expression(self.df, out)


def _inside_polygon_col(cx: Column, cy: Column, px, py) -> Column:
    """Even-odd rule: count edges whose span crosses the horizontal ray.
    Vertices are literals, so this unrolls to a codegen'd integer sum."""
    px = [float(v) for v in np.asarray(px)]
    py = [float(v) for v in np.asarray(py)]
    n = len(px)
    crossings = F.lit(0)
    for i in range(n):
        j = (i - 1) % n
        x1, y1, x2, y2 = px[i], py[i], px[j], py[j]
        spans = (F.lit(y1) > cy) != (F.lit(y2) > cy)
        if y2 == y1:
            continue  # horizontal edge never crosses the ray
        xint = (F.lit(x2 - x1) * (cy - F.lit(y1)) / F.lit(y2 - y1)) + F.lit(x1)
        crossings = crossings + F.when(spans & (cx < xint), 1).otherwise(0)
    return (crossings % 2) == 1
