"""Bipolar conic (bipc) and International Map of the World Polyconic
(imw_p) — reference src/projections/{bipc,imw_p}.cpp.
"""

from __future__ import annotations

import numpy as np

from proj_ray.core import mathops as m
from proj_ray.core.coords import Coords, ERR_OUTSIDE_DOMAIN
from proj_ray.ops.base import Operation, Params, ProjError, register


@register
class Bipc(Operation):
    """Bipolar oblique conic conformal of the western hemisphere
    (bipc.cpp).  All projection constants are fixed."""

    name = "bipc"
    lamB = -0.34894976726250681539
    n = 0.63055844881274687180
    F = 1.89724742567461030582
    Azab = 0.81650043674686363166
    Azba = 1.82261843856185925133
    T = 1.27246578267089012270
    rhoc = 1.20709121521568721927
    cAzc = 0.69691523038678375519
    sAzc = 0.71715351331143607555
    C45 = 0.70710678118654752469
    S45 = 0.70710678118654752410
    C20 = 0.93969262078590838411
    S20 = -0.34202014332566873287
    R110 = 1.91986217719376253360
    R104 = 1.81514242207410275904
    ONEEPS = 1.000000001

    def setup(self, params: Params) -> None:
        self.es = 0.0
        self.noskew = params.b("ns")

    def _fwd(self, c: Coords) -> None:
        lam, phi = c.x, c.y
        cphi = np.cos(phi)
        sphi = np.sin(phi)
        with np.errstate(all="ignore"):
            sdlam = self.lamB - lam
            cdlam = np.cos(sdlam)
            sdlam = np.sin(sdlam)
            pole = np.abs(np.abs(phi) - m.M_HALFPI) < 1e-10
            tphi = np.where(pole, np.inf, sphi / np.where(pole, 1.0, cphi))
            Az = np.where(pole, np.where(phi < 0.0, np.pi, 0.0),
                          np.arctan2(sdlam, self.C45 * (tphi - cdlam)))
            tag = Az > self.Azba
            # tag branch (Azab cone)
            sd_b = np.sin(lam + self.R110)
            cd_b = np.cos(lam + self.R110)
            z_b = self.S20 * sphi + self.C20 * cphi * cd_b
            # untag branch (Azba cone)
            z_a = self.S45 * (sphi + cphi * cdlam)
            zraw = np.where(tag, z_b, z_a)
            bad = np.abs(zraw) > self.ONEEPS
            z = np.arccos(np.clip(zraw, -1.0, 1.0))
            Az_b = np.where(pole, Az,
                            np.arctan2(sd_b, self.C20 * tphi - self.S20 * cd_b))
            Az = np.where(tag, Az_b, Az)
            Av = np.where(tag, self.Azab, self.Azba)
            y0 = np.where(tag, self.rhoc, -self.rhoc)
            bad = bad | (z < 0.0)
            t = np.tan(0.5 * z) ** self.n
            r = self.F * t
            al = 0.5 * (self.R104 - z)
            bad = bad | (al < 0.0)
            al = (t + np.maximum(al, 0.0) ** self.n) / self.T
            bad = bad | (np.abs(al) > self.ONEEPS)
            al = np.arccos(np.clip(al, -1.0, 1.0))
            tt = self.n * (Av - Az)
            shrink = np.abs(tt) < al
            r = np.where(shrink,
                         r / np.cos(al + np.where(tag, tt, -tt)), r)
            x = r * np.sin(tt)
            y = y0 + np.where(tag, -r, r) * np.cos(tt)
            if self.noskew:
                x, y = (-x * self.cAzc - y * self.sAzc,
                        -y * self.cAzc + x * self.sAzc)
        c.set_error(bad, ERR_OUTSIDE_DOMAIN)
        c.x = np.where(bad, np.nan, x)
        c.y = np.where(bad, np.nan, y)

    def _inv(self, c: Coords) -> None:
        x, y = c.x.copy(), c.y.copy()
        with np.errstate(all="ignore"):
            if self.noskew:
                x, y = (-x * self.cAzc + y * self.sAzc,
                        -y * self.cAzc - x * self.sAzc)
            neg = x < 0.0
            y = np.where(neg, self.rhoc - y, y + self.rhoc)
            s = np.where(neg, self.S20, self.S45)
            cc = np.where(neg, self.C20, self.C45)
            Av = np.where(neg, self.Azab, self.Azba)
            r = np.hypot(x, y)
            rp = r.copy()
            rl = r.copy()
            Az = np.arctan2(x, y)
            fAz = np.abs(Az)
            done = np.zeros(r.shape, dtype=bool)
            z = np.zeros_like(r)
            for _ in range(10):
                z = 2.0 * np.arctan((r / self.F) ** (1.0 / self.n))
                al = np.arccos(np.clip(
                    (np.tan(0.5 * z) ** self.n
                     + np.tan(0.5 * (self.R104 - z)) ** self.n) / self.T,
                    -1.0, 1.0))
                rnew = np.where(fAz < al,
                                rp * np.cos(al + np.where(neg, Az, -Az)), r)
                r = np.where(done, r, rnew)
                done = done | (np.abs(rl - r) < 1e-10)
                if done.all():
                    break
                rl = r
            bad = ~done
            Az = Av - Az / self.n
            phi = np.arcsin(np.clip(
                s * np.cos(z) + cc * np.sin(z) * np.cos(Az), -1.0, 1.0))
            lam = np.arctan2(np.sin(Az),
                             cc / np.tan(z) - s * np.cos(Az))
            lam = np.where(neg, lam - self.R110, self.lamB - lam)
        c.set_error(bad, ERR_OUTSIDE_DOMAIN)
        c.x = np.where(bad, np.nan, lam)
        c.y = np.where(bad, np.nan, phi)


@register
class ImwP(Operation):
    """International Map of the World modified polyconic (imw_p.cpp)."""

    name = "imw_p"

    def setup(self, params: Params) -> None:
        self.en = m.enfn(self.ell.n)
        if not params.has("lat_1") or not params.has("lat_2"):
            raise ProjError("imw_p: lat_1 and lat_2 should be specified")
        phi_1 = params.r("lat_1")
        phi_2 = params.r("lat_2")
        del_ = 0.5 * (phi_2 - phi_1)
        sig = 0.5 * (phi_2 + phi_1)
        if abs(del_) < 1e-10 or abs(sig) < 1e-10:
            raise ProjError("imw_p: |lat_1 - lat_2| and |lat_1 + lat_2| "
                            "should be > 0")
        if phi_2 < phi_1:
            phi_1, phi_2 = phi_2, phi_1
        self.phi_1, self.phi_2 = phi_1, phi_2
        if params.has("lon_1"):
            self.lam_1 = params.r("lon_1")
        else:
            sigd = abs(sig * m.RAD_TO_DEG)
            self.lam_1 = (2.0 if sigd <= 60 else 4.0 if sigd <= 76
                          else 8.0) * m.DEG_TO_RAD
        self.mode = 0  # NONE_IS_ZERO
        self.sphi_1 = self.sphi_2 = 0.0
        self.R_1 = self.R_2 = 0.0
        if phi_1 != 0.0:
            x1, y1 = self._node_xy(phi_1, 1)
        else:
            self.mode = 1  # PHI_1_IS_ZERO
            y1, x1 = 0.0, self.lam_1
        if phi_2 != 0.0:
            x2, T2 = self._node_xy(phi_2, 2)
        else:
            self.mode = -1  # PHI_2_IS_ZERO
            T2, x2 = 0.0, self.lam_1
        m1 = float(m.mlfn(phi_1, self.sphi_1, np.cos(phi_1), self.en))
        m2 = float(m.mlfn(phi_2, self.sphi_2, np.cos(phi_2), self.en))
        t = m2 - m1
        s = x2 - x1
        y2 = np.sqrt(t * t - s * s) + y1
        self.C2 = y2 - T2
        t = 1.0 / t
        self.P = (m2 * y1 - m1 * y2) * t
        self.Q = (y2 - y1) * t
        self.Pp = (m2 * x1 - m1 * x2) * t
        self.Qp = (x2 - x1) * t

    def _node_xy(self, phi, which):
        sp = float(np.sin(phi))
        R = float(1.0 / (np.tan(phi) * np.sqrt(1.0 - self.es * sp * sp)))
        if which == 1:
            self.sphi_1, self.R_1 = sp, R
        else:
            self.sphi_2, self.R_2 = sp, R
        Fv = self.lam_1 * sp
        return R * np.sin(Fv), R * (1.0 - np.cos(Fv))

    def _loc_for(self, lam, phi):
        """Vectorized loc_for (imw_p.cpp:57-103); returns (x, y, yc)."""
        zero = phi == 0.0
        phi_s = np.where(zero, 0.5, phi)  # dummy to avoid div-by-zero
        sp = np.sin(phi_s)
        mm = m.mlfn(phi_s, sp, np.cos(phi_s), self.en)
        xa = self.Pp + self.Qp * mm
        ya = self.P + self.Q * mm
        with np.errstate(all="ignore"):
            R = 1.0 / (np.tan(phi_s) * np.sqrt(1.0 - self.es * sp * sp))
            C = np.sqrt(np.maximum(R * R - xa * xa, 0.0))
            C = np.where(phi_s < 0.0, -C, C) + ya - R
            if self.mode == -1:
                xb = lam
                yb = np.full_like(lam, self.C2)
            else:
                t = lam * self.sphi_2
                xb = self.R_2 * np.sin(t)
                yb = self.C2 + self.R_2 * (1.0 - np.cos(t))
            if self.mode == 1:
                xc = lam
                yc = np.zeros_like(lam)
            else:
                t = lam * self.sphi_1
                xc = self.R_1 * np.sin(t)
                yc = self.R_1 * (1.0 - np.cos(t))
            D = (xb - xc) / (yb - yc)
            B = xc + D * (C + R - yc)
            x = D * np.sqrt(np.maximum(R * R * (1 + D * D) - B * B, 0.0))
            x = np.where(phi_s > 0, -x, x)
            x = (B + x) / (1.0 + D * D)
            y = np.sqrt(np.maximum(R * R - x * x, 0.0))
            y = np.where(phi_s > 0, -y, y) + C + R
        x = np.where(zero, lam, x)
        y = np.where(zero, 0.0, y)
        return x, y, yc

    def _fwd(self, c: Coords) -> None:
        x, y, _ = self._loc_for(c.x, c.y)
        c.x, c.y = x, y

    def _inv(self, c: Coords) -> None:
        X, Y = c.x, c.y
        TOL = 1e-10
        phi = np.full_like(X, self.phi_2)
        lam = X / np.cos(phi)
        bad = np.zeros(X.shape, dtype=bool)
        done = np.zeros(X.shape, dtype=bool)
        for _ in range(1000):
            tx, ty, yc = self._loc_for(lam, phi)
            denom = ty - yc
            with np.errstate(all="ignore"):
                update_phi = (denom != 0) | (np.abs(ty - Y) > TOL)
                denom_zero = update_phi & (denom == 0)
                bad = bad | (denom_zero & ~done)
                new_phi = ((phi - self.phi_1) * (Y - yc)
                           / np.where(denom == 0, 1.0, denom) + self.phi_1)
                phi = np.where(done | ~update_phi, phi, new_phi)
                update_lam = (tx != 0) & (np.abs(tx - X) > TOL)
                lam = np.where(done | ~update_lam, lam,
                               lam * X / np.where(tx == 0, 1.0, tx))
            done = done | ((np.abs(tx - X) <= TOL) & (np.abs(ty - Y) <= TOL))
            if (done | bad).all():
                break
        bad = bad | ~done
        c.set_error(bad, ERR_OUTSIDE_DOMAIN)
        c.x = np.where(bad, np.nan, lam)
        c.y = np.where(bad, np.nan, phi)
