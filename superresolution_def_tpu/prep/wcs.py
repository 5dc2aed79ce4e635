"""TAN (gnomonic) WCS — the projection the whole reference pipeline lives in.

From-scratch implementation of the standard FITS TAN convention (no astropy
in this image): CRPIXn are 1-based, intermediate coordinates are
CD @ (pixel - crpix) in degrees, projected gnomonically around CRVAL.
Covers every operation the reference performs on WCS objects:

- construction from / export to FITS headers (CDn_n or CDELTn forms);
- pixel<->world transforms (vectorized numpy);
- `wcs[y0:y0+H, x0:x0+W]` slicing = crpix shift (astropy slice semantics,
  Dataset_step3:235);
- the step-3 aligned-LR derivation: CD (or CDELT) x factor, CRPIX / factor
  (create_aligned_lr_wcs, Dataset_step3:212-221);
- the step-1 registration target: fresh TAN centered on a reference CRVAL
  at native scale with CRPIX at the image center
  (register_single_image_smart, Dataset_step1:236-240);
- pixel scale in arcsec (proj_plane_pixel_scales equivalent) and
  angular separation for the step-3 distance filter (:401-409).
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class TanWCS:
    crval: np.ndarray  # (ra0, dec0) deg
    crpix: np.ndarray  # (x0, y0), 1-based FITS convention
    cd: np.ndarray     # 2x2 CD matrix, deg/pixel: [[cd1_1, cd1_2], [cd2_1, cd2_2]]

    def __init__(self, crval, crpix, cd=None, cdelt=None):
        self.crval = np.asarray(crval, np.float64)
        self.crpix = np.asarray(crpix, np.float64)
        if cd is not None:
            self.cd = np.asarray(cd, np.float64).reshape(2, 2)
        else:
            cdelt = np.asarray(cdelt, np.float64)
            self.cd = np.diag(cdelt)

    # ------------------------------------------------------------------ #
    @classmethod
    def from_header(cls, header: dict) -> "TanWCS":
        ctype1 = str(header.get("CTYPE1", ""))
        if "TAN" not in ctype1 and ctype1:
            raise ValueError(f"unsupported projection {ctype1!r} (TAN only)")
        crval = [float(header["CRVAL1"]), float(header["CRVAL2"])]
        crpix = [float(header.get("CRPIX1", 1.0)), float(header.get("CRPIX2", 1.0))]
        if "CD1_1" in header:
            cd = [
                [float(header["CD1_1"]), float(header.get("CD1_2", 0.0))],
                [float(header.get("CD2_1", 0.0)), float(header["CD2_2"])],
            ]
            return cls(crval, crpix, cd=cd)
        cdelt = [float(header.get("CDELT1", 1.0)), float(header.get("CDELT2", 1.0))]
        if "PC1_1" in header:
            pc = np.array(
                [
                    [float(header.get("PC1_1", 1.0)), float(header.get("PC1_2", 0.0))],
                    [float(header.get("PC2_1", 0.0)), float(header.get("PC2_2", 1.0))],
                ]
            )
            return cls(crval, crpix, cd=np.diag(cdelt) @ pc)
        return cls(crval, crpix, cdelt=cdelt)

    def to_header(self) -> dict:
        return {
            "CTYPE1": "RA---TAN",
            "CTYPE2": "DEC--TAN",
            "CRVAL1": float(self.crval[0]),
            "CRVAL2": float(self.crval[1]),
            "CRPIX1": float(self.crpix[0]),
            "CRPIX2": float(self.crpix[1]),
            "CD1_1": float(self.cd[0, 0]),
            "CD1_2": float(self.cd[0, 1]),
            "CD2_1": float(self.cd[1, 0]),
            "CD2_2": float(self.cd[1, 1]),
        }

    @classmethod
    def has_celestial(cls, header: dict) -> bool:
        return (
            "CRVAL1" in header
            and "CRVAL2" in header
            and "TAN" in str(header.get("CTYPE1", ""))
        )

    # ------------------------------------------------------------------ #
    def pixel_to_world(self, px, py):
        """0-based pixel coords -> (ra, deg) arrays. Vectorized."""
        px = np.asarray(px, np.float64)
        py = np.asarray(py, np.float64)
        # FITS crpix is 1-based; 0-based pixel p maps via (p + 1 - crpix)
        u = self.cd[0, 0] * (px + 1 - self.crpix[0]) + self.cd[0, 1] * (py + 1 - self.crpix[1])
        v = self.cd[1, 0] * (px + 1 - self.crpix[0]) + self.cd[1, 1] * (py + 1 - self.crpix[1])
        xi = np.deg2rad(u)
        eta = np.deg2rad(v)
        ra0 = np.deg2rad(self.crval[0])
        dec0 = np.deg2rad(self.crval[1])
        denom = np.cos(dec0) - eta * np.sin(dec0)
        ra = ra0 + np.arctan2(xi, denom)
        dec = np.arctan(
            (np.sin(dec0) + eta * np.cos(dec0))
            / np.sqrt(xi**2 + denom**2)
        )
        return np.rad2deg(ra) % 360.0, np.rad2deg(dec)

    def world_to_pixel(self, ra, dec):
        """(ra, dec) deg -> 0-based pixel coords. Vectorized."""
        ra = np.deg2rad(np.asarray(ra, np.float64))
        dec = np.deg2rad(np.asarray(dec, np.float64))
        ra0 = np.deg2rad(self.crval[0])
        dec0 = np.deg2rad(self.crval[1])
        dra = ra - ra0
        den = np.sin(dec0) * np.sin(dec) + np.cos(dec0) * np.cos(dec) * np.cos(dra)
        xi = np.cos(dec) * np.sin(dra) / den
        eta = (np.cos(dec0) * np.sin(dec) - np.sin(dec0) * np.cos(dec) * np.cos(dra)) / den
        uv = np.stack([np.rad2deg(xi), np.rad2deg(eta)])
        inv = np.linalg.inv(self.cd)
        p = inv @ uv.reshape(2, -1)
        px = p[0].reshape(np.shape(xi)) + self.crpix[0] - 1
        py = p[1].reshape(np.shape(eta)) + self.crpix[1] - 1
        return px, py

    # ------------------------------------------------------------------ #
    def slice(self, y0: int, x0: int) -> "TanWCS":
        """astropy `wcs[y0:..., x0:...]` equivalent: shift crpix."""
        return TanWCS(self.crval, self.crpix - np.array([x0, y0]), cd=self.cd)

    def scaled_lr(self, factor: float) -> "TanWCS":
        """Reference create_aligned_lr_wcs: CD * factor, CRPIX / factor."""
        return TanWCS(self.crval, self.crpix / factor, cd=self.cd * factor)

    @classmethod
    def registration_target(cls, ref_crval, shape, native_scale_deg: float) -> "TanWCS":
        """Step-1 target: centered on master CRVAL at native scale
        (Dataset_step1:236-240; note crpix = shape/2, astropy convention)."""
        h, w = shape
        return cls(
            ref_crval,
            [w / 2, h / 2],
            cdelt=[-native_scale_deg, native_scale_deg],
        )

    # ------------------------------------------------------------------ #
    def pixel_scale_arcsec(self) -> float:
        """sqrt of column norms like proj_plane_pixel_scales()[0] * 3600."""
        return float(np.sqrt(self.cd[0, 0] ** 2 + self.cd[1, 0] ** 2) * 3600.0)

    def center_world(self, shape) -> tuple[float, float]:
        h, w = shape
        ra, dec = self.pixel_to_world(np.array([(w - 1) / 2]), np.array([(h - 1) / 2]))
        return float(ra[0]), float(dec[0])


def angular_separation_deg(ra1, dec1, ra2, dec2) -> float:
    """Great-circle separation (haversine), degrees."""
    ra1, dec1, ra2, dec2 = map(np.deg2rad, (ra1, dec1, ra2, dec2))
    sd = np.sin((dec2 - dec1) / 2) ** 2
    sr = np.sin((ra2 - ra1) / 2) ** 2
    h = sd + np.cos(dec1) * np.cos(dec2) * sr
    return float(np.rad2deg(2 * np.arcsin(np.sqrt(np.clip(h, 0, 1)))))
