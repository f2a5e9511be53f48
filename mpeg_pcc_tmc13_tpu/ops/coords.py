"""Coordinate conversion: cartesian <-> (radius, azimuth, z).

Counterpart of `tmc3/coordinate_conversion.{h,cpp}` (`convertXyzToRpl`,
`normalisedAxesWeights`, `offsetAndScale`): spherical-domain coding for
rotating-LiDAR content (angular tools, GPS angular_enabled hls.h:470+).

Quantisation conventions:
* radius   r_q = round(sqrt(x^2 + y^2))           (integer units)
* azimuth  phi_q = round(atan2(y, x) * 2^phi_bits / 2pi), wrapped to
           [0, 2^phi_bits)
* z passes through unchanged (the reference's laser-index form maps z
  via a calibrated laser table; virtual uniform "lasers" are the
  untabled equivalent and keep the transform self-contained).

Only the INVERSE transform is normative (the decoder runs it; the
encoder codes a cartesian residual against its own inverse), matching
the reference's secondary-residual design
(geometry_predictive_encoder.cpp residual coding :312-596).
"""

from __future__ import annotations

import numpy as np

PHI_BITS = 17  # azimuth quantisation (reference-ish precision)


def xyz_to_spherical(positions: np.ndarray, phi_bits: int = PHI_BITS):
    """(N,3) int xyz -> (N,3) int (r, phi, z)."""
    p = positions.astype(np.float64)
    r = np.round(np.sqrt(p[:, 0] ** 2 + p[:, 1] ** 2)).astype(np.int64)
    phi = np.arctan2(p[:, 1], p[:, 0])  # [-pi, pi]
    scale = (1 << phi_bits) / (2 * np.pi)
    phi_q = np.round(phi * scale).astype(np.int64) % (1 << phi_bits)
    return np.column_stack([r, phi_q, positions[:, 2].astype(np.int64)])


def spherical_to_xyz(sph: np.ndarray, phi_bits: int = PHI_BITS):
    """Inverse transform (normative: both sides compute identically)."""
    r = sph[:, 0].astype(np.float64)
    phi = sph[:, 1].astype(np.float64) * (2 * np.pi / (1 << phi_bits))
    x = np.round(r * np.cos(phi)).astype(np.int64)
    y = np.round(r * np.sin(phi)).astype(np.int64)
    return np.column_stack([x, y, sph[:, 2].astype(np.int64)])


def normalised_axes_weights(bbox_whd) -> np.ndarray:
    """Per-axis LoD bias weights (reference normalisedAxesWeights):
    normalise axis extents so distance metrics treat anisotropic
    content (e.g. LiDAR z range << xy range) fairly.  Q8 weights."""
    ext = np.maximum(np.asarray(bbox_whd, dtype=np.float64), 1.0)
    w = ext.max() / ext
    return np.round(np.minimum(w, 256.0) * 256.0).astype(np.int64)
