"""Decode reference (tmc3) bitstreams to point clouds.

Glue around the native bit-exact engine (native/refcodec.cc): parses
the reference TLV/HLS syntax (ref_hls.py) and drives the octree brick
decoder, reproducing the reference decoder's output cloud
(PCCTMC3Decoder3::decodeGeometryBrick + outputCurrentCloud,
/root/reference/tmc3/decoder.cpp:573,?).

Supported: octree geometry, intra, planar/IDCM (non-angular)/
angular off, single entropy stream, bitwise occupancy, no in-tree
scaling; unique or duplicate points; any QTBT coded-axis schedule.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

from . import ref_hls

_NATIVE_DIR = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "native"))
_SO_PATH = os.path.join(_NATIVE_DIR, "libtmc13_entropy.so")

_lib: Optional[ctypes.CDLL] = None


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    # make is incremental: rebuilds only when refcodec.cc is newer
    subprocess.run(["make", "-s"], cwd=_NATIVE_DIR, check=True,
                   capture_output=True)
    lib = ctypes.CDLL(_SO_PATH)
    c = ctypes
    lib.tmc13ref_decode_octree_intra.argtypes = [
        c.POINTER(c.c_uint8), c.c_int,
        c.POINTER(c.c_int32), c.c_int,
        c.c_int,
        c.POINTER(c.c_int32),
        c.POINTER(c.c_int32), c.c_int,
    ]
    lib.tmc13ref_decode_octree_intra.restype = c.c_int
    _lib = lib
    return lib


def geom_params_array(gps, bypass_no_update=False) -> "np.ndarray":
    """Pack the RefGps tool flags into the native GeomParams layout
    (native/refcodec.cc GeomParams, 12 int32s)."""
    return np.array([
        gps.neighbour_avail_boundary_log2_minus1 + 1,
        1 if gps.adjacent_child_contextualization else 0,
        1 if gps.unique_points else 0,
        1 if gps.planar_enabled else 0,
        0 if gps.planar_buffer_disabled else 1,
        1 if gps.multiple_planar else 0,
        1 if gps.depth_planar_eligibility else 0,
        1 if gps.planar_dynamic_obuf_eligibility else 0,
        gps.planar_threshold0, gps.planar_threshold1,
        gps.planar_threshold2,
        1 if bypass_no_update else 0,
        gps.inferred_direct_coding_mode,
        1 if gps.joint_2pt_idcm else 0,
        gps.idcm_rate_minus1,
    ], dtype=np.int32)


class UnsupportedTool(NotImplementedError):
    pass


def _check_supported(sps: ref_hls.RefSps, gps: ref_hls.RefGps,
                     gbh: ref_hls.RefGbh):
    unsupported = []
    if sps.cabac_bypass_stream_enabled:
        unsupported.append("cabac bypass stream")
    if gps.predgeom_enabled:
        unsupported.append("predictive geometry")
    if gps.trisoup_enabled:
        unsupported.append("trisoup")
    if gps.inferred_direct_coding_mode and gps.angular_enabled:
        unsupported.append("angular IDCM")
    if gps.angular_enabled:
        unsupported.append("angular mode")
    if gps.scaling_enabled:
        unsupported.append("in-tree scaling")
    if not gps.bitwise_occupancy:
        unsupported.append("bytewise occupancy coder")
    if gps.neighbour_avail_boundary_log2_minus1 < 1:
        unsupported.append("neighbourAvailBoundaryLog2 < 2")
    if gbh.inter_prediction:
        unsupported.append("inter prediction")
    if gbh.geom_stream_cnt_minus1:
        unsupported.append("multiple entropy streams")
    if gbh.entropy_continuation:
        unsupported.append("entropy continuation")
    if unsupported:
        raise UnsupportedTool(", ".join(unsupported))


def decode_geometry_brick(sps: ref_hls.RefSps, gps: ref_hls.RefGps,
                          gbh: ref_hls.RefGbh,
                          payload: bytes) -> np.ndarray:
    """Decode one octree geometry brick to slice-local STV grid
    positions in the reference's decode order."""
    _check_supported(sps, gps, gbh)
    lib = _load()
    aec = payload[gbh.header_bytes:len(payload) - gbh.footer_bytes]
    aec_arr = np.frombuffer(aec, dtype=np.uint8)
    axes = np.asarray(gbh.tree_lvl_coded_axis_list, dtype=np.int32)
    gp = geom_params_array(
        gps, sps.bypass_bin_coding_without_prob_update)
    out = np.empty((gbh.num_points, 3), dtype=np.int32)
    c = ctypes
    n = lib.tmc13ref_decode_octree_intra(
        aec_arr.ctypes.data_as(c.POINTER(c.c_uint8)), len(aec),
        axes.ctypes.data_as(c.POINTER(c.c_int32)), len(axes),
        gbh.num_points,
        gp.ctypes.data_as(c.POINTER(c.c_int32)),
        out.ctypes.data_as(c.POINTER(c.c_int32)), gbh.num_points)
    if n < 0:
        raise RuntimeError(f"refcodec decode failed rc={n}")
    if n != gbh.num_points:
        raise RuntimeError(
            f"decoded {n} points, footer says {gbh.num_points}")
    return out.astype(np.int64)


def decode_stream(data: bytes) -> List[np.ndarray]:
    """Decode a full tmc3 TLV stream (geometry only) to per-frame
    XYZ integer positions at the sequence scale, mirroring the
    reference's output conversion for seq scale 1 (decoder.cpp
    outputCurrentCloud: slice origin add + toXyz)."""
    sps: Optional[ref_hls.RefSps] = None
    gps_map = {}
    frames: List[np.ndarray] = []
    cur_slices: List[np.ndarray] = []
    cur_ctr: Optional[int] = None

    def flush():
        if cur_slices:
            frames.append(np.concatenate(cur_slices, axis=0))
            cur_slices.clear()

    for t, payload in ref_hls.iter_ref_tlv(data):
        if t == ref_hls.T_SPS:
            sps = ref_hls.parse_sps(payload)
        elif t == ref_hls.T_GPS:
            g = ref_hls.parse_gps(payload)
            gps_map[g.gps_id] = g
        elif t == ref_hls.T_GEOM_BRICK:
            gbh_ids = ref_hls.parse_gbh(
                sps, gps_map[payload[0] >> 4], payload)
            if cur_ctr is not None and gbh_ids.frame_ctr_lsb != cur_ctr:
                flush()
            cur_ctr = gbh_ids.frame_ctr_lsb
            gps = gps_map[gbh_ids.gps_id]
            local = decode_geometry_brick(sps, gps, gbh_ids, payload)
            pos = local + np.asarray(gbh_ids.box_origin_stv,
                                     dtype=np.int64)
            xyz = np.stack(
                ref_hls.to_xyz(sps.geometry_axis_order,
                               [pos[:, 0], pos[:, 1], pos[:, 2]]),
                axis=1)
            # sequence bounding box origin offset (output conversion)
            xyz += np.asarray(sps.bbox_origin, dtype=np.int64)
            cur_slices.append(xyz)
        elif t == ref_hls.T_FRAME_BOUNDARY:
            flush()
            cur_ctr = None
    flush()
    return frames
