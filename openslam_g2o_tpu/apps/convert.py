"""Graph format converters.

`convert_sba_slam3d` re-expresses an SBA stereo graph (VertexCam /
VertexSBAPointXYZ / EdgeProjectP2SC) as a slam3d graph (VertexSE3 /
VertexTrackXYZ / EdgeSE3PointXYZDisparity with a shared camera parameter) —
parity with g2o/examples/data_convert/convert_sba_slam3d.cpp:60-125.

    python -m openslam_g2o_tpu.apps.convert input.g2o output.g2o
"""
from __future__ import annotations

import numpy as np

from openslam_g2o_tpu.core.graph import Graph

__all__ = ["convert_sba_slam3d", "main"]


def convert_sba_slam3d(g: Graph) -> Graph:
    """SBA stereo graph -> slam3d disparity graph.

    Mapping (convert_sba_slam3d.cpp):
    * first VertexCam's intrinsics -> PARAMS_CAMERACALIB id 0 with identity
      sensor offset (:70-78),
    * VertexCam (t, q, K, baseline) -> VertexSE3 (t, q) (:80-88),
    * VertexSBAPointXYZ -> VertexTrackXYZ (:90-99),
    * EdgeProjectP2SC (point, cam; meas (u, v, u_right)) ->
      EdgeSE3PointXYZDisparity (cam, point;
      meas (u, v, (u - u_right) / (fx * baseline))), information copied
      verbatim (the reference leaves the conversion as a TODO too, :103-118).
    """
    out = Graph()
    fx = baseline = None
    for vid in sorted(g.vertices):
        rec = g.vertices[vid]
        if rec.vtype.name == "cam":
            p = np.asarray(rec.params, dtype=np.float64)
            if fx is None:
                fx, fy, cx, cy = p[7], p[8], p[9], p[10]
                baseline = p[11]
                out.add_parameter(0, "camera_calib",
                                  np.concatenate([[0, 0, 0, 0, 0, 0, 1],
                                                  [fx, fy, cx, cy]]))
            out.add_vertex(vid, "se3", p[:7], fixed=rec.fixed)
        elif rec.vtype.name == "sba_point_xyz":
            out.add_vertex(vid, "point_xyz", rec.params, fixed=rec.fixed,
                           marginalized=rec.marginalized)
    if fx is None:
        raise ValueError("input graph contains no VertexCam")
    n_skipped = 0
    for e in g.edges:
        if e.etype.name != "edge_project_p2sc":
            n_skipped += 1
            continue
        point_id, cam_id = e.vertex_ids
        u, v, u_right = np.asarray(e.measurement, dtype=np.float64)
        meas = np.array([u, v, (u - u_right) / (fx * baseline)])
        out.add_edge("edge_se3_disparity", (cam_id, point_id), meas,
                     e.information, kernel=e.kernel,
                     kernel_delta=e.kernel_delta, param_ids=[0])
    if n_skipped:
        import sys
        print(f"convert_sba_slam3d: skipped {n_skipped} non-P2SC edges",
              file=sys.stderr)
    return out


def main(argv=None):
    import argparse

    from openslam_g2o_tpu.io.g2o_format import load_g2o, save_g2o

    ap = argparse.ArgumentParser(
        description="convert an SBA stereo .g2o graph to slam3d form")
    ap.add_argument("input", help="gm2dl/SBA input file")
    ap.add_argument("output", help="slam3d output file")
    args = ap.parse_args(argv)
    g = load_g2o(args.input)
    out = convert_sba_slam3d(g)
    print(f"Vertices in/out:\t{len(g.vertices)} {len(out.vertices)}")
    print(f"Edges in/out:\t{len(g.edges)} {len(out.edges)}")
    save_g2o(out, args.output)


if __name__ == "__main__":
    main()
