"""Legacy tag support: the DEPRECATED_* 3D types.

The reference keeps a parallel SE3Quat-based slam3d library for old files
(g2o/types/deprecated/slam3d/types_slam3d.cpp registrations). The file
measurement format (translation + quaternion) is identical to the modern
types, and the modern MQT error convention evaluates the same constraints;
we therefore alias the legacy tags onto the modern types instead of keeping
a second implementation. (The deprecated classes' error used the raw SE3Quat
delta rather than the sign-normalized compact quaternion — identical at the
optimum and equivalent in chi2 for small residuals.)
"""
from openslam_g2o_tpu.core.registry import register_tag_alias

# modern tag                            legacy tag
for legacy, modern in [
    ("DEPRECATED_VERTEX_SE3:QUAT", "VERTEX_SE3:QUAT"),
    ("DEPRECATED_EDGE_SE3:QUAT", "EDGE_SE3:QUAT"),
    ("DEPRECATED_VERTEX_TRACKXYZ", "VERTEX_TRACKXYZ"),
    ("DEPRECATED_PARAMS_SE3OFFSET", "PARAMS_SE3OFFSET"),
    ("DEPRECATED_EDGE_SE3_TRACKXYZ", "EDGE_SE3_TRACKXYZ"),
    ("DEPRECATED_EDGE_SE3_PRIOR", "EDGE_SE3_PRIOR"),
    ("DEPRECATED_EDGE_SE3_OFFSET", "EDGE_SE3_OFFSET"),
    ("DEPRECATED_PARAMS_CAMERACALIB", "PARAMS_CAMERACALIB"),
    ("DEPRECATED_EDGE_PROJECT_DISPARITY", "EDGE_PROJECT_DISPARITY"),
    ("DEPRECATED_EDGE_PROJECT_DEPTH", "EDGE_PROJECT_DEPTH"),
]:
    register_tag_alias(legacy, modern)

# icp stereo-camera family: VertexSCam is a VertexCam with (statically
# shared) intrinsics; Edge_XYZ_VSC is its stereo projection
# (types_icp.h:253-420) — structurally the SBACam stereo edge.
register_tag_alias("VERTEX_SCAM", "VERTEX_CAM")
register_tag_alias("EDGE_XYZ_VSC", "EDGE_PROJECT_P2SC")
