from openslam_g2o_tpu.ops import lie  # noqa: F401
