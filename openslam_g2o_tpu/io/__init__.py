from openslam_g2o_tpu.io.g2o_format import load_g2o, loads_g2o, save_g2o  # noqa: F401
