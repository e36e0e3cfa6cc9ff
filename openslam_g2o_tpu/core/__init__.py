from openslam_g2o_tpu.core import registry, robust  # noqa: F401
from openslam_g2o_tpu.core.graph import Graph  # noqa: F401
