"""create_sphere: generate the sphere pose-graph benchmark.

Parity with g2o/examples/sphere/create_sphere.cpp:216. Run:

    python examples/create_sphere.py sphere.g2o
"""
import sys

from openslam_g2o_tpu.apps.simulator import create_sphere
from openslam_g2o_tpu.io.g2o_format import save_g2o


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "sphere.g2o"
    g, gt = create_sphere(n_laps=50, n_per_lap=50, radius=100.0)
    save_g2o(g, out)
    print(f"wrote {g.num_vertices()} vertices, {g.num_edges()} edges to {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
