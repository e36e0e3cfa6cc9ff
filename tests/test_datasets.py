"""Dataset-level convergence tests (the reference's benchmark methodology:
run the bundled datasets and require large chi2 reduction to a stable
minimum — SURVEY.md §4 item 4). The full-size 2D sets run on the CPU mesh in
reasonable time via the dense MXU-style path; Manhattan/sphere full runs live
in bench.py (TPU)."""
import numpy as np
import pytest

from openslam_g2o_tpu.core import problem as P
from openslam_g2o_tpu.core.algorithms import (
    GaussNewton, LevenbergMarquardt, optimize, TerminateCriterion)
from openslam_g2o_tpu.io.g2o_format import load_g2o

DATA_2D = "/root/reference/data/2d"


@pytest.fixture(scope="module")
def intel():
    g = load_g2o(f"{DATA_2D}/intel/intel.g2o")
    if g.gauge_freedom():
        g.set_fixed(g.find_gauge(), True)
    return g


class TestIntel:
    def test_lm_converges(self, intel):
        prob = intel.compile()
        chi0 = float(P.chi2(prob))
        out, stats = optimize(prob, LevenbergMarquardt(), iterations=10,
                              terminate=TerminateCriterion(gain_threshold=1e-9))
        final = stats[-1]["chi2"]
        # regression values: initial chi2 = 1331.4989, converged = 546.4611
        # (stable across GN and LM; see tests/README for the protocol)
        assert abs(chi0 - 1331.498898) < 1e-3
        assert final < 546.5
        assert final > 500.0  # guard against chi2-definition drift
        chis = [s["chi2"] for s in stats]
        assert all(b <= a + 1e-6 for a, b in zip(chis, chis[1:]))

    def test_gn_matches_lm_minimum(self, intel):
        prob = intel.compile()
        _, stats_gn = optimize(prob, GaussNewton(), iterations=8)
        _, stats_lm = optimize(prob, LevenbergMarquardt(), iterations=12)
        assert abs(stats_gn[-1]["chi2"] - stats_lm[-1]["chi2"]) < 1.0

    def test_lm_pcg_chebyshev_converges_end_to_end(self, intel):
        """End-to-end LM-PCG with the Chebyshev polynomial preconditioner
        (pcg_cheby=4): must reach the recorded basin (546.46), exercising
        the full _lm_pcg_step Chebyshev branch — Gershgorin bracket,
        internal outer-budget scaling, precond-norm stopping — not just
        make_chebyshev_precond in isolation."""
        from openslam_g2o_tpu.core.algorithms import LevenbergMarquardtPCG
        prob = intel.compile()
        out, stats = optimize(
            prob, LevenbergMarquardtPCG(pcg_cheby=4, pcg_iters=120,
                                        pcg_tol=1e-8),
            iterations=15,
            terminate=TerminateCriterion(gain_threshold=1e-9))
        assert stats[-1]["chi2"] < 547.0
        assert stats[-1]["chi2"] > 500.0


class TestSphere:
    def test_lm_pcg_converges_to_reference_basin(self):
        """sphere_bignoise_vertex3.g2o: recorded values chi2 1.766e8 ->
        743862.7 (plateau reached ~iteration 60, identical basin from file
        init and spanning-tree init). Runs the full 60 iterations and
        requires the recorded plateau within 0.1% — convergence to the
        reference basin, not merely descent."""
        from openslam_g2o_tpu.core.algorithms import LevenbergMarquardtPCG
        g = load_g2o("/root/reference/data/3d/sphere/sphere_bignoise_vertex3.g2o")
        if g.gauge_freedom():
            g.set_fixed(g.find_gauge(), True)
        prob = g.compile()
        chi0 = float(P.chi2(prob))
        assert abs(chi0 - 176631217.78) / chi0 < 1e-6
        out, stats = optimize(prob, LevenbergMarquardtPCG(pcg_iters=150),
                              iterations=60)
        assert abs(stats[-1]["chi2"] - 743862.7) / 743862.7 < 1e-3
        chis = [s["chi2"] for s in stats]
        assert all(b <= a + 1e-6 for a, b in zip(chis, chis[1:]))


class TestGarage:
    def test_lm_pcg_converges(self):
        """parking-garage.g2o (3D SE3, real data): recorded values
        chi2 16720.02 -> ~1.26 (25 LM-PCG iterations)."""
        from openslam_g2o_tpu.core.algorithms import LevenbergMarquardtPCG
        g = load_g2o("/root/reference/data/3d/garage/parking-garage.g2o")
        if g.gauge_freedom():
            g.set_fixed(g.find_gauge(), True)
        prob = g.compile()
        chi0 = float(P.chi2(prob))
        assert abs(chi0 - 16720.019) < 0.1
        out, stats = optimize(prob, LevenbergMarquardtPCG(pcg_iters=100),
                              iterations=15)
        assert stats[-1]["chi2"] < 2.0   # deep minimum of the real dataset
        chis = [s["chi2"] for s in stats]
        assert all(b <= a + 1e-6 for a, b in zip(chis, chis[1:]))
