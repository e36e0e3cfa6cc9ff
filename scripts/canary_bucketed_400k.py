"""Toolchain-bump canary for the gated multi-bucket (sliced-ELL) BA path.

The degree-bucketed tables (core/ba_ell._bucketize) measured 68.5 ms/step
vs 308 ms single-table at the 400k-obs BAL shape on a v5e — a 4.5x win —
but the round-3 Mosaic toolchain either ABORTS the backend (bucketed solve
inside lax.while_loop) or silently MISCOMPUTES the matvec (chi2 stalls at
~1.5e8 while the CPU run of identical code reaches ~6.6e5). The path is
therefore gated off (_BUCKET_ENABLE = False). See CLAUDE.md round-3 notes.

This canary is the one-command re-check for the day the toolchain bumps:

    PYTHONPATH=/root/.axon_site:/root/repo python scripts/canary_bucketed_400k.py

It force-enables bucketing, runs the SAME host-driven LM trial program on
CPU and on the accelerator at the 400k shape, and compares the chi2
trajectories step by step. Prints ``CANARY PASS`` (safe to flip
_BUCKET_ENABLE = True, after also re-running bench.py's noise-floor gates)
or ``CANARY FAIL — keep gated``.

WARNING: on a broken toolchain the TPU probe may abort the backend and
poison the client process (expect a 20-40 min tunnel drain after a crash —
CLAUDE.md). Run it in a dedicated process, never inside a measurement
session.
"""
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import numpy as np

N_STEPS = 4
REL_TOL = 2e-3      # f32 trajectory agreement per step


def run_trajectory(device_kind: str):
    import jax
    import jax.numpy as jnp
    from openslam_g2o_tpu.apps.simulator import synthetic_bal_problem
    from openslam_g2o_tpu.core import ba_ell as BE

    BE._BUCKET_ENABLE = True
    prob, _ = synthetic_bal_problem(n_cams=900, n_points=50000,
                                    obs_per_point=8, dtype=jnp.float32)
    pattern = BE.build_ba_ell_pattern(prob)
    n_buckets = max(len(pg.cam_buckets) for pg in pattern.proj)
    if n_buckets < 2:
        print(f"[{device_kind}] pattern built only {n_buckets} bucket(s) — "
              "bucketing did not activate; check _BUCKET_* knobs")
        return None
    algo = BE.LevenbergMarquardtSchurELL()
    dev = jax.devices(device_kind)[0]
    with jax.default_device(dev):
        state = algo.init(prob)
        st = (state["params"], state["lam"], state["ni"], state["chi2"])
        traj = [float(st[3])]
        for i in range(N_STEPS):
            t0 = time.monotonic()
            out = BE.ba_ell_step(prob, pattern, *st, pcg_iters=30,
                                 pcg_tol=0.05)
            st = out[:4]
            jax.block_until_ready(st[0])
            traj.append(float(st[3]))
            print(f"[{device_kind}] step {i}: chi2 {traj[-1]:.1f} "
                  f"({time.monotonic()-t0:.1f}s)", flush=True)
    return traj


def main():
    import jax

    cpu_traj = run_trajectory("cpu")
    if cpu_traj is None:
        return 2
    kinds = {d.platform for d in jax.devices()}
    accel = next((k for k in kinds if k != "cpu"), None)
    if accel is None:
        print("no accelerator visible — CPU-only run records the reference "
              "trajectory; re-run with the TPU attached")
        print("cpu trajectory:", [round(c, 1) for c in cpu_traj])
        return 2
    tpu_traj = run_trajectory(accel)
    if tpu_traj is None:
        return 2

    worst = 0.0
    for c, t in zip(cpu_traj, tpu_traj):
        worst = max(worst, abs(c - t) / max(abs(c), 1.0))
    print(f"cpu  trajectory: {[round(c, 1) for c in cpu_traj]}")
    print(f"tpu  trajectory: {[round(t, 1) for t in tpu_traj]}")
    print(f"worst per-step relative gap: {worst:.2e} (tol {REL_TOL})")
    descending = tpu_traj[-1] < 0.9 * tpu_traj[0]
    passed = bool(worst <= REL_TOL and descending)
    _record(passed, worst, cpu_traj, tpu_traj)
    if passed:
        print("CANARY PASS — the bucketed path computes correctly on this "
              "toolchain; flip ba_ell._BUCKET_ENABLE = True and re-run "
              "bench.py (noise-floor gates must stay green).")
        return 0
    print("CANARY FAIL — keep gated (_BUCKET_ENABLE = False).")
    return 1


def _record(passed, worst, cpu_traj, tpu_traj):
    """Persist the verdict so bench.py can carry it in the round artifact
    (the canary must run in its OWN process — a toolchain fault poisons
    the client — so the bench reads the recorded result instead of
    re-probing)."""
    import datetime
    import json
    with open(os.path.join(_REPO, "CANARY_400K.json"), "w") as fh:
        json.dump({
            "bucketed_path_correct_on_toolchain": passed,
            "chi2_parity_worst_rel_gap": worst,
            "cpu_trajectory": [round(c, 1) for c in cpu_traj],
            "tpu_trajectory": [round(t, 1) for t in tpu_traj],
            "checked_utc": datetime.datetime.now(
                datetime.timezone.utc).isoformat(timespec="seconds"),
        }, fh, indent=1)


if __name__ == "__main__":
    sys.exit(main())
