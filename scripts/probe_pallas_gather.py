"""Probe: Mosaic lane-axis take_along_axis vs XLA gather at SpMV shapes."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, K, D = 3500, 10, 3
M = N * K
rng = np.random.default_rng(0)
nb = rng.integers(0, N, size=(N, K)).astype(np.int32)
xT = jnp.asarray(rng.normal(size=(8, N)).astype(np.float32))
idx = jnp.asarray(np.broadcast_to(nb.reshape(1, -1), (8, M)).copy())
V = jnp.asarray(rng.normal(size=(D * D, N, K)).astype(np.float32))

nb_kmaj = np.empty((8, K * N), np.int32)
for k in range(K):
    nb_kmaj[:, k * N:(k + 1) * N] = nb[:, k][None, :]
nb_kmaj = jnp.asarray(nb_kmaj)


def scan_reps(fn, label, length=200):
    """fn: [8, N] -> [8, N]; carry depends on output so nothing is DCE'd."""
    @jax.jit
    def run(x):
        def body(c, _):
            y = fn(c)
            c2 = y / jnp.maximum(jnp.max(jnp.abs(y)), 1e-9)
            return c2, ()
        return jax.lax.scan(body, x, None, length=length)[0]
    try:
        out = run(xT)
        jax.block_until_ready(out)
    except Exception as e:
        print(f"{label}: FAILED {repr(e)[:400]}", flush=True)
        return
    t0 = time.monotonic()
    for _ in range(10):
        out = run(xT)
    jax.block_until_ready(out)
    t = (time.monotonic() - t0) / 10 / length
    print(f"{label:36s}: {t*1e6:9.2f} us/rep", flush=True)


# --- 1. plain gather kernel ------------------------------------------------
def gather_kernel(x_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=1)


@jax.jit
def pallas_gather(x, i):
    return pl.pallas_call(
        gather_kernel,
        out_shape=jax.ShapeDtypeStruct((8, M), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, i)


# standalone compile + numeric check FIRST (no scan, no DCE)
try:
    g = pallas_gather(xT, idx)
    ref = np.asarray(xT)[:, nb.reshape(-1)]
    print("gather kernel max err:",
          float(np.abs(np.asarray(g) - ref).max()), flush=True)
except Exception as e:
    print("pallas gather standalone FAILED:", repr(e)[:400], flush=True)

scan_reps(lambda x: pallas_gather(x, idx)[:, :N],
          "pallas take_along_axis gather")
scan_reps(lambda x: jnp.take(x, idx[0], axis=1)[:, :N], "XLA take gather")


# --- 2. full SpMV kernel: K-loop of take_along_axis ------------------------
def spmv_kernel(x_ref, nb_ref, v_ref, y_ref):
    x = x_ref[:]
    rows = [jnp.zeros((N,), jnp.float32) for _ in range(D)]
    for k in range(K):
        xk = jnp.take_along_axis(x, nb_ref[:, k * N:(k + 1) * N], axis=1)
        for s in range(D):
            for t_ in range(D):
                rows[s] = rows[s] + v_ref[s * D + t_, :, k] * xk[t_]
    y_ref[:] = jnp.stack(rows + [jnp.zeros((N,), jnp.float32)] * (8 - D))


@jax.jit
def pallas_spmv(x):
    return pl.pallas_call(
        spmv_kernel,
        out_shape=jax.ShapeDtypeStruct((8, N), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, nb_kmaj, V)


try:
    y = pallas_spmv(xT)
    xg = np.asarray(xT)[:D][:, nb.reshape(-1)].reshape(D, N, K)
    yref = (np.asarray(V).reshape(D, D, N, K) * xg[None]).sum(axis=(1, 3))
    print("spmv kernel max err:",
          float(np.abs(np.asarray(y)[:D] - yref).max()), flush=True)
    scan_reps(pallas_spmv, "pallas full SpMV kernel")
except Exception as e:
    print("pallas spmv FAILED:", repr(e)[:600], flush=True)
