"""Probe TPU gather/matvec lowering variants at Manhattan shapes.

Which formulation of the ELL SpMV gather is fast on v5e through XLA — and
how much is per-scan-iteration overhead vs the ops themselves.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

N, K, D = 3500, 10, 3
rng = np.random.default_rng(0)
nb = jnp.asarray(rng.integers(0, N, size=(N, K)).astype(np.int32))
nb_flat = nb.reshape(-1)
V = jnp.asarray(rng.normal(size=(D * D, N, K)).astype(np.float32))
Vr = jnp.asarray(rng.normal(size=(N, K, D, D)).astype(np.float32))
x0 = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
xT0 = x0.T
x8 = jnp.concatenate([xT0, jnp.zeros((5, N), jnp.float32)])  # [8, N]


def scan_time(body, init, length, label, reps=10):
    @jax.jit
    def run(x):
        return jax.lax.scan(lambda c, _: (body(c), None), x, None,
                            length=length)[0]
    out = run(init)
    jax.block_until_ready(out)
    t0 = time.monotonic()
    for _ in range(reps):
        out = run(init)
    jax.block_until_ready(out)
    t = (time.monotonic() - t0) / reps
    print(f"{label:44s}: {t/length*1e6:9.2f} us/rep", flush=True)


def renorm(y):
    return y / jnp.maximum(jnp.max(jnp.abs(y)), 1e-9)


# A: lane-axis take on [3, N]
scan_time(lambda xT: renorm(
    jnp.take(xT, nb_flat, axis=1).reshape(D, N, K).sum(axis=2)),
    xT0, 256, "A take axis=1 [3,N] + ksum")

# B: take_along_axis
idxB = jnp.broadcast_to(nb_flat[None], (D, N * K))
scan_time(lambda xT: renorm(
    jnp.take_along_axis(xT, idxB, axis=1).reshape(D, N, K).sum(axis=2)),
    xT0, 256, "B take_along_axis [3,N] + ksum")

# C: row gather [N, 3]
scan_time(lambda x: renorm(x[nb_flat].reshape(N, K, D).sum(axis=1)).reshape(N, D),
          x0, 256, "C row gather [N,3] + ksum")

# D: padded sublanes [8, N]
scan_time(lambda xT: renorm(
    jnp.take(xT, nb_flat, axis=1).reshape(8, N, K).sum(axis=2)),
    x8, 256, "D take axis=1 [8,N] + ksum")

# E: per-k column take (K small gathers)
def ek(xT):
    acc = jnp.zeros((D, N), jnp.float32)
    for k in range(K):
        acc = acc + jnp.take(xT, nb[:, k], axis=1)
    return renorm(acc)
scan_time(ek, xT0, 256, "E K separate takes [3,N]")

# F: full current ell_matvec form
def f(xT):
    xg = jnp.take(xT, nb_flat, axis=1).reshape(D, N, K)
    y = (V.reshape(D, D, N, K) * xg[None]).sum(axis=(1, 3))
    return renorm(y)
scan_time(f, xT0, 256, "F lane matvec (gather+VPU reduce)")

# G: no-gather control (same math, fake xg)
def g(xT):
    xg = jnp.broadcast_to(xT[:, :, None], (D, N, K))
    y = (V.reshape(D, D, N, K) * xg[None]).sum(axis=(1, 3))
    return renorm(y)
scan_time(g, xT0, 256, "G no-gather control (VPU only)")

# H: old einsum form
def h(x):
    xg = x[nb_flat].reshape(N, K, D)
    y = jnp.einsum("nkst,nkt->ns", Vr, xg)
    return renorm(y)
scan_time(h, x0, 256, "H row gather + einsum (old)")

# I: transpose-only control
scan_time(lambda x: renorm(x.T).T, x0, 256, "I transpose roundtrip only")

# J: one big roll-free band test: y = V0*x (elementwise) control
scan_time(lambda x: renorm(x * 1.0001), x0, 256, "J scan overhead control")
