import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import time, statistics, functools
import jax, jax.numpy as jnp, numpy as np
from nlsolver_tpu.linalg.jacobi import eigh_jacobi
from nlsolver_tpu.ops.eigh_jacobi import eigh_jacobi_pallas

def fetch(x): return float(np.asarray(jnp.sum(x[0].astype(jnp.float32))))
def timed(run, runs=5, warmup=2):
    for _ in range(warmup): fetch(run())
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter(); fetch(run()); ts.append(time.perf_counter()-t0)
    return statistics.median(ts)

CHAIN = 8
def chained(eigh_fn, A):
    # dependent chain: feed eigenvector-perturbed matrix back in
    def body(A, _):
        w, V = eigh_fn(A)
        A2 = A + 1e-6 * V[:, :1] * jnp.swapaxes(V[:, :1], 0, 1)  # rank-1 nudge, [n,n,B]
        return A2, w
    Af, ws = jax.lax.scan(body, A, None, length=CHAIN)
    return ws

def chained_major(eigh_fn, A):   # [B, n, n] layouts
    def body(A, _):
        w, V = eigh_fn(A)
        A2 = A + 1e-6 * V[..., :1] @ jnp.swapaxes(V[..., :1], -1, -2)
        return A2, w
    Af, ws = jax.lax.scan(body, A, None, length=CHAIN)
    return ws

rng = np.random.default_rng(0)
for n, B in ((8, 4096), (16, 4096), (32, 2048)):
    As = rng.standard_normal((B, n, n)).astype(np.float32); As = (As + As.transpose(0,2,1))/2
    Am = jnp.asarray(As)                      # [B, n, n]
    Abm = jnp.asarray(np.moveaxis(As, 0, -1)) # [n, n, B]

    xla = jax.jit(functools.partial(chained_major, lambda A: jnp.linalg.eigh(A)))
    jac = jax.jit(functools.partial(chained, lambda A: eigh_jacobi(A, sweeps=8)))
    pal = jax.jit(functools.partial(chained, lambda A: eigh_jacobi_pallas(A, sweeps=8, tile=256, sort=False)))
    jac_nosort = jax.jit(functools.partial(chained, lambda A: eigh_jacobi(A, sweeps=8, sort=False)))

    t_xla = timed(lambda: xla(Am))
    t_jac = timed(lambda: jac(Abm))
    t_jns = timed(lambda: jac_nosort(Abm))
    t_pal = timed(lambda: pal(Abm))
    per = lambda t: t / CHAIN / B * 1e9
    print(f"n={n:3d} B={B}: XLA {per(t_xla):8.0f} ns/mat | jacobi {per(t_jac):8.0f} | jacobi-nosort {per(t_jns):8.0f} | pallas {per(t_pal):8.0f}")
