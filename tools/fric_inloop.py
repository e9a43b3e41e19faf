"""Isolate the in-loop friction invocation overhead (r4 mystery: ~4.6
ms/iter at B=64 regardless of friction implementation, vs ~0.45 ms for the
same kernel invoked from a lax.scan).

Modes compare the SAME kernel called 100x:
  scan       — lax.scan body (the r5 microbench shape)
  while      — lax.while_loop with a batched done-flag cond (PD loop shape)
  whilesolve — while_loop body = solve matmul + kernel (PD-like data flow)
  whilenof   — while_loop body = solve matmul only (overhead floor)
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

from diffcloth_tpu.core import selfcol as sc
from diffcloth_tpu.core import friction_pallas as fp

print("backend:", jax.default_backend(), flush=True)
rng = np.random.RandomState(9)
n = 1426
n_pad = fp._round_up(n, 128)
x = rng.randn(n, 3).astype(np.float32) * 0.3
v = rng.randn(n, 3).astype(np.float32) * 0.1
radii = (np.abs(rng.rand(n)) * 0.03 + 0.01).astype(np.float32)
conn = np.zeros((n, n), bool); np.fill_diagonal(conn, True)
cand = sc.build_candidate_pairs(conn)
cs = sc.detect_self_collisions(jnp.asarray(cand, jnp.int32),
                               jnp.asarray(radii), jnp.asarray(x),
                               jnp.asarray(v), 0.01, cap_pairs=1024)
cs = sc.assign_layers(cs, n, max_layers=16)
tables = sc.build_layer_tables(cs, n, 16)
area = jnp.asarray((rng.rand(n) + 0.2).astype(np.float32))
density = jnp.asarray(1.7, jnp.float32)
budgets = tuple(min(c, n) for c in sc.compact_slot_budgets(4))
geom = fp.build_kernel_geom(tables, area, n, budgets)
print("counts:", np.asarray(geom.counts), flush=True)

B = 64
fs = jnp.asarray(rng.randn(B, n, 3).astype(np.float32))
p_inv = jnp.asarray(rng.randn(n, n).astype(np.float32) * 0.01)

def fric(fb):
    return jax.vmap(lambda a: fp.self_friction_kernel(
        a, geom, density, jnp.zeros_like(a), budgets))(fb)

def timeit(name, fn, *args):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args); jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(f"{name}: {dt/100*1000:.3f} ms/iteration", flush=True)

@jax.jit
def run_scan(fs):
    def body(c, _):
        return fric(c), ()
    out, _ = jax.lax.scan(body, fs, None, length=100)
    return out

@jax.jit
def run_while(fs):
    def cond(c):
        f, it, done = c
        return jnp.logical_and(it < 100, ~jnp.all(done))
    def body(c):
        f, it, done = c
        f2 = fric(f)
        return f2, it + 1, done
    out, _, _ = jax.lax.while_loop(
        cond, body, (fs, jnp.int32(0), jnp.zeros((B,), bool)))
    return out

@jax.jit
def run_whilesolve(fs):
    def cond(c):
        f, it, done = c
        return jnp.logical_and(it < 100, ~jnp.all(done))
    def body(c):
        f, it, done = c
        g = jnp.einsum("ij,bjk->bik", p_inv, f,
                       precision=jax.lax.Precision.HIGHEST)
        f2 = fric(g)
        return f2, it + 1, done
    out, _, _ = jax.lax.while_loop(
        cond, body, (fs, jnp.int32(0), jnp.zeros((B,), bool)))
    return out

@jax.jit
def run_whilenof(fs):
    def cond(c):
        f, it, done = c
        return jnp.logical_and(it < 100, ~jnp.all(done))
    def body(c):
        f, it, done = c
        g = jnp.einsum("ij,bjk->bik", p_inv, f,
                       precision=jax.lax.Precision.HIGHEST)
        return g, it + 1, done
    out, _, _ = jax.lax.while_loop(
        cond, body, (fs, jnp.int32(0), jnp.zeros((B,), bool)))
    return out

mode = sys.argv[1] if len(sys.argv) > 1 else "all"
if mode in ("all", "scan"):
    timeit("scan", run_scan, fs)
if mode in ("all", "while"):
    timeit("while", run_while, fs)
if mode in ("all", "whilenof"):
    timeit("whilenof", run_whilenof, fs)
if mode in ("all", "whilesolve"):
    timeit("whilesolve", run_whilesolve, fs)
