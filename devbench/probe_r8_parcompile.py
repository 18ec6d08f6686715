"""Probe: do axon remote compiles overlap across Python threads?

The round-3 bench chronically hit the driver kill (~1400 s) because each
phase pays a serial remote compile (primary ~650 s, full-path ~500 s each).
If `.lower().compile()` releases the GIL and the remote compile service
accepts concurrent requests, bench.py can AOT-compile all phase graphs in
parallel threads at t=0 and only measure serially.

Also checks: does compiling in a background thread stall device execution
on the main thread? (It shouldn't — compile never touches the chip.)
"""
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

print("devices:", jax.devices(), flush=True)


def make_fn(depth, width, seed):
    """A conv stack expensive enough to compile measurably (~20-60 s)."""
    ws = [jnp.asarray(
        np.random.default_rng(seed + i).normal(size=(3, 3, width, width)),
        jnp.bfloat16) for i in range(depth)]

    def f(x):
        for w in ws:
            x = jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            x = jax.nn.relu(x)
        return jnp.sum(x)
    return jax.jit(f)


x = jnp.zeros((8, 64, 64, 96), jnp.bfloat16)

# --- sequential baseline: two distinct graphs
fns = [make_fn(24, 96, s) for s in (0, 1)]
t0 = time.time()
lowered = [f.lower(x) for f in fns]
c0 = lowered[0].compile(); t1 = time.time()
c1 = lowered[1].compile(); t2 = time.time()
print(f"sequential: g0={t1-t0:.1f}s g1={t2-t1:.1f}s total={t2-t0:.1f}s", flush=True)

# --- threaded: two more distinct graphs compiled concurrently
fns2 = [make_fn(24, 96, s) for s in (2, 3)]
lowered2 = [f.lower(x) for f in fns2]
results = [None, None]
def compile_one(i):
    t = time.time()
    results[i] = lowered2[i].compile()
    print(f"  thread {i} compile done in {time.time()-t:.1f}s", flush=True)

t0 = time.time()
threads = [threading.Thread(target=compile_one, args=(i,)) for i in range(2)]
for th in threads: th.start()
for th in threads: th.join()
t_par = time.time() - t0
print(f"threaded total={t_par:.1f}s", flush=True)

# --- does a background compile stall device execution?
fn3 = make_fn(24, 96, 4)
low3 = fn3.lower(x)
exe = results[0]
# warm up the executable
float(exe(x))
t0 = time.time()
n = 0
done = threading.Event()
def bg():
    low3.compile()
    done.set()
th = threading.Thread(target=bg); th.start()
while not done.is_set() and time.time() - t0 < 300:
    float(exe(x)); n += 1
th.join()
dt = time.time() - t0
print(f"during bg compile: {n} exec iters in {dt:.1f}s ({n/max(dt,1e-9):.1f} it/s)", flush=True)
# baseline exec rate
t0 = time.time()
for _ in range(n or 10):
    float(exe(x))
print(f"baseline exec: {(n or 10)/(time.time()-t0):.1f} it/s", flush=True)
