import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax-comp-cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
import jax, jax.numpy as jnp, numpy as np
from ultra_tpu.data.synthetic import random_kg_triples, with_inverses
from ultra_tpu.graph import make_graph
from ultra_tpu.ops.rspmm_pallas import attach_plans, rspmm_pallas_sum

rb, C = int(sys.argv[1]), int(sys.argv[2])
V, E_DIRECT, R = 14541, 272115, 237
B, D = 8, 64
trip = random_kg_triples(V, R, E_DIRECT, seed=0)
ei, et = with_inverses(trip, R)
E = ei.shape[1]; E_pad = 548864
ei_p = np.concatenate([ei, np.zeros((2, E_pad-E), np.int64)], axis=1)
et_p = np.concatenate([et, np.zeros(E_pad-E, np.int64)])
ew_p = np.concatenate([np.ones(E, np.float32), np.zeros(E_pad-E, np.float32)])
g0 = make_graph(ei, et, num_nodes=V, num_relations=2*R, pad_to=E_pad)
rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.normal(size=(V, B, D)).astype(np.float32))
rel = jnp.asarray(rng.normal(size=(2*R, B, D)).astype(np.float32))
graph = attach_plans(g0, rb=rb, chunk=C, host_edges=(ei_p, et_p, ew_p))
def step(x):
    return 0.999*x + 0.001*rspmm_pallas_sum("mul", V, graph.plans, rel, x, graph.edge_weight)
def run(n):
    f = jax.jit(lambda x: jax.lax.fori_loop(0, n, lambda i,c: step(c), x))
    float(jnp.sum(f(x0)))
    t0=time.time(); float(jnp.sum(f(x0))); return time.time()-t0
t1 = run(1); tn = run(9)
ms = (tn-t1)/8*1e3
print(f"RESULT rb={rb} C={C}: {ms:.2f} ms, {E/ms/1e3:.0f} K e/ms (chunks={graph.plans.dst.num_chunks})", flush=True)
