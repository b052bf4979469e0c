"""Path-guided 1D SGD graph sort as a batched JAX kernel.

Equivalent capability to odgi's path_linear_sgd_order used by the reference's
prep stage (reference: src/prep.cpp:30-125; hyperparameters: iter_max=100,
zipf theta=0.99, eps=0.01, cooling at 0.5, eta_max=max_path_step_count^2,
min_term_updates = factor * sum_path_step_count, seed "pangenomic!").

The reference runs Hogwild-style asynchronous updates over threads; the
TPU-native design instead applies each iteration's term updates as one
batched, vectorized step (gather -> per-term delta -> segment-sum scatter),
which is the natural data-parallel formulation: one jit-compiled update per
iteration, B terms wide.  Terms sample a step uniformly, a second step of
the same path at a zipf-distributed rank distance, and pull the two nodes'
1D positions toward their nucleotide distance along the path.
"""
from __future__ import annotations

import numpy as np

from ..graph.mutable import MutableGraph


def _zipf_cdf(n: int, theta: float) -> np.ndarray:
    ranks = np.arange(1, n + 1, dtype=np.float64)
    w = ranks ** (-theta)
    cdf = np.cumsum(w)
    return cdf / cdf[-1]


def path_sgd_order(
    g: MutableGraph,
    iter_max: int = 100,
    eps: float = 0.01,
    theta: float = 0.99,
    cooling_start: float = 0.5,
    min_term_updates_factor: float = 1.0,
    seed: int = 9399527, # fnv-ish hash of "pangenomic!"
    device: str = "auto",
) -> list[int]:
    """Returns node ids ordered by their optimized 1D position.

    device: "auto" routes small graphs (< ~5M terms per iteration) to the
    local CPU backend — a remote-TPU compile costs minutes per process and
    only pays off at pod scale — and large graphs to the default backend;
    "cpu"/"default" force a choice."""
    import jax
    import jax.numpy as jnp

    node_ids = list(g.node_ids())
    n = len(node_ids)
    if n <= 1:
        return node_ids
    id2ix = {nid: i for i, nid in enumerate(node_ids)}
    node_len = np.array([len(g.seqs[nid]) for nid in node_ids], dtype=np.float64)

    # flat step arrays over all paths
    st_node, st_pos, st_path_off, st_path_len = [], [], [], []
    off = 0
    for steps in g.path_steps:
        st_path_off.append(off)
        pos = 0
        for h in steps:
            ix = id2ix[h >> 1]
            st_node.append(ix)
            st_pos.append(pos + node_len[ix] / 2.0)
            pos += node_len[ix]
        st_path_len.append(len(steps))
        off += len(steps)
    T = off
    if T == 0:
        return node_ids
    st_node = np.array(st_node, dtype=np.int32)
    st_pos = np.array(st_pos, dtype=np.float64)
    step_path_start = np.zeros(T, dtype=np.int32)
    step_path_count = np.zeros(T, dtype=np.int32)
    for p, (o, c) in enumerate(zip(st_path_off, st_path_len)):
        step_path_start[o:o + c] = o
        step_path_count[o:o + c] = c

    max_steps = max(st_path_len) if st_path_len else 1
    zipf_space = int(max(2, max(st_path_len)))
    cdf = _zipf_cdf(zipf_space, theta)

    eta_max = float(max_steps) ** 2
    lam = np.log(eta_max / eps) / max(iter_max - 1, 1)
    B = max(int(min_term_updates_factor * T), 1)

    # init positions at current vector offsets (node center)
    x0 = np.cumsum(node_len) - node_len / 2.0

    def _solve():
      dev_node = jnp.asarray(st_node)
      dev_pos = jnp.asarray(st_pos, dtype=jnp.float32)
      dev_start = jnp.asarray(step_path_start)
      dev_count = jnp.asarray(step_path_count)
      dev_cdf = jnp.asarray(cdf, dtype=jnp.float32)

      etas = jnp.asarray(eta_max * np.exp(-lam * np.arange(iter_max)),
                         dtype=jnp.float32)
      caps = jnp.asarray(
          [zipf_space if t < iter_max * cooling_start
           else min(zipf_space, 1000)
           for t in range(iter_max)], dtype=jnp.int32)
      n_nodes = n

      @jax.jit
      def run(x, key):
        def one_iter(t, carry):
            x, key = carry
            key, k1, k2, k3 = jax.random.split(key, 4)
            eta = etas[t]
            space_cap = caps[t]
            i1 = jax.random.randint(k1, (B,), 0, T)
            u = jax.random.uniform(k2, (B,))
            z = jnp.searchsorted(dev_cdf, u) + 1
            z = jnp.minimum(z, space_cap).astype(jnp.int32)
            sgn = jnp.where(jax.random.bernoulli(k3, 0.5, (B,)), 1, -1
                            ).astype(jnp.int32)
            r1 = i1 - dev_start[i1]
            cnt = dev_count[i1]
            r2 = r1 + sgn * z
            r2 = jnp.where((r2 < 0) | (r2 >= cnt), r1 - sgn * z, r2)
            r2 = jnp.clip(r2, 0, cnt - 1)
            i2 = dev_start[i1] + r2
            n1, n2 = dev_node[i1], dev_node[i2]
            d = jnp.abs(dev_pos[i1] - dev_pos[i2])
            ok = (n1 != n2) & (d > 0)
            d = jnp.maximum(d, 1e-3)
            mu = jnp.minimum(eta / (d * d), 1.0)
            dx = x[n1] - x[n2]
            mag = jnp.abs(dx) + 1e-9
            delta = mu * (mag - d) / 2.0
            rr = jnp.where(ok, delta / mag, 0.0)
            upd = rr * dx
            # the reference applies term updates Hogwild-sequentially; the
            # batched equivalent averages conflicting per-node updates so
            # simultaneous terms cannot compound into divergence
            acc = jnp.zeros((n_nodes,), jnp.float32)
            cnt_nd = jnp.zeros((n_nodes,), jnp.float32)
            acc = acc.at[n1].add(-upd).at[n2].add(upd)
            one = jnp.where(ok, 1.0, 0.0)
            cnt_nd = cnt_nd.at[n1].add(one).at[n2].add(one)
            x = x + acc / jnp.maximum(cnt_nd, 1.0)
            return (x, key)
        x, _ = jax.lax.fori_loop(0, iter_max, one_iter, (x, key))
        return x

      x = jnp.asarray(x0, dtype=jnp.float32)
      key = jax.random.PRNGKey(seed)
      x = run(x, key)
      xh = np.asarray(jax.device_get(x), dtype=np.float64)
      order = np.argsort(xh, kind="stable")
      return [node_ids[i] for i in order]

    # a remote-TPU compile costs minutes per process; route small graphs
    # to the local CPU backend where the same jit compiles in seconds —
    # the device only pays off at pod scale (B x iter_max >> 1e8 updates)
    use_cpu = device == "cpu" or (device == "auto" and B < 5_000_000)
    if use_cpu:
        try:
            cpu_dev = jax.devices("cpu")[0]
        except RuntimeError:        # pragma: no cover - cpu always exists
            cpu_dev = None
        if cpu_dev is not None:
            with jax.default_device(cpu_dev):
                return _solve()
    return _solve()
