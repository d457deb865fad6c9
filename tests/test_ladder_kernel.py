"""Fuzz the batched device ladder kernel (ops/ladder_kernel.py) against
the dense reference machine (ops/ladder_ref.py) — decision logs, statuses
and final dense state bit-for-bit on the IEEE-f64 CPU backend.

Together with tests/test_ladder_ref.py (machine == Python Scallop) this
closes the trust-mode chain: device decisions == host ladder decisions.
"""

import numpy as np
import pytest

from aletsch_tpu.ops import ladder_kernel, ladder_ref

# small shapes keep the CPU fuzz fast
KW = dict(V=24, E=96, H=16, L=16, DMAX=12, DLOG=64)


def make_states(seeds):
    import sys
    sys.path.insert(0, "tests")
    from test_ladder_ref import make_scallop
    refs, states = [], []
    for seed in seeds:
        sc = make_scallop(seed)
        if sc is None:
            continue
        st = ladder_ref.export_scallop(
            sc, emax=KW["E"], hmax=KW["H"], lmax=KW["L"])
        if st is None:
            continue
        if st.nv > KW["V"]:
            continue
        # reference DMAX eligibility (kernel overflows on deeper lists)
        refs.append(st)
        twin = ladder_ref.export_scallop(
            make_scallop(seed), emax=KW["E"], hmax=KW["H"], lmax=KW["L"])
        states.append(twin)
    return refs, states


@pytest.mark.parametrize("chunk", range(4))
def test_kernel_matches_reference(chunk):
    seeds = range(chunk * 25, chunk * 25 + 25)
    refs, states = make_states(seeds)
    if not states:
        pytest.skip("no eligible graphs")
    logs, status, finals = ladder_kernel.run_kernel(states, **KW)
    ewrt, ealive, esrc, edst, estr, nedges, hedge, hlen, nz = finals
    for b, ref in enumerate(refs):
        dec, st = ladder_ref.run_ladder(ref, max_decisions=KW["DLOG"])
        if st != ladder_ref.ST_CLEAN or status[b] != 0:
            # overflow semantics: host redoes everything; only require
            # the kernel reported an overflow too when the ref overflowed
            assert status[b] != 0 or st == ladder_ref.ST_CLEAN
            continue
        assert logs[b] == dec, (b, logs[b][:8], dec[:8])
        ne = ref.n_edges
        assert int(nedges[b]) == ne
        assert np.array_equal(ealive[b, :ne], ref.e_alive[:ne]), b
        am = ref.e_alive[:ne]
        assert np.array_equal(esrc[b, :ne][am], ref.e_src[:ne][am]), b
        assert np.array_equal(edst[b, :ne][am], ref.e_dst[:ne][am]), b
        assert np.array_equal(ewrt[b, :ne][am], ref.e_wrt[:ne][am]), b
        assert np.array_equal(estr[b, :ne][am],
                              ref.e_str[:ne][am].astype(np.int32)), b
        nh = ref.n_hyper
        assert np.array_equal(hlen[b, :nh], ref.h_len[:nh]), b
        for k in range(nh):
            ln = ref.h_len[k]
            assert np.array_equal(hedge[b, k, :ln],
                                  ref.h_edge[k, :ln]), (b, k)
        assert np.array_equal(nz[b, :ref.nv], ref.nonzero), b


def make_broken(seed, cls=None):
    """Graph with an orphaned interior vertex (exercises the broken arm,
    which flow-consistent simulate_graph output never produces)."""
    import random

    from aletsch_tpu.config import Parameters
    from aletsch_tpu.core.graph_io import simulate_graph
    from aletsch_tpu.scallop.decompose import Scallop
    import sys
    sys.path.insert(0, "tests")
    from test_ladder_ref import random_phase_paths, stamp
    cls = cls or Scallop
    rng = random.Random(seed)
    gr = simulate_graph(10, 20, 100, seed=seed)
    if gr.num_edges() == 0:
        return None
    for v in range(2, gr.num_vertices() - 2):
        ins = gr.in_edges(v)
        if ins and gr.out_degree(v) > 0:
            for e in list(ins):
                gr.remove_edge(e)
            break
    stamp(gr)
    hs = random_phase_paths(gr, rng, 4)
    hs.filter_nodes(gr)
    return cls(gr, hs, Parameters())


@pytest.mark.parametrize("seed", range(12))
def test_broken_arm_three_way(seed):
    import sys
    sys.path.insert(0, "tests")
    from test_ladder_ref import LoggingScallop, run_restricted
    host = make_broken(seed, LoggingScallop)
    if host is None:
        pytest.skip("empty graph")
    st = ladder_ref.export_scallop(make_broken(seed), emax=KW["E"],
                                   hmax=KW["H"], lmax=KW["L"])
    if st is None:
        pytest.skip("ineligible")
    run_restricted(host)
    dec, status = ladder_ref.run_ladder(st)
    assert status == ladder_ref.ST_CLEAN
    assert dec == host.declog
    twin = ladder_ref.export_scallop(make_broken(seed), emax=KW["E"],
                                     hmax=KW["H"], lmax=KW["L"])
    logs, kstatus, _ = ladder_kernel.run_kernel([twin], **KW)
    assert kstatus[0] == 0 and logs[0] == dec


def test_kernel_inactive_rows():
    refs, states = make_states(range(3))
    if not states:
        pytest.skip("no eligible graphs")
    # pad with inactive rows
    logs, status, _ = ladder_kernel.run_kernel(
        states + [None, None], B=len(states) + 2, **KW)
    assert all(s == 0 for s in status[len(states):])
    assert logs[len(states):] == [[], []] if len(logs) > len(states) \
        else True
