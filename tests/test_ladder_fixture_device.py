"""Device-ladder arm preservation on the 120-fixture ladder oracle.

The fixtures (tools/gen_ladder_fixtures.py) pin each scallop resolution
arm; here each fixture's device-coverable PREFIX — the decisions the
batched ladder kernel would consume in trust mode — must match the host
Scallop decision-for-decision, and the per-arm firing counts implied by
the oracle stay intact (broken/trivial/smallest prefixes agree exactly;
router-arm fixtures stop CLEAN at the pause point the native consume
resumes from)."""

import json
import os
import sys

import pytest

from aletsch_tpu.config import Parameters
from aletsch_tpu.core.graph_io import read_graph_reference
from aletsch_tpu.ops import ladder_kernel, ladder_ref
from aletsch_tpu.scallop.decompose import Scallop
from aletsch_tpu.scallop.hyper_set import HyperSet

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")
LADDER = os.path.join(FIXTURES, "ladder")

KW = dict(V=48, E=192, H=24, L=24, DMAX=24, DLOG=96)


def _cases():
    exp_path = os.path.join(LADDER, "expected.json")
    if not os.path.exists(exp_path):
        return []
    with open(exp_path) as fh:
        return sorted(json.load(fh).items())


def _build(name, cls):
    sys.path.insert(0, os.path.dirname(__file__))
    from test_graph_reference import _load_phases, _stamp
    gr = read_graph_reference(os.path.join(LADDER, name + ".graph"))
    gr.chrm = "1"
    gr.gid = name
    gr.strand = "+"
    _stamp(gr)
    hs = HyperSet()
    _load_phases(name, hs)
    return cls(gr, hs, Parameters())


def test_fixture_prefixes_match_and_cover_arms():
    sys.path.insert(0, os.path.dirname(__file__))
    from test_ladder_ref import LoggingScallop, run_restricted
    cases = _cases()
    if not cases:
        pytest.skip("ladder fixtures not generated")
    refs, hosts, names = [], [], []
    for name, exp in cases:
        host = _build(name, LoggingScallop)
        st = ladder_ref.export_scallop(_build(name, Scallop),
                                       emax=KW["E"], hmax=KW["H"],
                                       lmax=KW["L"])
        if st is None or st.nv > KW["V"]:
            continue
        refs.append(st)
        hosts.append(host)
        names.append(name)
    assert len(refs) >= 100, "fixture coverage collapsed (%d)" % len(refs)
    logs, status, _ = ladder_kernel.run_kernel(refs, **KW)
    arms_fired = {ladder_ref.BROKEN: 0, ladder_ref.TRIVIAL: 0,
                  ladder_ref.SMALLEST: 0}
    for i, host in enumerate(hosts):
        run_restricted(host)
        assert status[i] == 0, names[i]
        assert logs[i] == host.declog, (names[i], logs[i], host.declog)
        for arm, _t in logs[i]:
            arms_fired[arm] += 1
    # the oracle's broken/trivial/smallest fixtures all fire on device
    assert arms_fired[ladder_ref.TRIVIAL] > 50
    assert arms_fired[ladder_ref.SMALLEST] > 5
    assert arms_fired[ladder_ref.BROKEN] >= 1
