"""Generate the reference-format `.graph` fixture oracle for the scallop
decomposition ladder (VERDICT r2 #4).

Writes tests/fixtures/ladder/<arm>_<k>.graph (the reference instance
format, rnacore/splice_graph.cc:329-376) plus optional <name>.phase
phasing-path sidecars (lines: `count v1 v2 ...` -> hyper_set node lists,
the phase_set -> hyper_set input of scallop.cc:38-45) and one
expected.json with each fixture's construction-derived truth:

- arm: the ladder rung the fixture forces (asserted via
  Scallop.arm_counts -- failures name the arm);
- paths: the UNIQUE decomposition {vertex tuple: weight}; weights are
  exact wherever the construction keeps flows consistent (trivial,
  broken, unsplittable-single threading, splittable-pure threading,
  phasing-protected edges); the smallest-edge arm necessarily perturbs
  flow by the removed spurious weight, so those fixtures assert exact
  path SETS plus weight conservation to the removed amount.

Arm constructions (all integer flows; every interior vertex's weight
equals its throughflow so balance_vertex is the identity):

- trivial:      K disjoint parallel chains source->...->sink, distinct
                weights; every interior vertex has in/out degree 1
                (resolve_trivial_vertex, scallop.cc:1180-1256).
- broken:       trivial + a dead-end interior vertex (in-edges, no
                out-edges -> resolve_broken_vertex, scallop.cc:190-236).
- unsplit:      X with in {e1:a, e2:b}, out {e3:c, e4:d}, a+b=c+d,
                c<a, b<d, phasing routes (e1,e3),(e1,e4),(e2,e4): one
                connected bipartite component -> UNSPLITTABLE_SINGLE
                (router.cc:116-171); thread_leaf telescopes to the exact
                pe2w {(e1,e3):c, (e1,e4):d-b, (e2,e4):b}
                (router.cc:859-897).
- split:        X with routes only (e1,e3),(e2,e4) and a=c, b=d: two
                bipartite components -> SPLITTABLE_PURE; per-component
                threading is exact.  (The reference's subsetsum split of
                splittable vertices, router.cc:360-543, is dead code on
                the live path: the mixed/splittable branch sits after the
                unconditional break at scallop.cc:150; SPLITTABLE_PURE
                vertices are threaded by router::build like unsplittable
                ones, which is what these fixtures pin.)
- smallest:     X additionally carries a spurious out-edge X->Y with
                ratio s/(c+d+s) in (0.01, 0.30), no phasing support,
                both endpoints with degree >= 2: resolve_smallest_edges
                removes exactly it (scallop.cc:844-945).
- protected:    the same spurious edge WITH phasing paths through it on
                both sides: hs.left_extend && hs.right_extend vetoes the
                removal (scallop.cc:890-904); the edge survives into the
                threading and its path appears in the decomposition.
"""

import json
import os
import random
import sys

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures", "ladder")


class G:
    def __init__(self):
        self.vw = {}     # vertex -> weight
        self.edges = []  # (s, t, w)
        self.phases = []  # (count, [vertices])

    def path(self, vs, w):
        for k in range(len(vs) - 1):
            self.edges.append((vs[k], vs[k + 1], w))
        for v in vs:
            self.vw[v] = self.vw.get(v, 0) + w

    def edge(self, s, t, w):
        self.edges.append((s, t, w))
        self.vw[s] = self.vw.get(s, 0)
        self.vw[t] = self.vw.get(t, 0)

    def write(self, name):
        n = max(self.vw) + 1
        with open(os.path.join(OUT, name + ".graph"), "w") as fh:
            fh.write("%d\n" % n)
            for v in range(n):
                fh.write("v%d %.1f %d\n"
                         % (v, float(self.vw.get(v, 0)), 100))
            for (s, t, w) in self.edges:
                fh.write("%d %d %.1f 100\n" % (s, t, float(w)))
        if self.phases:
            with open(os.path.join(OUT, name + ".phase"), "w") as fh:
                for c, vs in self.phases:
                    fh.write("%d %s\n" % (c, " ".join(map(str, vs))))


def gen_trivial(rng, k):
    g = G()
    npaths = rng.randint(2, 4)
    weights = rng.sample(range(3, 40), npaths)
    nxt = 1
    paths = {}
    chains = []
    for w in weights:
        ln = rng.randint(1, 3)
        vs = list(range(nxt, nxt + ln))
        nxt += ln
        chains.append((vs, w))
    sink = nxt
    g.vw[0] = sum(weights)
    for vs, w in chains:
        full = [0] + vs + [sink]
        g.path(full, w)
        paths[tuple(full)] = float(w)
    g.vw[0] = g.vw[sink] = sum(weights)
    return g, {"arm": "trivial", "exact": True,
               "paths": {",".join(map(str, p)): w
                         for p, w in paths.items()}}


def gen_broken(rng, k):
    g = G()
    npaths = rng.randint(2, 3)
    weights = rng.sample(range(3, 30), npaths)
    nxt = 1
    chains = []
    for w in weights:
        ln = rng.randint(1, 2)
        vs = list(range(nxt, nxt + ln))
        nxt += ln
        chains.append((vs, w))
    dead = nxt              # interior dead end (in-edge, no out-edge)
    sink = nxt + 1
    paths = {}
    for vs, w in chains:
        full = [0] + vs + [sink]
        g.path(full, w)
        paths[tuple(full)] = float(w)
    m = rng.randint(2, 9)
    g.edge(0, dead, m)
    g.vw[dead] = m
    g.vw[0] = sum(weights) + m
    g.vw[sink] = sum(weights)
    return g, {"arm": "broken", "exact": True,
               "paths": {",".join(map(str, p)): w
                         for p, w in paths.items()}}


def gen_unsplit(rng, k):
    g = G()
    # 0 P1=1 P2=2 X=3 Q1=4 Q2=5 T=6
    c = rng.randint(3, 15)
    b = rng.randint(2, 12)
    extra = rng.randint(1, 8)
    d = b + extra            # b < d
    a = c + extra            # a+b = c+d, c < a
    g.path([0, 1, 3], a)
    g.path([0, 2, 3], b)
    g.path([3, 4, 6], c)
    g.path([3, 5, 6], d)
    g.vw[3] = a + b
    g.phases = [(2, [1, 3, 4]), (2, [1, 3, 5]), (2, [2, 3, 5])]
    paths = {(0, 1, 3, 4, 6): float(c),
             (0, 1, 3, 5, 6): float(d - b),
             (0, 2, 3, 5, 6): float(b)}
    return g, {"arm": "unsplittable", "exact": True,
               "paths": {",".join(map(str, p)): w
                         for p, w in paths.items()}}


def gen_split(rng, k):
    g = G()
    a = rng.randint(3, 20)
    b = rng.randint(3, 20)
    while b == a:
        b = rng.randint(3, 20)
    g.path([0, 1, 3], a)
    g.path([0, 2, 3], b)
    g.path([3, 4, 6], a)
    g.path([3, 5, 6], b)
    g.vw[3] = a + b
    g.phases = [(2, [1, 3, 4]), (2, [2, 3, 5])]
    paths = {(0, 1, 3, 4, 6): float(a), (0, 2, 3, 5, 6): float(b)}
    return g, {"arm": "splittable", "exact": True,
               "paths": {",".join(map(str, p)): w
                         for p, w in paths.items()}}


def _spurious_base(rng, protected):
    """X = 3 with in {a, b}, out {c, d, s->Y}; Y = 6 also fed m from 0.
    Real-edge ratios stay >= 0.30 so only the spurious edge qualifies.
    protected mode keeps flows per-threading-component consistent
    (a = c+s, b = d) and adds both-side phasing through the spurious
    edge so left/right_extend veto the removal."""
    g = G()
    # keep real weights within 2.33x so min/sum >= 0.30 pre+post removal
    c = rng.randint(8, 12)
    d = rng.randint(8, 12)
    s = 2                    # spurious: 2/(c+d+2) ~ 0.09..0.11 < 0.30
    if protected:
        a = c + s            # component {e1, e3, e*} consistent
        b = d                # component {e2, e4} consistent
    else:
        extra = rng.randint(-2, 2)
        b = c + extra
        a = d + s - extra    # a+b = c+d+s
    m = rng.randint(5, 15)
    # 0 P1=1 P2=2 X=3 Q1=4 Q2=5 Y=6 T=7
    g.path([0, 1, 3], a)
    g.path([0, 2, 3], b)
    g.path([3, 4, 7], c)
    g.path([3, 5, 7], d)
    g.edge(3, 6, s)
    g.path([0, 6], m)
    g.path([6, 7], m + s)
    g.vw[3] = a + b
    g.vw[6] = m + s
    g.vw[0] = a + b + m
    g.vw[7] = c + d + m + s
    # both-side phasing on every REAL edge of X; protected mode must NOT
    # carry the (e1,e4) route or the bipartite graph becomes one
    # component and the split derivation changes
    g.phases = [(2, [1, 3, 4]), (2, [2, 3, 5]),
                (2, [0, 1, 3]), (2, [0, 2, 3]),
                (2, [3, 4, 7]), (2, [3, 5, 7])]
    if protected:
        g.phases += [(2, [1, 3, 6]), (2, [3, 6, 7])]
    else:
        g.phases.append((2, [1, 3, 5]))
    return g, a, b, c, d, s, m


def gen_smallest(rng, k):
    g, a, b, c, d, s, m = _spurious_base(rng, protected=False)
    # after the removal flows are off by s at X and Y; assert exact path
    # SETS + conservation (see module docstring)
    paths = [(0, 1, 3, 4, 7), (0, 1, 3, 5, 7), (0, 2, 3, 5, 7),
             (0, 6, 7)]
    return g, {"arm": "smallest", "exact": False,
               "paths": {",".join(map(str, p)): None for p in paths},
               "total": float(a + b + m - s),
               "slack": float(2 * s)}


def gen_protected(rng, k):
    g, a, b, c, d, s, m = _spurious_base(rng, protected=True)
    # consistent flows; threading components:
    #   {e1, e3, e*}: c then s off e1;  {e2, e4}: b... with routes
    #   (e1,e3),(e1,e*),(e2,e4) and a = c+s, b = d
    # constraint: regenerate weights for exact consistency
    paths = {(0, 1, 3, 4, 7): float(c),
             (0, 1, 3, 6, 7): float(s),
             (0, 2, 3, 5, 7): float(d),
             (0, 6, 7): float(m)}
    return g, {"arm": "protected", "exact": True,
               "paths": {",".join(map(str, p)): w
                         for p, w in paths.items()}}


def main():
    os.makedirs(OUT, exist_ok=True)
    for f in os.listdir(OUT):
        os.remove(os.path.join(OUT, f))
    expected = {}
    gens = [("trivial", gen_trivial, 20), ("broken", gen_broken, 15),
            ("unsplit", gen_unsplit, 25), ("split", gen_split, 25),
            ("smallest", gen_smallest, 20),
            ("protected", gen_protected, 15)]
    for tag, fn, count in gens:
        for k in range(count):
            rng = random.Random(hash((tag, k)) & 0xffffffff)
            g, exp = fn(rng, k)
            name = "%s_%02d" % (tag, k)
            g.write(name)
            expected[name] = exp
    with open(os.path.join(OUT, "expected.json"), "w") as fh:
        json.dump(expected, fh, indent=1, sort_keys=True)
    print("wrote %d fixtures to %s" % (len(expected), OUT))


if __name__ == "__main__":
    sys.exit(main())
