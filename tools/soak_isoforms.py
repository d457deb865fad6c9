import os
import sys, os, random
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax; jax.config.update("jax_platforms", "cpu")
from aletsch_tpu.sim import simulate_pairs, write_bam
from aletsch_tpu.config import default_params
from aletsch_tpu.meta.incubator import Incubator
from aletsch_tpu.io.gtf import read_gtf

def make_gene(g, rng):
    """3-5 exons; isoform A = all exons, isoform B skips one middle exon."""
    off = 50000 + g * 100000
    exons, p = [], off
    for e in range(rng.randint(3, 5)):
        el = rng.randint(150, 400)
        exons.append((p, p + el)); p += el + rng.randint(500, 2000)
    skip = rng.randint(1, len(exons) - 2)
    isoA = exons
    isoB = exons[:skip] + exons[skip + 1:]
    return isoA, isoB

def chain(exons):
    return tuple((exons[k-1][1], exons[k][0]) for k in range(1, len(exons)))

N = 30
rng = random.Random(777)
genes = [make_gene(g, rng) for g in range(N)]
base = "/tmp/iso"; os.makedirs(base, exist_ok=True)
bams = []
for s in range(3):
    srng = random.Random(40 + s)
    recs = []
    for g, (A, B) in enumerate(genes):
        st = "+" if g % 2 == 0 else "-"
        recs += simulate_pairs(A, 60, st, srng, prefix="a%d_%d" % (s, g))
        recs += simulate_pairs(B, 25, st, srng, prefix="b%d_%d" % (s, g))
    p = os.path.join(base, "s%d.bam" % s)
    write_bam(p, recs, ("chr1",), (10000000,))
    bams.append(p)
bl = os.path.join(base, "bams.list")
open(bl, "w").write("".join("%s x paired_end\n" % b for b in bams))
params = default_params()
out = os.path.join(base, "gtf"); os.makedirs(out, exist_ok=True)
for p in params:
    p.input_bam_list = bl
    p.output_gtf_file = os.path.join(base, "meta.gtf")
    p.output_gtf_dir = out
    p.verbose = 0
Incubator(params).resolve()
got = {chain(t.exons) for t in read_gtf(os.path.join(base, "meta.gtf")) if len(t.exons) > 1}
okA = sum(1 for A, B in genes if chain(A) in got)
okB = sum(1 for A, B in genes if chain(B) in got)
both = sum(1 for A, B in genes if chain(A) in got and chain(B) in got)
print("major isoform recovered: %d/%d; minor (exon-skip): %d/%d; both: %d/%d"
      % (okA, N, okB, N, both, N))
