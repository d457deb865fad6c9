import os, sys, time, random
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax; jax.config.update("jax_platforms", "cpu")
from aletsch_tpu.config import default_params
from aletsch_tpu.sim import simulate_pairs, write_bam
from aletsch_tpu.meta.incubator import Incubator
from aletsch_tpu.utils.tracing import rss_mb
from aletsch_tpu.io.gtf import read_gtf

base = "/tmp/bigsoak"
N_GENES, CHRLEN, NS = 2000, 630000000, 10   # ~human-chr1-scale coordinates

def gene_exons(g):
    off = 50000 + g * 300000
    rng = random.Random(g * 7 + 1)
    exons, p = [], off
    for e in range(rng.randint(2, 7)):
        el = rng.randint(120, 500)
        exons.append((p, p + el)); p += el + rng.randint(500, 4000)
    return exons

t0 = time.time()
bams = []
total = 0
for s in range(NS):
    p = os.path.join(base, "s%d.bam" % s)
    bams.append(p)
    if os.path.exists(p):
        continue
    rng = random.Random(s + 77)
    recs = []
    for g in range(N_GENES):
        depth = rng.randint(10, 60)
        recs += simulate_pairs(gene_exons(g), depth, "+" if g % 2 == 0 else "-",
                               rng, prefix="s%dg%d" % (s, g))
    total += len(recs)
    write_bam(p, recs, ("chr1",), (CHRLEN,))
print("sim: %d records in %.0fs" % (total, time.time() - t0), flush=True)
bl = os.path.join(base, "bams.list")
open(bl, "w").write("".join("%s x paired_end\n" % b for b in bams))

params = default_params()
out = os.path.join(base, "gtf"); os.makedirs(out, exist_ok=True)
for p in params:
    p.input_bam_list = bl
    p.output_gtf_file = os.path.join(base, "meta.gtf")
    p.output_gtf_dir = out
    p.verbose = 1
t0 = time.time()
inc = Incubator(params)
inc.resolve()
dt = time.time() - t0

def chain(exons):
    return tuple((exons[k-1][1], exons[k][0]) for k in range(1, len(exons)))
truth = {chain(gene_exons(g)) for g in range(N_GENES)}
got = {chain(t.exons) for t in read_gtf(os.path.join(base, "meta.gtf")) if len(t.exons) > 1}
def is_sub(c, f):
    n, m = len(c), len(f)
    return any(c == f[i:i+n] for i in range(m-n+1))
novel = sum(1 for c in got - truth if not any(is_sub(c, f) for f in truth))
sz = sum(os.path.getsize(b) for b in bams)
print("BIGSOAK: %d bundles in %.0fs (%.1f bundles/s, %.2f MB/s BAM, rss %.0f MB); recall %d/%d, novel %d"
      % (inc.stats["bundles"], dt, inc.stats["bundles"]/dt, sz/1e6/dt,
         rss_mb(), len(truth & got), len(truth), novel), flush=True)
