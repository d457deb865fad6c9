import os, sys, time, random
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax; jax.config.update("jax_platforms", "cpu")
from aletsch_tpu.config import default_params
from aletsch_tpu.sim import simulate_pairs, write_bam
from aletsch_tpu.meta.incubator import Incubator
from aletsch_tpu.utils.tracing import rss_mb

base = "/tmp/soak"
os.makedirs(base, exist_ok=True)
N_GENES, CHRLEN, NS = 500, 160000000, 10

def gene_exons(g):
    off = 50000 + g * 300000
    rng = random.Random(g)
    exons, p = [], off
    for e in range(rng.randint(2, 6)):
        el = rng.randint(120, 500)
        exons.append((p, p + el)); p += el + rng.randint(500, 3000)
    return exons

t0 = time.time()
bams = []
total_reads = 0
for s in range(NS):
    p = os.path.join(base, "s%d.bam" % s)
    bams.append(p)
    if os.path.exists(p):
        continue
    rng = random.Random(s + 21)
    recs = []
    for g in range(N_GENES):
        depth = rng.randint(8, 40)
        recs += simulate_pairs(gene_exons(g), depth, "+" if g % 2 == 0 else "-",
                               rng, prefix="s%dg%d" % (s, g))
    total_reads += len(recs)
    write_bam(p, recs, ("chr1",), (CHRLEN,))
print("sim done %.1fs (%d reads this run)" % (time.time() - t0, total_reads))
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
nt = sum(1 for line in open(os.path.join(base, "meta.gtf")) if "\ttranscript\t" in line)
sz = sum(os.path.getsize(b) for b in bams)
print("SOAK: %d bundles, %d transcripts in %.1fs  (%.1f bundles/s, %.1f MB/s BAM, rss %.0f MB)"
      % (inc.stats["bundles"], nt, dt, inc.stats["bundles"]/dt, sz/1e6/dt, rss_mb()))
