"""Measured CPU baseline: reference Aletsch (shim-built, -t 10) vs our CLI
on the identical production-scale cohort (the BASELINE.json ">= 10x
bundles/s over 10-thread CPU Aletsch" target, measured for real).

Usage: python tools/refbuild/baseline.py [--genes N] [--samples N]

Cohort = tools/soak_production.py's generator (10 samples x 2000 genes over
630 Mb) plus the sentinel target the reference needs to process the final
region (aletsch_tpu/sim.py::sentinel_target).  Both runs get the same BAMs;
wall-clock ratio == bundles/s ratio on identical input.  Results are
printed as one JSON line and belong in BASELINE.md.
"""

import json
import os
import random
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, REPO)

from tools.refbuild.compare import ensure_binary  # noqa: E402


def build_cohort(base, n_genes, ns, chrlen=630000000):
    from aletsch_tpu.sim import sentinel_target, simulate_pairs, write_bam

    def gene_exons(g):
        off = 50000 + g * 300000
        rng = random.Random(g * 7 + 1)
        exons, p = [], off
        for _ in range(rng.randint(2, 7)):
            el = rng.randint(120, 500)
            exons.append((p, p + el))
            p += el + rng.randint(500, 4000)
        return exons

    os.makedirs(base, exist_ok=True)
    bams = []
    total = 0
    for s in range(ns):
        p = os.path.join(base, "s%d.bam" % s)
        bams.append(p)
        if os.path.exists(p):
            continue
        rng = random.Random(s + 77)
        recs = []
        for g in range(n_genes):
            depth = rng.randint(10, 60)
            recs += simulate_pairs(gene_exons(g), depth,
                                   "+" if g % 2 == 0 else "-", rng,
                                   prefix="s%dg%d" % (s, g))
        total += len(recs)
        recs, names, lengths = sentinel_target(recs, ("chr1",), (chrlen,))
        write_bam(p, recs, names, lengths)
    lst = os.path.join(base, "bams.list")
    with open(lst, "w") as fh:
        for b in bams:
            fh.write("%s %s.bai paired_end\n" % (b, b))
    return lst, total


def main():
    n_genes = 2000
    ns = 10
    if "--genes" in sys.argv:
        n_genes = int(sys.argv[sys.argv.index("--genes") + 1])
    if "--samples" in sys.argv:
        ns = int(sys.argv[sys.argv.index("--samples") + 1])
    binary = ensure_binary()
    base = "/tmp/refbase_g%d_s%d" % (n_genes, ns)
    t0 = time.time()
    lst, nrec = build_cohort(base, n_genes, ns)
    print("cohort ready (%.0fs, %d new records)" % (time.time() - t0, nrec),
          file=sys.stderr, flush=True)

    # warm the page cache for BOTH runs (the first reader of the freshly
    # written ~1.4 GB of BAMs otherwise pays cold-cache IO: measured
    # 21.6s -> 11.4s for the reference between cold and warm)
    for b in open(lst):
        with open(b.split()[0], "rb") as fh:
            while fh.read(1 << 22):
                pass

    # the reference opens its outputs in APPEND mode (sample_profile.cc:
    # 121,137): clean stale outputs or re-runs accumulate transcripts
    import shutil
    ref_out = os.path.join(base, "ref")
    shutil.rmtree(ref_out, ignore_errors=True)
    os.makedirs(os.path.join(ref_out, "gtf"), exist_ok=True)
    import resource
    r0 = resource.getrusage(resource.RUSAGE_CHILDREN)
    t0 = time.time()
    with open(os.path.join(ref_out, "log.txt"), "w") as log:
        subprocess.run([binary, "-i", lst, "-o",
                        os.path.join(ref_out, "meta.gtf"), "-d",
                        os.path.join(ref_out, "gtf"), "-t", "10"],
                       stdout=log, stderr=subprocess.STDOUT, check=True)
    ref_wall = time.time() - t0
    r1 = resource.getrusage(resource.RUSAGE_CHILDREN)
    ref_cpu = (r1.ru_utime - r0.ru_utime) + (r1.ru_stime - r0.ru_stime)
    print("reference -t 10: %.1fs" % ref_wall, file=sys.stderr, flush=True)

    our_out = os.path.join(base, "ours")
    shutil.rmtree(our_out, ignore_errors=True)
    os.makedirs(os.path.join(our_out, "gtf"), exist_ok=True)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env.pop("PYTHONDONTWRITEBYTECODE", None)
    env.setdefault("PYTHONPYCACHEPREFIX", "/tmp/aletsch_pycache")
    r0 = resource.getrusage(resource.RUSAGE_CHILDREN)
    t0 = time.time()
    subprocess.run([sys.executable, "-m", "aletsch_tpu", "-i", lst, "-o",
                    os.path.join(our_out, "meta.gtf"), "-d",
                    os.path.join(our_out, "gtf"), "--verbose", "0"],
                   check=True, env=env)
    our_wall = time.time() - t0
    r1 = resource.getrusage(resource.RUSAGE_CHILDREN)
    our_cpu = (r1.ru_utime - r0.ru_utime) + (r1.ru_stime - r0.ru_stime)
    print("ours: %.1fs" % our_wall, file=sys.stderr, flush=True)

    from tools.refbuild.compare import parse_gtf
    ref = parse_gtf(os.path.join(ref_out, "meta.gtf"))
    ours = parse_gtf(os.path.join(our_out, "meta.gtf"))
    both = len(set(ref) & set(ours))
    res = {
        "metric": "reference_baseline",
        "cohort": {"genes": n_genes, "samples": ns},
        "ref_wall_s": round(ref_wall, 1),
        "our_wall_s": round(our_wall, 1),
        "speedup_vs_ref10t": round(ref_wall / our_wall, 2),
        "ref_cpu_s": round(ref_cpu, 1),
        "our_cpu_s": round(our_cpu, 1),
        "cpu_efficiency_vs_ref": round(ref_cpu / our_cpu, 2),
        "ref_chains": len(ref),
        "our_chains": len(ours),
        "matched_chains": both,
        "host_cpus": os.cpu_count(),
    }
    print(json.dumps(res))


if __name__ == "__main__":
    main()
