"""Per-axis adversarial accuracy (VERDICT r2 #7).

For each adversarial grammar kind (aletsch_tpu/sim.py ADVERSARIAL_KINDS:
opposite-strand overlap, XS-conflict, NH>1 multimap webs, coverage
cliffs) this soak builds a 2-sample cohort of ONLY that kind, assembles
it, and reports per-kind truth-chain recall plus the novel-false-chain
rate (assembled multi-exon chains that are neither truth chains nor
truncated truth subchains).  A final mixed-protocol cohort puts
paired_end and ont samples in ONE bam list, exercising the per-type
parameter overlays (util/parameters.cc:508-518: long-read types run with
min_num_hits_in_bundle=1 and relaxed junction support).

Usage: python tools/soak_adversarial.py   (prints a markdown table;
results belong in BASELINE.md)
"""

import os
import random
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")

from aletsch_tpu.config import default_params
from aletsch_tpu.io.gtf import read_gtf
from aletsch_tpu.meta.incubator import Incubator
from aletsch_tpu.sim import (ADVERSARIAL_KINDS, chain_of,
                             make_adversarial_locus, simulate_pairs,
                             write_bam)


def chain(exons):
    return tuple((exons[k - 1][1], exons[k][0])
                 for k in range(1, len(exons)))


def is_subchain(c, full):
    n, m = len(c), len(full)
    if n == 0 or n > m:
        return False
    return any(c == full[i:i + n] for i in range(m - n + 1))


REF_BINARY = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools", "refbuild", "build", "aletsch")


def run_reference(d, lst):
    """Reference binary on the same cohort (None when not built)."""
    if not os.path.exists(REF_BINARY):
        return None
    import subprocess
    out = os.path.join(d, "refgtf")
    os.makedirs(out, exist_ok=True)
    meta = os.path.join(d, "ref_meta.gtf")
    with open(os.path.join(d, "ref_log.txt"), "w") as log:
        subprocess.run([REF_BINARY, "-i", lst, "-o", meta, "-d", out,
                        "-t", "1"], stdout=log, stderr=subprocess.STDOUT,
                       check=True, cwd=d)
    return read_gtf(meta)


def run_pipeline(d, lst):
    params = default_params()
    out = os.path.join(d, "gtf")
    os.makedirs(out, exist_ok=True)
    for p in params:
        p.input_bam_list = lst
        p.output_gtf_file = os.path.join(d, "meta.gtf")
        p.output_gtf_dir = out
        p.verbose = 0
    Incubator(params).resolve()
    return read_gtf(os.path.join(d, "meta.gtf"))


def kind_cohort(d, kind, n_loci=12, n_samples=2):
    truth = []
    bams = []
    for s in range(n_samples):
        rng = random.Random(1000 + 37 * s)
        t = [] if s == 0 else None      # identical loci per sample
        recs = []
        pos = 100000
        rng_l = random.Random(500)      # same loci structure across samples
        for i in range(n_loci):
            r, span = make_adversarial_locus(
                rng_l, pos, "s%dl%d" % (s, i), kind, truth=t)
            recs += r
            pos += span + rng.randint(25000, 40000)
        if t:
            truth = t
        from aletsch_tpu.sim import sentinel_target
        recs, names, lengths = sentinel_target(recs, ("chr1",),
                                               (40_000_000,))
        p = os.path.join(d, "%s_%d.bam" % (kind, s))
        write_bam(p, recs, names, lengths)
        bams.append(p)
    lst = os.path.join(d, "bams.list")
    with open(lst, "w") as fh:
        for b in bams:
            fh.write("%s x paired_end\n" % b)
    return lst, {c for _, c in truth}


def evaluate(trsts, truth):
    got = {chain(t.exons) for t in trsts if len(t.exons) > 1}
    recalled = sum(1 for c in truth if c in got)
    novel = [g for g in got
             if g not in truth and not any(is_subchain(g, c)
                                           for c in truth)]
    return recalled, len(truth), len(novel), len(got)


def mixed_protocol_cohort(d):
    """paired_end + ont samples of the SAME genes in one list."""
    genes = []
    rng = random.Random(9)
    pos = 100000
    for g in range(30):
        exons = []
        p = pos
        for _ in range(rng.randint(2, 5)):
            el = rng.randint(150, 400)
            exons.append((p, p + el))
            p += el + rng.randint(400, 2000)
        genes.append(exons)
        pos = p + rng.randint(25000, 50000)
    # paired-end sample
    recs = []
    for gi, exons in enumerate(genes):
        recs += simulate_pairs(exons, 40, "+" if gi % 2 == 0 else "-",
                               rng, prefix="pe%d" % gi)
    pe = os.path.join(d, "mixed_pe.bam")
    write_bam(pe, recs, ("chr1",), (40_000_000,))
    # ont sample: sparse full-length single-end long reads (the overlay
    # matters: min_num_hits_in_bundle=1 keeps 3-read bundles)
    from aletsch_tpu.sim import map_to_genome
    recs = []
    for gi, exons in enumerate(genes):
        strand = "+" if gi % 2 == 0 else "-"
        total = sum(b - a for a, b in exons)
        for i in range(3):
            trim = rng.randint(0, 15)
            g, cigar = map_to_genome(exons, trim, total - trim -
                                     rng.randint(0, 15))
            recs.append(dict(qname="ont%d.%d" % (gi, i),
                             flag=0x10 if strand == "-" else 0, pos=g,
                             cigar=cigar, mpos=-1, isize=0, xs=strand))
    ont = os.path.join(d, "mixed_ont.bam")
    write_bam(ont, recs, ("chr1",), (40_000_000,))
    lst = os.path.join(d, "mixed.list")
    with open(lst, "w") as fh:
        fh.write("%s x paired_end\n%s x ont\n" % (pe, ont))
    return lst, {chain(e) for e in genes if len(e) > 1}


def main():
    d = tempfile.mkdtemp(prefix="adv_soak_")
    print("| kind | truth | recalled | novel (ours) | novel (reference) | chains ours==ref |")
    print("|---|---|---|---|---|---|")
    rows = {}
    for kind in ADVERSARIAL_KINDS:
        kd = os.path.join(d, kind)
        os.makedirs(kd)
        lst, truth = kind_cohort(kd, kind)
        trsts = run_pipeline(kd, lst)
        rec, tot, novel, got = evaluate(trsts, truth)
        ref_trsts = run_reference(kd, lst)
        if ref_trsts is not None:
            _, _, rnovel, _ = evaluate(ref_trsts, truth)
            ours_set = {chain(t.exons) for t in trsts if len(t.exons) > 1}
            ref_set = {chain(t.exons) for t in ref_trsts
                       if len(t.exons) > 1}
            same = "yes" if ours_set == ref_set else \
                "no (+%d/-%d)" % (len(ours_set - ref_set),
                                  len(ref_set - ours_set))
        else:
            rnovel, same = "n/a", "n/a"
        rows[kind] = (rec, tot, novel, got)
        print("| %s | %d | %d | %d | %s | %s |"
              % (kind, tot, rec, novel, rnovel, same))
    md = os.path.join(d, "mixed")
    os.makedirs(md)
    lst, truth = mixed_protocol_cohort(md)
    trsts = run_pipeline(md, lst)
    rec, tot, novel, got = evaluate(trsts, truth)
    rows["mixed_pe+ont"] = (rec, tot, novel, got)
    print("| mixed_pe+ont | %d | %d | %d | %d |" % (tot, rec, novel, got))
    bad = [k for k, (r, t, n, _) in rows.items() if r < t]
    if bad:
        print("RECALL DEGRADED AXES: %s" % bad)
        return 1
    print("full recall on every axis; novel chains are compared against "
          "the reference binary per kind above")
    return 0


if __name__ == "__main__":
    sys.exit(main())
