"""Region-sharded multi-host assembly: N shards == 1 host, bitwise."""

import os
import random

from aletsch_tpu.config import default_params
from aletsch_tpu.meta.incubator import Incubator
from aletsch_tpu.parallel.distributed import merge_shards, run_region_shard
from aletsch_tpu.sim import simulate_pairs, write_bam


def make_cohort(tmp_path, n_samples=2, n_genes=6, region_len=40000):
    rng = random.Random(17)
    genes = []
    pos = 20000
    for g in range(n_genes):
        ne = rng.randint(2, 4)
        exons = []
        p = pos
        for e in range(ne):
            el = rng.randint(200, 400)
            exons.append((p, p + el))
            p += el + rng.randint(500, 1200)
        genes.append(exons)
        pos = p + rng.randint(50000, 70000)
    bams = []
    for s in range(n_samples):
        srng = random.Random(100 + s)
        recs = []
        for gi, exons in enumerate(genes):
            strand = "+" if gi % 2 == 0 else "-"
            recs += simulate_pairs(exons, 40, strand, srng,
                                   prefix="s%dg%d" % (s, gi))
        p = str(tmp_path / ("s%d.bam" % s))
        write_bam(p, recs, names=("chr1",), lengths=(10**6,))
        bams.append(p)
    bl = tmp_path / "bams.list"
    bl.write_text("".join("%s %s.bai paired_end\n" % (b, b) for b in bams))
    return str(bl), region_len


def make_params(bl, region_len, out_gtf, out_dir):
    os.makedirs(out_dir, exist_ok=True)
    params = default_params()
    for p in params:
        p.input_bam_list = bl
        p.output_gtf_file = out_gtf
        p.output_gtf_dir = out_dir
        p.region_partition_length = region_len   # force many regions
        p.verbose = 0
    return params


def test_two_shards_equal_single_host(tmp_path):
    bl, region_len = make_cohort(tmp_path)

    # single-host reference run
    params1 = make_params(bl, region_len, str(tmp_path / "single.gtf"),
                          str(tmp_path / "single_gtf"))
    inc1 = Incubator(params1)
    inc1.resolve()

    # two region shards + merge
    dumps = []
    shard_stats_bundles = 0
    for h in range(2):
        params_h = make_params(bl, region_len, str(tmp_path / "unused.gtf"),
                               str(tmp_path / "unused_dir"))
        d = str(tmp_path / ("shard%d.pkl" % h))
        inc = run_region_shard(params_h, h, 2, d)
        shard_stats_bundles += inc.stats["bundles"]
        dumps.append(d)
    paramsm = make_params(bl, region_len, str(tmp_path / "merged.gtf"),
                          str(tmp_path / "merged_gtf"))
    merge_shards(paramsm, dumps)

    # shard workloads were disjoint and complete
    assert shard_stats_bundles == inc1.stats["bundles"]
    assert open(tmp_path / "single.gtf").read() == \
        open(tmp_path / "merged.gtf").read()
    # per-sample outputs identical too
    for sid in range(3):
        a = (tmp_path / "single_gtf" / ("%d.gtf" % sid)).read_text()
        b = (tmp_path / "merged_gtf" / ("%d.gtf" % sid)).read_text()
        assert a == b


def test_parallel_jobs_equal_single(tmp_path):
    from aletsch_tpu.parallel.jobs import run_parallel
    bl, region_len = make_cohort(tmp_path, n_samples=2, n_genes=5)

    params1 = make_params(bl, region_len, str(tmp_path / "j1.gtf"),
                          str(tmp_path / "j1_gtf"))
    run_parallel(params1, 1)

    params2 = make_params(bl, region_len, str(tmp_path / "j2.gtf"),
                          str(tmp_path / "j2_gtf"))
    run_parallel(params2, 2)

    assert open(tmp_path / "j1.gtf").read() == open(tmp_path / "j2.gtf").read()
