import os

from aletsch_tpu.config import default_params
from aletsch_tpu.io.gtf import read_gtf
from aletsch_tpu.meta.incubator import Incubator

from simulate import (GENE_A_ISO1, GENE_A_ISO2, GENE_B_ISO1, simulate_sample)


def intron_chain(exons):
    return tuple((exons[k - 1][1], exons[k][0]) for k in range(1, len(exons)))


def run_pipeline(tmp_path, n_samples=2):
    bams = []
    for s in range(n_samples):
        p = str(tmp_path / ("s%d.bam" % s))
        simulate_sample(p, seed=s + 1)
        bams.append(p)
    bam_list = tmp_path / "bams.list"
    bam_list.write_text("".join("%s %s.bai paired_end\n" % (b, b) for b in bams))
    out_gtf = str(tmp_path / "meta.gtf")
    out_dir = str(tmp_path / "gtf")
    os.makedirs(out_dir, exist_ok=True)
    params = default_params()
    for p in params:
        p.input_bam_list = str(bam_list)
        p.output_gtf_file = out_gtf
        p.output_gtf_dir = out_dir
        p.verbose = 0
    inc = Incubator(params)
    inc.resolve()
    return out_gtf, out_dir


def test_two_sample_end_to_end(tmp_path):
    out_gtf, out_dir = run_pipeline(tmp_path, n_samples=2)
    trsts = read_gtf(out_gtf)
    assert len(trsts) >= 2
    chains = {intron_chain(t.exons) for t in trsts}
    assert intron_chain(GENE_A_ISO1) in chains
    assert intron_chain(GENE_B_ISO1) in chains
    # exon-skipping isoform is rarer but should be recovered too
    assert intron_chain(GENE_A_ISO2) in chains
    # strands propagated from XS tags
    by_chain = {intron_chain(t.exons): t for t in trsts}
    assert by_chain[intron_chain(GENE_A_ISO1)].strand == "+"
    assert by_chain[intron_chain(GENE_B_ISO1)].strand == "-"
    # per-sample outputs: 2 samples + combined
    for sid in range(3):
        assert os.path.exists(os.path.join(out_dir, "%d.gtf" % sid))
        assert os.path.exists(os.path.join(out_dir, "%d.trstFeature.csv" % sid))
    s0 = read_gtf(os.path.join(out_dir, "0.gtf"))
    assert len(s0) >= 2
    # feature CSV rows are 51 columns wide
    with open(os.path.join(out_dir, "0.trstFeature.csv")) as fh:
        for line in fh:
            assert len(line.rstrip("\n").split("\t")) == 51


def test_combined_gtf_counts(tmp_path):
    out_gtf, out_dir = run_pipeline(tmp_path, n_samples=2)
    with open(out_gtf) as fh:
        lines = [l for l in fh if "\ttranscript\t" in l]
    # count attribute reflects supporting samples (up to 2 + combined)
    assert all('count "' in l for l in lines)
