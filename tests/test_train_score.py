"""Train-then-score loop on simulated data: truncations score below true
full-length transcripts."""

import os
import random

import numpy as np

from aletsch_tpu.config import default_params
from aletsch_tpu.io.gtf import Transcript, write_gtf
from aletsch_tpu.meta.incubator import Incubator
from aletsch_tpu.scoring.score import score
from aletsch_tpu.scoring.train import train
from aletsch_tpu.sim import simulate_pairs, write_bam


def build_training_cohort(tmp_path):
    rng = random.Random(42)
    genes = []
    pos = 50000
    for g in range(25):
        ne = rng.randint(2, 5)
        exons = []
        p = pos
        for e in range(ne):
            el = rng.randint(200, 400)
            exons.append((p, p + el))
            p += el + rng.randint(500, 1200)
        genes.append(exons)
        pos = p + rng.randint(40000, 60000)
    bams = []
    for s in range(2):
        srng = random.Random(7 + s)
        recs = []
        for gi, exons in enumerate(genes):
            strand = "+" if gi % 2 == 0 else "-"
            # uneven depth creates both solid and flaky transcripts
            depth = srng.choice([6, 10, 30, 60])
            recs += simulate_pairs(exons, depth, strand, srng,
                                   prefix="s%dg%d" % (s, gi))
        p = str(tmp_path / ("s%d.bam" % s))
        write_bam(p, recs, names=("chr1",), lengths=(10**7,))
        bams.append(p)
    bl = tmp_path / "bams.list"
    bl.write_text("".join("%s %s.bai paired_end\n" % (b, b) for b in bams))

    truth = []
    for gi, exons in enumerate(genes):
        t = Transcript(seqname="chr1", source="truth", gene_id="g%d" % gi,
                       transcript_id="t%d" % gi,
                       strand="+" if gi % 2 == 0 else "-")
        for a, b in exons:
            t.add_exon(a, b)
        truth.append(t)
    truth_gtf = str(tmp_path / "truth.gtf")
    write_gtf(truth_gtf, truth)
    return str(bl), truth_gtf


def test_train_and_score_roundtrip(tmp_path):
    bl, truth_gtf = build_training_cohort(tmp_path)
    out_gtf = str(tmp_path / "meta.gtf")
    out_dir = str(tmp_path / "gtf")
    os.makedirs(out_dir)
    params = default_params()
    for p in params:
        p.input_bam_list = bl
        p.output_gtf_file = out_gtf
        p.output_gtf_dir = out_dir
        p.verbose = 0
    Incubator(params).resolve()

    model_path = str(tmp_path / "model.npz")
    fa, model, pos, tot = train(out_dir, out_gtf, truth_gtf, 2, model_path,
                                n_estimators=20, max_depth=8)
    assert 0 < pos <= tot
    assert os.path.exists(model_path)

    scores_path = str(tmp_path / "scores.csv")
    score(out_dir, model_path, 2, scores_path, prob_score=0.0)
    rows = [l.split(",") for l in open(scores_path).read().splitlines()[1:]]
    assert len(rows) >= 5
    probs = np.array([float(r[1]) for r in rows])
    assert (probs >= 0).all() and (probs <= 1).all()
    # in-sample sanity: the forest separates matched from unmatched rows
    from aletsch_tpu.scoring.train import label_rows
    from aletsch_tpu.scoring.forest import predict_proba
    X, y, _ = label_rows(out_dir, out_gtf, truth_gtf, 2)
    yp = predict_proba(fa, X, use_jax=False)
    if len(set(y.tolist())) == 2:
        assert yp[y == 1].mean() > yp[y == 0].mean()


def build_cohort_seeded(tmp_path, tag, gene_seed, read_seed0):
    """Independent cohort: different gene structures AND different reads."""
    rng = random.Random(gene_seed)
    genes = []
    pos = 50000
    for g in range(25):
        ne = rng.randint(2, 5)
        exons = []
        p = pos
        for e in range(ne):
            el = rng.randint(200, 400)
            exons.append((p, p + el))
            p += el + rng.randint(500, 1200)
        genes.append(exons)
        pos = p + rng.randint(40000, 60000)
    bams = []
    for s in range(2):
        srng = random.Random(read_seed0 + s)
        recs = []
        for gi, exons in enumerate(genes):
            strand = "+" if gi % 2 == 0 else "-"
            depth = srng.choice([6, 10, 30, 60])
            recs += simulate_pairs(exons, depth, strand, srng,
                                   prefix="%s%dg%d" % (tag, s, gi))
        p = str(tmp_path / ("%s%d.bam" % (tag, s)))
        write_bam(p, recs, names=("chr1",), lengths=(10**7,))
        bams.append(p)
    bl = tmp_path / ("%s.list" % tag)
    bl.write_text("".join("%s x paired_end\n" % b for b in bams))
    truth = []
    for gi, exons in enumerate(genes):
        t = Transcript(seqname="chr1", source="truth", gene_id="g%d" % gi,
                       transcript_id="t%d" % gi,
                       strand="+" if gi % 2 == 0 else "-")
        for a, b in exons:
            t.add_exon(a, b)
        truth.append(t)
    truth_gtf = str(tmp_path / ("%s_truth.gtf" % tag))
    write_gtf(truth_gtf, truth)
    return str(bl), truth_gtf, genes


def test_score_generalizes_out_of_sample(tmp_path):
    """Train on cohort A, score cohort B (different genes, different reads):
    matched transcripts must outscore unmatched ones on the held-out set."""
    def assemble(bl, sub):
        out_gtf = str(tmp_path / (sub + ".gtf"))
        out_dir = str(tmp_path / sub)
        os.makedirs(out_dir)
        params = default_params()
        for p in params:
            p.input_bam_list = bl
            p.output_gtf_file = out_gtf
            p.output_gtf_dir = out_dir
            p.verbose = 0
        Incubator(params).resolve()
        return out_gtf, out_dir

    bl_a, truth_a, _ = build_cohort_seeded(tmp_path, "a", 101, 500)
    bl_b, truth_b, _ = build_cohort_seeded(tmp_path, "b", 202, 700)
    gtf_a, dir_a = assemble(bl_a, "A")
    gtf_b, dir_b = assemble(bl_b, "B")

    model_path = str(tmp_path / "model.npz")
    train(dir_a, gtf_a, truth_a, 2, model_path,
          n_estimators=30, max_depth=8)

    from aletsch_tpu.scoring.forest import ForestArrays, predict_proba
    from aletsch_tpu.scoring.train import label_rows
    fa = ForestArrays.load(model_path)
    Xb, yb, _ = label_rows(dir_b, gtf_b, truth_b, 2)
    assert len(set(yb.tolist())) == 2, "held-out cohort needs both classes"
    yp = predict_proba(fa, Xb, use_jax=False)
    assert yp[yb == 1].mean() > yp[yb == 0].mean() + 0.1
