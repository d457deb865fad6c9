"""End-to-end benchmark: synthetic multi-sample cohort -> bundles/s.

Generates a multi-gene, multi-sample paired-end workload with the in-repo
simulator, runs the full assembly pipeline (generate -> cluster -> bridge ->
decompose -> merge -> GTF), and reports bundle throughput.  Also times the
batched TPU bottleneck-DP kernel as a device-side sanity probe (stderr only).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against the recorded round-1 reference value in
BENCH_BASELINE (self-relative until a reference-binary baseline exists; the
upstream repo publishes no numbers, see BASELINE.md).
"""

import json
import os
import random
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Self-relative baseline: round-1 recorded bundles/s on the bench workload.
BENCH_BASELINE = 40.0

N_SAMPLES = 2
N_GENES = 30
CHROM_LEN = 40_000_000


def make_workload(tmpdir):
    from aletsch_tpu.sim import simulate_pairs, write_bam
    rng = random.Random(7)
    genes = []
    pos = 100000
    for g in range(N_GENES):
        ne = rng.randint(2, 5)
        exons = []
        p = pos
        for e in range(ne):
            el = rng.randint(150, 500)
            exons.append((p, p + el))
            p += el + rng.randint(400, 2000)
        genes.append(exons)
        pos = p + rng.randint(30000, 60000)
    bams = []
    for s in range(N_SAMPLES):
        recs = []
        for gi, exons in enumerate(genes):
            strand = "+" if gi % 2 == 0 else "-"
            n = rng.randint(30, 80)
            recs += simulate_pairs(exons, n, strand, rng,
                                   prefix="s%dg%d" % (s, gi))
            if len(exons) >= 3:
                skip = exons[:1] + exons[2:]
                recs += simulate_pairs(skip, max(8, n // 3), strand, rng,
                                       prefix="s%dk%d" % (s, gi))
        path = os.path.join(tmpdir, "s%d.bam" % s)
        write_bam(path, recs, names=("chr1",), lengths=(CHROM_LEN,))
        bams.append(path)
    listpath = os.path.join(tmpdir, "bams.list")
    with open(listpath, "w") as fh:
        for b in bams:
            fh.write("%s %s.bai paired_end\n" % (b, b))
    return listpath


def run_pipeline(tmpdir, listpath, sub="run", tweak=None, reps=5):
    from aletsch_tpu.config import default_params
    from aletsch_tpu.meta.incubator import Incubator
    from aletsch_tpu.meta import device_wave
    os.makedirs(os.path.join(tmpdir, sub), exist_ok=True)
    out_gtf = os.path.join(tmpdir, sub, "meta.gtf")
    out_dir = os.path.join(tmpdir, sub, "gtf")
    os.makedirs(out_dir, exist_ok=True)
    params = default_params()
    for p in params:
        p.input_bam_list = listpath
        p.output_gtf_file = out_gtf
        p.output_gtf_dir = out_dir
        p.verbose = 0
        if tweak:
            tweak(p)
    # best-of-5: the absolute workload is sub-second, so single-shot timing
    # is dominated by filesystem-cache and TPU-relay noise
    best = None
    wall_total = 0.0
    d0 = device_wave.device_stats()
    for _ in range(reps):
        inc = Incubator(params)
        t0 = time.time()
        inc.resolve()
        dt = time.time() - t0
        wall_total += dt
        if best is None or dt < best[1]:
            best = (inc, dt)
    inc, dt = best
    d1 = device_wave.device_stats()
    dstat = {k: d1.get(k, 0) - d0.get(k, 0) for k in d1}
    dstat["wall_total"] = wall_total
    dstat["device_share"] = (dstat.get("device_time", 0.0) / wall_total
                             if wall_total > 0 else 0.0)
    n_trst = sum(1 for line in open(out_gtf) if "\ttranscript\t" in line)
    return inc.stats["bundles"], dt, n_trst, dstat


def kernel_probe():
    """Device-side probe: batched bottleneck DP throughput."""
    try:
        import jax.numpy as jnp
        from aletsch_tpu.ops.bridge_dp import get_bottleneck_fn
        import numpy as np
        fn = get_bottleneck_fn()
        B, V = 64, 64
        rng = np.random.default_rng(0)
        W = np.triu(rng.uniform(0, 10, (B, V, V)).astype(np.float32), 1)
        W *= (rng.uniform(size=W.shape) < 0.3)
        Wj = jnp.asarray(W)
        fn(Wj).block_until_ready()           # compile
        t0 = time.time()
        reps = 10
        for _ in range(reps):
            out = fn(Wj)
        out.block_until_ready()
        dt = (time.time() - t0) / reps
        return B / dt
    except Exception as e:                    # pragma: no cover
        print("kernel probe failed: %s" % e, file=sys.stderr)
        return 0.0


def device_engaged_probe(tmpdir):
    """Device-on-the-hot-path probe: an adversarial cohort assembled with
    max_num_exons=8, which routes every larger graph straight to the greedy
    max-path loop (scallop.cc:49) — the configuration under which the
    wave-batched device DP (meta/device_wave.py) carries the extractions.
    Runs host-forced then device-forced on the SAME inputs (byte parity of
    the GTFs is test-enforced elsewhere) and reports both walls plus the
    device-time share of the device run."""
    from aletsch_tpu.sim import simulate_adversarial_sample
    sub = os.path.join(tmpdir, "devprobe")
    os.makedirs(sub, exist_ok=True)
    bams = []
    for s in range(2):
        path = os.path.join(sub, "a%d.bam" % s)
        simulate_adversarial_sample(path, seed=21 + s, n_loci=8)
        bams.append(path)
    listpath = os.path.join(sub, "bams.list")
    with open(listpath, "w") as fh:
        for b in bams:
            fh.write("%s %s.bai paired_end\n" % (b, b))

    def mk(device):
        def tweak(p):
            p.device_greedy = device
            p.device_min_vertices = 2
            p.device_min_groups = 0
            p.max_num_exons = 8
        return tweak

    # single rep: each device dispatch costs seconds of relay round-trip on
    # the tunneled chip, so best-of-5 would stretch bench by minutes while
    # measuring the same thing
    _, host_dt, _, _ = run_pipeline(tmpdir, listpath, sub="devprobe/host",
                                    tweak=mk("off"), reps=1)
    _, dev_dt, _, dstat = run_pipeline(tmpdir, listpath, sub="devprobe/dev",
                                       tweak=mk("on"), reps=1)
    return {
        "host_wall_s": round(host_dt, 4),
        "device_wall_s": round(dev_dt, 4),
        "device_time_s": round(dstat.get("device_time", 0.0), 4),
        "device_share_of_wall": round(dstat.get("device_share", 0.0), 4),
        "device_steps": dstat.get("device_steps", 0),
        "device_dispatches": dstat.get("dispatches", 0),
        "device_graphs": dstat.get("graphs", 0),
        "host_fallback_graphs": dstat.get("host_graphs", 0),
    }


def make_deep_workload(tmpdir):
    """Fewer genes, much deeper coverage (real-data density)."""
    from aletsch_tpu.sim import simulate_pairs, write_bam
    rng = random.Random(11)
    genes = []
    pos = 100000
    for g in range(20):
        ne = rng.randint(2, 6)
        exons = []
        p = pos
        for e in range(ne):
            el = rng.randint(150, 500)
            exons.append((p, p + el))
            p += el + rng.randint(400, 2000)
        genes.append(exons)
        pos = p + rng.randint(30000, 60000)
    bams = []
    nreads = 0
    for s in range(2):
        recs = []
        for gi, exons in enumerate(genes):
            strand = "+" if gi % 2 == 0 else "-"
            recs += simulate_pairs(exons, 400, strand, rng,
                                   prefix="d%dg%d" % (s, gi))
        nreads += len(recs)
        path = os.path.join(tmpdir, "deep%d.bam" % s)
        write_bam(path, recs, names=("chr1",), lengths=(40_000_000,))
        bams.append(path)
    listpath = os.path.join(tmpdir, "deep.list")
    with open(listpath, "w") as fh:
        for b in bams:
            fh.write("%s %s.bai paired_end\n" % (b, b))
    return listpath, nreads


def scaling_probe():
    """On-chip single-device rate plus an 8-virtual-device CPU mesh run in a
    subprocess (validates the sharded step's multi-device scaling shape even
    with one physical chip)."""
    out = []
    try:
        from aletsch_tpu.parallel.scaling import format_scaling, measure_scaling
        out.append(format_scaling(measure_scaling(reps=3)))
    except Exception as e:                    # pragma: no cover
        out.append("scaling probe failed: %s" % e)
    try:
        import subprocess
        env = dict(os.environ)
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                            " --xla_force_host_platform_device_count=8").strip()
        r = subprocess.run([sys.executable, "-m", "aletsch_tpu.parallel.scaling"],
                           capture_output=True, text=True, timeout=300, env=env,
                           cwd=os.path.dirname(os.path.abspath(__file__)))
        if r.returncode == 0 and r.stdout.strip():
            out.append("virtual 8-dev CPU mesh (shards compile+execute; all "
                       "virtual devices share this host's cores, so "
                       "efficiency here is NOT hardware scaling):\n"
                       + r.stdout.strip())
    except Exception as e:                    # pragma: no cover
        out.append("virtual-mesh probe failed: %s" % e)
    return "\n".join(out)


def main():
    tmpdir = tempfile.mkdtemp(prefix="aletsch_bench_")
    try:
        listpath = make_workload(tmpdir)
        bundles, dt, n_trst, dstat = run_pipeline(tmpdir, listpath)
        bps = bundles / dt if dt > 0 else 0.0
        deep_list, deep_reads = make_deep_workload(tmpdir)
        dbundles, ddt, dn, ddstat = run_pipeline(tmpdir, deep_list, sub="deep")
        kps = kernel_probe()
        dev = device_engaged_probe(tmpdir)
        print("bench: %d bundles in %.2fs -> %.2f bundles/s; "
              "%d transcripts; kernel probe %.0f graphs/s"
              % (bundles, dt, bps, n_trst, kps), file=sys.stderr)
        print("bench-deep: %d bundles (%d reads) in %.2fs -> %.1f bundles/s, "
              "%.0f reads/s; %d transcripts"
              % (dbundles, deep_reads, ddt, dbundles / ddt,
                 deep_reads / ddt, dn), file=sys.stderr)
        print("device share (default config): %.4f of wall on device "
              "(the greedy loop is cold below max_num_exons and the "
              "similarity auto-threshold sits above this workload; see "
              "docs/DESIGN.md for the measured host<->device bandwidth "
              "analysis)" % dstat.get("device_share", 0.0), file=sys.stderr)
        print("device-engaged probe (max_num_exons=8 forces the greedy "
              "loop hot): %s" % json.dumps(dev), file=sys.stderr)
        print(scaling_probe(), file=sys.stderr)
        print(json.dumps({
            "metric": "bundles_per_second",
            "value": round(bps, 3),
            "unit": "bundles/s",
            "vs_baseline": round(bps / BENCH_BASELINE, 3),
            "device_share_default": round(dstat.get("device_share", 0.0), 4),
            "device_probe": dev,
        }))
    finally:
        shutil.rmtree(tmpdir, ignore_errors=True)


if __name__ == "__main__":
    main()
