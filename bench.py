"""End-to-end benchmark, anchored to the MEASURED reference binary.

Headline metric: bundles/s of the full assembly pipeline on the
production-scale cohort (10 samples x 2000 genes over 630 Mb, ~1.4M
records -- the same cohort tools/refbuild/baseline.py runs the shim-built
reference Aletsch on).  vs_baseline is measured-vs-measured: our rate
divided by the reference's 10-thread rate on the identical cohort
(tools/refbuild/baseline_measured.json; re-measure with
`python tools/refbuild/baseline.py`).

Also reported (stderr): the small shallow/deep workloads (round-1/2
comparability), per-stage device statistics for the default config, the
fused greedy-drain probe (hot + production shapes, ops/greedy_fused.py),
measured host-vs-device crossover numbers for every device stage, and the
virtual-mesh scaling probe.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import os
import random
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_SAMPLES = 2
N_GENES = 30
CHROM_LEN = 40_000_000

PROD_GENES = int(os.environ.get("ALETSCH_BENCH_GENES", "2000"))
PROD_SAMPLES = int(os.environ.get("ALETSCH_BENCH_SAMPLES", "10"))


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
    dstat = {k: d1.get(k, 0) - d0.get(k, 0)
             for k in d1 if not isinstance(d1.get(k), bool)}
    dstat["wall_total"] = wall_total
    dev_time = (dstat.get("device_time", 0.0)
                + dstat.get("fused_device_time", 0.0)
                + dstat.get("bridge_device_time", 0.0))
    dstat["device_share"] = dev_time / wall_total if wall_total > 0 else 0.0
    n_trst = sum(1 for line in open(out_gtf) if "\ttranscript\t" in line)
    return inc.stats["bundles"], dt, n_trst, dstat


def production_bench():
    """Headline: our pipeline on the measured-baseline cohort."""
    from tools.refbuild.baseline import build_cohort
    base = "/tmp/refbase_g%d_s%d" % (PROD_GENES, PROD_SAMPLES)
    lst, _ = build_cohort(base, PROD_GENES, PROD_SAMPLES)
    import resource
    r0 = resource.getrusage(resource.RUSAGE_SELF)
    bundles, dt, n_trst, dstat = run_pipeline(base, lst, sub="bench_ours",
                                              reps=1)
    r1 = resource.getrusage(resource.RUSAGE_SELF)
    cpu_s = (r1.ru_utime - r0.ru_utime) + (r1.ru_stime - r0.ru_stime)
    rate = bundles / dt if dt > 0 else 0.0
    # measured reference baseline on the identical cohort
    ref = None
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "tools", "refbuild",
                               "baseline_measured.json")) as fh:
            j = json.load(fh)
        if j.get("cohort") == {"genes": PROD_GENES,
                               "samples": PROD_SAMPLES}:
            ref = j
    except Exception:
        pass
    vs = None
    ref_rate = None
    if ref is not None and ref.get("ref_wall_s"):
        ref_rate = bundles / float(ref["ref_wall_s"])
        vs = rate / ref_rate
    return {
        "bundles": bundles,
        "wall_s": round(dt, 2),
        "cpu_s": round(cpu_s, 1),
        "bundles_per_s": round(rate, 1),
        "transcripts": n_trst,
        "ref_wall_s": None if ref is None else ref["ref_wall_s"],
        "ref_cpu_s": None if ref is None else ref.get("ref_cpu_s"),
        "ref_bundles_per_s": None if ref_rate is None
        else round(ref_rate, 1),
        "vs_reference_10t": None if vs is None else round(vs, 3),
        "cpu_efficiency_vs_ref": None
        if ref is None or not ref.get("ref_cpu_s") or cpu_s <= 0
        else round(ref["ref_cpu_s"] / cpu_s, 2),
        "device_stats": {k: round(v, 4) if isinstance(v, float) else v
                         for k, v in dstat.items()},
    }


def fused_probe(tmpdir):
    """Fused greedy-drain probe: host-forced vs device-forced on the same
    inputs at (a) the hot shape (max_num_exons=8 routes every larger graph
    straight to the greedy loop, scallop.cc:49) and (b) the production
    shape (default max_num_exons: the drain handles residual paths only).
    GTF byte parity of the two modes is test-enforced
    (tests/test_device_greedy_fused.py)."""
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

    def mk(device, exons):
        def tweak(p):
            p.device_greedy = device
            p.device_min_vertices = 2
            p.device_min_groups = 0
            p.max_num_exons = exons
        return tweak

    out = {}
    for tag, exons in (("hot", 8), ("production", 10000)):
        _, host_dt, _, _ = run_pipeline(
            tmpdir, listpath, sub="devprobe/h_%s" % tag,
            tweak=mk("off", exons), reps=1)
        _, dev_dt, _, dstat = run_pipeline(
            tmpdir, listpath, sub="devprobe/d_%s" % tag,
            tweak=mk("on", exons), reps=1)
        out[tag] = {
            "host_wall_s": round(host_dt, 4),
            "device_wall_s": round(dev_dt, 4),
            "fused_dispatches": dstat.get("fused_dispatches", 0),
            "fused_graphs": dstat.get("fused_graphs", 0),
            "fused_paths": dstat.get("fused_paths", 0),
            "fused_device_time_s": round(
                dstat.get("fused_device_time", 0.0), 4),
            "host_fallback_graphs": dstat.get("host_graphs", 0),
        }
    return out


def crossover_probe():
    """Measured per-stage host-vs-device crossover on this chip: one warm
    dispatch cost per kernel vs the equivalent native-host solve cost.
    'auto' device gating consults these magnitudes (docs/DESIGN.md
    'measured crossovers')."""
    out = {}
    try:
        import numpy as np
        import jax
        # fused greedy drain: [64, 64, 64] f64 batch
        from aletsch_tpu.ops.greedy_fused import DeviceGreedyFused
        fd = DeviceGreedyFused()
        rng = np.random.default_rng(3)
        for b in range(fd.batch):
            n = 32
            cnt = np.zeros(n, dtype=int)
            for j in range(1, n):
                for u in rng.choice(j, size=min(j, 3), replace=False):
                    fd.W[b, u, j] = float(rng.integers(1, 1000))
                    fd.P[b, u, j] = cnt[j]
                    cnt[j] += 1
            fd.sink[b] = n - 1
            fd.scal[b] = (2.0, 0.01, 1e-8)
        t0 = time.time()
        fd.solve(fd.batch)
        dev_s = time.time() - t0
        from aletsch_tpu.ops.greedy_fused import drain_host
        t0 = time.time()
        drain_host(fd.W, fd.P, fd.sink, fd.scal[:, 0], fd.scal[:, 1],
                   fd.scal[:, 2])
        host_py_s = time.time() - t0
        out["greedy_fused"] = {
            "device_dispatch_s": round(dev_s, 4),
            "host_numpy_oracle_s": round(host_py_s, 4),
            "note": "native host drain is ~100x faster than the numpy "
                    "oracle; device wins only when dispatch cost < native "
                    "host cost for the batch",
        }
        # bridge top-K kernel
        from aletsch_tpu.ops.bridge_topk import DeviceBridge
        bd = DeviceBridge()
        t0 = time.time()
        bd.solve(bd.batch)
        out["bridge_topk"] = {"device_dispatch_s":
                              round(time.time() - t0, 4)}
        # support reduce
        from aletsch_tpu.ops.support import DeviceSupport
        sd = DeviceSupport()
        t0 = time.time()
        sd.solve(sd.batch)
        out["support_reduce"] = {"device_dispatch_s":
                                 round(time.time() - t0, 4)}
    except Exception as e:                    # pragma: no cover
        out["error"] = str(e)
    return out


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
        prod = production_bench()
        print("bench-production: %d bundles in %.1fs -> %.1f bundles/s "
              "(reference -t10: %s bundles/s measured on the same cohort; "
              "vs_reference = %s)"
              % (prod["bundles"], prod["wall_s"], prod["bundles_per_s"],
                 prod["ref_bundles_per_s"], prod["vs_reference_10t"]),
              file=sys.stderr)
        print("bench-production device stats (default config): %s"
              % json.dumps(prod["device_stats"]), file=sys.stderr)

        listpath = make_workload(tmpdir)
        bundles, dt, n_trst, _ = run_pipeline(tmpdir, listpath)
        print("bench-small: %d bundles in %.2fs -> %.1f bundles/s; "
              "%d transcripts" % (bundles, dt, bundles / dt, n_trst),
              file=sys.stderr)
        deep_list, deep_reads = make_deep_workload(tmpdir)
        dbundles, ddt, dn, _ = run_pipeline(tmpdir, deep_list, sub="deep")
        print("bench-deep: %d bundles (%d reads) in %.2fs -> %.1f "
              "bundles/s, %.0f reads/s; %d transcripts"
              % (dbundles, deep_reads, ddt, dbundles / ddt,
                 deep_reads / ddt, dn), file=sys.stderr)

        fused = fused_probe(tmpdir)
        print("fused greedy-drain probe: %s" % json.dumps(fused),
              file=sys.stderr)
        cross = crossover_probe()
        print("measured per-stage device dispatch costs: %s"
              % json.dumps(cross), file=sys.stderr)
        print(scaling_probe(), file=sys.stderr)

        vs = prod["vs_reference_10t"]
        print(json.dumps({
            "metric": "bundles_per_second",
            "value": prod["bundles_per_s"],
            "unit": "bundles/s",
            "vs_baseline": vs if vs is not None else 0.0,
            "baseline_kind": "measured reference binary, -t 10, same "
                             "cohort, same host (BASELINE.md)",
            "production": {k: v for k, v in prod.items()
                           if k != "device_stats"},
            "device_share_default":
                prod["device_stats"].get("device_share", 0.0),
            "fused_probe": fused,
            "stage_dispatch_costs": cross,
        }))
    finally:
        shutil.rmtree(tmpdir, ignore_errors=True)


if __name__ == "__main__":
    main()
