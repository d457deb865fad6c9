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

Prints ONE COMPACT JSON line: {"metric", "value", "unit", "vs_baseline",
...scalar summaries...}; the full probe tables are written to
BENCH_DETAIL.json next to this file (and echoed to stderr) so the
driver's stdout capture never overflows (round-4 BENCH parse failure).
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
             for k in d1 if isinstance(d1.get(k), (int, float))
             and not isinstance(d1.get(k), bool)}
    dstat.update({k: v for k, v in d1.items() if isinstance(v, str)})
    dstat["wall_total"] = wall_total
    dev_time = (dstat.get("device_time", 0.0)
                + dstat.get("fused_device_time", 0.0)
                + dstat.get("bridge_device_time", 0.0))
    dstat["device_share"] = dev_time / wall_total if wall_total > 0 else 0.0
    n_trst = sum(1 for line in open(out_gtf) if "\ttranscript\t" in line)
    return inc.stats["bundles"], dt, n_trst, dstat


def read_steal():
    """(steal jiffies, total jiffies) from /proc/stat — intermittent host
    CPU steal (~10-15%) can halve throughput for stretches, so every
    published number carries its window's steal share."""
    try:
        with open("/proc/stat") as fh:
            f = fh.readline().split()
        vals = [int(x) for x in f[1:]]
        return (vals[7] if len(vals) > 7 else 0), sum(vals)
    except Exception:
        return 0, 0


def run_cli(base, lst, sub, env_extra=None, extra_args=()):
    """One CLI-subprocess run (the same protocol tools/refbuild/baseline.py
    uses to time the reference binary: full process incl. startup).
    Returns (wall_s, cpu_s, meta_gtf_path)."""
    import resource
    import subprocess
    out = os.path.join(base, sub)
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(os.path.join(out, "gtf"), exist_ok=True)
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.abspath(__file__))
    env.pop("PYTHONDONTWRITEBYTECODE", None)
    env.setdefault("PYTHONPYCACHEPREFIX", "/tmp/aletsch_pycache")
    if env_extra:
        env.update(env_extra)
    meta = os.path.join(out, "meta.gtf")
    r0 = resource.getrusage(resource.RUSAGE_CHILDREN)
    t0 = time.time()
    # children must not write to OUR stdout: bench's contract is ONE JSON
    # line there (the gloo backend of --jax_dist_launch logs to stdout)
    with open(os.path.join(out, "run.log"), "w") as log:
        subprocess.run([sys.executable, "-m", "aletsch_tpu", "-i", lst,
                        "-o", meta, "-d", os.path.join(out, "gtf"),
                        "--verbose", "0"] + list(extra_args), check=True,
                       env=env, stdout=log, stderr=log)
    wall = time.time() - t0
    r1 = resource.getrusage(resource.RUSAGE_CHILDREN)
    cpu = (r1.ru_utime - r0.ru_utime) + (r1.ru_stime - r0.ru_stime)
    return wall, cpu, meta


def production_bench(reps=3):
    """Headline: our CLI on the measured-baseline cohort, timed with the
    SAME protocol as the reference binary (subprocess incl. startup,
    tools/refbuild/baseline.py — this protocol match is why wall_s here
    and BASELINE.md now agree; the round-3 1.48x-vs-1.34x gap was
    in-process vs CLI measurement).  reps repeats; median + spread +
    steal window published."""
    from tools.refbuild.baseline import build_cohort
    base = "/tmp/refbase_g%d_s%d" % (PROD_GENES, PROD_SAMPLES)
    lst, _ = build_cohort(base, PROD_GENES, PROD_SAMPLES)
    # warm the page cache (same courtesy baseline.py extends the reference)
    for b in open(lst):
        with open(b.split()[0], "rb") as fh:
            while fh.read(1 << 22):
                pass
    # interleave REFERENCE runs in the SAME measurement window when the
    # shim-built binary exists: host background noise (micro-steal,
    # hypervisor contention invisible to /proc/stat) was measured moving
    # walls 40-60% between windows, so the only fair ratio pairs both
    # sides under identical conditions.  Falls back to the pinned
    # baseline_measured.json when the binary is absent.
    import resource
    import subprocess
    ref_bin = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "tools", "refbuild", "build", "aletsch")
    if not os.path.exists(ref_bin):
        try:
            from tools.refbuild.compare import ensure_binary
            ensure_binary()
        except Exception:
            pass
    ref_walls, ref_cpus = [], []

    def run_ref(r):
        # the reference binary's -t10 run intermittently SEGVs (its own
        # threading bug); retry once and drop the rep rather than
        # aborting the whole bench
        for attempt in range(2):
            out = os.path.join(base, "bench_ref_r%d" % r)
            shutil.rmtree(out, ignore_errors=True)
            os.makedirs(os.path.join(out, "gtf"), exist_ok=True)
            r0 = resource.getrusage(resource.RUSAGE_CHILDREN)
            t0 = time.time()
            with open(os.path.join(out, "log.txt"), "w") as log:
                rc = subprocess.run(
                    [ref_bin, "-i", lst, "-o",
                     os.path.join(out, "meta.gtf"), "-d",
                     os.path.join(out, "gtf"), "-t", "10"],
                    stdout=log, stderr=subprocess.STDOUT).returncode
            wall = time.time() - t0
            r1 = resource.getrusage(resource.RUSAGE_CHILDREN)
            if rc == 0:
                ref_walls.append(wall)
                ref_cpus.append((r1.ru_utime - r0.ru_utime)
                                + (r1.ru_stime - r0.ru_stime))
                return
            print("bench: reference run %d attempt %d crashed (rc=%s)"
                  % (r, attempt, rc), file=sys.stderr)

    s0, t0j = read_steal()
    walls, cpus = [], []
    for r in range(reps):
        if os.path.exists(ref_bin):
            run_ref(r)
        wall, cpu, _ = run_cli(base, lst, "bench_ours_r%d" % r)
        walls.append(wall)
        cpus.append(cpu)
    s1, t1j = read_steal()
    steal_pct = (100.0 * (s1 - s0) / (t1j - t0j)) if t1j > t0j else 0.0
    wall_med = sorted(walls)[len(walls) // 2]
    cpu_med = sorted(cpus)[len(cpus) // 2]
    # one in-process run for device statistics (wave/device accounting
    # lives in this process's device_wave.stats) + the resolution-ladder
    # arm histogram (round-4 verdict weak#4: pin the router-rung share)
    from aletsch_tpu.meta import native_core as _nc
    _nc.ladder_histogram(reset=True)
    bundles, dt_inproc, n_trst, dstat = run_pipeline(
        base, lst, sub="bench_ours_inproc", reps=1)
    lhist = _nc.ladder_histogram()
    lhist_summary = None
    if lhist:
        names = _nc.LADDER_RUNGS
        prefix = sum(lhist[k] for k in names[:4])
        router = sum(lhist[k] for k in names[4:])
        tot = prefix + router
        lhist_summary = {
            "fires": lhist,
            "device_prefix_fires": prefix,
            "router_fires": router,
            "device_prefix_share": round(prefix / tot, 6) if tot else None,
            "note": ("the device ladder (ops/ladder_kernel.py) covers "
                     "rungs 0-3; router_fires is the measured count of "
                     "production ladder iterations it CANNOT absorb "
                     "(scallop.cc:64-150 rungs 5+)"),
        }
    rate = bundles / wall_med if wall_med > 0 else 0.0
    # reference baseline: same-window interleaved medians when measured
    # above, else the pinned baseline_measured.json
    ref = None
    if ref_walls:
        ref = {"ref_wall_s": round(sorted(ref_walls)[len(ref_walls) // 2],
                                   2),
               "ref_cpu_s": round(sorted(ref_cpus)[len(ref_cpus) // 2], 1),
               "same_window": True}
    else:
        try:
            with open(os.path.join(
                    os.path.dirname(os.path.abspath(__file__)),
                    "tools", "refbuild", "baseline_measured.json")) as fh:
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
        "wall_s": round(wall_med, 2),
        "wall_s_runs": [round(w, 2) for w in walls],
        "wall_s_spread": [round(min(walls), 2), round(max(walls), 2)],
        "wall_s_inprocess": round(dt_inproc, 2),
        "steal_pct_window": round(steal_pct, 2),
        "cpu_s": round(cpu_med, 1),
        "cores_used": round(cpu_med / wall_med, 2) if wall_med > 0 else 0,
        "bundles_per_s": round(rate, 1),
        "transcripts": n_trst,
        "ref_wall_s": None if ref is None else ref["ref_wall_s"],
        "ref_wall_s_runs": [round(w, 2) for w in ref_walls] or None,
        "ref_same_window": bool(ref_walls),
        "ref_cpu_s": None if ref is None else ref.get("ref_cpu_s"),
        "ref_bundles_per_s": None if ref_rate is None
        else round(ref_rate, 1),
        "vs_reference_10t": None if vs is None else round(vs, 3),
        "cpu_efficiency_vs_ref": None
        if ref is None or not ref.get("ref_cpu_s") or cpu_med <= 0
        else round(ref["ref_cpu_s"] / cpu_med, 2),
        "device_stats": {k: round(v, 4) if isinstance(v, float) else v
                         for k, v in dstat.items()},
        "ladder_arm_histogram": lhist_summary,
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
    """The batch-amortization crossover sweep (ops/crossover.py, round-3
    review item 1): device fused-drain dispatch vs the genuine native host
    drain on identical inputs at B in {64, 256, 512, 1024}, with the
    t_dev(B) = a + b*B vs t_host(B) = c*B fit and the break-even batch
    size.  Large-B rows reuse the platform cache when present (each NEW
    large shape costs the relay a >10-minute XLA compile); the resulting
    calibration is saved so production 'auto' runs read the measured
    model."""
    try:
        from aletsch_tpu.ops import crossover
        from aletsch_tpu.ops.greedy_fused import _pallas_drain_wanted
        # the Pallas f32 form compiles in seconds at every batch shape,
        # so no cross-window row reuse is needed; the XLA f64 fallback
        # keeps the cached-large-B policy (>10-min compiles per shape)
        reuse = None if _pallas_drain_wanted() else 256
        cal = crossover.measure(batches=(64, 256, 512, 1024), reps=3,
                                reuse_above=reuse)
        cal["direct_projection"] = crossover.project_direct(cal)
        crossover.save(cal)
        return cal
    except Exception as e:                    # pragma: no cover
        return {"error": str(e)}


def pallas_drain_probe():
    """The round-4 verdict item-1 deliverable: f32 Pallas fused drain vs
    the native host drain, resident and dispatch, with bit-exactness
    against the f64 host oracle (ops/crossover.measure_pallas_drain).

    Runs in a FRESH subprocess: the relay queue poisons same-process
    resident timings ~100x after heavy dispatch traffic (measured in
    round 5 — earlier bench probes inflate 2.4 us/graph to ~400), so
    the only clean measurement context is a new process."""
    import subprocess
    try:
        env = dict(os.environ)
        # APPEND to PYTHONPATH: the axon plugin rides the environment's
        # sitecustomize dir (~/.axon_site) — replacing the path would
        # leave the subprocess without the TPU backend
        env["PYTHONPATH"] = (os.path.dirname(os.path.abspath(__file__))
                             + os.pathsep + env.get("PYTHONPATH", ""))
        r = subprocess.run(
            [sys.executable, "-m", "aletsch_tpu.ops.crossover",
             "--pallas-drain"],
            capture_output=True, text=True, timeout=900, env=env,
            cwd=os.path.dirname(os.path.abspath(__file__)))
        for line in r.stdout.splitlines():
            if line.startswith("RESULT "):
                return json.loads(line[7:])
        return {"error": "no RESULT line (rc=%d): %s"
                % (r.returncode, (r.stderr or "")[-400:])}
    except Exception as e:                    # pragma: no cover
        return {"error": str(e)}


def ladder_crossover_probe():
    """Device scallop-ladder crossover (round-3 review item 3's 'measured
    host-vs-device comparison at B>=256'): the batched ladder kernel
    (ops/ladder_kernel.py) vs the genuine native host ladder
    (core_bench_ladder) on identical graphs.  Uses the reduced kernel
    shape the relay's XLA compiler handles (V=32/E=96/H=16/L=16 — the
    full production shape faults the compiler; the first compile of a new
    shape costs ~12 min, later runs hit the relay cache)."""
    try:
        from aletsch_tpu.ops import crossover
        return crossover.measure_ladder(batches=(64, 256), reps=2,
                                        V=32, E=96, H=16, L=16, DMAX=12,
                                        DLOG=64, time_budget_s=900)
    except Exception as e:                    # pragma: no cover
        return {"error": str(e)}


def similarity_crossover_probe():
    """MXU similarity-matmul crossover (the quadratic-FLOPs stage whose
    device dispatch can undercut the host as regions grow)."""
    try:
        from aletsch_tpu.ops import crossover
        return crossover.measure_similarity()
    except Exception as e:                    # pragma: no cover
        return {"error": str(e)}


def coverage_crossover_probe():
    """Round-4 verdict weak#8: measured crossover row for the
    region-stats/coverage kernel (ops/coverage.py) instead of
    host-only-by-analogy."""
    try:
        from aletsch_tpu.ops import crossover
        return crossover.measure_coverage()
    except Exception as e:                    # pragma: no cover
        return {"error": str(e)}


def mfu_probe():
    """Per-kernel MFU / speed-of-light accounting (ops/mfu.py, SURVEY §7
    step 9): analytic FLOPs+bytes per dispatch vs measured time vs chip
    peaks, with a bound classification per kernel."""
    try:
        from aletsch_tpu.ops import mfu
        return mfu.measure_all(reps=3)
    except Exception as e:                    # pragma: no cover
        return {"error": str(e)}


def jaxdist_probe(reps=1):
    """--jax_dist_launch 2 at production scale (round-3 review item 7):
    wall vs the single-process CLI median, and byte equality of the merged
    meta GTF (workers force the cpu platform; parallel/jaxdist.py)."""
    from tools.refbuild.baseline import build_cohort
    base = "/tmp/refbase_g%d_s%d" % (PROD_GENES, PROD_SAMPLES)
    try:
        lst, _ = build_cohort(base, PROD_GENES, PROD_SAMPLES)
        wall, cpu, meta = run_cli(base, lst, "bench_jaxdist",
                                  extra_args=["--jax_dist_launch", "2"])
        ref_meta = os.path.join(base, "bench_ours_r0", "meta.gtf")
        identical = None
        if os.path.exists(ref_meta) and os.path.exists(meta):
            identical = sorted(open(ref_meta).readlines()) == \
                sorted(open(meta).readlines())
        return {"wall_s": round(wall, 2), "cpu_s": round(cpu, 1),
                "processes": 2, "meta_gtf_identical": identical,
                "note": "2 region-shard processes on 2 shared host "
                        "cores, cpu platform: sample-sharded profiling "
                        "(round-4 item 4; each sample profiled by "
                        "exactly one process, profiles all-gathered) "
                        "cut group CPU-s 38.3 -> ~15 ~= single-process "
                        "+ merge; wall parity on a 2-core host is the "
                        "expected ceiling — on a real multi-host part "
                        "each process owns its own cores and the region "
                        "grid splits scan+assembly 1/P"}
    except Exception as e:                    # pragma: no cover
        return {"error": str(e)}


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
    """On-chip single-device rate plus an 8-virtual-device CPU mesh run in
    a subprocess; returns (stderr text, shape dict).  The shape analysis
    (parallel/scaling.py measure_scaling_shape) separates host contention
    from sharding overhead so real multi-chip scaling is extrapolable."""
    out = []
    shape = None
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
        r = subprocess.run([sys.executable, "-m", "aletsch_tpu.parallel.scaling",
                            "--shape"],
                           capture_output=True, text=True, timeout=600, env=env,
                           cwd=os.path.dirname(os.path.abspath(__file__)))
        if r.returncode == 0 and r.stdout.strip():
            lines = []
            for line in r.stdout.strip().splitlines():
                if line.startswith("SHAPE "):
                    shape = json.loads(line[6:])
                else:
                    lines.append(line)
            out.append("virtual 8-dev CPU mesh (shards compile+execute; all "
                       "virtual devices share this host's cores, so "
                       "efficiency here is NOT hardware scaling):\n"
                       + "\n".join(lines))
    except Exception as e:                    # pragma: no cover
        out.append("virtual-mesh probe failed: %s" % e)
    return "\n".join(out), shape


def main():
    tmpdir = tempfile.mkdtemp(prefix="aletsch_bench_")
    try:
        # FIRST, before this process initializes the chip: the pallas
        # probe subprocess needs exclusive, queue-clean chip access
        pallas = pallas_drain_probe()
        print("pallas fused-drain crossover: %s" % json.dumps(pallas),
              file=sys.stderr)
        prod = production_bench()
        print("bench-production: %d bundles, wall median %.1fs of %s "
              "(steal %.1f%%) -> %.1f bundles/s (reference -t10: %s "
              "bundles/s measured on the same cohort; vs_reference = %s; "
              "cores used %.2f)"
              % (prod["bundles"], prod["wall_s"],
                 prod["wall_s_runs"], prod["steal_pct_window"],
                 prod["bundles_per_s"], prod["ref_bundles_per_s"],
                 prod["vs_reference_10t"], prod["cores_used"]),
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
        # the in-process resident column is queue-poisoned by earlier
        # probes; re-project the direct-attached model with the CLEAN
        # subprocess-measured pallas resident slope
        try:
            from aletsch_tpu.ops import crossover as _co
            b2c = pallas["fit"]["b2_resident_per_graph_s"]
            cross["direct_projection_clean"] = _co.project_direct(
                cross, b2_override=b2c)
        except Exception:
            pass
        print("crossover sweep + amortization fit: %s" % json.dumps(cross),
              file=sys.stderr)
        lcross = ladder_crossover_probe()
        print("ladder crossover: %s" % json.dumps(lcross),
              file=sys.stderr)
        scross = similarity_crossover_probe()
        print("similarity matmul crossover: %s" % json.dumps(scross),
              file=sys.stderr)
        covx = coverage_crossover_probe()
        print("coverage/region-stats crossover: %s" % json.dumps(covx),
              file=sys.stderr)
        mfu = mfu_probe()
        print("mfu / speed-of-light: %s" % json.dumps(mfu), file=sys.stderr)
        jd = jaxdist_probe()
        print("jax_dist 2-process production: %s" % json.dumps(jd),
              file=sys.stderr)
        scale_txt, shape = scaling_probe()
        print(scale_txt, file=sys.stderr)
        if shape:
            print("scaling shape: %s" % json.dumps(shape), file=sys.stderr)

        emit(prod, fused, cross, lcross, scross, mfu, jd, shape,
             pallas, covx)
    finally:
        shutil.rmtree(tmpdir, ignore_errors=True)


def emit(prod, fused, cross, lcross, scross, mfu, jd, shape,
         pallas=None, covx=None):
    """Write BENCH_DETAIL.json and print the compact headline line."""
    if True:
        vs = prod["vs_reference_10t"]
        detail = {
            "metric": "bundles_per_second",
            "value": prod["bundles_per_s"],
            "unit": "bundles/s",
            "vs_baseline": vs if vs is not None else 0.0,
            "baseline_kind": "measured reference binary, -t 10, same "
                             "cohort, same host, same CLI-subprocess "
                             "protocol (BASELINE.md)",
            "production": {k: v for k, v in prod.items()
                           if k != "device_stats"},
            "device_share_default":
                prod["device_stats"].get("device_share", 0.0),
            "fused_probe": fused,
            "crossover": cross,
            "pallas_drain_crossover": pallas,
            "ladder_crossover": lcross,
            "similarity_crossover": scross,
            "coverage_crossover": covx,
            "mfu": mfu,
            "jax_dist": jd,
            "scaling_shape": shape,
        }
        # Full tables go to a sidecar file + stderr; stdout carries ONE
        # COMPACT line (round-4 verdict weak#1: the ~8 KB single-line JSON
        # overflowed the driver's capture -> BENCH_r04 "parsed": null).
        detail_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json")
        with open(detail_path, "w") as fh:
            json.dump(detail, fh, indent=1)
        print("bench detail -> %s" % detail_path, file=sys.stderr)
        mfu_line = None
        try:
            kerns = mfu.get("kernels", {}) if isinstance(mfu, dict) else {}
            pcts = [k["pct_of_hbm_peak"] for k in kerns.values()
                    if isinstance(k, dict) and "pct_of_hbm_peak" in k]
            if pcts:
                mfu_line = ("best kernel %.4f%% of HBM peak -> "
                            "latency/serialization-bound" % max(pcts))
        except Exception:
            pass
        headline = {
            "metric": "bundles_per_second",
            "value": prod["bundles_per_s"],
            "unit": "bundles/s",
            "vs_baseline": vs if vs is not None else 0.0,
            "wall_s": prod["wall_s"],
            "ref_wall_s": prod["ref_wall_s"],
            "ref_same_window": prod["ref_same_window"],
            "cpu_efficiency_vs_ref": prod["cpu_efficiency_vs_ref"],
            "steal_pct_window": prod["steal_pct_window"],
            "device_share_default":
                round(prod["device_stats"].get("device_share", 0.0), 4),
            "break_even_B": (cross or {}).get("break_even_B")
            if isinstance(cross, dict) else None,
            "pallas_resident_us_per_graph": min(
                (r["resident_us_per_graph_min"]
                 for r in (pallas.get("table") or [])
                 if r.get("resident_us_per_graph_min") is not None),
                default=None) if isinstance(pallas, dict) else None,
            "pallas_beats_host_resident":
                pallas.get("device_beats_host_resident")
                if isinstance(pallas, dict) else None,
            "ladder_device_prefix_share":
                (prod.get("ladder_arm_histogram") or {}).get(
                    "device_prefix_share"),
            "mfu": mfu_line,
            "detail_file": "BENCH_DETAIL.json",
        }
        print(json.dumps(headline))


if __name__ == "__main__":
    main()
