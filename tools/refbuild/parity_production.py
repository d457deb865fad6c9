"""Production-scale byte-parity check: reference -t 1 vs ours with
ALETSCH_REF_QUIRKS=1 on the baseline cohort (10 x 2000 genes).

Prints per-file verdicts, and for any differing file, the differing rows.

Usage: python tools/refbuild/parity_production.py [--genes N] [--samples N]
"""

import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, REPO)

from tools.refbuild.baseline import build_cohort  # noqa: E402
from tools.refbuild.compare import (  # noqa: E402
    ensure_binary, run_reference, run_ours, byte_compare)


def main():
    n_genes = 2000
    ns = 10
    if "--genes" in sys.argv:
        n_genes = int(sys.argv[sys.argv.index("--genes") + 1])
    if "--samples" in sys.argv:
        ns = int(sys.argv[sys.argv.index("--samples") + 1])
    ensure_binary()
    base = "/tmp/refbase_g%d_s%d" % (n_genes, ns)
    lst, nrec = build_cohort(base, n_genes, ns)
    print("cohort ready (%d new records)" % nrec, file=sys.stderr,
          flush=True)
    for sub in ("ref", "oursq"):
        shutil.rmtree(os.path.join(base, sub), ignore_errors=True)
    ref_out = run_reference(base, lst, threads=1)
    print("reference done", file=sys.stderr, flush=True)
    our_out = run_ours(base, lst, quirks=True)
    print("ours done", file=sys.stderr, flush=True)
    bc = byte_compare(ref_out, our_out)
    n_id = sum(1 for v in bc.values() if v == "identical")
    print("%d/%d files byte-identical" % (n_id, len(bc)))
    for f, v in sorted(bc.items()):
        if v == "identical":
            continue
        print("== %s: %s" % (f, v))
        a = os.path.join(ref_out, f) if f == "meta.gtf" else \
            os.path.join(ref_out, "gtf", f)
        b = os.path.join(our_out, f) if f == "meta.gtf" else \
            os.path.join(our_out, "gtf", f)
        la = sorted(open(a).readlines())
        lb = sorted(open(b).readlines())
        sa, sb = set(la), set(lb)
        for ln in la:
            if ln not in sb:
                print("  ref : %s" % ln.rstrip())
        for ln in lb:
            if ln not in sa:
                print("  ours: %s" % ln.rstrip())


if __name__ == "__main__":
    main()
