"""Subprocess worker entry points for parallel execution.

multiprocessing fork/spawn are both hazardous here (the runtime's
sitecustomize imports JAX into every interpreter; fork after backend init
deadlocks, spawn re-executes __main__).  Workers are therefore plain
subprocesses running this module with pickled arguments:

    python -m aletsch_tpu.parallel.worker shard <params.pkl> <h> <H> <dump>
    python -m aletsch_tpu.parallel.worker profile <params.pkl> <sid> <out.pkl>
"""

from __future__ import annotations

import pickle
import sys


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    cmd = argv[0]
    if cmd == "shard":
        params_path, h, H, dump = argv[1], int(argv[2]), int(argv[3]), argv[4]
        with open(params_path, "rb") as fh:
            params = pickle.load(fh)
        from .distributed import run_region_shard
        run_region_shard(params, h, H, dump)
        return 0
    if cmd == "profile":
        params_path, sid, out = argv[1], int(argv[2]), argv[3]
        with open(params_path, "rb") as fh:
            payload = pickle.load(fh)
        params = payload["params"]
        sp = payload["samples"][sid]
        from ..meta.incubator import _prep_sample
        sp = _prep_sample((sp, params))
        with open(out, "wb") as fh:
            pickle.dump(sp, fh)
        return 0
    print("unknown worker command %s" % cmd)
    return 1


if __name__ == "__main__":
    sys.exit(main())
