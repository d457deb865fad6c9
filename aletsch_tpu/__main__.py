"""CLI entry point: python -m aletsch_tpu -i bam.list -o out.gtf [options]

Mirrors the reference CLI (aletsch.cc:16-43): one Parameters instance per
data type, then the incubator drives the full assembly.
"""

import sys

from .config import parse_all, print_help
from .meta.incubator import Incubator


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) == 0:
        print_help()
        return 0
    params = parse_all(argv)
    from .constants import DEFAULT
    cfg = params[DEFAULT]
    if not cfg.profile_only and not cfg.output_gtf_file:
        print_help()
        return 1
    inc = Incubator(params)
    inc.resolve()
    return 0


if __name__ == "__main__":
    sys.exit(main())
