"""Test shim: simulator lives in aletsch_tpu.sim."""
from aletsch_tpu.sim import *     # noqa: F401,F403
from aletsch_tpu.sim import (GENE_A_ISO1, GENE_A_ISO2, GENE_B_ISO1,
                             simulate_sample, simulate_pairs, write_bam,
                             map_to_genome)
