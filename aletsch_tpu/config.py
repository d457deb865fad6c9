"""Typed configuration tree with per-protocol overlays.

The reference keeps one mutable ``parameters`` object per RNA-seq data type
(/root/reference/aletsch.cc:21-26, util/parameters.{h,cc}).  Generic flags
apply to every data type; ``--flag <dt> <value>`` style flags target a single
type (util/parameters.cc:350-495).  We model this as a frozen-ish dataclass
plus a parser that produces the full NUM_DATA_TYPES-sized list.

Defaults follow util/parameters.cc:19-112; per-protocol defaults follow
util/parameters.cc:508-518 (long reads loosen bundle/junction thresholds).
"""

from __future__ import annotations

import sys
from dataclasses import dataclass, field

from .constants import (DEFAULT, NUM_DATA_TYPES, ONT, PACBIO_CCS,
                        PACBIO_SUB)

VERSION = "0.1.0"


@dataclass
class Parameters:
    # controlling
    input_bam_list: str = ""
    output_gtf_file: str = ""
    output_gtf_dir: str = ""
    chrm_list_string: str = ""
    chrm_list_file: str = ""
    profile_dir: str = ""
    verbose: int = 1
    jax_profile_dir: str = ""      # TPU addition: jax.profiler trace output
    checkpoint_dir: str = ""       # TPU addition: per-region checkpoint/resume
    algo: str = "aletsch-tpu"
    version: str = VERSION
    max_threads: int = 10
    profile_only: bool = False
    boost_precision: bool = False
    skip_single_exon_transcripts: bool = True

    # TPU additions: wave-batched greedy DP on the accelerator
    # (meta/device_wave.py; "auto" engages when a wave has enough paused
    # graphs to amortize a dispatch, "on" forces it, "off" disables)
    device_greedy: str = "auto"
    device_min_vertices: int = 16   # smaller graphs solve faster on host
    device_min_groups: int = 16     # min groups per wave to engage "auto"
    device_similarity: str = "auto"  # clustering rounds via the MXU matmul
    device_min_cluster: int = 48     # region size where the matmul wins on
                                     # a direct-attached part (measured;
                                     # 'auto' additionally requires the
                                     # ops/crossover.py amortization model
                                     # via device_wave.auto_device_ok:
                                     # engage iff a + b*B < c*B with
                                     # measured a/b/c per backend)
    # bridging pier DPs wave-batched on device (ops/bridge_topk.py);
    # "auto" == off on tunnel-attached chips (measured: transfer dominates,
    # see meta/device_wave.py bridge_enabled), "on" forces it
    device_bridge: str = "auto"
    # cross-sample junction-support reduce on device (ops/support.py);
    # same auto posture (see meta/device_wave.py support_enabled)
    device_support: str = "auto"
    # scallop resolution-ladder prefix on device (ops/ladder_kernel.py,
    # pause kind 4); same auto posture (device_wave.ladder_enabled)
    device_ladder: str = "auto"

    # meta-assembly
    max_group_size: int = 200
    min_grouping_similarity: float = 0.10
    max_grouping_similarity: float = 0.80
    max_num_junctions_to_combine: int = 500
    assembly_repeats: int = 1
    region_partition_length: int = 1000000
    batch_partition_size: int = 3

    # bridging paired-end reads
    bridge_end_relaxing: int = 10
    bridge_dp_solution_size: int = 10
    bridge_dp_stack_size: int = 5
    min_bridging_score: float = 1.5

    # loading bam file and reads
    min_flank_length: int = 3
    max_num_cigar: int = 10000
    min_bundle_gap: int = 200
    min_num_hits_in_bundle: int = 10
    min_junction_support: int = 1
    min_mapping_quality: int = 1
    use_second_alignment: bool = True
    uniquely_mapped_only: bool = False
    batch_bundle_size: int = 100
    max_reads_partition_gap: int = 10
    max_read_span: int = 500000

    # preview
    max_preview_reads: int = 2000000
    max_preview_spliced_reads: int = 50000
    min_preview_spliced_reads: int = 100
    preview_infer_ratio: float = 0.8

    # identifying subgraphs
    min_subregion_gap: int = 15
    min_subregion_overlap: float = 1.5
    min_subregion_length: int = 15
    min_subregion_pvalue: float = 0.01

    # revising splice graph and phasing paths
    max_group_boundary_distance: int = 10000
    max_intron_contamination_coverage: float = 2.0
    min_surviving_edge_weight: float = 1.5
    normal_junction_threshold: float = 10
    extend_junction_threshold: float = 20
    min_boundary_log_ratio: float = 2.0

    # decomposing splice graph; indexed by decomposition type constants
    max_decompose_error_ratio: tuple = (0.30, 0.00, 1.10, 1.10, 0.75, 0.30, 0.00, 1.00)
    min_guaranteed_edge_weight: float = 0.01
    max_dp_table_size: int = 10000

    # filtering paths
    min_transcript_coverage: float = 2.0
    min_transcript_length_base: int = 100
    min_transcript_length_increase: int = 20
    min_single_exon_transcript_coverage: float = 3.5
    min_single_exon_individual_coverage: float = 1.5
    min_single_exon_transcript_length: int = 250
    min_single_exon_clustering_overlap: float = 0.8
    min_exon_length: int = 8
    max_num_exons: int = 10000

    # clustering assembled transcripts
    max_cluster_boundary_distance: int = 10000
    max_cluster_intron_distance: int = 5
    max_cluster_intron_shifting: int = 10
    long_reads_cluster_boosting: int = 5

    def set_default(self, data_type: int) -> "Parameters":
        """Per-protocol overlays (util/parameters.cc:508-518)."""
        if data_type in (PACBIO_CCS, PACBIO_SUB, ONT):
            self.min_num_hits_in_bundle = 1
        if data_type == PACBIO_CCS:
            self.min_junction_support = 1
        if data_type in (PACBIO_SUB, ONT):
            self.min_junction_support = 2
        return self


# flags applying to every data type: (flag names, attr, converter)
_GENERIC_FLAGS = {
    "-i": ("input_bam_list", str),
    "-o": ("output_gtf_file", str),
    "-l": ("chrm_list_string", str),
    "--chrm_list_string": ("chrm_list_string", str),
    "-L": ("chrm_list_file", str),
    "--chrm_list_file": ("chrm_list_file", str),
    "-d": ("output_gtf_dir", str),
    "--output_gtf_dir": ("output_gtf_dir", str),
    "-p": ("profile_dir", str),
    "--profile_dir": ("profile_dir", str),
    "-t": ("max_threads", int),
    "--max_threads": ("max_threads", int),
    "-s": ("min_grouping_similarity", float),
    "--min_grouping_similarity": ("min_grouping_similarity", float),
    "-c": ("max_group_size", int),
    "--max_group_size": ("max_group_size", int),
    "-r": ("assembly_repeats", int),
    "--assembly_repeats": ("assembly_repeats", int),
    "-b": ("batch_partition_size", int),
    "-g": ("region_partition_length", int),
    "--region_partition_length": ("region_partition_length", int),
    "--verbose": ("verbose", int),
    "--device_greedy": ("device_greedy", str),
    "--device_min_vertices": ("device_min_vertices", int),
    "--device_min_groups": ("device_min_groups", int),
    "--device_similarity": ("device_similarity", str),
    "--device_min_cluster": ("device_min_cluster", int),
    "--device_bridge": ("device_bridge", str),
    "--device_support": ("device_support", str),
    "--device_ladder": ("device_ladder", str),
    "--jax_profile_dir": ("jax_profile_dir", str),
    "--checkpoint_dir": ("checkpoint_dir", str),
    "--min_bridging_score": ("min_bridging_score", float),
    "--bridge_dp_solution_size": ("bridge_dp_solution_size", int),
    "--bridge_dp_stack_size": ("bridge_dp_stack_size", int),
    "--min_transcript_coverage": ("min_transcript_coverage", float),
    "--min_single_exon_transcript_coverage": ("min_single_exon_transcript_coverage", float),
    "--min_single_exon_transcript_length": ("min_single_exon_transcript_length", int),
    "--min_single_exon_clustering_overlap": ("min_single_exon_clustering_overlap", float),
    "--min_transcript_length_base": ("min_transcript_length_base", int),
    "--min_transcript_length_increase": ("min_transcript_length_increase", int),
    "--min_exon_length": ("min_exon_length", int),
    "--max_num_exons": ("max_num_exons", int),
    "--max_dp_table_size": ("max_dp_table_size", int),
}

# flags with the ``--flag <data-type> <value>`` pattern (parameters.cc:350-495)
_TYPED_FLAGS = {
    "--min_flank_length": ("min_flank_length", int),
    "--max_num_cigar": ("max_num_cigar", int),
    "--min_bundle_gap": ("min_bundle_gap", int),
    "--min_num_hits_in_bundle": ("min_num_hits_in_bundle", int),
    "--min_mapping_quality": ("min_mapping_quality", int),
    "--max_reads_partition_gap": ("max_reads_partition_gap", int),
    "--batch_bundle_size": ("batch_bundle_size", int),
    "--use_second_alignment": ("use_second_alignment", lambda s: s == "true"),
    "--uniquely_mapped_only": ("uniquely_mapped_only", lambda s: s == "true"),
    "--max_preview_spliced_reads": ("max_preview_spliced_reads", int),
    "--min_preview_spliced_reads": ("min_preview_spliced_reads", int),
    "--max_preview_reads": ("max_preview_reads", int),
    "--preview_infer_ratio": ("preview_infer_ratio", float),
    "--min_subregion_gap": ("min_subregion_gap", int),
    "--min_subregion_length": ("min_subregion_length", int),
    "--min_subregion_overlap": ("min_subregion_overlap", float),
    "--min_surviving_edge_weight": ("min_surviving_edge_weight", float),
    "--max_intron_contamination_coverage": ("max_intron_contamination_coverage", float),
    "--min_boundary_log_ratio": ("min_boundary_log_ratio", float),
}

_BOOL_FLAGS = {
    "--boost_precision": ("boost_precision", True),
    "--output_single_exon_transcripts": ("skip_single_exon_transcripts", False),
    "--profile": ("profile_only", True),
}


def parse_arguments(argv, data_type: int) -> Parameters:
    """Parse one Parameters instance for the given data type."""
    p = Parameters()
    p.set_default(data_type)
    i = 0
    while i < len(argv):
        a = argv[i]
        if a in _GENERIC_FLAGS:
            attr, conv = _GENERIC_FLAGS[a]
            setattr(p, attr, conv(argv[i + 1]))
            i += 2
        elif a in _TYPED_FLAGS:
            attr, conv = _TYPED_FLAGS[a]
            dt = int(argv[i + 1])
            if dt == 0 or dt == data_type:
                setattr(p, attr, conv(argv[i + 2]))
            i += 3
        elif a in _BOOL_FLAGS:
            attr, val = _BOOL_FLAGS[a]
            setattr(p, attr, val)
            i += 1
        elif a.startswith("--max_decompose_error_ratio"):
            idx = int(a[len("--max_decompose_error_ratio"):])
            r = list(p.max_decompose_error_ratio)
            r[idx] = float(argv[i + 1])
            p.max_decompose_error_ratio = tuple(r)
            i += 2
        elif a == "--version":
            print(VERSION)
            sys.exit(0)
            i += 1
        elif a == "--help":
            print_help()
            sys.exit(0)
            i += 1
        else:
            i += 1
    return p


def parse_all(argv) -> list:
    """One Parameters per data type, mirroring aletsch.cc:21-26."""
    return [parse_arguments(argv, dt) for dt in range(NUM_DATA_TYPES)]


def default_params() -> list:
    return [Parameters().set_default(dt) for dt in range(NUM_DATA_TYPES)]


def print_help():
    print("Usage: aletsch-tpu -i <input-bam-list> -o <output.gtf> [options]")
    print("")
    print("Options:")
    rows = [
        ("--help", "print usage and exit"),
        ("--version", "print version and exit"),
        ("--profile", "profile individual samples and exit (writes files if -p given)"),
        ("--boost_precision", "reduce false positives"),
        ("--output_single_exon_transcripts", "assemble single-exon transcripts"),
        ("-l/--chrm_list_string <string>", "comma-separated chromosomes to assemble"),
        ("-L/--chrm_list_file <string>", "file listing chromosomes to assemble"),
        ("-d/--output_gtf_dir <string>", "dir for individual transcripts (created if missing)"),
        ("-p/--profile_dir <string>", "existing dir for sample profiles"),
        ("-t/--max_threads <integer>", "max worker threads, default: 10"),
        ("-c/--max_group_size <integer>", "max splice graphs combined, default: 200"),
        ("-b/--batch_partition_size <integer>", "partitions loaded per batch, default: 3"),
        ("-g/--region_partition_length <integer>", "partition length, default: 1000000"),
        ("-s/--min_grouping_similarity <float>", "min similarity to combine graphs, default: 0.1"),
        ("--min_bridging_score <float>", "min score for bridging paired-end reads, default: 1.5"),
        ("--min_transcript_coverage <float>", "min multi-exon transcript coverage, default: 2.0"),
        ("--jobs <integer>", "single-host multi-process execution over region shards"),
        ("--shard <h> <H> / --shard_dump <path>", "assemble region shard h of H, dump transcript sets"),
        ("--merge_shards <p1,p2,...>", "merge shard dumps and write outputs"),
        ("--jax_dist <pid> <P> <host:port>", "join a jax.distributed process group (shard payloads ride collectives)"),
        ("--jax_dist_launch <N>", "spawn the N-process jax.distributed group locally and wait"),
    ]
    for flag, desc in rows:
        print(" %-46s  %s" % (flag, desc))
