"""aletsch-tpu: a TPU-native multi-sample transcript assembler.

A from-scratch re-design of the capabilities of Shao-Group/aletsch
(reference mounted at /root/reference) for JAX/XLA/Pallas on TPU:
host-side BAM ingestion and orchestration, batched dense kernels for
coverage statistics, paired-end bridging DP, splice-graph decomposition
and random-forest transcript scoring.
"""

__version__ = "0.1.0"
