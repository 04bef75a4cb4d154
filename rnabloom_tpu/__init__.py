"""rnabloom_tpu — a TPU-native de novo transcriptome assembler.

A from-scratch JAX/XLA/Pallas rebuild of the RNA-Bloom method (reference-free
transcript assembly from bulk/single-cell short reads and ONT/PacBio long
reads).  The de Bruijn graph is implicit: HBM-resident sharded Bloom filter
bit/counter arrays queried by batched ntHash kernels, with graph traversal
expressed as frontier-batched device steps.
"""

__version__ = "0.1.0"
