"""oarfish_tpu — TPU-native long-read RNA-seq transcript quantification.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
COMBINE-lab/oarfish (reference under /root/reference): host-side streaming
BAM decoding packs a sparse read×transcript CSR; the EM abundance update,
coverage models, and bootstrap inferential replicates run on device; reads
shard data-parallel across a TPU mesh with per-iteration `psum` of partial
transcript counts.
"""

__version__ = "0.1.0"
