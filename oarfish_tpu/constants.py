"""Numeric constants shared by the inference engine.

Parity-critical: these mirror the reference's `src/util/constants.rs:1-3`.
"""

# Abundances below this are treated as zero for convergence checks and are
# zeroed out before the final E/M round (reference `constants.rs:1`).
MIN_READ_THRESH = 1e-5

# A read whose assignment denominator falls at/below this is dropped from the
# M-step (reference `constants.rs:2`).
EM_DENOM_THRESH = 1e-30

# Placeholder read name used when a record carries none (reference
# `constants.rs:3`).
EMPTY_READ_NAME = "no_read_name_available"
