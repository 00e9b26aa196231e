"""Short-read (salmon-style) quantification seeding for the EM.

Mirrors `read_short_quant_vec` (`read_function.rs:9-77`): a tab-separated
file with `Name/Length/EffectiveLength/TPM/NumReads` columns, validated
against the header transcripts and projected to header order with 0-fill.
"""

from __future__ import annotations

import csv
import logging
from typing import Sequence

import numpy as np

log = logging.getLogger("oarfish_tpu")


def read_short_quant_vec(path: str, txps_name: Sequence[str]) -> np.ndarray:
    records = {}
    with open(path, newline="") as fh:
        rdr = csv.DictReader(fh, delimiter="\t")
        for row in rdr:
            records[row["Name"]] = float(row["NumReads"])

    name_set = set(txps_name)
    extra = [k for k in records if k not in name_set]
    if extra:
        raise ValueError(
            "There were transcripts in the short read quantification file "
            "that didn't appear in the BAM header; cannot proceed."
        )

    num_missing = 0
    out = np.zeros(len(txps_name), dtype=np.float64)
    for i, name in enumerate(txps_name):
        if name in records:
            out[i] = records[name]
        else:
            num_missing += 1
    if num_missing > 0:
        log.warning(
            "There were %d transcripts appearing in the BAM header but "
            "missing from the short read quantifications; they have been "
            "assumed to have 0 abundance.",
            num_missing,
        )
    return out
