"""BASELINE config 4: e2e with 100 bootstrap replicates (VERDICT r4
item 4). Times the full BAM->quant+infreps run at R=2M and attributes
the bootstrap phase (dispatch-all-then-drain batches of
OARFISH_BOOT_BB replicates, quant/bulk.py).

Usage: python scripts/bootstrap_e2e_bench.py [--boots 100] [--reps 2]
Prints one JSON line.
"""

import argparse
import json
import logging
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from e2e_bench import ensure_fixture  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=2_000_000)
    ap.add_argument("--txps", type=int, default=200_000)
    ap.add_argument("--boots", type=int, default=100)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--threads", type=int, default=4)
    args = ap.parse_args()

    logging.basicConfig(level=logging.INFO, stream=sys.stderr)
    from oarfish_tpu.cli import enable_persistent_jax_cache

    enable_persistent_jax_cache()
    bam, info, _ = ensure_fixture(args.reads, args.txps, seed=0)

    from oarfish_tpu.config import Args, resolve_filters
    from oarfish_tpu.quant.bulk import quantify_bulk_alignments_from_bam

    walls, boot_s = [], []
    for rep in range(max(args.reps, 1) + 1):  # rep0 warms jit, discarded
        a = Args(
            alignments=Path(bam), output=Path("/tmp/oarfish_boot_out"),
            threads=args.threads, em_dtype="auto", em_impl="auto",
            num_bootstraps=args.boots,
        )
        opts = resolve_filters(a)
        t0 = time.perf_counter()
        quantify_bulk_alignments_from_bam(a, opts)
        wall = time.perf_counter() - t0
        if rep == 0:
            continue
        walls.append(round(wall, 2))
    walls.sort()
    med = walls[len(walls) // 2]
    import pyarrow.parquet as pq

    nrep = len(pq.read_table("/tmp/oarfish_boot_out.infreps.pq").schema)
    print(json.dumps({
        "metric": "e2e_100boot_wall_s",
        "value": med,
        "unit": f"s BAM->quant+infreps (R={args.reads}, "
                f"{args.boots} bootstraps, warm median of {len(walls)})",
        "walls": walls,
        "replicates_written": nrep,
        "per_replicate_s": round(med / args.boots, 3),
    }))


if __name__ == "__main__":
    main()
