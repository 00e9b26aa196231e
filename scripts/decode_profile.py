"""Profile the native BAM decode path in isolation.

Streams the e2e fixture through the C++ decoder with (a) no consumer
work at all (pure producer throughput) and (b) the full overlapped
filter/pack, and prints the decoder's internal phase split (inflate /
boundary-scan / record-scan / merge, via OARFISH_DECODE_TIMING).

Usage: python scripts/decode_profile.py [--reads N] [--txps T] [--threads K]
"""

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("OARFISH_DECODE_TIMING", "1")

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=2_000_000)
    ap.add_argument("--txps", type=int, default=200_000)
    ap.add_argument("--threads", type=int, default=4)
    ap.add_argument("--skip-pack", action="store_true")
    args = ap.parse_args()

    from e2e_bench import ensure_fixture  # noqa: E402

    bam_path, info, gen_s = ensure_fixture(args.reads, args.txps)
    size_mb = info["bytes"] / 1e6
    print(
        f"fixture {bam_path}: R={args.reads} A={info['A_generated']} "
        f"{size_mb:.0f}MB (gen {gen_s:.1f}s)",
        flush=True,
    )

    from oarfish_tpu.host import native

    # warm the page cache so the first timed pass isn't disk-bound
    with open(bam_path, "rb") as fh:
        while fh.read(1 << 24):
            pass

    # --- pure decode: consume chunks, do nothing with them
    for rep in range(2):
        t0 = time.perf_counter()
        n_rec = 0
        n_chunks = 0
        for chunk in native.stream_bam(
            bam_path, threads=args.threads, keep_names=False,
            sort_check_num=100_000,
        ):
            n_rec += len(chunk.columns.flag)
            n_chunks += 1
        dt = time.perf_counter() - t0
        print(
            f"pure decode rep{rep}: {dt:.2f}s  {n_rec} records "
            f"({n_rec/dt/1e6:.2f} M rec/s, {size_mb/dt:.0f} MB/s comp) "
            f"{n_chunks} chunks",
            flush=True,
        )

    if args.skip_pack:
        return

    # --- overlapped pack (decode producer || filter consumer)
    from oarfish_tpu.config import Args, resolve_filters
    from oarfish_tpu.host.packer import pack_bam_fast

    a = Args(alignments=Path(bam_path), output=Path("/tmp/dp_out"))
    opts = resolve_filters(a)
    tm = {}
    t0 = time.perf_counter()
    pack_bam_fast(
        bam_path, opts, 100, threads=args.threads, timings=tm,
    )
    dt = time.perf_counter() - t0
    print(f"full pack: {dt:.2f}s  timings={tm}", flush=True)


if __name__ == "__main__":
    main()
