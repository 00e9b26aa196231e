"""Interleaved A/B of two decoder .so builds on the e2e fixture.

The VM's host CPU throughput swings 2-3x on minute scales, so variants
are run back-to-back in alternating order and compared on BOTH wall
and process CPU-seconds (user+sys, robust to host throttling).

Usage:
  python scripts/decode_ab.py A.so B.so [--reads N] [--reps K] [--pack]
Each rep of each variant runs in a fresh subprocess (the .so is copied
over csrc/liboarfish_host.so before the child starts).
"""

import argparse
import json
import shutil
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
LIB = REPO / "csrc" / "liboarfish_host.so"

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from oarfish_tpu.host import native
bam = {bam!r}
t0w = time.perf_counter(); t0c = os.times()
if {pack}:
    from pathlib import Path
    from oarfish_tpu.config import Args, resolve_filters
    from oarfish_tpu.host.packer import pack_bam_fast
    a = Args(alignments=Path(bam), output=Path("/tmp/dab_out"))
    opts = resolve_filters(a)
    pack_bam_fast(bam, opts, 100, threads=4)
else:
    n = 0
    for chunk in native.stream_bam(bam, threads=4, keep_names=False,
                                   sort_check_num=100000):
        n += len(chunk.columns.flag)
t1w = time.perf_counter(); t1c = os.times()
cpu = (t1c.user - t0c.user) + (t1c.system - t0c.system)
print(json.dumps({{"wall": t1w - t0w, "cpu": cpu}}))
"""


def run_child(bam, pack):
    code = CHILD.format(repo=str(REPO), bam=str(bam), pack=bool(pack))
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=600, cwd=str(REPO),
    )
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-2000:])
        raise SystemExit("child failed")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("so_a")
    ap.add_argument("so_b")
    ap.add_argument("--reads", type=int, default=2_000_000)
    ap.add_argument("--txps", type=int, default=200_000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--pack", action="store_true")
    args = ap.parse_args()

    sys.path.insert(0, str(REPO / "scripts"))
    from e2e_bench import ensure_fixture

    bam, info, _ = ensure_fixture(args.reads, args.txps)
    print(f"fixture: A={info['A_generated']} {info['bytes']/1e6:.0f}MB "
          f"mode={'pack' if args.pack else 'decode'}", flush=True)

    res = {"A": [], "B": []}
    for rep in range(args.reps):
        for tag, so in (("A", args.so_a), ("B", args.so_b)):
            shutil.copy(so, LIB)
            r = run_child(bam, args.pack)
            res[tag].append(r)
            print(f"rep{rep} {tag}: wall {r['wall']:.2f}s cpu {r['cpu']:.2f}s",
                  flush=True)

    for tag in ("A", "B"):
        ws = sorted(x["wall"] for x in res[tag])
        cs = sorted(x["cpu"] for x in res[tag])
        print(f"{tag}: wall min/med {ws[0]:.2f}/{ws[len(ws)//2]:.2f}s  "
              f"cpu min/med {cs[0]:.2f}/{cs[len(cs)//2]:.2f}s")


if __name__ == "__main__":
    main()
