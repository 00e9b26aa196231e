"""Differential tests: C++ columnar decoder vs the Python BAM reader, and
the fast pack path vs the streaming per-group oracle path."""

import numpy as np
import pytest

from oarfish_tpu.config import FilterOpts, Strand
from oarfish_tpu.host import native
from oarfish_tpu.host.packer import CollationError, pack_bam, pack_bam_fast
from oarfish_tpu.host.vector_filter import columns_from_records
from oarfish_tpu.io import bam
from oarfish_tpu.io.bam import BamReader
from util_sim import simulate_bam

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native decoder not built"
)


@pytest.fixture(scope="module")
def fixture_bam(tmp_path_factory):
    d = tmp_path_factory.mktemp("native")
    p = d / "sim.bam"
    simulate_bam(p, num_reads=700, seed=21)
    return p


def test_decoder_matches_python_reader(fixture_bam):
    dec = native.decode_bam(fixture_bam, keep_names=True)
    reader = BamReader(fixture_bam)
    cols, names, num_unmapped = columns_from_records(reader.records())

    assert dec.header.ref_names == reader.header.ref_names
    assert dec.header.ref_lengths == reader.header.ref_lengths
    assert dec.header.programs() == reader.header.programs()
    assert dec.num_unmapped == num_unmapped
    assert dec.dup_name is None
    np.testing.assert_array_equal(dec.columns.group_id, cols.group_id)
    np.testing.assert_array_equal(dec.columns.flag, cols.flag)
    np.testing.assert_array_equal(dec.columns.ref_id, cols.ref_id)
    np.testing.assert_array_equal(dec.columns.pos, cols.pos)
    np.testing.assert_array_equal(dec.columns.ref_span, cols.ref_span)
    np.testing.assert_array_equal(dec.columns.seq_len, cols.seq_len)
    np.testing.assert_array_equal(dec.columns.score, cols.score)
    np.testing.assert_array_equal(dec.columns.has_score, cols.has_score)
    assert dec.group_names == names


def test_decoder_barcodes(tmp_path):
    p = tmp_path / "bc.bam"
    simulate_bam(p, num_reads=60, seed=7, barcodes=["AAAA", "CCCC"])
    dec = native.decode_bam(p, want_barcodes=True)
    assert dec.barcodes == ["AAAA", "CCCC"]
    assert set(np.unique(dec.cb_id)) <= {0, 1}
    # contiguous: barcode 0 records all before barcode 1
    switch = np.nonzero(np.diff(dec.cb_id))[0]
    assert len(switch) == 1


def test_fast_pack_matches_oracle_pack(fixture_bam):
    for opts in (FilterOpts(), FilterOpts(model_coverage=True),
                 FilterOpts(which_strand=Strand.FORWARD, three_prime_clip=50)):
        header, store_f, cov_f, unm_f = pack_bam_fast(
            fixture_bam, opts, bin_width=100, keep_names=True
        )
        reader = BamReader(fixture_bam)
        store_o, cov_o, unm_o = pack_bam(
            reader,
            np.asarray(header.ref_lengths),
            opts,
            bin_width=100,
            keep_names=True,
        )
        assert unm_f == unm_o
        np.testing.assert_array_equal(store_f.txp_id, store_o.txp_id)
        np.testing.assert_array_equal(store_f.start, store_o.start)
        np.testing.assert_array_equal(store_f.end, store_o.end)
        np.testing.assert_array_equal(store_f.as_prob, store_o.as_prob)
        np.testing.assert_array_equal(store_f.boundaries, store_o.boundaries)
        assert store_f.discard.to_json_dict() == store_o.discard.to_json_dict()
        assert store_f.num_unique_alignments == store_o.num_unique_alignments
        assert store_f.read_names == store_o.read_names
        np.testing.assert_allclose(cov_f.bins, cov_o.bins, rtol=1e-12)
        np.testing.assert_allclose(cov_f.total_weight, cov_o.total_weight)


def test_fast_pack_collation_error(tmp_path):
    p = tmp_path / "bad.bam"
    recs = [
        dict(name="r1", flag=0, ref_id=0, pos=0, cigar="100M", seq="A" * 100,
             score=100),
        dict(name="r2", flag=0, ref_id=0, pos=0, cigar="100M", seq="A" * 100,
             score=100),
        dict(name="r1", flag=0, ref_id=0, pos=5, cigar="100M", seq="A" * 100,
             score=90),
    ]
    bam.write_bam(p, ["t"], [500], recs)
    with pytest.raises(CollationError, match="r1"):
        pack_bam_fast(p, FilterOpts(), bin_width=0)


def test_parallel_scan_matches_serial(tmp_path):
    """>4096 records with threads=16 exercises the parallel record scan;
    part boundaries land mid-group, so this covers the stitching merge."""
    p = tmp_path / "big.bam"
    simulate_bam(p, num_reads=6000, seed=3)
    par = native.decode_bam(p, threads=16, keep_names=True)
    ser = native.decode_bam(p, threads=1, keep_names=True)
    assert par.num_unmapped == ser.num_unmapped
    assert par.dup_name is None and ser.dup_name is None
    assert par.group_names == ser.group_names
    for f in ("group_id", "flag", "ref_id", "pos", "ref_span", "seq_len",
              "score", "has_score"):
        np.testing.assert_array_equal(
            getattr(par.columns, f), getattr(ser.columns, f), err_msg=f
        )


def test_parallel_scan_barcodes(tmp_path):
    p = tmp_path / "bigbc.bam"
    bcs = [f"BC{i:03d}" for i in range(40)]
    simulate_bam(p, num_reads=6000, seed=5, barcodes=bcs)
    par = native.decode_bam(p, threads=16, want_barcodes=True)
    ser = native.decode_bam(p, threads=1, want_barcodes=True)
    assert par.barcodes == ser.barcodes == bcs
    np.testing.assert_array_equal(par.cb_id, ser.cb_id)
    np.testing.assert_array_equal(par.columns.group_id, ser.columns.group_id)


def test_parallel_scan_collation_check(tmp_path):
    """A duplicate read name separated by other groups must still be caught
    when the duplicates fall in different parallel parts."""
    p = tmp_path / "dup.bam"
    recs = []
    for i in range(3000):
        recs.append(dict(name=f"r{i}", flag=0, ref_id=0, pos=0,
                         cigar="100M", seq="A" * 100, score=100))
    recs.append(dict(name="r17", flag=0, ref_id=0, pos=5,
                     cigar="100M", seq="A" * 100, score=90))
    # pad past the 4096-record parallel threshold
    for i in range(3001, 5000):
        recs.append(dict(name=f"r{i}", flag=0, ref_id=0, pos=0,
                         cigar="100M", seq="A" * 100, score=100))
    bam.write_bam(p, ["t"], [500], recs)
    dec = native.decode_bam(p, threads=16)
    assert dec.dup_name == "r17"


def test_decoder_error_paths(tmp_path):
    p = tmp_path / "junk.bam"
    p.write_bytes(b"this is not a bam file")
    with pytest.raises(ValueError):
        native.decode_bam(p)


def test_corrupt_bam_clean_errors(tmp_path, fixture_bam):
    """Corrupt/truncated inputs must raise clean errors, never crash
    or return garbage columns (bounds hardening in bam_decoder.cpp)."""
    import gzip

    from oarfish_tpu.host import native

    if native.get_lib() is None:
        pytest.skip("native decoder unavailable")

    # not BGZF at all
    junk = tmp_path / "junk.bam"
    junk.write_bytes(b"\x00" * 64)
    with pytest.raises(ValueError):
        native.decode_bam(str(junk))

    # plain gzip (no FEXTRA) is not BGZF
    pg = tmp_path / "plain.bam"
    pg.write_bytes(gzip.compress(b"BAM\x01" + b"\x00" * 100))
    with pytest.raises(ValueError):
        native.decode_bam(str(pg))

    # truncated mid-block: chop a valid BAM
    from pathlib import Path

    data = Path(fixture_bam).read_bytes()
    tr = tmp_path / "trunc.bam"
    tr.write_bytes(data[: len(data) // 2])
    with pytest.raises(ValueError):
        native.decode_bam(str(tr))


def test_coverage_reversed_interval_matches_oracle():
    """A reversed interval (start > end) collapses to a point in the
    oracle (store.py add_intervals: e = max(min(s,e), end)); the native
    accumulator must do exactly the same, not swap to the full span."""
    import numpy as np

    from oarfish_tpu.host import store as store_mod
    from oarfish_tpu.host.store import TranscriptCoverage

    lens = np.array([1000, 700], dtype=np.int64)
    tid = np.array([0, 0, 1], dtype=np.int64)
    start = np.array([500, 100, 600], dtype=np.int64)  # first is reversed
    end = np.array([100, 400, 650], dtype=np.int64)

    cov_n = TranscriptCoverage(lens, 100)
    cov_n.add_intervals(tid, start, end)

    orig = store_mod._get_cov_lib
    store_mod._get_cov_lib = lambda: None
    try:
        cov_o = TranscriptCoverage(lens, 100)
        cov_o.add_intervals(tid, start, end)
    finally:
        store_mod._get_cov_lib = orig

    np.testing.assert_allclose(cov_n.bins, cov_o.bins, rtol=1e-12)
    np.testing.assert_allclose(cov_n.total_weight, cov_o.total_weight)


def test_stream_chunks_match_whole_decode(fixture_bam, monkeypatch):
    """The chunked stream API, reassembled with per-chunk group-id
    rebasing, must reproduce the whole-file decode exactly — including
    group names, barcodes, and the unmapped count — under tiny windows
    that force cross-chunk group carries."""
    whole = native.decode_bam(fixture_bam, keep_names=True)
    monkeypatch.setenv("OARFISH_DECODE_WINDOW_BYTES", "4096")
    chunks = list(native.stream_bam(fixture_bam, keep_names=True))
    assert len(chunks) > 3  # the tiny window actually chunked
    assert chunks[0].header is not None
    assert chunks[0].header.ref_names == whole.header.ref_names
    assert chunks[-1].is_final
    assert all(not c.is_final for c in chunks[:-1])
    base = 0
    gid = []
    names = []
    unmapped = 0
    for c in chunks:
        gid.append(c.columns.group_id + base)
        if c.group_names is not None:
            names.extend(c.group_names)
        base += c.n_groups
        unmapped += c.num_unmapped
    np.testing.assert_array_equal(np.concatenate(gid), whole.columns.group_id)
    for f in ("flag", "ref_id", "pos", "ref_span", "seq_len", "score",
              "has_score"):
        np.testing.assert_array_equal(
            np.concatenate([getattr(c.columns, f) for c in chunks]),
            getattr(whole.columns, f), err_msg=f,
        )
    assert names == list(whole.group_names)
    assert base == len(whole.group_names)
    assert unmapped == whole.num_unmapped


def test_stream_pack_matches_whole_pack(fixture_bam, monkeypatch):
    """The overlapped streaming pack (decode chunk k+1 ∥ filter chunk k)
    must match the whole-file-then-filter pack: CSR exactly, coverage
    bins to FP-accumulation-order tolerance."""
    from oarfish_tpu.host.packer import pack_bam_stream

    opts = FilterOpts(model_coverage=True)
    monkeypatch.setenv("OARFISH_STREAM_PACK", "0")
    h2, s2, c2, u2 = pack_bam_fast(
        fixture_bam, opts, bin_width=100, keep_names=True
    )
    monkeypatch.setenv("OARFISH_DECODE_WINDOW_BYTES", "4096")
    tm = {}
    h1, s1, c1, u1 = pack_bam_stream(
        fixture_bam, opts, bin_width=100, keep_names=True, timings=tm
    )
    assert h1.ref_names == h2.ref_names
    assert u1 == u2
    assert tm["chunks"] > 3
    for f in ("txp_id", "start", "end", "as_prob", "boundaries"):
        np.testing.assert_array_equal(
            getattr(s1, f), getattr(s2, f), err_msg=f
        )
    assert s1.discard.to_json_dict() == s2.discard.to_json_dict()
    assert s1.num_unique_alignments == s2.num_unique_alignments
    assert s1.read_names == s2.read_names
    np.testing.assert_allclose(c1.bins, c2.bins, rtol=1e-12, atol=1e-12)
    np.testing.assert_array_equal(c1.total_weight, c2.total_weight)


def test_stream_pack_collation_error(tmp_path, monkeypatch):
    p = tmp_path / "bad.bam"
    recs = [
        dict(name="s1", flag=0, ref_id=0, pos=0, cigar="100M",
             seq="A" * 100, score=100),
        dict(name="s2", flag=0, ref_id=0, pos=0, cigar="100M",
             seq="A" * 100, score=100),
        dict(name="s1", flag=0, ref_id=0, pos=5, cigar="100M",
             seq="A" * 100, score=90),
    ]
    bam.write_bam(p, ["t"], [500], recs)
    from oarfish_tpu.host.packer import pack_bam_stream

    with pytest.raises(CollationError, match="s1"):
        pack_bam_stream(p, FilterOpts(), bin_width=0)


def test_stream_pack_consumer_error_cancels_decode(fixture_bam, monkeypatch):
    """A consumer-side failure must stop the producer after at most the
    queued chunks — not decode the rest of the file (a collation error
    on a 50 GB BAM would otherwise stall for the full decode)."""
    from oarfish_tpu.host import native as native_mod
    from oarfish_tpu.host import packer as packer_mod
    from oarfish_tpu.host.packer import pack_bam_stream

    monkeypatch.setenv("OARFISH_DECODE_WINDOW_BYTES", "4096")
    pulled = [0]
    orig_stream = native_mod.stream_bam

    def counting_stream(*a, **kw):
        gen = orig_stream(*a, **kw)
        if gen is None:
            return None

        def wrap():
            try:
                for chunk in gen:
                    pulled[0] += 1
                    yield chunk
            finally:
                gen.close()

        return wrap()

    monkeypatch.setattr(native_mod, "stream_bam", counting_stream)

    def boom(*a, **kw):
        raise RuntimeError("consumer exploded")

    import oarfish_tpu.host.vector_filter as vf

    # pack_bam_stream imports filter_records from the module at call time
    monkeypatch.setattr(vf, "filter_records", boom)

    with pytest.raises(RuntimeError, match="consumer exploded"):
        pack_bam_stream(fixture_bam, FilterOpts(), bin_width=0)

    # sanity: the tiny window really does split this file into many chunks
    total = sum(1 for _ in orig_stream(fixture_bam))
    assert total > 6, total
    # producer stopped early: first chunk + at most the queue capacity
    assert pulled[0] <= 4, (pulled[0], total)


def test_streaming_windows_match_single_window(fixture_bam, monkeypatch):
    """Tiny inflate windows (forcing record-tail carries and cross-
    window group stitching) must produce byte-identical columns, group
    names, and counters to the one-window decode."""
    import numpy as np

    from oarfish_tpu.host import native

    if native.get_lib() is None:
        pytest.skip("native decoder unavailable")

    monkeypatch.delenv("OARFISH_DECODE_WINDOW_BYTES", raising=False)
    big = native.decode_bam(fixture_bam, keep_names=True)
    monkeypatch.setenv("OARFISH_DECODE_WINDOW_BYTES", "4096")
    small = native.decode_bam(fixture_bam, keep_names=True)

    assert small.num_unmapped == big.num_unmapped
    assert small.dup_name == big.dup_name
    assert small.header.ref_names == big.header.ref_names
    assert small.header.ref_lengths == big.header.ref_lengths
    for f in ("group_id", "flag", "ref_id", "pos", "ref_span",
              "seq_len", "score", "has_score"):
        np.testing.assert_array_equal(
            getattr(small.columns, f), getattr(big.columns, f), err_msg=f
        )
    assert list(small.group_names) == list(big.group_names)


def test_name_spill_matches_resident(fixture_bam, monkeypatch):
    """The disk-spilled name store (NameSpill, the analogue of the
    reference's swapvec spill, `bulk.rs:221-229`) must be element-equal
    to the memory-resident NameBlob and be memmap-backed (names live in
    page cache, not RSS)."""
    import numpy as np

    from oarfish_tpu.host.packer import pack_bam_stream

    opts = FilterOpts()
    monkeypatch.setenv("OARFISH_NAME_SPILL", "0")
    res = pack_bam_stream(fixture_bam, opts, bin_width=0, keep_names=True)
    if res is None:
        pytest.skip("native decoder unavailable")
    _, s_res, _, _ = res
    monkeypatch.delenv("OARFISH_NAME_SPILL", raising=False)
    _, s_sp, _, _ = pack_bam_stream(
        fixture_bam, opts, bin_width=0, keep_names=True
    )
    assert isinstance(s_sp.read_names._buf, np.memmap)
    assert len(s_sp.read_names) == len(s_res.read_names)
    assert s_sp.read_names == s_res.read_names
    # random access through the memmap decodes correctly
    assert s_sp.read_names[0] == s_res.read_names[0]
    n = len(s_res.read_names)
    assert s_sp.read_names[n - 1] == s_res.read_names[n - 1]


def test_pipeline_stream_matches_sync(fixture_bam, monkeypatch):
    """The background-inflate window pipeline (OARFISH_DECODE_PIPELINE=1,
    the many-core default at threads >= 6) must produce byte-identical
    chunks to the single-buffer sync path, under tiny windows that force
    many prefetch/stitch cycles and cross-window group carries."""
    monkeypatch.setenv("OARFISH_DECODE_WINDOW_BYTES", "4096")

    def collect():
        cols, names, unmapped, base = [], [], 0, 0
        chunks = list(native.stream_bam(fixture_bam, keep_names=True))
        for c in chunks:
            cols.append(c.columns)
            names.extend(c.group_names or [])
            unmapped += c.num_unmapped
            base += c.n_groups
        return chunks, cols, names, unmapped, base

    monkeypatch.setenv("OARFISH_DECODE_PIPELINE", "0")
    _, cols_s, names_s, unm_s, ng_s = collect()
    monkeypatch.setenv("OARFISH_DECODE_PIPELINE", "1")
    chunks_p, cols_p, names_p, unm_p, ng_p = collect()
    assert len(chunks_p) > 3
    assert (names_p, unm_p, ng_p) == (names_s, unm_s, ng_s)
    for f in ("group_id", "flag", "ref_id", "pos", "ref_span", "seq_len",
              "score", "has_score"):
        np.testing.assert_array_equal(
            np.concatenate([getattr(c, f) for c in cols_p]),
            np.concatenate([getattr(c, f) for c in cols_s]), err_msg=f,
        )


def test_pipeline_stream_default_windows(fixture_bam, monkeypatch):
    """Pipeline mode with default (one-window) geometry: the whole file
    fits one window, so the prefetch immediately drains to EOF."""
    monkeypatch.delenv("OARFISH_DECODE_WINDOW_BYTES", raising=False)
    monkeypatch.setenv("OARFISH_DECODE_PIPELINE", "1")
    whole = native.decode_bam(fixture_bam, keep_names=True)
    chunks = list(native.stream_bam(fixture_bam, keep_names=True))
    assert chunks[-1].is_final
    np.testing.assert_array_equal(
        np.concatenate([c.columns.flag for c in chunks]),
        whole.columns.flag,
    )


def test_pipeline_early_close_joins_prefetch(fixture_bam, monkeypatch):
    """Closing the stream generator mid-flight (consumer error path)
    with a prefetch in progress must not crash or leak — the destructor
    joins the background inflate before unmapping."""
    monkeypatch.setenv("OARFISH_DECODE_WINDOW_BYTES", "4096")
    monkeypatch.setenv("OARFISH_DECODE_PIPELINE", "1")
    gen = native.stream_bam(fixture_bam, keep_names=False)
    next(gen)
    gen.close()  # prefetch may be in flight; close must join it


@pytest.mark.parametrize("pipeline", ["0", "1"])
def test_tiny_headroom_giant_tail_fallback(fixture_bam, monkeypatch,
                                           pipeline):
    """A partial-record tail larger than the stitch headroom takes the
    realloc+copy fallback (both sync and pipeline advance paths). Tiny
    windows + a headroom smaller than one record force it constantly."""
    whole = native.decode_bam(fixture_bam, keep_names=True)
    monkeypatch.setenv("OARFISH_DECODE_WINDOW_BYTES", "512")
    monkeypatch.setenv("OARFISH_DECODE_HEADROOM_BYTES", "64")
    monkeypatch.setenv("OARFISH_DECODE_PIPELINE", pipeline)
    chunks = list(native.stream_bam(fixture_bam, keep_names=True))
    for f in ("group_id", "flag", "ref_id", "pos", "ref_span", "seq_len",
              "score", "has_score"):
        got = np.concatenate([getattr(c.columns, f) for c in chunks])
        if f == "group_id":
            base, parts2 = 0, []
            for c in chunks:
                parts2.append(c.columns.group_id + base)
                base += c.n_groups
            got = np.concatenate(parts2)
        np.testing.assert_array_equal(
            got, getattr(whole.columns, f), err_msg=f,
        )
    names = [n for c in chunks for n in (c.group_names or [])]
    assert names == list(whole.group_names)


def test_filter_pool_matches_serial(fixture_bam, monkeypatch):
    """The out-of-order filter pool must accumulate strictly in order:
    CSR, names, discard table, and unique counts byte-identical to the
    single-worker path."""
    from oarfish_tpu.host.packer import pack_bam_stream

    opts = FilterOpts(model_coverage=True)
    monkeypatch.setenv("OARFISH_DECODE_WINDOW_BYTES", "4096")

    def run():
        return pack_bam_stream(fixture_bam, opts, 100, threads=2,
                               keep_names=True)

    monkeypatch.setenv("OARFISH_FILTER_THREADS", "1")
    h1, s1, c1, u1 = run()
    monkeypatch.setenv("OARFISH_FILTER_THREADS", "4")
    h4, s4, c4, u4 = run()
    assert u1 == u4
    np.testing.assert_array_equal(s1.txp_id, s4.txp_id)
    np.testing.assert_array_equal(s1.boundaries, s4.boundaries)
    np.testing.assert_array_equal(s1.as_prob, s4.as_prob)
    np.testing.assert_array_equal(s1.start, s4.start)
    assert list(s1.read_names) == list(s4.read_names)
    from dataclasses import asdict

    assert asdict(s1.discard) == asdict(s4.discard)
    assert s1.num_unique_alignments == s4.num_unique_alignments
    np.testing.assert_allclose(c1.bins, c4.bins, rtol=1e-12, atol=1e-12)


def test_header_spanning_many_windows(tmp_path, monkeypatch):
    """A header larger than the decode window exercises the open-path
    grow/concatenate branch (ref dictionaries at GENCODE scale easily
    exceed a test-sized window)."""
    p = tmp_path / "bighdr.bam"
    # ~300 KB of ref dictionary = ~5 BGZF blocks; with a 1 KB window
    # each grow appends one block, so the concat branch runs repeatedly
    names = [f"transcript_{i:06d}_{'x'*40}" for i in range(5000)]
    lens = [1000 + i for i in range(5000)]
    recs = [
        dict(name=f"r{i}", flag=0, ref_id=i % 5000, pos=5, cigar="200M",
             seq="A" * 200, score=290)
        for i in range(50)
    ]
    bam.write_bam(p, names, lens, recs)
    whole = native.decode_bam(p, keep_names=True)
    assert whole.header.ref_names == names
    monkeypatch.setenv("OARFISH_DECODE_WINDOW_BYTES", "1024")
    monkeypatch.setenv("OARFISH_DECODE_HEADROOM_BYTES", "256")
    chunks = list(native.stream_bam(p, keep_names=True))
    assert chunks[0].header is not None
    assert chunks[0].header.ref_names == names
    assert list(chunks[0].header.ref_lengths) == lens
    np.testing.assert_array_equal(
        np.concatenate([c.columns.ref_id for c in chunks]),
        whole.columns.ref_id,
    )


def _fuzz_bam(rng, path, trial):
    """One randomized valid BAM: harsh CIGARs (all 9 ops), zero-length
    seqs, name lengths up to the 254-byte format cap, many refs,
    unmapped records, secondary/supplementary flags, and payloads big
    enough to span multiple BGZF blocks."""
    CIG = "MIDNSHP=X"
    nrefs = int(rng.integers(1, 30))
    names = [f"ref{i}_{'z' * int(rng.integers(0, 40))}" for i in range(nrefs)]
    lens = [int(x) for x in rng.integers(100, 100_000, nrefs)]
    recs = []
    nreads = int(rng.integers(1, 150))
    for r in range(nreads):
        if rng.random() < 0.08:
            recs.append(dict(name=f"u{r}", flag=4, ref_id=-1, pos=-1,
                             cigar="", seq="", mapq=0))
            continue
        name = "r" + "x" * int(rng.integers(0, 200)) + str(r)
        for a in range(int(rng.integers(1, 4))):
            nops = int(rng.integers(1, 8))
            cig, qlen = "", 0
            for _ in range(nops):
                op = CIG[int(rng.integers(len(CIG)))]
                n = int(rng.integers(1, 300))
                cig += f"{n}{op}"
                if op in "MIS=X":
                    qlen += n
            seq = ("ACGTNMRWSYK" * (qlen // 11 + 1))[:qlen]
            if rng.random() < 0.2:
                seq = ""  # SAM '*': l_seq == 0 with a real CIGAR
            flag = 0 if a == 0 else int(rng.choice([256, 2048]))
            score = (int(rng.integers(0, 500))
                     if rng.random() < 0.9 else None)
            recs.append(dict(name=name, flag=flag,
                             ref_id=int(rng.integers(nrefs)),
                             pos=int(rng.integers(0, 1000)), cigar=cig,
                             seq=seq, score=score))
    bam.write_bam(path, names, lens, recs)
    return recs


def test_fuzz_decoder_differential(tmp_path):
    """Property fuzz (VERDICT r3 item 7): randomized harsh-but-valid
    BAMs — the native decoder's columns must match the Python reader
    byte-for-byte on every trial."""
    if native.get_lib() is None:
        pytest.skip("native decoder unavailable")
    rng = np.random.default_rng(20260820)
    for trial in range(10):
        p = tmp_path / f"f{trial}.bam"
        _fuzz_bam(rng, p, trial)
        dec = native.decode_bam(p, keep_names=True)
        reader = BamReader(p)
        cols, names2, num_unmapped = columns_from_records(
            reader.records()
        )
        assert dec.header.ref_names == reader.header.ref_names
        assert dec.num_unmapped == num_unmapped, f"trial {trial}"
        for f in ("group_id", "flag", "ref_id", "pos", "ref_span",
                  "seq_len", "score", "has_score"):
            np.testing.assert_array_equal(
                getattr(dec.columns, f), getattr(cols, f),
                err_msg=f"trial {trial} column {f}",
            )
        assert dec.group_names == names2, f"trial {trial}"


def test_fuzz_truncation_boundaries(tmp_path):
    """Truncate a fuzzed BAM at every structural boundary class — mid
    magic, mid header, mid ref table, mid record, mid BGZF block, after
    a whole block — the native decoder must raise a clean ValueError
    (or decode the intact prefix identically to the Python reader),
    never crash or return garbage."""
    if native.get_lib() is None:
        pytest.skip("native decoder unavailable")
    rng = np.random.default_rng(7)
    p = tmp_path / "base.bam"
    _fuzz_bam(rng, p, 0)
    data = p.read_bytes()
    cuts = sorted(set(
        [1, 3, 9, 17, 30]
        + [int(x) for x in rng.integers(1, len(data), 25)]
        + [len(data) - 1, len(data) - 28]  # inside / before EOF marker
    ))
    for cut in cuts:
        tr = tmp_path / "trunc.bam"
        tr.write_bytes(data[:cut])
        try:
            dec = native.decode_bam(tr, keep_names=True)
        except ValueError:
            continue  # clean typed failure
        # decoded without error: truncation fell on a whole-file
        # boundary — the Python reader must agree exactly
        reader = BamReader(tr)
        cols, names2, num_unmapped = columns_from_records(
            reader.records()
        )
        np.testing.assert_array_equal(dec.columns.group_id,
                                      cols.group_id)
        np.testing.assert_array_equal(dec.columns.pos, cols.pos)
        assert dec.group_names == names2
