"""Data-ingestion tests (cf. reference tests/test_data.py:18-102)."""

import gzip

import numpy as np
import pytest

from phlash_tpu.data import (
    RawContig,
    VcfContig,
    chunk_het_matrix,
    contig,
    init_mcmc_data,
)


def test_chunk_layout_invariant(rng):
    "Each chunk's first `overlap` columns replay the previous chunk's tail."
    H = rng.integers(-1, 2, size=(3, 1234)).astype(np.int8)
    overlap, chunk_size = 50, 200
    ch = chunk_het_matrix(H, overlap, chunk_size)
    span = overlap + chunk_size
    assert ch.shape[1] == span
    per_row = ch.shape[0] // 3
    for r in range(3):
        row = ch[r * per_row : (r + 1) * per_row]
        for k in range(per_row):
            start = k * chunk_size
            expected = H[r, start : start + span]
            got = row[k, : len(expected)]
            np.testing.assert_array_equal(got, expected)
            # padding is always missing
            np.testing.assert_array_equal(row[k, len(expected) :], -1)


def test_chunker_short_sequence():
    H = np.zeros((1, 10), dtype=np.int8)
    ch = chunk_het_matrix(H, overlap=5, chunk_size=20)
    assert ch.shape == (1, 25)
    np.testing.assert_array_equal(ch[0, 10:], -1)


def _write_psmcfa(path, seqs):
    with open(path, "w") as f:
        for name, s in seqs.items():
            f.write(f">{name}\n")
            for i in range(0, len(s), 60):
                f.write(s[i : i + 60] + "\n")


def test_psmcfa_parser(tmp_path):
    p = tmp_path / "sample.psmcfa"
    _write_psmcfa(p, {"chr1": "TTKKTNNTKT", "chr2": "KKTT"})
    contigs = list(RawContig.from_psmcfa_iter(str(p), window_size=100))
    assert len(contigs) == 2
    np.testing.assert_array_equal(
        contigs[0].het_matrix[0], [0, 0, 1, 1, 0, -1, -1, 0, 1, 0]
    )
    np.testing.assert_array_equal(contigs[1].het_matrix[0], [1, 1, 0, 0])
    assert contigs[0].N == 2
    assert contigs[0].L == 1000


VCF_TEXT = """##fileformat=VCFv4.2
##contig=<ID=chr1,length=1000>
#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tsampleA\tsampleB
chr1\t10\t.\tA\tT\t.\tPASS\t.\tGT\t0/1\t0/0
chr1\t150\t.\tG\tC\t.\tPASS\t.\tGT\t1/1\t0/1
chr1\t151\t.\tG\tC\t.\tPASS\t.\tGT\t0|1\t./.
chr1\t400\t.\tT\tA\t.\tPASS\t.\tGT\t0/0\t1/1
"""


@pytest.mark.parametrize("gz", [False, True])
def test_vcf_parser(tmp_path, gz):
    p = tmp_path / ("t.vcf.gz" if gz else "t.vcf")
    if gz:
        with gzip.open(p, "wt") as f:
            f.write(VCF_TEXT)
    else:
        p.write_text(VCF_TEXT)
    c = contig(str(p), samples=["sampleA", "sampleB"], region="chr1:1-1000")
    assert isinstance(c, VcfContig)
    d = c.get_data(window_size=100)
    H = d["het_matrix"]
    assert H.shape == (2, 10)
    # window 0: pos 10 -> A het; window 1: pos 150/151 -> both het (B has
    # missing at 151 but het=0/1 at 150); window 3: hom-alt for B only
    assert H[0, 0] == 1 and H[1, 0] == 0
    assert H[0, 1] == 1 and H[1, 1] == 1
    assert H[0, 3] == 0 and H[1, 3] == 0
    # afs: nd counts 1,3,1(her 0|1 -> 1),... length 2N-1 = 3
    assert d["afs"].shape == (3,)
    assert d["afs"].sum() == 4


def _synthetic_vcf(n_records, contigs=("chr1",), spacing=37):
    "Deterministic sorted multi-record VCF body for streaming tests."
    lines = [
        "##fileformat=VCFv4.2",
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tsA\tsB",
    ]
    for chrom in contigs:
        for i in range(n_records):
            pos = 1 + i * spacing
            ga = "0/1" if i % 3 == 0 else "1/1"
            gb = "0/0" if i % 2 == 0 else "0/1"
            lines.append(f"{chrom}\t{pos}\t.\tA\tT\t.\tPASS\t.\tGT\t{ga}\t{gb}")
    return "\n".join(lines) + "\n"


@pytest.mark.parametrize("gz", [False, True])
def test_vcf_streaming_blocks(tmp_path, monkeypatch, gz):
    "Block-streamed parse (tiny blocks) must equal the single-block parse."
    text = _synthetic_vcf(4000, contigs=("chr0", "chr1", "chr2"))
    p = tmp_path / ("s.vcf.gz" if gz else "s.vcf")
    if gz:
        with gzip.open(p, "wt") as f:
            f.write(text)
    else:
        p.write_text(text)
    region = "chr1:1-148000"
    big = contig(str(p), samples=["sA", "sB"], region=region).get_data(100)
    # force many blocks, including ones that split lines mid-record
    monkeypatch.setattr(VcfContig, "_STREAM_BLOCK", 1 << 12)
    small = contig(str(p), samples=["sA", "sB"], region=region).get_data(100)
    np.testing.assert_array_equal(big["het_matrix"], small["het_matrix"])
    np.testing.assert_array_equal(big["afs"], small["afs"])
    assert big["het_matrix"].any() and big["afs"].sum() == 4000


# -- pysam-backed record iteration via a fake pysam module -------------------
#
# pysam is absent in this environment, so the indexed-fetch backend is
# exercised with a stand-in that implements pysam's actual coordinate
# contract: VariantFile.fetch(start=, stop=) is 0-based half-open while
# records expose 1-based .pos — exactly the convention mismatch that the
# shared 1-based-inclusive _records(start, end) interface has to absorb.

_FAKE_VCF_RECORDS = [
    # (contig, pos, rlen, {sample: GT tuple}) — mirrors VCF_TEXT above;
    # rlen is the REF allele length (pysam yields any record whose
    # [pos-1, pos-1+rlen) footprint overlaps the fetch window)
    ("chr1", 10, 1, {"sampleA": (0, 1), "sampleB": (0, 0)}),
    ("chr1", 150, 1, {"sampleA": (1, 1), "sampleB": (0, 1)}),
    ("chr1", 151, 1, {"sampleA": (0, 1), "sampleB": (None, None)}),
    ("chr1", 400, 1, {"sampleA": (0, 0), "sampleB": (1, 1)}),
]


def _install_fake_pysam(monkeypatch, records=_FAKE_VCF_RECORDS):
    import sys
    import types
    from types import SimpleNamespace

    fetch_log = []

    class VariantFile:
        def __init__(self, path):
            self._samples = sorted({s for _, _, _, g in records for s in g})

        def __enter__(self):
            return self

        def __exit__(self, *exc):
            return False

        def subset_samples(self, samples):
            missing = set(samples) - set(self._samples)
            if missing:
                raise ValueError(f"unknown samples {missing}")
            self._samples = list(samples)

        def fetch(self, contig=None, start=None, stop=None):
            fetch_log.append((contig, start, stop))
            for chrom, pos, rlen, gts in records:
                # real pysam: yield records whose 0-based REF footprint
                # [pos-1, pos-1+rlen) overlaps [start, stop)
                if chrom == contig and pos - 1 < stop and pos - 1 + rlen > start:
                    yield SimpleNamespace(
                        pos=pos,
                        samples={s: {"GT": gts[s]} for s in self._samples},
                    )

    fake = types.ModuleType("pysam")
    fake.VariantFile = VariantFile
    monkeypatch.setitem(sys.modules, "pysam", fake)
    return fetch_log


def test_iter_vcf_pysam_matches_text_parser(tmp_path, monkeypatch):
    "Same records, het/nd/missing semantics, and region edges as the text path."
    from phlash_tpu.data import _iter_vcf_pysam, _iter_vcf_text

    p = tmp_path / "t.vcf"
    p.write_text(VCF_TEXT)
    samples = ["sampleA", "sampleB"]
    _install_fake_pysam(monkeypatch)
    for region in [(1, 1000), (10, 150), (11, 149), (151, 400)]:
        text = list(_iter_vcf_text(str(p), "chr1", *region, samples))
        via_pysam = list(_iter_vcf_pysam("t.bcf", "chr1", *region, samples))
        assert [r["pos"] for r in via_pysam] == [r["pos"] for r in text], region
        for a, b in zip(via_pysam, text):
            np.testing.assert_array_equal(a["het"], b["het"])
            assert a["nd"] == b["nd"]


def test_iter_vcf_pysam_filters_straddling_deletion(monkeypatch):
    """A multi-base record starting before the region overlaps the fetch
    window (pysam yields it) but must be excluded, like the other backends
    exclude any pos < start."""
    from phlash_tpu.data import _iter_vcf_pysam

    records = [
        ("chr1", 99, 3, {"sA": (0, 1)}),  # deletion straddling pos 100
        ("chr1", 100, 1, {"sA": (0, 1)}),  # exactly on the left edge: kept
        ("chr1", 150, 1, {"sA": (1, 1)}),
    ]
    _install_fake_pysam(monkeypatch, records)
    got = list(_iter_vcf_pysam("t.bcf", "chr1", 100, 200, ["sA"]))
    assert [r["pos"] for r in got] == [100, 150]


def test_vcf_contig_prefers_pysam(monkeypatch):
    "With pysam importable, .bcf get_data routes through the indexed fetch."
    fetch_log = _install_fake_pysam(monkeypatch)
    c = VcfContig(
        "t.bcf", samples=["sampleA", "sampleB"], contig="chr1",
        interval=(1, 1000),
    )
    d = c.get_data(window_size=100)
    assert fetch_log == [("chr1", 0, 1000)]
    # identical to the text-parser result asserted in test_vcf_parser
    H = d["het_matrix"]
    assert H[0, 0] == 1 and H[1, 0] == 0
    assert H[0, 1] == 1 and H[1, 1] == 1
    assert H[0, 3] == 0 and H[1, 3] == 0
    assert d["afs"].sum() == 4


def test_vcf_requires_region(tmp_path):
    p = tmp_path / "t.vcf"
    p.write_text(VCF_TEXT)
    with pytest.raises(ValueError, match="region"):
        contig(str(p), samples=["sampleA"])


def test_init_mcmc_data(rng):
    contigs = [
        RawContig(
            het_matrix=rng.integers(0, 2, size=(2, 5000)).astype(np.int8),
            afs=np.array([10, 5, 2]),
            window_size=100,
        )
        for _ in range(2)
    ]
    afs, chunks = init_mcmc_data(
        contigs, window_size=100, overlap=100, chunk_size=1000, num_workers=1
    )
    np.testing.assert_array_equal(afs, [20, 10, 4])
    assert chunks.shape[1] == 1100
    assert chunks.dtype == np.int8


@pytest.mark.parametrize("region", ["chr1:1-148000", "chr2:50000-100000"])
def test_vcf_tabix_indexed_fetch(tmp_path, monkeypatch, region):
    "A native .tbi next to a bgzipped VCF must give identical results."
    from phlash_tpu.io.tabix import read_tbi, region_start_voff, write_tabixed_vcf

    text = _synthetic_vcf(3000, contigs=("chr0", "chr1", "chr2"))
    p = str(tmp_path / "t.vcf.gz")
    write_tabixed_vcf(p, text)
    monkeypatch.setattr(VcfContig, "_STREAM_BLOCK", 1 << 12)
    chrom, span = region.split(":")
    samples = ["sA", "sB"]
    with_idx = contig(p, samples=samples, region=region).get_data(100)
    # the later contigs must start at a nonzero virtual offset
    lo, hi = (int(x) for x in span.split("-"))
    voff = region_start_voff(p + ".tbi", chrom, lo, hi)
    assert voff is not None and voff > 0
    names, _refs = read_tbi(p + ".tbi")
    assert names == ["chr0", "chr1", "chr2"]
    import os as _os

    _os.remove(p + ".tbi")
    without = contig(p, samples=samples, region=region).get_data(100)
    np.testing.assert_array_equal(with_idx["het_matrix"], without["het_matrix"])
    np.testing.assert_array_equal(with_idx["afs"], without["afs"])
    assert with_idx["het_matrix"].any()


def test_vcf_tabix_empty_region(tmp_path):
    "An indexed region with no records returns empty data without scanning."
    from phlash_tpu.io.tabix import write_tabixed_vcf

    text = _synthetic_vcf(200, contigs=("c1",), spacing=10)
    p = str(tmp_path / "e.vcf.gz")
    write_tabixed_vcf(p, text)
    d = contig(p, samples=["sA"], region="c1:1000000-2000000").get_data(100)
    assert d["het_matrix"].sum() == 0 and d["afs"].sum() == 0


# ---------------------------------------------------------------------------
# tskit path via a duck-typed fake tree sequence (tskit is absent here;
# TreeSequenceContig only touches the five members the fake provides —
# cf. reference tests/test_data.py:85-102 which uses a real msprime ts)
# ---------------------------------------------------------------------------


class _FakeVariant:
    def __init__(self, position, genotypes):
        self.position = position
        self.genotypes = np.asarray(genotypes)


class _FakeIndividual:
    def __init__(self, nodes):
        self.nodes = nodes


class _FakeTS:
    """Duck-typed stand-in for tskit.TreeSequence.

    Stores per-site genotype vectors over haplotype ids 0..n-1 and
    implements exactly the members TreeSequenceContig uses."""

    def __init__(self, L, positions, genotypes):
        self._L = L
        self._pos = np.asarray(positions)
        self._g = np.asarray(genotypes)  # (n_sites, n_haplotypes)
        self.num_sites = len(self._pos)

    def get_sequence_length(self):
        return float(self._L)

    def individuals(self):
        return [
            _FakeIndividual((2 * i, 2 * i + 1)) for i in range(self._g.shape[1] // 2)
        ]

    def variants(self, samples, copy=False):
        cols = np.asarray(samples)
        for p, row in zip(self._pos, self._g):
            yield _FakeVariant(p, row[cols])

    def allele_frequency_spectrum(
        self, sample_sets, windows, polarised, span_normalise
    ):
        assert polarised and not span_normalise
        (sset,) = sample_sets
        counts = self._g[:, np.asarray(sset)].sum(1)
        n = len(sset)
        out = np.zeros((len(windows) - 1, n + 1))
        w = np.searchsorted(np.asarray(windows), self._pos, side="right") - 1
        for wi, k in zip(w, counts):
            out[wi, k] += 1
        return out


@pytest.fixture
def fake_ts(rng):
    L = 1000
    n_hap = 6
    positions = np.sort(rng.choice(np.arange(1, L), size=60, replace=False))
    genotypes = rng.integers(0, 2, size=(60, n_hap))
    return _FakeTS(L, positions, genotypes)


def test_ts_contig_basic(fake_ts):
    from phlash_tpu.data import TreeSequenceContig

    c = TreeSequenceContig(fake_ts)
    assert c.N == 6 and c.L == 1000
    d = c.get_data(window_size=100)
    assert d["het_matrix"].shape == (3, 10)
    # direct recomputation: window w counts sites where the pair differs
    want = np.zeros((3, 10), dtype=int)
    for p, row in zip(fake_ts._pos, fake_ts._g):
        for i in range(3):
            want[i, int(p) // 100] += row[2 * i] != row[2 * i + 1]
    np.testing.assert_array_equal(d["het_matrix"], want)
    # afs: polarized counts, monomorphic classes dropped
    k = fake_ts._g.sum(1)
    want_afs = np.bincount(k, minlength=7)[1:-1]
    np.testing.assert_array_equal(d["afs"], want_afs)


def test_ts_contig_node_subset(fake_ts):
    from phlash_tpu.data import TreeSequenceContig

    c = TreeSequenceContig(fake_ts, nodes=[(0, 3), (4, 5)])
    assert c.N == 4
    d = c.get_data(window_size=100)
    assert d["het_matrix"].shape == (2, 10)
    want = np.zeros((2, 10), dtype=int)
    for p, row in zip(fake_ts._pos, fake_ts._g):
        want[0, int(p) // 100] += row[0] != row[3]
        want[1, int(p) // 100] += row[4] != row[5]
    np.testing.assert_array_equal(d["het_matrix"], want)


def test_ts_contig_mask(fake_ts):
    from phlash_tpu.data import TreeSequenceContig

    mask = [(200, 400), (850, 900)]
    cm = TreeSequenceContig(fake_ts, mask=mask)
    d = cm.get_data(window_size=100)
    # masked windows are -1: [200,400) covers windows 2-3; (850,900) window 8
    np.testing.assert_array_equal(
        np.flatnonzero((d["het_matrix"] == -1).all(0)), [2, 3, 8]
    )
    assert (d["het_matrix"][:, [0, 1, 4, 5, 6, 7, 9]] >= 0).all()
    # the AFS must exclude masked intervals entirely
    keep = ~(
        ((fake_ts._pos >= 200) & (fake_ts._pos < 400))
        | ((fake_ts._pos >= 850) & (fake_ts._pos < 900))
    )
    k = fake_ts._g[keep].sum(1)
    want_afs = np.bincount(k, minlength=7)[1:-1]
    np.testing.assert_array_equal(d["afs"], want_afs)


def test_ts_contig_bad_nodes(fake_ts):
    from phlash_tpu.data import TreeSequenceContig

    with pytest.raises(ValueError, match="nodes"):
        TreeSequenceContig(fake_ts, nodes=[(0, 1, 2)])
    with pytest.raises(ValueError, match="nodes"):
        TreeSequenceContig(fake_ts, nodes="0,1")


def test_mask_breakpoints():
    from phlash_tpu.data import _mask_breakpoints

    bp, keep = _mask_breakpoints([(10, 20), (30, 40)], 100)
    np.testing.assert_array_equal(bp, [0, 10, 20, 30, 40, 100])
    np.testing.assert_array_equal(keep, [True, False, True, False, True])
    # empty mask: a single kept interval
    bp0, keep0 = _mask_breakpoints([], 50)
    np.testing.assert_array_equal(bp0, [0, 50])
    np.testing.assert_array_equal(keep0, [True])
    # overlapping intervals merge through midpoint coverage
    bp2, keep2 = _mask_breakpoints([(10, 30), (20, 40)], 100)
    assert not keep2[1:-1].any()


def test_mask_to_bool():
    from phlash_tpu.data import _mask_to_bool

    got = _mask_to_bool([(150, 250)], 1000, 100)
    np.testing.assert_array_equal(np.flatnonzero(got), [1, 2])
    assert not _mask_to_bool(None, 1000, 100).any()
    # mask beyond L clips
    got2 = _mask_to_bool([(950, 2000)], 1000, 100)
    np.testing.assert_array_equal(np.flatnonzero(got2), [9])


def test_vcf_ts_consistency(fake_ts, tmp_path):
    """The VCF and tree-sequence parsers agree on the same underlying data
    (cf. reference tests/test_data.py::test_equal_ts_vcf, which round-trips
    through ts.write_vcf — here the VCF text is written directly from the
    fake ts, so the check needs no tskit)."""
    from phlash_tpu.data import TreeSequenceContig

    samples = ["sA", "sB", "sC"]
    lines = [
        "##fileformat=VCFv4.2",
        "##contig=<ID=chr1,length=1000>",
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t" + "\t".join(samples),
    ]
    for p, row in zip(fake_ts._pos, fake_ts._g):
        gts = "\t".join(f"{row[2*i]}/{row[2*i+1]}" for i in range(3))
        # tskit coordinates are 0-based; VCF is 1-based (as write_vcf emits)
        lines.append(f"chr1\t{int(p)+1}\t.\tA\tT\t.\tPASS\t.\tGT\t{gts}")
    path = tmp_path / "ts.vcf"
    path.write_text("\n".join(lines) + "\n")

    d_vcf = contig(str(path), samples=samples, region="chr1:1-1000").get_data(100)
    d_ts = TreeSequenceContig(fake_ts).get_data(100)
    # the ts path counts het sites per window, the VCF path ORs them;
    # presence/absence must agree exactly
    np.testing.assert_array_equal(d_vcf["het_matrix"] > 0, d_ts["het_matrix"] > 0)
    np.testing.assert_array_equal(d_vcf["afs"], d_ts["afs"])


def test_vcf_requires_samples(tmp_path):
    p = tmp_path / "t.vcf"
    p.write_text(VCF_TEXT)
    with pytest.raises(ValueError, match="samples"):
        VcfContig(str(p), samples=[], contig="chr1", interval=(1, 1000))
