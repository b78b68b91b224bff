"""Native BCF2.2 reader tests.

The reader half of phlash_tpu.io.bcf was validated against an
htslib-produced file (the reference's tests/fixtures/sample.bcf golden
counts: het sum 234, afs [143, 60, 89] at 1:25-26 Mb — reference
tests/test_data.py:41-52); the committed fixture here is produced by our
own writer (tools/make_bcf_fixture.py) and pins the counts below, so the
reader, writer, BGZF framing, and region logic are all covered without a
pysam/bcftools dependency.
"""

import gzip
import os
import struct

import numpy as np
import pytest

from phlash_tpu.data import VcfContig, contig
from phlash_tpu.io.bcf import BcfFile, iter_bcf, write_bcf

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "sample.bcf")


def test_bgzf_framing():
    "The fixture is valid BGZF: gzip members with the BC extra field + EOF."
    raw = open(FIXTURE, "rb").read()
    assert raw[:4] == b"\x1f\x8b\x08\x04"  # gzip magic + FEXTRA
    xlen = struct.unpack_from("<H", raw, 10)[0]
    assert raw[12:14] == b"BC" and xlen == 6
    assert raw.endswith(
        bytes.fromhex("1f8b08040000000000ff0600424302001b0003000000000000000000")
    )
    # stdlib gzip decodes the multi-member stream to the BCF payload
    assert gzip.decompress(raw)[:5] == b"BCF\x02\x02"


def test_header_dictionaries():
    with BcfFile(FIXTURE) as f:
        assert list(f.contigs.values()) == ["chr1", "chr2"]
        assert f.samples == ["sampleA", "sampleB"]
        assert "GT" in f.strings.values()


def test_golden_counts():
    c = VcfContig(FIXTURE, contig="chr1", interval=(1, 1_000_000), samples=["sampleA", "sampleB"])
    d = c.get_data(100)
    assert d["het_matrix"].shape == (2, 10000)
    assert d["het_matrix"].max() == 1
    assert d["het_matrix"].sum() == 2252
    np.testing.assert_array_equal(d["afs"], [1070, 861, 378])


def test_golden_counts_region_subset():
    "Region restriction + single-sample subsetting on the second contig."
    c = VcfContig(FIXTURE, contig="chr2", interval=(100_000, 400_000), samples=["sampleB"])
    d = c.get_data(100)
    assert d["het_matrix"].shape == (1, 3000)
    assert d["het_matrix"].sum() == 119
    np.testing.assert_array_equal(d["afs"], [122])


def test_contig_factory_dispatch():
    c = contig(FIXTURE, samples=["sampleA"], region="chr1:1-1000000")
    assert isinstance(c, VcfContig)


def test_roundtrip_vs_text_vcf(tmp_path):
    "write_bcf -> iter_bcf must agree with the text parser on the same data."
    rng = np.random.default_rng(7)
    header = "\n".join(
        [
            "##fileformat=VCFv4.2",
            '##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">',
            "##contig=<ID=c1,length=100000>",
            "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\ts1\ts2\ts3",
        ]
    )
    pos = np.sort(rng.choice(np.arange(1, 100_000), 500, replace=False))
    records, text_lines = [], [header]
    for p in pos:
        gts = []
        for _ in range(3):
            a, b = (
                (None, None)
                if rng.random() < 0.1
                else (int(rng.integers(2)), int(rng.integers(2)))
            )
            gts.append((a, b))
        records.append(("c1", int(p), "G", ["C"], gts))
        cols = "\t".join(
            "./." if a is None else f"{a}/{b}" for a, b in gts
        )
        text_lines.append(f"c1\t{p}\t.\tG\tC\t.\tPASS\t.\tGT\t{cols}")
    bcf_path, vcf_path = str(tmp_path / "t.bcf"), tmp_path / "t.vcf"
    write_bcf(bcf_path, header, records)
    vcf_path.write_text("\n".join(text_lines) + "\n")
    samples = ["s2", "s1"]  # out of header order on purpose
    got = list(iter_bcf(bcf_path, "c1", 1, 100_000, samples))
    want = list(
        contig(str(vcf_path), samples=samples, region="c1:1-100000")._records(1, 100_000)
    )
    assert len(got) == len(want) == 500
    for g, w in zip(got, want):
        assert g["pos"] == w["pos"]
        np.testing.assert_array_equal(g["het"], w["het"])
        assert g["nd"] == w["nd"]


def test_mixed_ploidy_and_missing(tmp_path):
    header = "\n".join(
        [
            "##fileformat=VCFv4.2",
            '##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">',
            "##contig=<ID=c1,length=1000>",
            "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\ts1\ts2",
        ]
    )
    records = [
        ("c1", 10, "A", ["T"], [(0, 1), (1,)]),  # s2 haploid -> -1
        ("c1", 20, "A", ["T"], [(None, 1), (1, 1)]),  # half-missing -> -1, nd counts the 1
        ("c1", 30, "A", ["T"], [(1, 1), (0, 0)]),
    ]
    path = str(tmp_path / "m.bcf")
    write_bcf(path, header, records)
    out = list(iter_bcf(path, "c1", 1, 1000, ["s1", "s2"]))
    np.testing.assert_array_equal([r["het"] for r in out], [[1, -1], [-1, 0], [0, 0]])
    assert [r["nd"] for r in out] == [2, 3, 2]


def test_unknown_contig_raises(tmp_path):
    with pytest.raises(ValueError, match="contig"):
        list(iter_bcf(FIXTURE, "chrX", 1, 100, ["sampleA"]))


def test_unknown_sample_raises():
    with pytest.raises(ValueError, match="samples"):
        list(iter_bcf(FIXTURE, "chr1", 1, 100, ["nope"]))


def test_csi_index_present_and_used():
    "The committed fixture ships with a .csi; the reader must load it."
    with BcfFile(FIXTURE) as f:
        assert f._index is not None
        min_shift, depth, refs = f._index
        assert (min_shift, depth) == (14, 5)
        assert len(refs) == 2  # chr1, chr2


def test_indexed_region_equals_sequential(tmp_path):
    "Indexed sub-region queries must equal the full sequential scan."
    import shutil

    bcf = str(tmp_path / "s.bcf")
    shutil.copy(FIXTURE, bcf)
    # no index: sequential truth
    full = list(iter_bcf(bcf, "chr1", 1, 1_000_000, ["sampleA", "sampleB"]))
    lo, hi = full[1000]["pos"], full[2000]["pos"]
    want = [r for r in full if lo <= r["pos"] <= hi]
    shutil.copy(FIXTURE + ".csi", bcf + ".csi")
    got = list(iter_bcf(bcf, "chr1", lo, hi, ["sampleA", "sampleB"]))
    assert [r["pos"] for r in got] == [r["pos"] for r in want]
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g["het"], w["het"])
    # second contig through the index
    got2 = list(iter_bcf(bcf, "chr2", 1, 500_000, ["sampleA"]))
    want2 = list(iter_bcf(FIXTURE, "chr2", 1, 500_000, ["sampleA"]))
    assert [r["pos"] for r in got2] == [r["pos"] for r in want2]


def test_indexed_empty_region(tmp_path):
    "A region with no indexed records yields nothing (and doesn't scan)."
    recs = list(iter_bcf(FIXTURE, "chr2", 490_000, 499_999, ["sampleA"]))
    seq_total = list(iter_bcf(FIXTURE, "chr2", 1, 500_000, ["sampleA"]))
    tail = [r for r in seq_total if r["pos"] >= 490_000]
    assert [r["pos"] for r in recs] == [r["pos"] for r in tail]


def test_reg2bin_consistency():
    from phlash_tpu.io.bcf import _reg2bin, _reg2bins

    rng = np.random.default_rng(5)
    for _ in range(200):
        beg = int(rng.integers(0, 1 << 28))
        end = beg + int(rng.integers(1, 1 << 18))
        b = _reg2bin(beg, end, 14, 5)
        # the containing bin must be among the overlap bins of any
        # subinterval
        mid = (beg + end) // 2
        assert b in _reg2bins(beg, end, 14, 5)
        assert b in _reg2bins(mid, mid + 1, 14, 5)


def test_bgzf_virtual_seek(tmp_path):
    from phlash_tpu.io.bcf import BgzfReader, _BgzfWriter

    p = tmp_path / "t.bgzf"
    payload = bytes(range(256)) * 1500  # ~384 KB -> several blocks
    with open(p, "wb") as fh:
        w = _BgzfWriter(fh)
        # write in odd-sized pieces, remembering a mid-stream voffset
        w.write(payload[:100_000])
        mark = w.tell_virtual()
        w.write(payload[100_000:])
        w.finish()
    r = BgzfReader(str(p))
    r.seek_virtual(0)
    assert r.read(len(payload)) == payload
    r.seek_virtual(mark)
    assert r.read(50) == payload[100_000:100_050]


REF_FIXTURE = "/root/reference/tests/fixtures/sample.bcf"


@pytest.mark.skipif(not os.path.exists(REF_FIXTURE), reason="reference fixture absent")
def test_htslib_fixture_golden_counts():
    """Pin the reader to htslib-produced bytes.

    The committed fixture is written by our own writer; this one was written
    by htslib, so reader and writer cannot share a spec misreading.  Golden
    counts from the reference suite (tests/test_data.py:41-52)."""
    c = VcfContig(
        REF_FIXTURE,
        contig="1",
        interval=(25_000_000, 26_000_000),
        samples=["NA12878", "NA12889"],
    )
    d = c.get_data(100)
    assert d["het_matrix"].max() == 1
    assert d["het_matrix"].sum() == 234
    np.testing.assert_array_equal(d["afs"], [143, 60, 89])


@pytest.mark.skipif(not os.path.exists(REF_FIXTURE), reason="reference fixture absent")
def test_htslib_csi_region_query(tmp_path):
    "htslib's .csi drives the indexed seek; subregion == sequential subset."
    import shutil

    with BcfFile(REF_FIXTURE) as f:
        assert f._index is not None  # htslib's own index loaded
    full = list(iter_bcf(REF_FIXTURE, "1", 25_000_000, 26_000_000, ["NA12878"]))
    lo, hi = full[len(full) // 3]["pos"], full[2 * len(full) // 3]["pos"]
    want = [r for r in full if lo <= r["pos"] <= hi]
    got = list(iter_bcf(REF_FIXTURE, "1", lo, hi, ["NA12878"]))
    assert [r["pos"] for r in got] == [r["pos"] for r in want]
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g["het"], w["het"])


def test_header_quoted_description_not_miskeyed():
    "'ID=' or 'IDX=' inside a quoted Description must not corrupt parsing."
    from phlash_tpu.io.bcf import _header_dicts

    text = "\n".join(
        [
            "##fileformat=VCFv4.2",
            '##FILTER=<ID=PASS,Description="All filters passed",IDX=0>',
            '##INFO=<ID=DP,Number=1,Type=Integer,Description="has ID=trap, IDX=9 inside",IDX=1>',
            '##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype with, comma and IDX=7">',
            "##contig=<ID=chr1,length=1000,IDX=0>",
            "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\ts1",
        ]
    )
    contigs, strings, samples = _header_dicts(text)
    assert contigs == {0: "chr1"}
    assert strings[0] == "PASS" and strings[1] == "DP"
    # GT has no IDX= -> next free slot (2), not 7 from inside the quotes
    assert strings[2] == "GT"
    assert samples == ["s1"]


def test_header_escaped_quote_in_description():
    r"""A backslash-escaped quote (\") inside a Description (legal per the
    VCF spec) must not flip the quoted state and mis-split the body."""
    from phlash_tpu.io.bcf import _header_dicts

    text = "\n".join(
        [
            "##fileformat=VCFv4.2",
            '##INFO=<ID=X,Number=1,Type=Integer,Description="a \\"b\\", IDX=9",IDX=1>',
            '##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">',
            "##contig=<ID=chr1,length=1000,IDX=0>",
            "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\ts1",
        ]
    )
    contigs, strings, samples = _header_dicts(text)
    # X's real IDX is the trailing 1, not the 9 inside the escaped string
    assert strings[1] == "X"
    assert strings[2] == "GT"
    assert 9 not in strings
    assert contigs == {0: "chr1"} and samples == ["s1"]


def test_zero_count_format_field(tmp_path):
    """A FORMAT field with count 0 (type byte 0x00) is legal; skip it.

    htslib emits such descriptors for fields with no data in a record; the
    reader previously crashed on atom type 0 (KeyError)."""
    import shutil
    import struct as _struct

    from phlash_tpu.io.bcf import BgzfReader, _BgzfWriter, write_bcf

    header = "\n".join(
        [
            "##fileformat=VCFv4.2",
            '##FORMAT=<ID=ZZ,Number=.,Type=Integer,Description="empty">',
            '##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">',
            "##contig=<ID=c1,length=1000>",
            "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\ts1",
        ]
    )
    path = str(tmp_path / "z.bcf")
    write_bcf(path, header, [("c1", 10, "A", ["T"], [(0, 1)])])
    # splice a zero-count ZZ field in front of GT inside the indiv block:
    # re-read the one record, rewrite with n_fmt=2 and a 0x00 type byte +
    # ZZ's key prepended
    r = BgzfReader(path)
    r.seek_virtual(0)
    magic_and_header = r.read(5 + 4)
    (l_text,) = _struct.unpack("<I", magic_and_header[5:9])
    htext = r.read(l_text)
    head = r.read(8)
    l_shared, l_indiv = _struct.unpack("<II", head)
    shared = bytearray(r.read(l_shared))
    indiv = r.read(l_indiv)
    r.close()
    # bump n_fmt 1 -> 2 (high byte of the word at offset 20)
    n_allele_info = _struct.unpack_from("<I", shared, 20)[0]
    _struct.pack_into("<I", shared, 20, (n_allele_info & 0x00FFFFFF) | (2 << 24))
    # ZZ was declared first (dict index 1: PASS=0 implicit, ZZ=1, GT=2)
    zz_key = bytes([0x11, 0x01])  # typed int8 scalar = 1
    zz_field = zz_key + bytes([0x00])  # type byte: count 0, atom 0
    new_indiv = zz_field + indiv
    with open(path, "wb") as fh:
        w = _BgzfWriter(fh)
        w.write(magic_and_header[:5])
        w.write(_struct.pack("<I", l_text))
        w.write(htext)
        w.write(_struct.pack("<II", len(shared), len(new_indiv)))
        w.write(bytes(shared))
        w.write(new_indiv)
        w.finish()
    out = list(iter_bcf(path, "c1", 1, 1000, ["s1"]))
    assert len(out) == 1 and out[0]["het"][0] == 1


def test_bcf_fast_path_equals_record_path(tmp_path, monkeypatch):
    """VcfContig's vectorized .bcf fast path must reproduce the per-record
    path exactly (het OR-windowing, AFS counts, region filtering), including
    a mixed-layout file (a haploid record changes the batch layout)."""
    from phlash_tpu.io.bcf import write_bcf

    header = (
        "##fileformat=VCFv4.2\n"
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">\n'
        "##contig=<ID=chr1,length=5000>\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\ts0\ts1\n"
    )
    rng = np.random.default_rng(5)
    recs = []
    for pos in sorted(rng.choice(np.arange(1, 5000), size=300, replace=False)):
        gts = [tuple(rng.integers(0, 2, 2)), tuple(rng.integers(0, 2, 2))]
        if pos % 97 == 0:
            gts[0] = (None, None)  # missing call
        if pos % 131 == 0:
            gts = [(1,), (0,)]  # haploid record: layout switch mid-stream
        recs.append(("chr1", int(pos), "A", ["T"], gts))
    p = tmp_path / "mix.bcf"
    write_bcf(str(p), header, recs)

    c = VcfContig(str(p), samples=["s0", "s1"], contig="chr1", interval=(100, 4500))
    fast = c._get_data_fast(100)
    monkeypatch.setattr(VcfContig, "_get_data_fast", lambda self, w: None)
    slow = c.get_data(100)
    np.testing.assert_array_equal(fast["het_matrix"], slow["het_matrix"])
    np.testing.assert_array_equal(fast["afs"], slow["afs"])
    assert fast["het_matrix"].any() and fast["afs"].sum() > 0


def test_bcf_polyploid_raises_ploidy_error(tmp_path):
    """A tetraploid call (nd > 2*num_samples) must fail loudly in the fast
    path — a clear PloidyError, not a silently dropped AFS count."""
    from phlash_tpu.data import PloidyError
    from phlash_tpu.io.bcf import write_bcf

    header = (
        "##fileformat=VCFv4.2\n"
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">\n'
        "##contig=<ID=chr1,length=5000>\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\ts0\n"
    )
    recs = [
        ("chr1", 100, "A", ["T"], [(0, 1)]),
        ("chr1", 200, "A", ["T"], [(1, 1, 1, 1)]),  # tetraploid
    ]
    p = tmp_path / "tetra.bcf"
    write_bcf(str(p), header, recs)
    c = VcfContig(str(p), samples=["s0"], contig="chr1", interval=(1, 5000))
    with pytest.raises(PloidyError, match="diploid"):
        c.get_data(100)


def test_bcf_truncated_gt_payload_raises(tmp_path):
    """A record whose indiv block ends inside the GT payload must raise at
    framing time, not silently shift genotype-position association."""
    import struct as _struct

    from phlash_tpu.io.bcf import BgzfReader, _BgzfWriter, write_bcf

    header = (
        "##fileformat=VCFv4.2\n"
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">\n'
        "##contig=<ID=c1,length=1000>\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\ts1\n"
    )
    path = str(tmp_path / "trunc.bcf")
    write_bcf(path, header, [("c1", 10, "A", ["T"], [(0, 1)])])

    # re-frame the record with l_indiv cut to end at the GT payload start
    r = BgzfReader(path)
    r.seek_virtual(0)
    magic = r.read(5)
    (l_text,) = _struct.unpack("<I", r.read(4))
    htext = r.read(l_text)
    l_shared, l_indiv = _struct.unpack("<II", r.read(8))
    shared = r.read(l_shared)
    indiv = r.read(l_indiv)
    r.close()
    # indiv = [GT key typed int][GT meta descriptor][payload]; keep the
    # framing bytes, drop the payload
    cut = len(indiv) - 2  # 2 bytes: int8 x ploidy 2 x 1 sample
    with open(path, "wb") as fh:
        w = _BgzfWriter(fh)
        w.write(magic)
        w.write(_struct.pack("<I", l_text))
        w.write(htext)
        w.write(_struct.pack("<II", l_shared, cut))
        w.write(shared)
        w.write(indiv[:cut])
        w.finish()
    with BcfFile(path) as f:
        with pytest.raises(ValueError, match="truncated GT payload"):
            list(f.records("c1", 1, 1000))
